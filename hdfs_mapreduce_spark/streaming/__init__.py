from hdfs_mapreduce_spark.streaming.events import (
    sessionize,
    stream_windowed_event_stats,
    windowed_event_stats,
)

__all__ = [
    "windowed_event_stats",
    "stream_windowed_event_stats",
    "sessionize",
]
