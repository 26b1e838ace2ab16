from hdfs_mapreduce_spark.streaming.events import (
    session_stats,
    sessionize,
    stream_dedup_events,
    stream_sessionize,
    stream_windowed_event_stats,
    windowed_event_stats,
)

__all__ = [
    "windowed_event_stats",
    "stream_windowed_event_stats",
    "sessionize",
    "session_stats",
    "stream_sessionize",
    "stream_dedup_events",
]
