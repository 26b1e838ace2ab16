from hdfs_mapreduce_spark.functions.plugin import (
    map_records,
    map_records_batched,
    reduce_groups,
    run_mapreduce,
)

__all__ = [
    "map_records",
    "map_records_batched",
    "reduce_groups",
    "run_mapreduce",
]
