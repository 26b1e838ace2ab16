from hdfs_mapreduce_spark.sources.catalog import (
    TABLES,
    ingest_text,
    load_table,
    load_tables,
    register_views,
    spread,
    write_bucketed,
    write_table,
)

__all__ = [
    "TABLES",
    "ingest_text",
    "load_table",
    "load_tables",
    "register_views",
    "spread",
    "write_bucketed",
    "write_table",
]
