"""Structured Streaming over the events table.

The reference is batch-only (SURVEY §2.10 — its 5-second heartbeat loop is
cluster management, not data streaming). This module adds the streaming
surface a pipeline needs, with the batch/stream duality Spark makes natural:
the SAME windowed aggregation runs as a batch DataFrame (oracle-checkable
against DuckDB time_bucket) and as a ``readStream`` with watermarking
(tested with the availableNow trigger: stream result == batch result).

Sessionization is the classic "custom stateful operator": here it's
expressed relationally (lag + gap > threshold + running sum) so it works in
batch AND has a DuckDB oracle; a true incremental-streaming variant would use
``applyInPandasWithState`` (session windows keyed by user) — the relational
form is what you'd backfill with either way.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs_mapreduce_spark.sources.catalog import load_table

SESSION_GAP_MIN = 30


def _windowed_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type: count + sum(value)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form (the backfill path; oracle = DuckDB time_bucket)."""
    events = load_table(spark, sf_dir, "events")
    return _windowed_agg(events).orderBy("window_start", "event_type")


def stream_windowed_event_stats(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """Streaming form: parquet source → 1h watermark → tumbling window agg.

    Returns the DataStreamWriter (caller picks sink + trigger). Watermark
    means late events beyond 1 hour are dropped and window state is evicted —
    bounded state at any scale. With ``trigger(availableNow=True)`` this
    processes the existing files and stops: used by tests to prove
    stream ≡ batch.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    batch_df = load_table(spark, sf_dir, "events")
    # The raw parquet stores ts as TIMESTAMP(NANOS); stream-read it as a
    # nanosecond long (the schema Spark can actually decode) and apply the
    # same exact DIV-1000 conversion the batch loader uses.
    raw_schema = StructType(
        [
            StructField("ts", LongType(), f.nullable) if f.name == "ts" else f
            for f in batch_df.schema.fields
        ]
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file streaming source needs a *directory*; the test data is one
    # parquet file per table in a shared dir, so stage a symlink dir (a real
    # deployment points at a table directory and skips this).
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isfile(src):
        stage = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(src, os.path.join(stage, "events.parquet"))
        src = stage
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = _windowed_agg(stream.withWatermark("ts", "1 hour"))
    writer = agg.writeStream.outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds ``gap_min`` minutes. lag → gap flag → running
    sum, all windowed by user — one shuffle on user_id, codegen'd end-to-end.
    session_id is (user_id, session_seq) with session_seq 1-based."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > gap_min * 60)
    ).cast("int")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session stats: event count and duration seconds."""
    events = load_table(spark, sf_dir, "events")
    s = sessionize(events)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_sec"
            ),
        )
        .orderBy("user_id", "session_seq")
    )
