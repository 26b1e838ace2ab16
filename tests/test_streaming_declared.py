"""The declared streaming registry rows (plans/streaming_plans.py): each
runs its stream to completion and must hash-match its DuckDB oracle —
the same stream ≡ batch equalities test_streaming.py proves, promoted to
the driver's correctness surface (r4 verdict item 6)."""

from __future__ import annotations

from hdfs_mapreduce_spark.plans import ORACLE_SQL, RAW_QUERIES
from tests.conftest import SF_CORRECTNESS
from tests.oracle import assert_matches_oracle

STREAM_QUERIES = [
    "stream_windowed_stats",
    "stream_sliding_stats",
    "stream_attribution",
    "stream_session_stats",
    "stream_upsert_snapshot",
    "stream_heavy_hitters_audit",
    "stream_dedup_admitted",
    "stream_dedup_resketch",
    "stream_dedup_compacted",
    "stream_dedup_maintained",
]


def test_streaming_declared_queries_match_oracle(spark, ddb):
    for name in STREAM_QUERIES:
        df = RAW_QUERIES[name](spark, SF_CORRECTNESS)
        assert_matches_oracle(df, ddb, ORACLE_SQL[name], name)


def test_upsert_snapshot_is_one_row_per_key(spark):
    """Two staged copies over two micro-batches must still produce exactly
    one row per event_id (the anti-join merge actually deduplicates)."""
    from pyspark.sql import functions as F

    snap = RAW_QUERIES["stream_upsert_snapshot"](spark, SF_CORRECTNESS)
    agg = snap.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("event_id").alias("d"),
    ).collect()[0]
    assert agg["n"] == agg["d"] > 0


def test_online_dedup_phase_instrumentation(spark):
    """The per-phase wall-clock dict (plans/streaming_plans.py:PHASE_SEC,
    the r11 session-sensitivity attribution) must cover every phase of a
    declared online-dedup query after it runs, with phases that are
    positive and sum to (at most) the query's end-to-end cost — bench.py
    embeds this dict as phase_sec in every BENCH payload, so a missing
    or stale phase would silently un-attribute the driver's numbers."""
    import time

    from hdfs_mapreduce_spark.plans.streaming_plans import PHASE_SEC

    PHASE_SEC.pop("stream_dedup_resketch", None)
    t0 = time.perf_counter()
    RAW_QUERIES["stream_dedup_resketch"](spark, SF_CORRECTNESS).write.format(
        "noop"
    ).mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    phases = PHASE_SEC["stream_dedup_resketch"]
    assert set(phases) == {
        "ingest_0", "ingest_1", "resketch", "ingest_2_wide",
        "build_read_plan",
    }
    assert all(v > 0 for v in phases.values())
    # phases time plan BUILD (the noop write happens after), so their sum
    # is bounded by the end-to-end cost
    assert sum(phases.values()) <= elapsed
