"""Tolerance test for the approx-distinct sketch (excluded from hash
matching by FIXTURES.md) and as-of join point-in-time semantics."""

from __future__ import annotations

from datetime import datetime

from hdfs_mapreduce_spark.plans.relational import q16_approx_distinct
from tests.conftest import SF_CORRECTNESS


def test_approx_distinct_within_tolerance(spark, ddb):
    approx = q16_approx_distinct(spark, SF_CORRECTNESS).collect()[0]["approx_u"]
    exact = ddb.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert abs(approx - exact) / exact <= 0.05, (approx, exact)


def test_approx_quantiles_rank_error_bounded(spark, ddb):
    """percentile_approx(accuracy=10000) guarantees rank error <= 1/10000;
    assert the sketch value sits between the exact quantiles one percent to
    either side (a much looser band than the guarantee)."""
    from hdfs_mapreduce_spark.plans.relational import q17_approx_quantiles

    rows = q17_approx_quantiles(spark, SF_CORRECTNESS).collect()
    assert len(rows) > 0
    for r in rows:
        for pname, p in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            lo, hi = ddb.execute(
                "SELECT quantile_cont(value, ?), quantile_cont(value, ?) "
                "FROM events WHERE event_type = ?",
                [max(p - 0.01, 0.0), min(p + 0.01, 1.0), r["event_type"]],
            ).fetchone()
            assert lo <= r[pname] <= hi, (r["event_type"], pname, lo, r[pname], hi)


def test_asof_join_semantics(spark):
    from hdfs_mapreduce_spark.operators.asof import as_of_join

    orders = spark.createDataFrame(
        [
            (100, 1, datetime(2024, 1, 10)),  # after e2 → picks e2
            (101, 1, datetime(2024, 1, 5)),   # exactly at e1 → inclusive
            (102, 1, datetime(2024, 1, 1)),   # before any event → null
            (103, 2, datetime(2024, 6, 1)),   # user with no events → null
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    events = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5), 11, "a", 1.0),
            (1, datetime(2024, 1, 7), 12, "b", 2.0),
            (1, datetime(2024, 1, 7), 13, "c", 3.0),  # tie → higher event_id wins
        ],
        "user_id long, ts timestamp, event_id long, event_type string, value double",
    )
    out = {
        r["o_orderkey"]: (r["event_id"], r["event_type"])
        for r in as_of_join(
            orders,
            events,
            left_key="o_custkey",
            right_key="user_id",
            left_time="o_orderdate",
            right_time="ts",
            value_cols=["event_id", "event_type", "value"],
            right_tiebreak="event_id",
        ).collect()
    }
    assert out[100] == (13, "c")  # latest ts, deterministic tie-break
    assert out[101] == (11, "a")  # inclusive boundary
    assert out[102] == (None, None)  # no prior event
    assert out[103] == (None, None)  # unseen key

def test_events_gapfill_fills_empty_hours(spark):
    """Crafted gap: hours with no events must appear as (0, 0.0) rows."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.plans.pipeline_plans import events_gapfill

    out = events_gapfill(spark, SF_CORRECTNESS)
    rows = out.collect()
    # dense spine: |hours| x |types| rows exactly, no missing combinations
    hours = {r["hour"] for r in rows}
    types = {r["event_type"] for r in rows}
    assert len(rows) == len(hours) * len(types)
    assert all(r["n_events"] >= 0 for r in rows)
    zero = [r for r in rows if r["n_events"] == 0]
    for r in zero:
        assert r["sum_value"] == 0.0


def test_hll_mergeable_union_equals_direct(spark, ddb):
    """Register-wise HLL union must reproduce the direct single-pass
    sketch exactly, and both sit within the sketch error of exact."""
    from hdfs_mapreduce_spark.plans.analytics_plans import events_hll_mergeable

    row = events_hll_mergeable(spark, SF_CORRECTNESS).collect()[0]
    assert row["users_merged"] == row["users_direct"]
    exact = ddb.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert abs(row["users_merged"] - exact) / exact <= 0.05
    assert row["n_days"] > 1  # the union genuinely merged multiple sketches
