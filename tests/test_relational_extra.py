"""Tolerance test for the approx-distinct sketch (excluded from hash
matching by FIXTURES.md) and as-of join point-in-time semantics."""

from __future__ import annotations

from datetime import datetime

from hdfs_mapreduce_spark.plans.relational import q16_approx_distinct
from tests.conftest import SF_CORRECTNESS


def test_approx_distinct_within_tolerance(spark, ddb):
    """Since round 4 the query emits (exact_u, within_bound): the sketch
    check itself is the hash-verified relation. This test asserts the
    exact side against DuckDB and that the bound held."""
    row = q16_approx_distinct(spark, SF_CORRECTNESS).collect()[0]
    exact = ddb.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert row["exact_u"] == exact
    assert row["within_bound"] is True


def test_approx_quantiles_rank_error_bounded(spark):
    """percentile_approx(accuracy=10000) guarantees rank error <= 1/10000;
    the query now emits the rank-error audit directly (le/lt fraction
    checks at eps=0.01, a much looser band than the guarantee) — assert
    every check column came back true."""
    from hdfs_mapreduce_spark.plans.relational import q17_approx_quantiles

    rows = q17_approx_quantiles(spark, SF_CORRECTNESS).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n"] > 0
        for pname in ("p50_ok", "p95_ok", "p99_ok"):
            assert r[pname] is True, (r["event_type"], pname)


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
    """The merged (register-wise union of per-day sketches) estimate and
    the direct single-pass estimate must BOTH sit within the sketch
    error of the exact distinct count — the mode-independent guarantee
    (merged == direct bit-for-bit held only while both sketches were in
    the same sparse/dense mode; the sf0.1 sweep caught the promotion
    boundary, see events_hll_mergeable's docstring)."""
    from hdfs_mapreduce_spark.plans.analytics_plans import events_hll_mergeable

    row = events_hll_mergeable(spark, SF_CORRECTNESS).collect()[0]
    assert row["merged_within_bound"] is True
    assert row["within_bound"] is True
    exact = ddb.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert row["exact_users"] == exact
    assert row["n_days"] > 1  # the union genuinely merged multiple sketches
