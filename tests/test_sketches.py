"""Count-min sketch invariants: overestimation, error bound on this
fixed dataset, exact mergeability, and the broadcast probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.functions.text import tokens
from hdfs_mapreduce_spark.operators.sketches import (
    cm_estimate,
    cm_merge,
    cm_sketch,
)
from hdfs_mapreduce_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _token_df(spark):
    docs = load_table(spark, SF, "documents")
    return docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )


def test_cm_estimate_overestimates_within_bound(spark):
    tok = _token_df(spark)
    truth = {
        r["token"]: r["n"]
        for r in tok.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(truth.values())
    sketch = cm_sketch(tok, "token")
    items = spark.createDataFrame(
        [(t,) for t in truth] + [("never-seen-token-xyz",)], "token string"
    )
    est = {
        r["item"]: r["est"]
        for r in cm_estimate(sketch, items, "token").collect()
    }
    for t, n in truth.items():
        assert est[t] >= n, f"underestimate for {t}"
        # generous deterministic check of the eN/width expectation
        assert est[t] - n <= max(8, 4 * n_total // 1024), t
    # a value never inserted can still collide, but stays within the bound
    assert est["never-seen-token-xyz"] <= max(8, 4 * n_total // 1024)


def test_cm_merge_equals_sketch_of_union_exactly(spark):
    """Deterministic disjoint split (by token spelling): the merged
    partial sketches must equal the whole-stream sketch cell for cell —
    the property that makes per-partition/per-day sketches composable."""
    tok = _token_df(spark)
    first = tok.filter(F.substring("token", 1, 1) < "n")
    second = tok.filter(F.substring("token", 1, 1) >= "n")
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cm_merge(
            cm_sketch(first, "token"), cm_sketch(second, "token")
        ).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cm_sketch(tok, "token").collect()
    }
    assert merged == whole


def test_cm_sketch_is_tiny_and_probe_broadcasts(spark):
    tok = _token_df(spark)
    sketch = cm_sketch(tok, "token")
    assert sketch.count() <= 4 * 1024
    items = spark.createDataFrame([("the",), ("spark",)], "token string")
    plan = (
        cm_estimate(sketch, items, "token")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_mg_summary_bounds_and_coverage(spark):
    """Misra-Gries guarantees on the real token stream: estimates never
    exceed true counts, underestimate by at most N/(k+1), and every item
    with true frequency above N/(k+1) appears in the summary."""
    from hdfs_mapreduce_spark.operators.sketches import mg_summary

    tok = _token_df(spark)
    truth = {
        r["token"]: r["n"]
        for r in tok.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(truth.values())
    k = 8  # far fewer counters than distinct tokens: the summary must cut
    got = {r["item"]: r["cnt"] for r in mg_summary(tok, "token", k=k).collect()}
    assert len(got) <= k
    bound = n_total // (k + 1)
    for item, est in got.items():
        assert est <= truth[item], f"overestimate for {item}"
        assert truth[item] - est <= bound, f"error bound broken for {item}"
    for item, n in truth.items():
        if n > bound:
            assert item in got, f"guaranteed heavy hitter {item} missing"


def test_mg_summary_small_domains_are_exact(spark):
    """With more counters than distinct items nothing is ever evicted, so
    the summary equals the exact counts."""
    from hdfs_mapreduce_spark.operators.sketches import mg_summary

    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1, "token string"
    )
    got = {r["item"]: r["cnt"] for r in mg_summary(df, "token", k=10).collect()}
    assert got == {"a": 7, "b": 3, "c": 1}
