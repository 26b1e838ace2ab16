"""Deterministic sampling operators vs exact Python references."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.sampling import (
    stratified_head_sample,
    weighted_sample,
)
from hdfs_mapreduce_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _h56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def test_weighted_sample_matches_python_reference(spark):
    """The engine-side top-n by ln(u)/w must equal the identical formula
    computed sequentially in Python — same hash, same keys, same rows."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.col("n_chars").alias("w")
    )
    rows = {r["doc_id"]: r["w"] for r in docs.collect()}
    seed, n = "42", 25

    def key(doc_id: int, w: int) -> float:
        u = (_h56(f"ws:{seed}:{doc_id}") + 1) / float(1 << 56)
        return math.log(u) / w

    want = sorted(
        ((key(d, w), d) for d, w in rows.items() if w > 0),
        key=lambda t: (-t[0], t[1]),
    )[:n]
    got = [
        (r["ws_key"], r["doc_id"])
        for r in weighted_sample(docs, "doc_id", "w", n, seed).collect()
    ]
    assert [d for _, d in got] == [d for _, d in want]
    for (gk, _), (wk, _) in zip(got, want):
        assert abs(gk - wk) < 1e-12


def test_weighted_sample_is_deterministic_and_respects_weights(spark):
    """Same seed -> same sample; a new seed -> a different sample; a row
    with overwhelming weight is always drawn; zero weight never is."""
    rows = [(i, 1.0) for i in range(200)] + [(999, 1e9), (1000, 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    s1 = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 20).collect()]
    s2 = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 20).collect()]
    assert s1 == s2
    s3 = [
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", "w", 20, seed="7").collect()
    ]
    assert s1 != s3
    assert 999 in s1 and 999 in s3  # ~1e9x the weight: P(miss) ~ 0
    assert 1000 not in s1 and 1000 not in s3


def test_stratified_head_sample_exact_sizes(spark):
    docs = load_table(spark, SF, "documents")
    out = stratified_head_sample(docs, "doc_id", "lang", 10)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    avail = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {k: min(10, v) for k, v in avail.items()}
    # deterministic: run twice, same membership
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in stratified_head_sample(docs, "doc_id", "lang", 10).collect()
    }
    assert a == b


def test_stratified_head_sample_uses_window_group_limit(spark):
    """The per-stratum cap must plan as WindowGroupLimit (per-partition
    heads kept before the window sort), not a full sort of every row."""
    docs = load_table(spark, SF, "documents")
    plan = (
        stratified_head_sample(docs, "doc_id", "lang", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_dsir_scores_prefer_target_like_docs(spark):
    """A pool doc written in the target's vocabulary must outscore a pool
    doc with disjoint vocabulary, and only pool (non-target) docs are
    returned."""
    from hdfs_mapreduce_spark.operators.sampling import dsir_llr_scores

    rows = [
        # target slice: a consistent vocabulary
        (1, "alpha beta gamma alpha beta", True),
        (2, "beta gamma alpha gamma", True),
        (3, "gamma alpha beta beta", True),
        # pool: one target-like, one alien
        (10, "alpha beta gamma", False),
        (11, "zog quux blarp", False),
    ]
    df = spark.createDataFrame(rows, "id long, text string, tgt boolean")
    got = {
        r["id"]: r["dsir_score"]
        for r in dsir_llr_scores(df, "id", "text", F.col("tgt")).collect()
    }
    assert set(got) == {10, 11}
    assert got[10] > got[11]


def test_dsir_scores_length_normalized(spark):
    """Repeating a document's tokens must not change its mean-LLR score
    (the length normalization that keeps selection from favoring long
    docs)."""
    from hdfs_mapreduce_spark.operators.sampling import dsir_llr_scores

    rows = [
        (1, "alpha beta gamma", True),
        (2, "alpha gamma beta", True),
        (10, "alpha beta", False),
        (11, "alpha beta alpha beta alpha beta", False),
    ]
    df = spark.createDataFrame(rows, "id long, text string, tgt boolean")
    got = {
        r["id"]: r["dsir_score"]
        for r in dsir_llr_scores(df, "id", "text", F.col("tgt")).collect()
    }
    assert math.isclose(got[10], got[11], rel_tol=1e-12)
