"""Oracle + semantics tests for the warehouse-analytics query set
(plans/analytics_plans.py) and the round-2 pipeline additions
(decontamination, PII scrub, embedding centroids)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.plans import ORACLE_SQL, QUERIES
from tests.conftest import SF_CORRECTNESS
from tests.oracle import assert_matches_oracle

NEW_ORACLE_QUERIES = [
    "tpch_q3_shipping",
    "tpch_q5_region",
    "tpch_q10_returns",
    "events_props_json",
    "q24_exact_percentile",
    "events_anomaly",
    "dedup_decontaminate",
    "pii_scrub",
    "embedding_centroids",
    "q23_window_suite",
    "scalar_funcs",
    "events_attribution",
    "boilerplate_ngrams",
    "corpus_mix",
]


def test_new_queries_match_oracle(spark, ddb):
    for name in NEW_ORACLE_QUERIES:
        df = QUERIES[name](spark, SF_CORRECTNESS)
        assert_matches_oracle(df, ddb, ORACLE_SQL[name], name)


def test_tpch_q5_broadcasts_dims(spark):
    """The six-table join must broadcast the constant dims — a shuffle of
    nation/region at 100 TB would be a planning bug. Uses the uncached
    builder so the plan reflects this test's session confs."""
    from hdfs_mapreduce_spark.plans import RAW_QUERIES

    plan = RAW_QUERIES["tpch_q5_region"](spark, SF_CORRECTNESS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_redacts_everything(spark):
    """After scrubbing, no email- or phone-shaped substring survives."""
    from hdfs_mapreduce_spark.plans.text_plans import EMAIL_RE, PHONE_RE

    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(dirty, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    leftovers = (
        docs.select(scrubbed.alias("s"))
        .filter(
            (F.regexp_count(F.col("s"), F.lit(EMAIL_RE)) > 0)
            | (F.regexp_count(F.col("s"), F.lit(PHONE_RE)) > 0)
        )
        .count()
    )
    assert leftovers == 0


def test_decontaminate_flags_known_overlap(spark):
    """A train doc sharing a full shingle window with a bench doc is
    flagged; a disjoint doc is not."""
    from hdfs_mapreduce_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "quick brown fox jumps high"),  # shares 3-gram shingles
            (2, "completely different words entirely unrelated"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc"]: r["n_hits"] for r in decontaminate(
        train, bench, "doc_id", "text", min_hits=1
    ).collect()}
    assert 1 in out and out[1] >= 1
    assert 2 not in out


def test_decontaminate_bench_side_broadcasts(spark):
    """The benchmark shingle vocabulary must broadcast — shuffling the
    corpus against an eval set would invert the scale asymmetry."""
    from hdfs_mapreduce_spark.operators.dedup import decontaminate

    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    plan = decontaminate(
        train, bench, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_embedding_centroids_shape_and_mean(spark):
    """640 rows (10 labels x 64 dims) and each centroid equals the plain
    mean of that (label, dim) slice."""
    df = QUERIES["embedding_centroids"](spark, SF_CORRECTNESS)
    rows = df.collect()
    emb = spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    dim = len(emb.first()["embedding"])
    assert len(rows) == n_labels * dim
    # spot-check one cell against a driver-side mean
    label0 = [r for r in rows if r["label"] == rows[0]["label"] and r["dim"] == 0]
    vecs = [
        float(r["embedding"][0])
        for r in emb.filter(F.col("label") == rows[0]["label"]).collect()
    ]
    assert abs(label0[0]["centroid"] - sum(vecs) / len(vecs)) < 1e-9


def test_quantile_hist_error_bounded_by_bin_width(spark):
    """The histogram-interpolated quantile must sit within one bin width
    of the rank-ceil(qN) order statistic for every (type, q) — the
    estimator's bound (the selected bin provably contains that rank's
    value) — and stay inside the observed [min, max]."""
    import math

    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.plans.analytics_plans import (
        QHIST_BINS,
        QHIST_QS,
        events_quantile_hist,
    )
    from hdfs_mapreduce_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_type"], r["q"]): r["est"]
        for r in events_quantile_hist(spark, sf).collect()
    }
    events = load_table(spark, sf, "events")
    by_type = {
        r["event_type"]: sorted(r["vals"])
        for r in events.groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    assert len(got) == len(by_type) * len(QHIST_QS) > 0
    for (etype, q), est in got.items():
        vals = by_type[etype]
        lo, hi = vals[0], vals[-1]
        bin_w = (hi - lo) / QHIST_BINS
        rank_val = vals[max(0, math.ceil(q * len(vals)) - 1)]
        assert abs(est - rank_val) <= bin_w + 1e-9, (
            etype, q, est, rank_val, bin_w,
        )
        assert lo - 1e-9 <= est <= hi + 1e-9
