"""Degenerate-input robustness: every operator family must handle empty
or smaller-than-parameter inputs by returning an empty/correctly-shaped
result, never by crashing — at 100 TB a filtered partition or a new
tenant's empty table WILL hit these paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def test_dedup_family_on_empty_corpus(spark):
    from hdfs_mapreduce_spark.operators.dedup import (
        exact_dedup,
        minhash_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    docs = _empty_docs(spark)
    assert exact_dedup(docs, "doc_id", "text").count() == 0
    assert minhash_signatures(docs, "doc_id", "text").count() == 0
    assert minhash_pairs(docs, "doc_id", "text", 0.7).count() == 0
    assert simhash_pairs(docs, "doc_id", "text").count() == 0
    assert ngram_jaccard_pairs(docs, "doc_id", "text", 0.5).count() == 0


def test_components_on_empty_edges(spark):
    from hdfs_mapreduce_spark.operators.components import (
        canonical_assignment,
        connected_components,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = {
        r["doc_id"]: r["canonical"]
        for r in canonical_assignment(
            nodes, "doc_id", edges, "src", "dst"
        ).collect()
    }
    assert out == {1: 1, 2: 2}  # singletons label themselves


def test_kmeans_fit_on_empty_table(spark):
    from hdfs_mapreduce_spark.operators.similarity import kmeans_fit

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    cents, assignment, n_iter = kmeans_fit(emb, k=4, max_iter=5, tol=0.0)
    assert cents == [] and n_iter == 0
    assert assignment.count() == 0
    assert assignment.columns == ["vid", "cluster", "dist"]


def test_kmeans_fit_with_fewer_rows_than_k(spark):
    from hdfs_mapreduce_spark.operators.similarity import kmeans_fit

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    cents, assignment, _ = kmeans_fit(emb, k=8, max_iter=5, tol=0.0)
    assert len(cents) == 2  # only as many clusters as seed vectors exist
    assert assignment.count() == 2


def test_bpe_learn_on_empty_and_single_char_corpus(spark):
    from hdfs_mapreduce_spark.operators.bpe import bpe_learn

    empty = spark.createDataFrame([], "text string")
    merges, words = bpe_learn(empty, "text", n_merges=5)
    assert merges == [] and words.count() == 0
    # single-character words: no adjacent pairs anywhere -> no merges
    singles = spark.createDataFrame([("a b c a",)], "text string")
    merges, words = bpe_learn(singles, "text", n_merges=5)
    assert merges == []
    assert words.count() == 3


def test_cm_sketch_on_empty_stream(spark):
    from hdfs_mapreduce_spark.operators.sketches import cm_estimate, cm_sketch

    tok = spark.createDataFrame([], "token string")
    sketch = cm_sketch(tok, "token")
    assert sketch.count() == 0
    items = spark.createDataFrame([("x",)], "token string")
    est = cm_estimate(sketch, items, "token").collect()
    assert [(r["item"], r["est"]) for r in est] == [("x", 0)]


def test_packing_on_empty_corpus(spark):
    from hdfs_mapreduce_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(docs, "doc_id", "n_tokens", 128).count() == 0


def test_asof_and_band_joins_with_empty_right_side(spark):
    from hdfs_mapreduce_spark.operators.asof import as_of_join
    from hdfs_mapreduce_spark.operators.band import band_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    empty = spark.createDataFrame(
        [], "rk long, rts timestamp, v double, tb long"
    )
    out = as_of_join(
        left, empty,
        left_key="k", right_key="rk",
        left_time="ts", right_time="rts",
        value_cols=["v"], right_tiebreak="tb",
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["v"] is None  # no match -> null fill
    bj = band_join(
        left, empty.select("rk", "rts"),
        left_key="k", right_key="rk",
        left_time="ts", right_time="rts",
        lower_us=0, upper_us=5_000_000,
    )
    assert bj.count() == 0


def test_pq_empty_corpus_and_missing_queries(spark):
    from hdfs_mapreduce_spark.operators.similarity import (
        ann_topk_pq,
        pq_encode,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="empty corpus"):
        pq_encode(empty).collect()
    some = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8)],
        "vec_id long, embedding array<float>",
    )
    out = ann_topk_pq(some, [99], k=5, m_sub=2, ksub=2)
    assert out.count() == 0


def test_ivfpq_empty_corpus_and_missing_queries(spark):
    from hdfs_mapreduce_spark.operators.similarity import ann_topk_ivfpq

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="empty corpus"):
        ann_topk_ivfpq(empty, [0])
    some = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8)],
        "vec_id long, embedding array<float>",
    )
    out = ann_topk_ivfpq(some, [99], k=5, nlist=2, nprobe=1, m_sub=2, ksub=2)
    assert out.count() == 0
