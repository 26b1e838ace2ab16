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


# --- adversarial documents (r4 verdict item 9) -----------------------------------
# Pathological inputs at the limits the operators encode: a multi-MB
# single-line document (the shingle transform materializes ~n_tokens
# array cells per doc), an all-duplicate-token document (one distinct
# shingle, maximal collision mass), NUL bytes and astral-plane Unicode
# (md5/h56 must hash them losslessly, framing must not split on them).


def _adversarial_docs(spark):
    big = ("token " * 400_000).strip()          # ~2.4 MB, one line
    dup = ("same " * 5_000).strip()             # all-duplicate tokens
    nul = "alpha\x00beta gamma\x00 delta"       # embedded NULs
    astral = "🜁🜂🜃 𐍈𐍉 😀😀😀 " * 50           # astral-plane code points
    one = "solo"
    return spark.createDataFrame(
        [(0, big), (1, dup), (2, nul), (3, astral), (4, one)],
        "doc_id long, text string",
    )


def test_shingles_and_signatures_survive_adversarial_docs(spark):
    """The shingle when-ladder and the MinHash/SimHash signature paths
    must process every pathological doc without error, one signature per
    doc, and identical bytes → identical signatures."""
    from hdfs_mapreduce_spark.operators.dedup import (
        minhash_signatures,
        shingle_relation,
        simhash_signatures,
    )

    docs = _adversarial_docs(spark)
    sh = shingle_relation(docs, "doc_id", "text")
    per_doc = {
        r["doc"]: r["n"]
        for r in sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # big doc: n_tokens - k + 1 shingles (k=3); dup doc: same count with
    # duplicates retained; 1-token docs contribute exactly one shingle
    assert per_doc[0] == 400_000 - 2
    assert per_doc[1] == 5_000 - 2
    assert per_doc[4] == 1
    assert per_doc[2] >= 1 and per_doc[3] >= 1

    mh = minhash_signatures(docs, "doc_id", "text")
    assert mh.count() == 5
    sim = {r["doc"]: r["simhash"] for r in
           simhash_signatures(docs, "doc_id", "text").collect()}
    assert len(sim) == 5
    # all-duplicate doc: its only distinct token decides every vote, so
    # the signature must equal the signature of one copy of the token
    solo = spark.createDataFrame([(9, "same")], "doc_id long, text string")
    [r] = simhash_signatures(solo, "doc_id", "text").collect()
    assert sim[1] == r["simhash"]


def test_simhash_lane_capacity_at_the_packing_limit(spark):
    """The packed 2-per-accumulator SimHash lanes hold 2^28 tokens/doc;
    prove no cross-lane carry at a scale big enough that a packing bug
    (e.g. lane width 14 instead of 28) WOULD corrupt: a 400k-token doc's
    packed votes must reproduce the unpacked per-bit sums exactly."""
    from hdfs_mapreduce_spark.functions.hashing import h56
    from hdfs_mapreduce_spark.functions.text import tokens
    from hdfs_mapreduce_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_signatures,
    )

    text = ("alpha beta gamma " * 133_334).strip()  # ~400k tokens
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [row] = simhash_signatures(docs, "doc_id", "text").collect()
    # unpacked reference: 56 independent SUMs, no lane packing
    tok = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("t")
    ).withColumn("h", h56(F.col("t")))
    agg = tok.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.expr(f"(h >> {j}) & 1")).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ],
    ).collect()[0]
    expected = sum(
        (1 << j) for j in range(SIMHASH_BITS)
        if 2 * agg[f"s{j}"] > agg["n"]
    )
    assert row["simhash"] == expected


def test_text_stats_and_fingerprint_on_adversarial_docs(spark):
    """Quality metrics, token stats and the rolling-hash fingerprint must
    produce one finite row per pathological doc (no overflow, no crash on
    NUL/astral input)."""
    import math

    from hdfs_mapreduce_spark.functions.text import (
        fingerprint,
        quality_score,
        token_count,
    )

    docs = _adversarial_docs(spark)
    rows = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_tokens"] >= 1
        assert r["q"] is not None and math.isfinite(r["q"])
        assert r["fp"] is not None and 0 <= r["fp"]


def test_binary_plugin_framing_with_nul_and_astral_input(spark, tmp_path):
    """The executable word-count plugin must round-trip NUL bytes and
    astral-plane tokens through the stdin pipe protocol identically to
    the expression twin (UTF-8 framing, '\\n'-only splitting)."""
    from hdfs_mapreduce_spark.functions.reference_jobs import word_count_expr
    from hdfs_mapreduce_spark.operators.binary_plugin import (
        WORDCOUNT_PLUGIN_SRC,
        run_binary_mapreduce,
    )

    plugin = tmp_path / "wc"
    plugin.write_text(WORDCOUNT_PLUGIN_SRC)
    plugin.chmod(0o755)
    lines = ["nul\x00token nul\x00token plain", "😀 𐍈 😀 plain"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "key long, value string"
    )
    got = {
        (r["key"], r["value"])
        for r in run_binary_mapreduce(df, str(plugin)).collect()
    }
    expect = {
        (r["token"], str(r["cnt"]))
        for r in word_count_expr(df, "value").collect()
    }
    assert got == expect and ("nul\x00token", "2") in got
