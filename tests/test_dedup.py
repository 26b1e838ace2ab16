"""Behavioral dedup tests on planted duplicates (the synthetic documents
table has organic near-dups too, but planted cases pin down semantics)."""

from __future__ import annotations

from hdfs_mapreduce_spark.operators.dedup import (
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "into the deep dark forest tonight"
)
NEAR = BASE.replace("tonight", "today")  # one token differs
OTHER = "completely different content about spark query engines and shuffles"


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)], "doc_id long, text string"
    )


def test_exact_dedup_groups(spark):
    out = exact_dedup(_docs(spark), "doc_id", "text").collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in out}
    assert by_keep == {1: 2, 3: 1, 4: 1}  # docs 1+2 identical, kept id=1


def test_minhash_finds_planted_near_dup(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_pairs(_docs(spark), "doc_id", "text", 0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.7  # one-token edit
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_simhash_identical_docs_hamming_zero(spark):
    out = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(_docs(spark), "doc_id", "text").collect()
    }
    assert out[(1, 2)] == 0
    assert out[(1, 3)] <= 3  # near-dup within the hamming budget


def test_minhash_pairs_subset_of_exact(spark):
    """LSH+verify can only *prune* relative to the exact inverted-index
    algorithm at the same threshold — never add."""
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    assert lsh <= exact
    assert len(exact) > 0  # the synthetic table has organic near-dups
    # On this data the 8x2 banding catches every true pair ≥ 0.5.
    assert lsh == exact


def test_ngram_jaccard_max_df_prunes_only_hot_shingles(spark):
    """With the hot-shingle cap, surviving pairs keep their exact Jaccard
    (sizes still count every shingle) and the output is a subset."""
    from hdfs_mapreduce_spark.operators.dedup import ngram_jaccard_pairs
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5, max_df=50).collect()
    }
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert abs(v - full[k]) < 1e-12
