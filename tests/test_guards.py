"""Input-size guards on the by-construction quadratic contrast operators
(round-5 verdict item 3): above the documented bound they must raise with
a pointer to the sublinear twin instead of silently launching an O(N²)
job; below it (every declared fixture) results are unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.dedup import ngram_jaccard_pairs
from hdfs_mapreduce_spark.operators.guards import (
    ANN_BRUTE_MAX_PAIRS,
    EXACT_PAIRS_MAX_ROWS,
    NGRAM_UNCAPPED_MAX_ROWS,
    ExactScaleError,
)
from hdfs_mapreduce_spark.operators.similarity import (
    ann_topk_bruteforce,
    cosine_pairs,
)
from hdfs_mapreduce_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_cosine_pairs_guard_raises_and_names_the_twin(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ExactScaleError) as e:
        cosine_pairs(emb, 0.4, max_rows=10)
    msg = str(e.value)
    assert "cosine_pairs" in msg
    assert "minhash_pairs" in msg and "semantic_dedup" in msg
    assert "max_rows=None" in msg
    # below the bound: builds and returns the same relation as unguarded
    guarded = cosine_pairs(emb, 0.9, max_rows=1000)
    raw = cosine_pairs(emb, 0.9)
    assert guarded.collect() == raw.collect()


def test_ngram_guard_applies_to_the_uncapped_form_only(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    with pytest.raises(ExactScaleError) as e:
        ngram_jaccard_pairs(docs, "doc_id", "text", 0.5, max_rows=10)
    assert "max_df" in str(e.value)
    # the capped form IS the production shape — same tight max_rows must
    # not probe or raise (the hot-shingle cap is what tames the join)
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", 0.5, max_df=50, max_rows=10
    )
    assert capped.count() >= 0


def test_ann_bruteforce_guard_counts_the_filtered_corpus(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ExactScaleError) as e:
        ann_topk_bruteforce(emb, [0, 1], 5, max_pairs=10)
    assert "ann_topk_lsh" in str(e.value)
    # a selective corpus_filter shrinks the probed side below the bound:
    # hybrid search over a pruned slice stays allowed under the same cap
    few = ann_topk_bruteforce(
        emb,
        [0, 1],
        5,
        corpus_filter=F.col("vec_id") < 20,
        max_pairs=100,
    )
    assert few.count() > 0


def test_declared_bounds_clear_every_fixture(spark):
    """The bounds the declared queries pass sit above sf0.1 AND the 3x
    scale fixtures, so driver/bench rows are unaffected; they exist for
    the 100x user."""
    assert EXACT_PAIRS_MAX_ROWS >= 100_000  # sf3 embeddings = 60k
    assert NGRAM_UNCAPPED_MAX_ROWS >= 50_000  # sf0.1 documents = 5k
    assert ANN_BRUTE_MAX_PAIRS // 5 >= 1_000_000  # 5 declared queries


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_gated_broadcast_both_sides_of_the_bound(spark):
    """Round-9 weak-item pin: corpus-vocabulary broadcasts are probed,
    not forced. Under the bound the hint applies (BroadcastHashJoin);
    over it the plain join runs so a Heaps-unbounded vocabulary degrades
    to a shuffle instead of an executor OOM."""
    from hdfs_mapreduce_spark.operators.bpe import bpe_encode
    from hdfs_mapreduce_spark.operators.relevance import (
        tfidf_top_terms,
        unigram_lm_scores,
    )
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").limit(200)
    # disable the planner's own size-based broadcast so the plan shows
    # exactly what the HINT contributes: with it on, a toy-scale vocab
    # broadcasts either way (which is itself the desired degrade — the
    # gate removes the hint, it doesn't forbid a broadcast AQE chooses)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for build in (
            lambda mr: bpe_encode(
                docs, "doc_id", "text", [("t", "h"), ("th", "e")],
                broadcast_max_rows=mr,
            ),
            lambda mr: unigram_lm_scores(
                docs, "doc_id", "text", broadcast_max_rows=mr
            ),
            lambda mr: tfidf_top_terms(
                docs, "doc_id", "text", broadcast_max_rows=mr
            ),
        ):
            under = _plan_of(build(10_000_000))
            assert "BroadcastHashJoin" in under, under
            over = _plan_of(build(0))
            # over the bound the vocab join loses its hint (the 1-row
            # stats relations keep theirs — count joins, not presence)
            assert under.count("BroadcastHashJoin") > over.count(
                "BroadcastHashJoin"
            ), over
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_gated_broadcast_results_identical_across_the_bound(spark):
    """The gate changes the physical strategy only: same rows either
    side of the bound. Float columns compare to 1e-12 relative — the
    shuffle join delivers a doc's lp rows in a different order than the
    broadcast join, so the per-doc sum differs in ulps (the declared
    query always takes the broadcast side at fixture scale, so its
    oracle hash is untouched)."""
    from hdfs_mapreduce_spark.operators.relevance import unigram_lm_scores
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").limit(50)
    a = unigram_lm_scores(docs, "doc_id", "text", broadcast_max_rows=10**9)
    b = unigram_lm_scores(docs, "doc_id", "text", broadcast_max_rows=0)
    ra, rb = a.collect(), b.collect()
    assert len(ra) == len(rb) > 0
    for x, y in zip(ra, rb):
        assert (x["doc_id"], x["n_tokens"]) == (y["doc_id"], y["n_tokens"])
        assert abs(x["logprob_mean"] - y["logprob_mean"]) <= 1e-12 * abs(
            y["logprob_mean"]
        )
        assert abs(x["ppl"] - y["ppl"]) <= 1e-12 * abs(y["ppl"])
