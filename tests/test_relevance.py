"""Semantic tests for BM25 and TF-IDF on crafted fixtures, plus oracle
parity at the correctness SF (the declared queries re-verify at sf0.01
via the driver gate)."""

from __future__ import annotations

import math

import pytest

from hdfs_mapreduce_spark.operators.relevance import bm25_scores, tfidf_top_terms

DOCS = [
    (1, "spark spark spark fast engine"),
    (2, "spark slow engine engine engine"),
    (3, "window merge window merge window"),
    (4, "nothing relevant here at all"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_ranks_higher_tf_first(spark, docs):
    out = bm25_scores(docs, "doc_id", "text", ["spark"]).collect()
    # docs 1 and 2 match; doc 1 has tf=3 vs tf=1 at equal length
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["bm25"] > out[1]["bm25"] > 0
    assert out[0]["tf_spark"] == 3


def test_bm25_excludes_nonmatching_and_respects_top_k(spark, docs):
    out = bm25_scores(docs, "doc_id", "text", ["spark", "window"], top_k=1)
    rows = out.collect()
    assert len(rows) == 1  # top_k honored
    full = bm25_scores(docs, "doc_id", "text", ["spark", "window"]).collect()
    assert {r["doc_id"] for r in full} == {1, 2, 3}  # 4 and 5 never match


def test_bm25_matches_reference_formula(spark, docs):
    out = {
        r["doc_id"]: r
        for r in bm25_scores(docs, "doc_id", "text", ["spark"]).collect()
    }
    # Hand-computed: N=5, df=2, avgdl = (5+5+5+5+0)/5 = 4.0
    idf = math.log((5 - 2 + 0.5) / (2 + 0.5) + 1.0)
    k1, b = 1.2, 0.75
    tf, n = 3, 5
    expected = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * n / 4.0))
    assert out[1]["bm25"] == pytest.approx(expected, rel=1e-12)


def test_tfidf_top_terms_picks_characteristic_tokens(spark, docs):
    out = tfidf_top_terms(docs, "doc_id", "text", top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 3: 'window' (tf=3) and 'merge' (tf=2) are unique to it
    d3 = by_doc[3]
    assert [r["token"] for r in d3] == ["window", "merge"]
    assert d3[0]["tfidf"] > d3[1]["tfidf"]
    # ranks are 1..top_n and tfidf is non-increasing within a doc
    for rows in by_doc.values():
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        assert all(
            rows[i]["tfidf"] >= rows[i + 1]["tfidf"] for i in range(len(rows) - 1)
        )


def test_tfidf_common_term_scores_zero(spark):
    # A token present in EVERY doc has idf = ln(N/N) = 0.
    df = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta"), (3, "common gamma")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", top_n=2).collect()
    for r in out:
        if r["token"] == "common":
            assert r["tfidf"] == 0.0
        else:
            assert r["tfidf"] > 0.0


def test_unigram_lm_scores_hand_computed(spark):
    from hdfs_mapreduce_spark.operators.relevance import unigram_lm_scores

    # Corpus: 4 tokens total; 'a' appears 2x (p=0.5), 'b' and 'c' once
    # (p=0.25 each).
    df = spark.createDataFrame(
        [(1, "a a"), (2, "b c"), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_lm_scores(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}  # empty doc drops
    assert out[1]["logprob_mean"] == pytest.approx(math.log(0.5), rel=1e-12)
    assert out[2]["logprob_mean"] == pytest.approx(math.log(0.25), rel=1e-12)
    assert out[1]["ppl"] == pytest.approx(2.0, rel=1e-12)
    assert out[2]["ppl"] == pytest.approx(4.0, rel=1e-12)
    # rarer tokens => higher perplexity: the curation signal direction
    assert out[2]["ppl"] > out[1]["ppl"]


def test_nb_classify_separates_disjoint_vocabularies(spark):
    """Planted two-class corpus with disjoint vocabularies: NB must recover
    every label; a mixed doc leaning 2:1 toward class b must predict b."""
    from hdfs_mapreduce_spark.operators.relevance import nb_classify

    docs = spark.createDataFrame(
        [
            (1, "apfel birne kirsche apfel birne", "a"),
            (2, "birne apfel apfel kirsche kirsche", "a"),
            (3, "pomme poire cerise pomme poire", "b"),
            (4, "poire pomme pomme cerise cerise", "b"),
            (5, "apfel pomme poire", "b"),  # 2 b-tokens vs 1 a-token
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r["pred"] for r in
           nb_classify(docs, "doc_id", "text", "lang", ("a", "b")).collect()}
    assert out == {1: "a", 2: "a", 3: "b", 4: "b", 5: "b"}


def test_nb_lang_confusion_beats_chance(spark):
    """On the synthetic multilingual corpus the only language signal is the
    per-lang stopword sprinkle (the content words are shared vocabulary), so
    perfect recovery is impossible — but NB trained on its own labels must
    still beat the 1-in-5 chance rate by a wide margin, and every doc must
    receive a prediction."""
    from hdfs_mapreduce_spark.plans.text_plans import nb_lang_confusion

    rows = nb_lang_confusion(spark, "/root/testdata/sf0.001").collect()
    total = sum(r["n"] for r in rows)
    diag = sum(r["n"] for r in rows if r["lang"] == r["pred"])
    assert total == 500  # no document dropped
    assert diag / total > 0.35  # chance is 0.20


def test_nb_fit_score_generalizes_to_held_out_docs(spark):
    """The production fit/score split: fit on 80% of the corpus, score the
    held-out 20% (which contains tokens the model never saw — the unk
    fallback path). Held-out accuracy must beat chance by a wide margin,
    and scoring the training split must reproduce nb_classify's
    predictions exactly."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.operators.relevance import (
        NB_CLASSES,
        nb_classify,
        nb_fit,
        nb_score,
    )
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    held = docs.filter(F.col("doc_id") % 5 == 0)
    model, priors = nb_fit(train, "text", "lang", NB_CLASSES)

    # train-split predictions match the fused classifier bit for bit
    fused = {
        (r["doc_id"], r["pred"])
        for r in nb_classify(train, "doc_id", "text", "lang").collect()
    }
    split = {
        (r["doc_id"], r["pred"])
        for r in nb_score(model, priors, train, "doc_id", "text").collect()
    }
    assert split == fused

    # held-out accuracy beats the 1-in-5 chance rate. The synthetic
    # corpus's only language signal is the per-lang stopword sprinkle
    # (content vocabulary is shared), so in-sample tops out ~0.4 and
    # held-out ~0.3 — the bar is "clearly above chance", not "high".
    truth = {r["doc_id"]: r["lang"] for r in held.select("doc_id", "lang").collect()}
    preds = {
        r["doc_id"]: r["pred"]
        for r in nb_score(model, priors, held, "doc_id", "text").collect()
    }
    assert set(preds) == set(truth)
    acc = sum(preds[d] == truth[d] for d in truth) / len(truth)
    assert acc > 0.25, f"held-out accuracy {acc:.2f} vs chance 0.20"
