"""Relevance scoring: BM25 ad-hoc retrieval and TF-IDF feature terms.

The reference engine has no scoring machinery at all — a user would write a
MapReduce plugin pair per formula (SURVEY §2.11); here both are single
declarative plans. These are the retrieval/feature-extraction passes a
training-data pipeline runs for quality weighting and corpus search.

Scale shapes:

* ``bm25_scores`` — the query-term list is a constant, so per-term
  frequencies are computed array-side in ONE map pass over the corpus (no
  token explode, no shuffle of token rows); the corpus statistics (N,
  avgdl, per-term document frequencies) reduce to a single row that is
  broadcast back. Total: one scan + a 1-row aggregate + TakeOrdered top-k.
* ``tfidf_top_terms`` — the full-vocabulary case: token explode → ONE
  doc-keyed shuffle that serves both the (doc, token) tf aggregate and the
  per-doc window top-n (Catalyst runs it as WindowGroupLimit — each
  partition keeps only its local top-n per doc before the window sort);
  document frequencies come from a map-side ``array_distinct`` explode
  whose vocab-sized result is **broadcast** back (vocabularies are
  millions of rows where corpora are billions).

Determinism: every score is a pure function of integer counts (tf, df, N,
doc length) and one exact integer-sum average, so Spark and DuckDB compute
bit-identical doubles (modulo one ulp in ln) — ties broken by id/token.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs_mapreduce_spark.functions.text import tokens
from hdfs_mapreduce_spark.operators.guards import (
    VOCAB_BROADCAST_MAX_ROWS,
    gated_broadcast,
)

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 50,
) -> DataFrame:
    """BM25 score of every document against a fixed bag of query terms
    (Robertson/Spärck Jones; the Okapi BM25 formula with the +1 idf floor).

    Returns the ``top_k`` matching docs as (doc_id, n_tokens, tf_<term>...,
    bm25), ordered by (bm25 desc, id). The per-term partial scores are
    summed in declared term order — a fixed-order expression sum, not an
    aggregate — so the total is reproducible across engines.
    """
    tk = tokens(F.lower(F.col(text_col)))

    def tf_of(term: str):
        # A factory, not an inline lambda: F.filter treats a 2-arg lambda
        # as the (element, index) form, so a `t=t` default would bind the
        # positional index, and a bare closure in the comprehension would
        # late-bind the loop variable.
        return F.size(F.filter("tk", lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col),
        tk.alias("tk"),
    ).select(
        id_col,
        F.size("tk").alias("n_tokens"),
        *[tf_of(t).alias(f"tf_{t}") for t in terms],
    ).drop("tk")
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_tokens").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    def term_score(t: str):
        tf = F.col(f"tf_{t}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
            + 1.0
        )
        norm = tf + k1 * (1.0 - b + b * F.col("n_tokens") / F.col("avgdl"))
        return F.when(tf > 0, idf * (tf * (k1 + 1.0)) / norm).otherwise(F.lit(0.0))

    total = sum([term_score(t) for t in terms], start=F.lit(0.0))
    return (
        scored.select(
            id_col, "n_tokens", *[f"tf_{t}" for t in terms], total.alias("bm25")
        )
        .filter(sum([F.col(f"tf_{t}") for t in terms], start=F.lit(0)) > 0)
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(top_k)
    )


def unigram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    broadcast_max_rows: int | None = VOCAB_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    unigram model, plus the perplexity proxy exp(−mean) — the classic
    cheap quality signal for corpus curation (low-probability token soup
    scores high perplexity and gets dropped or down-weighted).

    Two aggregates and a size-gated broadcast: token explode → (token,
    count) vocabulary aggregate → map-side probability lookup → per-doc
    partial-agg mean. Curated vocabularies are millions of rows where
    corpora are trillions of tokens, so the fitted model usually
    broadcasts — but a raw crawl's token types are Heaps-unbounded, so
    the hint applies only under a probed bound (guards.gated_broadcast);
    above it the token-keyed shuffle join runs instead of an executor
    OOM. The corpus total is a 1-row broadcast. No smoothing: scoring
    the fitting corpus has no OOV.

    Output: (id, n_tokens, logprob_mean, ppl) ordered by id.
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # Corpus token total map-side from array sizes — no explode, so this
    # broadcast branch is a bare scan instead of a re-run of the tokenizer.
    total = df.select(
        F.size(tokens(F.lower(F.col(text_col)))).alias("n")
    ).agg(F.sum("n").alias("total"))
    lp = (
        tok.join(gated_broadcast(vocab, max_rows=broadcast_max_rows), "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc",
            F.log(F.col("c").cast("double") / F.col("total")).alias("lp"),
        )
    )
    mean = F.sum("lp") / F.count(F.lit(1))
    return (
        lp.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            mean.alias("logprob_mean"),
            F.exp(-mean).alias("ppl"),
        )
        .withColumnRenamed("doc", id_col)
        .orderBy(id_col)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
    broadcast_max_rows: int | None = VOCAB_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Top-``top_n`` TF-IDF terms per document: tf(d,t) · ln(N / df(t)).

    The characteristic-keyword extraction pass (feature terms per doc for
    clustering/labeling). Output: (doc_id, token, tf, tfidf, rnk) with
    rnk ≤ top_n, ties broken by token, ordered by (doc_id, rnk). The
    vocab-sized df(t) table broadcasts only under a probed bound
    (guards.gated_broadcast — Heaps' law makes a raw crawl's token types
    billions of rows); above it the token-keyed join shuffles and AQE
    picks the strategy.
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    # ONE shuffle on doc serves both the tf aggregate (hash(doc) clusters
    # (doc, token)) and the final per-doc window — the naive shape
    # (groupBy(doc,token) then window(doc)) shuffles twice and, because
    # ReuseExchange doesn't fire into the broadcast subquery, re-ran the
    # whole scan+explode for df(t). Measured 0.95s → 0.62s at sf0.1.
    # Skew unit is tokens-per-doc (bounded by doc length), same exposure
    # as the per-doc window the query inherently needs.
    tf = tok.repartition("doc").groupBy("doc", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # df(t) straight from the scan: each doc's DISTINCT tokens explode
    # map-side (array_distinct), partial counts combine before the tiny
    # vocab-sized exchange — no (doc, token) shuffle in this branch at all.
    dfr = (
        df.select(
            F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(gated_broadcast(dfr, max_rows=broadcast_max_rows), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "token",
            "tf",
            (
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= top_n)
        .withColumnRenamed("doc", id_col)
        .orderBy(id_col, "rnk")
    )


NB_CLASSES = ("de", "en", "es", "fr", "zh")


def nb_classify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    classes: Sequence[str] = NB_CLASSES,
    priors_over: DataFrame | None = None,
) -> DataFrame:
    """Multinomial Naive Bayes trained on the corpus's own labels and
    scored back over it — the model-based filter stage (fastText-style
    language/quality classifiers) in its simplest exactly-reproducible
    form. Laplace add-one smoothing over the corpus vocabulary V:

        score(d, c) = ln(n_docs_c / N) + Σ_t tf(d,t) · ln((cnt(t,c)+1) / (tok_c + V))

    Prediction is argmax, ties broken by declared class order. Returns
    (id, label, pred) per document, ordered by id.

    Scale shape ("fit tiny model, broadcast"): the corpus is tokenized
    ONCE into the (doc, token, tf) relation — map-side partials compress
    repeated tokens before its shuffle — and that single exchange feeds
    BOTH faces: the model fit aggregates it down to the vocab-sized
    per-token class counts (Catalyst serves the second read from a
    ReusedExchange), and scoring probes the broadcast model from it. The
    class token totals and |V| are whole-relation window sums over the
    vocab-sized model itself (one single-partition exchange of the
    vocabulary, never the corpus), the per-token log-weights are computed
    once per vocab row instead of once per token occurrence, and the
    document priors come straight from the documents relation — a
    label-column-only scan, no tokenizer. (The r2 version re-tokenized
    the corpus three times — 3.6x DuckDB; this shape measured ~2x
    faster with identical predictions.) Argmax compares log-scores that
    differ by whole units between classes, so the double-precision fold
    order (Spark partials vs any sequential engine, tf-weighted sums vs
    per-occurrence sums) cannot flip predictions on real text.
    """
    classes = list(classes)
    # Label-carrying tf relation: fit AND score read this one subplan, so
    # the label rides the existing shuffle for free — no extra label join
    # on either face (the generic nb_fit/nb_score pay one broadcast join
    # each because they cannot assume the scored corpus is the fitted one).
    dt = (
        df.select(
            F.col(id_col).alias("doc"),
            F.col(label_col).alias("label"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy("doc", "label", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Decomposed smoothing: ln((cnt+1)/(tok_c+V)) splits into a per-token
    # numerator and a per-class GLOBAL denominator, so
    #   score(d,c) = prior_c + Σ_t tf·ln(cnt(t,c)+1) − len_d·ln(tok_c+V).
    # That lets the broadcast model be the raw per-token class counts with
    # NO dependency on the global totals — the r3 shape serialized
    # broadcast(totals) → broadcast(model) → broadcast(priors) → score
    # (4 dependent jobs); here counts and the one-row scalar relation are
    # independent broadcasts and all global terms apply per-DOC in the
    # final projection (measured ~35% faster locally, identical argmax:
    # class scores differ by whole units, far beyond the ~1-ulp fold
    # freedom the reassociation introduces).
    counts = dt.groupBy("token").agg(
        *[
            F.sum(
                F.when(F.col("label") == c, F.col("tf")).otherwise(0)
            ).alias(f"cnt_{c}")
            for c in classes
        ]
    )
    totals = counts.agg(
        *[F.sum(f"cnt_{c}").alias(f"tok_{c}") for c in classes],
        F.count(F.lit(1)).alias("v"),
    )
    # priors_over: the same corpus, but callers that pre-repartitioned df
    # for the tokenize (sources.catalog.spread) pass the raw table here so
    # the label-only count doesn't pay the repartition exchange. totals
    # and priors stay SEPARATE broadcasts — independent subtrees
    # materialize concurrently, where folding one into the other
    # serializes two driver round-trips.
    priors = _priors_of(priors_over if priors_over is not None else df,
                        label_col, classes)
    scored = (
        dt.join(F.broadcast(counts), "token")  # no OOV on the fit corpus
        .groupBy("doc", "label")
        .agg(
            *[
                F.sum(F.col("tf") * F.log(F.col(f"cnt_{c}") + 1.0)).alias(
                    f"num_{c}"
                )
                for c in classes
            ],
            F.sum("tf").alias("len_d"),
        )
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(priors))
        .select(
            "doc",
            "label",
            *[
                (
                    F.col(f"prior_{c}")
                    + F.col(f"num_{c}")
                    - F.col("len_d")
                    * F.log((F.col(f"tok_{c}") + F.col("v")).cast("double"))
                ).alias(f"score_{c}")
                for c in classes
            ],
        )
    )
    return scored.select(
        F.col("doc").alias(id_col), "label", _nb_argmax(classes).alias("pred")
    ).orderBy(id_col)


def _tf_relation(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, token, tf): the single tokenizing pass — both the model fit
    and scoring consume this identical subplan, so Catalyst serves the
    second read from a ReusedExchange (plan-asserted)."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def nb_fit(
    df: DataFrame,
    text_col: str,
    label_col: str,
    classes: Sequence[str] = NB_CLASSES,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Fit the classifier; returns ``(model, priors)`` — the reusable
    production form (fit on a labeled corpus once, score anything later;
    both relations are broadcast-sized and Engine.materialize-able).

    ``model``: (token, lw_<c>...) per-token class log-weights
    (vocab-sized). ``priors``: ONE row with ln-priors ``prior_<c>`` and
    the unseen-token fallback ``unk_<c>`` = ln(1 / (tok_c + V)) — the
    Laplace mass a token absent from the training vocabulary gets, which
    is what makes scoring NEW corpora well-defined. Class token totals
    and |V| are window sums over the vocab-sized token aggregate; priors
    come from a label-only scan of the corpus."""
    classes = list(classes)
    lbl = df.select(
        F.col(id_col).alias("doc"), F.col(label_col).alias("label")
    )
    dt = _tf_relation(df, id_col, text_col).join(F.broadcast(lbl), "doc")
    model, stats = _fit_from_dt(dt, classes)
    priors = _priors_of(df, label_col, classes).crossJoin(F.broadcast(stats))
    return model, priors


def _fit_from_dt(
    dt: DataFrame, classes: list[str]
) -> tuple[DataFrame, DataFrame]:
    """(model, stats) from a (doc, label, token, tf) relation: the
    per-token class log-weights (vocab-sized) and the ONE-row unseen-token
    Laplace masses. Class token totals and |V| are a ONE-row aggregate
    over the vocab-sized token counts, broadcast back via crossJoin — the
    r3 shape window-summed over `Window.partitionBy()`, which funnels the
    entire vocabulary through a single sort task; at web scale the vocab
    is itself huge, so the partial-aggregating 1-row reduce is the only
    shape that survives (and it cut the local confusion query ~25%). The
    smoothing log still evaluates once per vocab row."""
    counts = dt.groupBy("token").agg(
        *[
            F.sum(
                F.when(F.col("label") == c, F.col("tf")).otherwise(0)
            ).alias(f"cnt_{c}")
            for c in classes
        ]
    )
    totals = counts.agg(
        *[F.sum(f"cnt_{c}").alias(f"tok_{c}") for c in classes],
        F.count(F.lit(1)).alias("v"),
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        *[
            F.log(
                (F.col(f"cnt_{c}") + 1).cast("double")
                / (F.col(f"tok_{c}") + F.col("v"))
            ).alias(f"lw_{c}")
            for c in classes
        ],
    )
    stats = totals.select(
        *[
            F.log(1.0 / (F.col(f"tok_{c}") + F.col("v"))).alias(f"unk_{c}")
            for c in classes
        ]
    )
    return model, stats


def _priors_of(
    df: DataFrame, label_col: str, classes: list[str]
) -> DataFrame:
    """One row of ln document priors from a label-only scan."""
    return df.agg(
        *[
            F.log(
                F.sum((F.col(label_col) == c).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias(f"prior_{c}")
            for c in classes
        ],
    )


def _nb_scored(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    priors: DataFrame,
    classes: Sequence[str],
) -> DataFrame:
    """(doc, score_<c>...): per-class log-scores of every document in
    ``df`` under a fitted (model, priors). Map-side broadcast probe —
    unknown tokens fall back to the priors row's unk_<c> mass — plus one
    doc-keyed aggregate."""
    dt = _tf_relation(df, id_col, text_col)
    return (
        dt.join(F.broadcast(model), "token", "left")
        .crossJoin(F.broadcast(priors))
        .groupBy("doc")
        .agg(
            *[
                (
                    F.max(F.col(f"prior_{c}"))
                    + F.sum(
                        F.col("tf")
                        * F.coalesce(F.col(f"lw_{c}"), F.col(f"unk_{c}"))
                    )
                ).alias(f"score_{c}")
                for c in classes
            ]
        )
    )


def _nb_argmax(classes: Sequence[str]):
    """Argmax over score_<c> columns, ties to the earliest declared class."""
    classes = list(classes)

    def best_other(c: str):
        others = [F.col(f"score_{o}") for o in classes if o != c]
        return others[0] if len(others) == 1 else F.greatest(*others)

    pred = F.lit(None).cast("string")
    for c in reversed(classes):
        cond = F.col(f"score_{c}") >= best_other(c)
        pred = F.when(cond, F.lit(c)).otherwise(pred)
    return pred


def nb_score(
    model: DataFrame,
    priors: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    classes: Sequence[str] = NB_CLASSES,
) -> DataFrame:
    """Score an arbitrary corpus under a fitted (model, priors): returns
    (id, pred) per document, ordered by id — the model-based filter gate
    a curation pipeline applies to unlabeled data. Tokens outside the
    training vocabulary get the Laplace unk mass (see nb_fit)."""
    classes = list(classes)
    scored = _nb_scored(df, id_col, text_col, model, priors, classes)
    return scored.select(
        F.col("doc").alias(id_col), _nb_argmax(classes).alias("pred")
    ).orderBy(id_col)
