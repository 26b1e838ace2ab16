"""Declared relevance queries (BM25 retrieval, TF-IDF feature terms) with
DuckDB oracle twins. Constants are shared between both faces so the
formulas cannot drift; see operators/relevance.py for the scale shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hdfs_mapreduce_spark.operators.relevance import (
    BM25_B,
    BM25_K1,
    bm25_scores,
    tfidf_top_terms,
    unigram_lm_scores,
)
from hdfs_mapreduce_spark.functions.hashing import h56_sql
from hdfs_mapreduce_spark.sources.catalog import load_table, spread

# Fixed ad-hoc query for the declared BM25 run.
BM25_TERMS = ("spark", "merge", "window")
BM25_TOP_K = 50
TFIDF_TOP_N = 3

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return bm25_scores(
        docs, "doc_id", "text", BM25_TERMS, BM25_K1, BM25_B, BM25_TOP_K
    )


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return tfidf_top_terms(docs, "doc_id", "text", TFIDF_TOP_N)


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return unigram_lm_scores(docs, "doc_id", "text")


VOCAB_TOP = 50


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: top-VOCAB_TOP tokens by corpus frequency
    with each token's cumulative share of all token occurrences — the
    table a tokenizer/vocab-size decision is made from. The corpus reduces
    to one (token, count) aggregate; the running total is a window over
    the tiny vocab relation (single-partition by construction — the
    aggregate output is vocabulary-sized, not corpus-sized), and the
    grand total is an exact integer sum."""
    from pyspark.sql.window import Window

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    from hdfs_mapreduce_spark.functions.text import tokens as _tokens
    from pyspark.sql import functions as F

    tok = docs.select(
        F.explode(_tokens(F.lower(F.col("text")))).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy()
    return (
        vocab.select(
            "token",
            "cnt",
            (F.sum("cnt").over(w).cast("double") / F.sum("cnt").over(total)).alias(
                "cum_share"
            ),
        )
        .orderBy(F.col("cnt").desc(), "token")
        .limit(VOCAB_TOP)
    )


def _bm25_sql() -> str:
    tf_cols = ",\n               ".join(
        f"len(list_filter({_TOKS}, t -> t = '{t}')) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_TERMS
    )
    # Same operation order as the Column expressions in bm25_scores.
    scores = " + ".join(
        f"(CASE WHEN tf_{t} > 0 THEN "
        f"ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0) "
        f"* (tf_{t} * ({BM25_K1} + 1.0)) "
        f"/ (tf_{t} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * n_tokens / avgdl)) "
        f"ELSE 0.0 END)"
        for t in BM25_TERMS
    )
    any_tf = " + ".join(f"tf_{t}" for t in BM25_TERMS)
    tf_out = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
        WITH base AS (
            SELECT doc_id, len({_TOKS}) AS n_tokens,
               {tf_cols}
            FROM documents
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs, AVG(n_tokens) AS avgdl, {df_cols}
            FROM base
        )
        SELECT doc_id, n_tokens, {tf_out}, {scores} AS bm25
        FROM base, stats
        WHERE {any_tf} > 0
        ORDER BY bm25 DESC, doc_id
        LIMIT {BM25_TOP_K}
    """


def _tfidf_sql() -> str:
    return f"""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, unnest({_TOKS}) AS token FROM documents
        ),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ),
        dfr AS (
            SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS MATERIALIZED (
            SELECT tf.doc_id, tf.token, tf.tf,
                   tf.tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
            FROM tf JOIN dfr USING (token), n
        )
        SELECT doc_id, token, tf, tfidf, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, token
            ) AS rnk FROM scored
        ) WHERE rnk <= {TFIDF_TOP_N}
        ORDER BY doc_id, rnk
    """


def _lm_sql() -> str:
    return f"""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, unnest({_TOKS}) AS token FROM documents
        ),
        vocab AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
        tot AS (SELECT COUNT(*) AS total FROM tok),
        lp AS (
            SELECT doc_id, ln(CAST(c AS DOUBLE) / total) AS lp
            FROM tok JOIN vocab USING (token), tot
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               SUM(lp) / COUNT(*) AS logprob_mean,
               exp(-(SUM(lp) / COUNT(*))) AS ppl
        FROM lp GROUP BY 1 ORDER BY doc_id
    """


def _vocab_sql() -> str:
    return f"""
        WITH tok AS MATERIALIZED (
            SELECT unnest({_TOKS}) AS token FROM documents
        ),
        vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1)
        SELECT token, cnt,
               CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / SUM(cnt) OVER () AS cum_share
        FROM vocab ORDER BY cnt DESC, token LIMIT {VOCAB_TOP}
    """


def quality_logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-batch logistic regression (operators/logreg.py):
    hashed-BoW features, weak label lang='en', LOGREG_ROUNDS gradient
    rounds from w=0. Relation = the final (idx, weight) vector with the
    bias at idx=LOGREG_DIM; oracle = the identical rounds unrolled as
    chained CTEs (pinned per-doc fold order, same update arithmetic)."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.operators.logreg import (
        LOGREG_DIM,
        logreg_fit,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    w = logreg_fit(docs, F.col("lang") == "en")
    return spark.createDataFrame(
        [(i, w[i]) for i in range(LOGREG_DIM + 1)],
        "idx long, weight double",
    ).orderBy("idx")


def quality_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit as above, then score every document against the final weights:
    the (label, pred, n, avg_prob) confusion relation a pipeline audits
    before applying a classifier quality gate."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.operators.logreg import logreg_confusion

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return logreg_confusion(docs, F.col("lang") == "en")


def quality_logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit, then the reliability diagram (operators/logreg.py
    logreg_calibration): per probability bin, count / mean predicted
    probability / observed positive fraction — whether the gate's
    threshold means what it says. The oracle reuses the unrolled-fit
    CTEs' per-doc sigmoid and bins with the same floor/cap rule; the
    probabilities are bit-identical by the fit oracle's discipline, so
    bin membership is too."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.operators.logreg import logreg_calibration

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return logreg_calibration(docs, F.col("lang") == "en")


def _logreg_ctes() -> str:
    """The fit unrolled: feats (integer cells -> one exact division),
    labels, then per round r: margins (bias-seeded ordered fold), resid
    (sigmoid - y, bias-only for docs with no cells), grad (per-feature
    sum), w{r+1} (w - lr*g/n, bias via SUM(resid))."""
    from hdfs_mapreduce_spark.operators.logreg import (
        LOGREG_DIM,
        LOGREG_LR,
        LOGREG_ROUNDS,
    )

    d, lr = LOGREG_DIM, LOGREG_LR
    parts = [
        f"""tok AS MATERIALIZED (
            SELECT doc_id AS doc, len({_TOKS}) AS cnt,
                   unnest({_TOKS}) AS token
            FROM documents
        ),
        cells AS MATERIALIZED (
            SELECT doc, cnt, {h56_sql('token')} % {d} AS idx,
                   SUM(CASE WHEN {h56_sql("'sign:' || token")} % 2 = 0
                            THEN 1 ELSE -1 END) AS val
            FROM tok GROUP BY doc, cnt, idx
        ),
        feats AS MATERIALIZED (
            SELECT doc, idx, CAST(val AS DOUBLE) / cnt AS x FROM cells
        ),
        labels AS MATERIALIZED (
            SELECT doc_id AS doc,
                   CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END AS y
            FROM documents
        ),
        nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM labels),
        w0 AS MATERIALIZED (
            SELECT unnest(generate_series(0, {d})) AS idx,
                   CAST(0.0 AS DOUBLE) AS w
        )"""
    ]
    for r in range(LOGREG_ROUNDS):
        parts.append(
            f"""m{r} AS MATERIALIZED (
            SELECT f.doc,
                   list_reduce(list_prepend(
                       (SELECT w FROM w{r} WHERE idx = {d}),
                       list(wr.w * f.x ORDER BY f.idx)),
                       (a, v) -> a + v) AS margin
            FROM feats f JOIN w{r} wr ON wr.idx = f.idx
            GROUP BY f.doc
        ),
        r{r} AS MATERIALIZED (
            SELECT l.doc,
                   1.0 / (1.0 + exp(-COALESCE(m.margin,
                       (SELECT w FROM w{r} WHERE idx = {d})))) - l.y
                       AS resid
            FROM labels l LEFT JOIN m{r} m ON m.doc = l.doc
        ),
        g{r} AS MATERIALIZED (
            SELECT f.idx, SUM(r.resid * f.x) AS g
            FROM r{r} r JOIN feats f ON f.doc = r.doc
            GROUP BY f.idx
        ),
        w{r + 1} AS MATERIALIZED (
            SELECT wr.idx,
                   wr.w - {lr} * (CASE WHEN wr.idx = {d}
                       THEN (SELECT SUM(resid) FROM r{r})
                       ELSE COALESCE(g.g, CAST(0.0 AS DOUBLE)) END)
                       / (SELECT n FROM nn) AS w
            FROM w{r} wr LEFT JOIN g{r} g ON g.idx = wr.idx
        )"""
        )
    return ",\n        ".join(parts)


def _logreg_fit_sql() -> str:
    from hdfs_mapreduce_spark.operators.logreg import LOGREG_ROUNDS

    return f"""
        WITH {_logreg_ctes()}
        SELECT idx, w AS weight FROM w{LOGREG_ROUNDS} ORDER BY idx
    """


def _logreg_score_sql() -> str:
    from hdfs_mapreduce_spark.operators.logreg import (
        LOGREG_DIM,
        LOGREG_ROUNDS,
    )

    t, d = LOGREG_ROUNDS, LOGREG_DIM
    return f"""
        WITH {_logreg_ctes()},
        mT AS MATERIALIZED (
            SELECT f.doc,
                   list_reduce(list_prepend(
                       (SELECT w FROM w{t} WHERE idx = {d}),
                       list(wr.w * f.x ORDER BY f.idx)),
                       (a, v) -> a + v) AS margin
            FROM feats f JOIN w{t} wr ON wr.idx = f.idx
            GROUP BY f.doc
        ),
        scored AS MATERIALIZED (
            SELECT CAST(l.y AS BIGINT) AS label,
                   1.0 / (1.0 + exp(-COALESCE(m.margin,
                       (SELECT w FROM w{t} WHERE idx = {d})))) AS p
            FROM labels l LEFT JOIN mT m ON m.doc = l.doc
        )
        SELECT label,
               CAST(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
                   AS pred,
               COUNT(*) AS n, AVG(p) AS avg_prob
        FROM scored GROUP BY label, pred ORDER BY label, pred
    """


def _logreg_calibration_sql(n_bins: int = 10) -> str:
    from hdfs_mapreduce_spark.operators.logreg import (
        LOGREG_DIM,
        LOGREG_ROUNDS,
    )

    t, d = LOGREG_ROUNDS, LOGREG_DIM
    return f"""
        WITH {_logreg_ctes()},
        mT AS MATERIALIZED (
            SELECT f.doc,
                   list_reduce(list_prepend(
                       (SELECT w FROM w{t} WHERE idx = {d}),
                       list(wr.w * f.x ORDER BY f.idx)),
                       (a, v) -> a + v) AS margin
            FROM feats f JOIN w{t} wr ON wr.idx = f.idx
            GROUP BY f.doc
        ),
        scored AS MATERIALIZED (
            SELECT l.y,
                   1.0 / (1.0 + exp(-COALESCE(m.margin,
                       (SELECT w FROM w{t} WHERE idx = {d})))) AS p
            FROM labels l LEFT JOIN mT m ON m.doc = l.doc
        )
        SELECT LEAST(CAST(floor(p * {n_bins}) AS BIGINT),
                     {n_bins - 1}) AS bin,
               COUNT(*) AS n, AVG(p) AS mean_p, AVG(y) AS frac_pos
        FROM scored GROUP BY bin ORDER BY bin
    """


QUERIES = {
    "text_bm25": text_bm25,
    "text_tfidf": text_tfidf,
    "text_lm_score": text_lm_score,
    "vocab_coverage": vocab_coverage,
    "quality_logreg_fit": quality_logreg_fit,
    "quality_logreg_score": quality_logreg_score,
    "quality_logreg_calibration": quality_logreg_calibration,
}

ORACLE_SQL = {
    "text_bm25": _bm25_sql(),
    "text_tfidf": _tfidf_sql(),
    "text_lm_score": _lm_sql(),
    "vocab_coverage": _vocab_sql(),
    "quality_logreg_fit": _logreg_fit_sql(),
    "quality_logreg_score": _logreg_score_sql(),
    "quality_logreg_calibration": _logreg_calibration_sql(),
}
