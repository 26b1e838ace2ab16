"""Deterministic sampling operators for corpus curation.

Both operators follow the repo's sampling discipline (plans/text_plans.py
dataset_split/dataset_sample): no ``rand()`` — randomness comes from the
shared engine-agnostic h56 hash of (seed, id), so membership is a pure
function of the row and the seed: stable across runs, engines, executors,
and corpus growth, and per-row decidable with no coordination.

* ``weighted_sample`` — weighted sampling WITHOUT replacement via the
  Efraimidis-Vitter/Spirakis exponential-jumps key ["Weighted random
  sampling with a reservoir", IPL'06]: each row gets key u^(1/w) with
  u = h56(seed, id) mapped to (0, 1); the n largest keys are the sample,
  and the inclusion law matches sequential weighted draws exactly. One
  map pass + TakeOrdered top-n — no shuffle of the corpus.
* ``stratified_head_sample`` — exactly ``n`` rows per stratum in seeded
  hash order (or every row of smaller strata): the fixed-budget
  per-source cap a mixture pipeline applies. One hash exchange on the
  stratum key; WindowGroupLimit keeps per-partition heads before the
  window sort at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs_mapreduce_spark.functions.hashing import h56
from hdfs_mapreduce_spark.functions.text import tokens

# h56 yields 56-bit integers; dividing by 2^56 maps to [0, 1). The +1
# keeps u strictly positive so ln(u) is finite.
_U_DENOM = float(1 << 56)


def _uniform(seed: str, id_col: Column) -> Column:
    return (
        (h56(F.concat(F.lit(f"ws:{seed}:"), id_col)) + 1).cast("double")
        / _U_DENOM
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: str = "42",
) -> DataFrame:
    """``n`` rows drawn without replacement with probability proportional
    to ``weight_col`` (computed as the top-n of ln(u)/w — the log form of
    u^(1/w), same ordering, no underflow for large weights). Zero- and
    negative-weight rows are never selected. Output: the sampled rows of
    ``df`` plus their ``ws_key``, ordered by key desc (draw order)."""
    u = _uniform(seed, F.col(id_col))
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .select("*", key.alias("ws_key"))
        .orderBy(F.col("ws_key").desc(), id_col)
        .limit(n)
    )


def stratified_head_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    n_per_stratum: int,
    seed: str = "42",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum in seeded hash order
    (all rows of strata smaller than the budget). Output adds ``rnk``
    (1-based within stratum)."""
    order = h56(F.concat(F.lit(f"sh:{seed}:"), F.col(id_col)))
    w = Window.partitionBy(stratum_col).orderBy(order.asc(), F.col(id_col))
    return (
        df.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= n_per_stratum)
    )


# Hashed-feature bucket count for DSIR. 2^10 buckets is the paper's
# regime scaled to the fixture vocabulary; at web scale raise to 2^16-2^20
# — the model stays a broadcast-sized table either way (that is the whole
# point of hashing the feature space).
DSIR_BUCKETS = 1024


def dsir_llr_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR), the hashed-n-gram
    importance estimator of Xie et al., NeurIPS 2023 ["Data Selection for
    Language Models via Importance Resampling"]: fit two bag-of-hashed-
    features unigram models — p over the TARGET slice (``is_target``
    rows), q over the full RAW pool — and score every raw document by its
    length-normalized log-likelihood ratio

        score(doc) = (1/n_tok) * Σ_tokens  ln p(bucket) − ln q(bucket)

    with add-one smoothing over the ``n_buckets`` hashed vocabulary.
    High scores = documents distributionally closest to the target; the
    selection pass a pretraining pipeline runs to tilt a web crawl toward
    a trusted corpus. This is the deterministic top-k variant (the paper
    adds Gumbel noise for a proper sample; determinism is what makes the
    relation oracle-checkable — add the repo's h56-seeded uniform for the
    sampled form, as dataset_weighted_sample does).

    Scale shape: token explode → two bucket-count aggregates whose output
    is ``n_buckets`` rows (NOT vocabulary-sized — hashing bounds the
    model regardless of corpus size), totals as 1-row aggregates, the
    log-ratio table broadcast to a map-side join, then one per-doc
    partial-agg sum. Two corpus-sized shuffles total (bucket counts ride
    the same explode), nothing driver-side.

    Returns (id, n_tokens, dsir_score) for every NON-target row with at
    least one token; scores are raw doubles — callers pin rounding.
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        is_target.alias("tgt"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    ).select(
        "doc",
        "tgt",
        (h56(F.concat(F.lit("dsir:"), F.col("token"))) % n_buckets).alias(
            "bucket"
        ),
    )
    raw_counts = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("tgt"), 1)).alias("ct"),
    )
    totals = raw_counts.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    ratio = raw_counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1).cast("double") / (F.col("tt") + n_buckets))
            - F.log(
                (F.col("cr") + 1).cast("double") / (F.col("tr") + n_buckets)
            )
        ).alias("llr"),
    )
    return (
        tok.where(~F.col("tgt"))
        .join(F.broadcast(ratio), "bucket")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("llr") / F.count(F.lit(1))).alias("dsir_score"),
        )
        .withColumnRenamed("doc", id_col)
    )
