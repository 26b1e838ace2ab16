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
