"""Count-min sketch: mergeable approximate frequency counts.

Completes the sketch family (HLL distinct counts, GK quantiles — both
Spark built-ins) with the classic heavy-hitter/point-query sketch
[Cormode & Muthukrishnan '05]: a depth x width counter grid where item v
increments cell (d, h_d(v)) in every row d, and a point query reads the
MIN over the d cells — always an overestimate, within eN/width with
probability 1 - exp(-depth).

Why this shape for 100 TB: the sketch relation is depth x width rows
(a few thousand) regardless of corpus size, built in ONE corpus pass —
each record explodes to its depth (row, bucket) cells map-side and the
partial aggregation collapses them before the tiny shuffle. Sketches
over different partitions/days MERGE by cell-wise addition (exactly the
property counts need for incremental pipelines), and the merge is a
union + re-aggregate of two tiny relations. Hashes are the shared
engine-agnostic h56 (functions/hashing.py), so a sketch built by Spark
can be probed by any engine that can compute md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs_mapreduce_spark.functions.hashing import h56

CM_DEPTH = 4
CM_WIDTH = 1024


def _cell(col: Column, d: int, width: int) -> Column:
    return h56(F.concat(F.lit(f"cm{d}:"), col)) % width


def cm_sketch(
    df: DataFrame,
    col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(row, bucket, cnt): the counter grid for the values of ``col``.
    One scan — the depth cells per record are built array-side and
    exploded, partials combine before the (row, bucket) shuffle whose
    domain is depth x width cells."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                _cell(F.col(col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise addition — sketch(A ++ B) == cm_merge(sketch(A), sketch(B))
    exactly (not approximately): both sides count the same cells."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


MG_K = 64


def mg_summary(
    df: DataFrame,
    col: str,
    k: int = MG_K,
) -> DataFrame:
    """Misra-Gries heavy-hitter summary: at most ``k`` (item, cnt) rows
    where cnt underestimates the true frequency by at most N/(k+1) — so
    every item with true frequency above N/(k+1) is guaranteed present
    [Misra & Gries '82; mergeability per Agarwal et al., "Mergeable
    Summaries", PODS'12].

    Scale shape: each partition streams once through a k-counter
    dictionary (mapInPandas — O(k) state, no sort, no shuffle of the
    stream); the per-partition summaries (p x k rows total) then merge
    by summing counts per item and subtracting the (k+1)-th largest
    merged count from everyone — the PODS'12 merge, which preserves the
    additive-error bound across partitions. One tiny shuffle of p x k
    rows is the only exchange after the scan.

    Null handling: nulls are NOT countable items — they are filtered
    before the scan (a null "heavy hitter" row would otherwise rank in
    the merge), so the summary covers non-null values only and N in the
    error bound is the non-null count."""
    import pandas as pd

    def partition_summary(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [i for i in counters if counters[i] == 1]
                    for i in counters:
                        counters[i] -= 1
                    for i in dead:
                        del counters[i]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    partials = (
        df.select(F.col(col).cast("string").alias(col))
        .filter(F.col(col).isNotNull())
        .mapInPandas(partition_summary, "item string, cnt long")
    )
    return mg_merge(partials, k=k)


def mg_merge(*summaries: DataFrame, k: int = MG_K) -> DataFrame:
    """Merge any number of (item, cnt) MG summaries into one of size <= k
    — the PODS'12 rule: sum counts per item, subtract the (k+1)-th
    largest merged count from everyone, drop non-positives. Error budgets
    add (each input's bound plus the subtraction), which is exactly the
    N/(k+1) total the summary guarantees. Also the per-batch merge step
    of streaming heavy hitters (streaming/events.py)."""
    if not summaries:
        raise ValueError("mg_merge needs at least one summary")
    merged = summaries[0]
    for s in summaries[1:]:
        merged = merged.unionByName(s)
    merged = merged.groupBy("item").agg(F.sum("cnt").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), "item")
    ranked = merged.select(
        "item", "cnt", F.row_number().over(w).alias("rn")
    )
    sub = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("cnt"))), F.lit(0)
        ).alias("sub")
    )
    return (
        ranked.filter(F.col("rn") <= k)
        .crossJoin(F.broadcast(sub))
        .select("item", (F.col("cnt") - F.col("sub")).alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(item, est): point-query estimates for the DISTINCT values of
    ``items`` — min over the depth cells, 0 for never-seen values (their
    cells may be absent from the sketch). Duplicate probe rows collapse
    to one output row (the estimate is a function of the value, so
    per-row output would only repeat it), and null probes collapse to a
    single (null, 0) row: h56(concat('cm:', null)) is null, which
    matches no sketch cell. The sketch side is depth x width rows, so it
    **broadcasts**; the probe is map-side."""
    probes = items.select(
        F.col(col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cell(F.col(col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("item", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cm_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-cardinality estimate from two count-min sketches (Cormode &
    Muthukrishnan '05 §4.2): per depth row, the bucket-wise inner
    product Σ_b cntA[b]·cntB[b] equals Σ_k fA(k)·fB(k) plus collision
    cross-terms — collisions only ADD, so every row OVERESTIMATES the
    true equi-join size and min-over-rows is the tightest estimate.
    All-integer arithmetic: deterministic in any engine, exact oracle.

    Scale: the sketches are depth×width cells regardless of input size
    (mergeable across partitions/streams), and the estimate is a
    cell-keyed join of two tiny relations — THIS is how a planner sizes
    a 100 TB join without touching the tables. Missing buckets mean
    zero counts, so the inner join computes the same sum a dense grid
    would."""
    return (
        a.alias("a")
        .join(b.alias("b"), ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("est"))
    )
