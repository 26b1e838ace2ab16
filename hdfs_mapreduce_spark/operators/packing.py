"""Token-budget sequence packing — grouping documents into training-sequence
bins of at most ``budget`` tokens (the step between curation and
tokenization in an LLM data pipeline).

Packing is inherently sequential (bin state), so the distributed form packs
**within each partition independently** via ``mapInPandas``: the generator
sees every Arrow batch of one partition in order and carries the open bin
across batches; bin ids are made globally unique by folding in the partition
id. No shuffle at all — at 100 TB this runs at scan speed, and the only
cross-partition cost is at most one under-filled bin per partition (bounded
waste: partitions × budget tokens).

First-fit-decreasing would pack tighter but needs a global sort; greedy
next-fit per partition is the standard scale trade (waste bound above) and
is what the invariant tests assert.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens: Column | str,
    budget: int = 2048,
) -> DataFrame:
    """Assign every row a bin such that each bin's token sum is <= budget.

    A single document longer than ``budget`` gets a bin of its own
    (truncation/splitting is the tokenizer's job, not the packer's).
    Returns (id_col, n_tokens, bin_id) — bin_id is globally unique.
    """
    tagged = df.select(
        F.col(id_col).alias("doc"),
        (F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens)
        .cast("long")
        .alias("n_tokens"),
        F.spark_partition_id().alias("pid"),
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bin_seq = 0
        used = 0
        pid_base = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pid_base is None:
                # bin_id = partition_id << 40 | local_seq — unique without
                # any coordination between partitions
                pid_base = int(pdf["pid"].iloc[0]) << 40
            bins = []
            for n in pdf["n_tokens"]:
                n = int(n)
                if used > 0 and used + n > budget:
                    bin_seq += 1
                    used = 0
                used += n
                bins.append(pid_base | bin_seq)
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],
                    "n_tokens": pdf["n_tokens"],
                    "bin_id": pd.Series(bins, dtype="int64"),
                }
            )

    return tagged.mapInPandas(pack, "doc long, n_tokens long, bin_id long")


def global_offsets(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    bucket_size: int = 1024,
) -> DataFrame:
    """Exclusive global prefix sum of ``weight_col`` in ``order_col`` order,
    as a distributed two-level cumsum — the scale-safe form of
    ``SUM(w) OVER (ORDER BY o)``, which Spark would otherwise execute as a
    single-partition window over the whole corpus.

      1. bucket rows by order_col ranges (order_col DIV bucket_size);
      2. per-bucket totals → one tiny relation; its running total (the
         only single-partition window, over ~n/bucket_size rows) gives
         each bucket's base offset;
      3. broadcast the bases back and add the within-bucket running sum,
         which parallelizes over buckets.

    Requires integer order_col (the DIV bucketing preserves order across
    buckets). Returns df's two columns plus ``start_off``.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(order_col).alias("o"), F.col(weight_col).cast("long").alias("w")
    ).withColumn("bucket", F.expr(f"o DIV {bucket_size}"))
    bucket_tot = base.groupBy("bucket").agg(F.sum("w").alias("bw"))
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bases = bucket_tot.select(
        "bucket", (F.sum("bw").over(wb) - F.col("bw")).alias("bucket_base")
    )
    ww = (
        Window.partitionBy("bucket")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(bases), "bucket")
        .select(
            F.col("o").alias(order_col),
            F.col("w").alias(weight_col),
            (F.col("bucket_base") + F.sum("w").over(ww) - F.col("w")).alias(
                "start_off"
            ),
        )
    )


def pack_concat_accounting(
    df: DataFrame,
    id_col: str,
    n_tokens: Column | str,
    budget: int = 2048,
) -> DataFrame:
    """Concat-and-chunk packing accounting (the GPT-pretraining layout:
    concatenate every document in id order, cut at exact ``budget``
    boundaries, documents crossing a boundary are split). Per doc:
    global start offset, first/last bin, and whether the doc is split.
    Built on the distributed prefix sum — no corpus-sized window."""
    tok = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    base = df.select(F.col(id_col), tok.cast("long").alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    off = global_offsets(base, id_col, "n_tokens")
    return off.select(
        id_col,
        "n_tokens",
        "start_off",
        F.expr(f"start_off DIV {budget}").alias("first_bin"),
        F.expr(f"(start_off + n_tokens - 1) DIV {budget}").alias("last_bin"),
    ).withColumn(
        "is_split", (F.col("first_bin") != F.col("last_bin")).cast("int")
    ).orderBy(id_col)
