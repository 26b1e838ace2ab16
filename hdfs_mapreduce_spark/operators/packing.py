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
