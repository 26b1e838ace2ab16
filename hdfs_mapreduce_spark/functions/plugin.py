"""Generic plugin surface — the Spark-first replacement for the reference's
MapReduce plugin protocol.

The reference ships a compiled binary with each job and forks it ONCE PER
RECORD: ``plugin MAP <lineNo> <line>`` emits ``key\tvalue`` lines on stdout
(dfs/compute_engine/compute_engine.go:49-69), and ``plugin REDUCE <key>
<v1\tv2\t...>`` emits one result line per group
(compute_engine.go:111-131). That protocol IS the reference's query language
(SURVEY §2.11); the fork-per-record design is its biggest bottleneck
(retrospective.md:23).

Here the same *capability* — run arbitrary user code over every record, then
over every key-group — is exposed as three Arrow-vectorized surfaces:

* ``map_records(df, fn, schema)`` — UDTF-like: per-record fn emitting 0..n
  output rows, executed per-batch via ``mapInPandas`` (no fork, no stdout
  parsing, ~10-100x less overhead than row-at-a-time).
* ``map_records_batched(df, fn, schema)`` — the raw batch surface for users
  who want to vectorize themselves.
* ``reduce_groups(df, keys, fn, schema)`` — UDAF-like: per-group fn via
  ``applyInPandas``; the shuffle/sort/merge/group machinery the reference
  hand-rolls (dfs/storageNode/storageNode.go:368-458, dfs/external_sort/
  extsort.go) is Spark's sort-based shuffle + grouped Arrow batches.

Unlike the reference, the last group is not silently dropped (its grouping
loop never flushes the final group — storageNode.go:449-464), values keep
their real types (no tab-in-value corruption, compute_engine.go:165-176),
and numeric keys sort numerically.

Scale notes: ``reduce_groups`` materializes one group per Arrow batch, so a
group must fit in executor memory — for unbounded groups (word-count hot
keys) use built-in aggregates instead, which do map-side partial aggregation
(the combiner the reference lacked). ``map_records`` streams batches and has
no such limit.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def map_records_batched(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """Arbitrary batch-to-batch transform (``mapInPandas``). ``fn`` receives a
    pandas batch and returns a pandas DataFrame matching ``schema``; output
    row count is unconstrained (0..n per input row → UDTF semantics)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = fn(batch)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(_run, schema=schema)


def map_records(
    df: DataFrame,
    fn: Callable[[dict[str, Any]], Iterable[dict[str, Any]]],
    schema: StructType | str,
) -> DataFrame:
    """Per-record plugin surface: ``fn(record_dict) -> iterable of output
    dicts`` (0..n, like the reference's MAP emitting 0..n KV lines). Executed
    batch-at-a-time under the hood — the user thinks per-record, Spark runs
    per-Arrow-batch."""

    def _batch(batch: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict[str, Any]] = []
        for rec in batch.to_dict("records"):
            rows.extend(fn(rec))
        return pd.DataFrame(rows)

    return map_records_batched(df, _batch, schema)


def reduce_groups(
    df: DataFrame,
    keys: list[str] | str,
    fn: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """Per-group plugin surface (``applyInPandas``): ``fn(key_tuple,
    group_pdf) -> result_pdf``. The reference's REDUCE with typed columns
    instead of a tab-joined value string."""
    if isinstance(keys, str):
        keys = [keys]
    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(fn, schema=schema)


def run_mapreduce(
    df: DataFrame,
    mapper: Callable[[dict[str, Any]], Iterable[dict[str, Any]]],
    reducer: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    map_schema: StructType | str,
    reduce_schema: StructType | str,
    key: str = "key",
) -> DataFrame:
    """The reference's full 2-stage job in one call:
    scan → map(plugin) → [partition → sort → shuffle → merge → group] →
    reduce(plugin). Everything in brackets is Spark's shuffle; the two
    callables are the only user code, exactly like the two plugin verbs."""
    mapped = map_records(df, mapper, map_schema)
    return reduce_groups(mapped, key, reducer, reduce_schema)
