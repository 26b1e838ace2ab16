"""Z-order (Morton curve) data layout: multi-column clustering for
row-group pruning — the lakehouse OPTIMIZE ZORDER BY, as plain Spark.

A 100 TB table is read through predicates on more than one column
(user AND time, domain AND date). Sorting by one column makes parquet
min/max pruning perfect for it and useless for the others; interleaving
the bits of both keys (the Morton/Z space-filling curve) makes rows
close in EITHER dimension land in the same files, so row-group
statistics prune on BOTH predicates. The whole operator is JVM-side
Catalyst expressions (an OR-fold of shift/mask terms — one
whole-stage-codegen span, no UDF) plus a range repartition + sort on
the computed key; nothing here is Python-per-row.

``tests/test_layout.py`` proves the effect mechanically: after
``zorder_layout`` each written file covers a narrow min/max slice of
BOTH columns (measured via pyarrow row-group statistics), where a
single-column sort leaves the other column's ranges spanning the whole
domain — i.e., the scan planner could actually skip files for either
predicate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per column: 2 columns × 16 = a 32-bit z-value


def zvalue(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1. Built as a literal OR-fold of shift/mask expressions —
    Catalyst folds it into one codegen span; the identical expression
    text is generated for the DuckDB oracle by ``zvalue_sql`` so both
    engines compute the same integer."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(
                F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zvalue_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """The DuckDB-side twin of ``zvalue``: same interleave, same term
    order, plain >> & << | operators over BIGINT."""
    terms = []
    for i in range(bits):
        # CAST keeps the shift in BIGINT: an INT32 operand would overflow
        # at << 31 (DuckDB shifts don't widen)
        terms.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_partitions: int,
    bits: int = Z_BITS,
) -> DataFrame:
    """Rows re-clustered along the Z curve of (col_a, col_b): range
    repartition on the z-value (contiguous curve segments per output
    partition — this is the one shuffle, and it is the point: a write
    job runs it once and every later scan prunes) followed by a
    within-partition sort so row groups inside each file stay tight.
    Write the result with any sink; parquet min/max stats then prune on
    BOTH columns. Columns must be non-negative integers; values are
    masked to ``bits`` low bits for the curve (ties beyond that keep
    their full-column order from the secondary sort)."""
    with_z = df.withColumn(
        "_z", zvalue(F.col(col_a), F.col(col_b), bits)
    )
    return (
        with_z.repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z", col_a, col_b)
        .drop("_z")
    )
