"""Banded (range) join — `lower <= right.time - left.time <= upper` on a
shared key, the interval/time-proximity join the reference lacks and Spark
has no dedicated operator for.

A naive theta-join (`ON key AND r.t BETWEEN l.t+lower AND l.t+upper`) plans
as a per-key nested loop: quadratic in the hot keys, fatal at 100 TB. This
implementation is the standard bucketized equi-join:

  * bucket width w = upper - lower (so any qualifying pair is at most one
    bucket apart);
  * each left row explodes to the 2-3 buckets its window can touch
    (`sequence(floor((t+lower)/w), floor((t+upper)/w))`);
  * each right row lands in exactly one bucket;
  * equi-join on (key, bucket) — a plain hash shuffle Catalyst can plan,
    AQE can skew-split — then the exact band predicate filters residuals.

Shuffle volume is |L|·(2..3) + |R| rows, never |L|·|R| per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _us(name: str) -> Column:
    """Microseconds since epoch, accepting TIMESTAMP or TIMESTAMP_NTZ input
    (parquet `timestamp[us]` without tz reads as NTZ under Spark 4's
    inferTimestampNTZ, and `unix_micros` rejects NTZ). The NTZ→LTZ cast
    interprets wall time in the session zone; band_join only ever compares
    *differences* of these values, so the zone offset cancels and results
    are identical under any session timezone."""
    return F.unix_micros(F.col(name).cast("timestamp"))


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
) -> DataFrame:
    """Inner-join rows with equal keys whose times satisfy
    ``lower_us <= unix_micros(right.time) - unix_micros(left.time) <= upper_us``
    (both bounds inclusive, microsecond precision).

    Returns all left columns plus all right columns; callers select/alias.
    Column name collisions must be resolved by the caller (alias the inputs).

    The degenerate band ``lower_us == upper_us`` ("exactly N later") is a
    plain equi-join on (key, left.time + offset) — no bucketing, no
    explode, no residual filter.
    """
    if upper_us < lower_us:
        raise ValueError("band_join needs upper_us >= lower_us")
    if upper_us == lower_us:
        lt_exact = _us(left_time) + F.lit(lower_us)
        rt_exact = _us(right_time)
        return left.withColumn("__bb_l", lt_exact).join(
            right.withColumn("__bb_r", rt_exact),
            (F.col(left_key) == F.col(right_key))
            & (F.col("__bb_l") == F.col("__bb_r")),
        ).drop("__bb_l", "__bb_r")
    w = upper_us - lower_us

    lt = _us(left_time)
    rt = _us(right_time)

    def bucket(c: Column) -> Column:
        return F.floor(c / F.lit(w))

    l_b = left.withColumn(
        "__bb_l",
        F.explode(F.sequence(bucket(lt + F.lit(lower_us)), bucket(lt + F.lit(upper_us)))),
    )
    r_b = right.withColumn("__bb_r", bucket(rt))
    gap = _us(right_time) - _us(left_time)
    return (
        l_b.join(
            r_b,
            (F.col(left_key) == F.col(right_key)) & (F.col("__bb_l") == F.col("__bb_r")),
        )
        .filter((gap >= lower_us) & (gap <= upper_us))
        .drop("__bb_l", "__bb_r")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_us: int = 3600 * 1_000_000,
) -> DataFrame:
    """Interval-overlap join: equal keys whose closed intervals intersect
    (``l.start <= r.end AND r.start <= l.end``, microsecond precision) —
    the interval×interval sibling of band_join (sessions × incidents,
    reservations × outages; in genomics this is the range-overlap join).

    A theta-join plans as a per-key nested loop; here both sides explode
    into the ``bucket_us``-wide buckets their interval spans and equi-join
    on (key, bucket). A pair overlapping several shared buckets must
    surface once: it is kept only in the bucket of ``max(l.start,
    r.start)`` — the overlap's first instant, which by construction lies
    inside BOTH intervals, so exactly one joined row per qualifying pair
    survives with no distinct shuffle (band_join's first-bucket-wins).

    Shuffle volume is Σ interval_span/bucket_us over both sides; pick
    ``bucket_us`` near the typical interval length (buckets per row stay
    1-2). Long-tail intervals fan out linearly, never quadratically.
    """
    ls, le = _us(left_start), _us(left_end)
    rs, re_ = _us(right_start), _us(right_end)
    w = F.lit(bucket_us)

    l_b = left.withColumn(
        "__iv_l", F.explode(F.sequence(F.floor(ls / w), F.floor(le / w)))
    )
    r_b = right.withColumn(
        "__iv_r", F.explode(F.sequence(F.floor(rs / w), F.floor(re_ / w)))
    )
    overlap = (ls <= re_) & (rs <= le)
    credit = F.floor(F.greatest(ls, rs) / w) == F.col("__iv_l")
    return (
        l_b.join(
            r_b,
            (F.col(left_key) == F.col(right_key))
            & (F.col("__iv_l") == F.col("__iv_r")),
        )
        .filter(overlap & credit)
        .drop("__iv_l", "__iv_r")
    )
