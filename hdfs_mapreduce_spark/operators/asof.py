"""As-of (point-in-time) join — a core operator the reference lacks and Spark
has no built-in for.

``as_of_join(left, right, ...)`` attaches, to every left row, the most recent
right row for the same key with right.time <= left.time (``direction=
"backward"``, the default) or the earliest with right.time >= left.time
(``"forward"``), optionally bounded by a staleness tolerance.

Implementation is the scale-correct union + forward-fill formulation, NOT a
range join: a ``t <= T`` theta-join explodes quadratically per key, while this
plan is one union, one shuffle on the key, one window sort:

    union(left-tagged, right-tagged)
      → Window.partitionBy(key).orderBy(time, side, tiebreak)
      → last_value(right_cols, ignoreNulls) forward-fill
      → keep left rows

In the backward direction right rows sort *before* left rows at equal time
(side 0 < 1), so ties are inclusive (right at exactly left.time is
visible); the forward direction mirrors the tags and uses first_value
over the following frame. With multiple right rows at the same
(key, time), the tiebreak column decides deterministically — which also
makes the DuckDB oracle (same window formulation) hash-exact, something
DuckDB's native ASOF JOIN wouldn't guarantee under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    right_tiebreak: str,
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Columns of the result: all of ``left`` plus ``value_cols`` (nullable —
    null when no right row matches in the chosen direction).

    All value columns forward-fill as ONE struct (left rows carry a NULL
    struct, so ignoreNulls skips them atomically) — a single last_value
    evaluation over the sorted run instead of len(value_cols) independent
    ones.

    ``direction`` (pandas merge_asof semantics, both ends inclusive):
    ``"backward"`` takes the most recent right row with time <= left
    time (the default — a point-in-time quote lookup); ``"forward"``
    takes the EARLIEST right row with time >= left time (next-event
    attribution), as first_value over the following frame — same plan,
    mirrored window. Ties at equal (key, time) resolve by the tiebreak
    column in both directions (largest wins backward, smallest forward —
    the row "nearest" in the scan order either way).

    ``tolerance_us`` bounds staleness (backward: left - right, forward:
    right - left): a match farther than that many microseconds fills
    null instead of silently joining. Implemented by carrying the
    matched right time inside the fill struct and gating the projection;
    the plan (one union, one key shuffle, one window) is unchanged."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    from pyspark.sql.types import StructField, StructType

    # NTZ-safe epoch micros (same rationale as band._us: only DIFFERENCES
    # are compared, so a constant session-zone offset cancels; caveat for
    # NTZ inputs, as for band_join: wall times inside a DST transition of
    # the session zone are ambiguous, so run with a fixed-offset session
    # zone — the default session is UTC — when time columns are NTZ)
    def _us(col):
        return F.unix_micros(col.cast("timestamp"))

    lcols = left.columns
    # the matched right time rides in the fill struct ONLY when a
    # tolerance needs it — unbounded callers shouldn't pay the extra
    # per-row timestamp through the union/shuffle/window
    rt_fields = (
        [StructField("__rt", right.schema[right_time].dataType)]
        if tolerance_us is not None
        else []
    )
    vtype = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
        + rt_fields
    )
    backward = direction == "backward"
    # backward: right rows sort BEFORE left at equal time (side 0 < 1) so
    # equal-time matches are visible to last_value over the preceding
    # frame; forward mirrors it — right AFTER left (1 > 0), first_value
    # over the following frame.
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1 if backward else 0).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(vtype).alias("__v"),
    )
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0 if backward else 1).alias("__side"),
        F.col(right_tiebreak).cast("long").alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            *([F.col(right_time).alias("__rt")] if tolerance_us is not None else []),
        ).alias("__v"),
    )
    base_w = Window.partitionBy("__k").orderBy(
        F.col("__t"), F.col("__side"), F.col("__tb")
    )
    if backward:
        w = base_w.rowsBetween(Window.unboundedPreceding, 0)
        fill = F.last("__v", ignorenulls=True).over(w)
    else:
        w = base_w.rowsBetween(0, Window.unboundedFollowing)
        fill = F.first("__v", ignorenulls=True).over(w)
    filled = l.unionByName(r).select("*", fill.alias("__f"))
    if tolerance_us is None:
        keep = F.col("__f").isNotNull()
    elif backward:
        keep = F.col("__f").isNotNull() & (
            _us(F.col("__t")) - _us(F.col("__f.__rt")) <= tolerance_us
        )
    else:
        keep = F.col("__f").isNotNull() & (
            _us(F.col("__f.__rt")) - _us(F.col("__t")) <= tolerance_us
        )
    return filled.filter(F.col("__side") == (1 if backward else 0)).select(
        *[F.col(c) for c in lcols],
        *[F.when(keep, F.col("__f")[c]).otherwise(None).alias(c) for c in value_cols],
    )
