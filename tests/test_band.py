"""Banded (range) join: exact window semantics on a crafted fixture, and the
no-blowup plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.band import band_join


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 100, datetime(2024, 1, 1, 0, 0, 0)),
            (1, 101, datetime(2024, 1, 1, 1, 0, 0)),
            (2, 102, datetime(2024, 1, 1, 0, 0, 0)),
        ],
        "k long, lid long, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 200, datetime(2024, 1, 1, 0, 0, 0)),      # gap 0 → in (inclusive)
            (1, 201, datetime(2024, 1, 1, 0, 10, 0)),     # gap 600s → in (boundary)
            (1, 202, datetime(2024, 1, 1, 0, 10, 0, 1)),  # gap 600s+1us → out
            (1, 203, datetime(2023, 12, 31, 23, 59, 59)), # negative gap → out
            (2, 204, datetime(2024, 1, 1, 0, 5, 0)),      # other key, in
            (3, 205, datetime(2024, 1, 1, 0, 0, 0)),      # key with no left
        ],
        "rk long, rid long, rt timestamp",
    )
    return left, right


def test_band_join_window_semantics(spark):
    left, right = _fixture(spark)
    out = band_join(
        left, right, "k", "rk", "lt", "rt", lower_us=0, upper_us=600 * 1_000_000
    )
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    assert pairs == {(100, 200), (100, 201), (102, 204)}


def test_band_join_no_duplicate_pairs(spark):
    """Each qualifying pair appears exactly once (right row has one bucket)."""
    left, right = _fixture(spark)
    out = band_join(
        left, right, "k", "rk", "lt", "rt", lower_us=0, upper_us=600 * 1_000_000
    ).groupBy("lid", "rid").count()
    assert all(r["count"] == 1 for r in out.collect())


def test_band_join_plan_no_nested_loop(spark):
    left, right = _fixture(spark)
    out = band_join(
        left, right, "k", "rk", "lt", "rt", lower_us=0, upper_us=600 * 1_000_000
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_band_join_degenerate_exact_offset(spark):
    """lower == upper ('exactly N later') is a plain equi-join on
    (key, time + offset) — well-defined, no bucketing."""
    left, right = _fixture(spark)
    out = band_join(
        left, right, "k", "rk", "lt", "rt",
        lower_us=600 * 1_000_000, upper_us=600 * 1_000_000,
    )
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    assert pairs == {(100, 201)}  # exactly 600s later; 202 is 1us off
