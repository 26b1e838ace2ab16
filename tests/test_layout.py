"""Z-order layout (operators/layout.py): the interleave must match a
bit-level reference, and the written files must actually exhibit the
pruning property — narrow min/max coverage on BOTH columns — that is
the operator's reason to exist."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.layout import (
    zorder_layout,
    zvalue,
    zvalue_sql,
)


def _ref_interleave(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_bitlevel_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535, 70000) for b in (0, 3, 64, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    ).collect()
    for r in got:
        # the expression keeps only the low 16 bits, like the reference
        assert r["z"] == _ref_interleave(r["a"] & 0xFFFF, r["b"] & 0xFFFF)
    # locality sanity: neighbors in either dimension stay numerically close
    assert abs(_ref_interleave(10, 10) - _ref_interleave(11, 10)) <= 3
    assert abs(_ref_interleave(10, 10) - _ref_interleave(10, 11)) <= 3


def test_zvalue_sql_twin_is_term_identical(spark):
    import duckdb

    con = duckdb.connect()
    expr = zvalue_sql("a", "b")
    for a, b in [(0, 0), (7, 9), (1234, 4321), (65535, 65535)]:
        want = _ref_interleave(a, b)
        got = con.execute(f"SELECT {expr} FROM (SELECT {a} AS a, {b} AS b)").fetchone()[0]
        assert got == want, (a, b)


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    """(min, max) of ``col`` per parquet data file, via row-group stats —
    the exact metadata a scan planner prunes with."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                cc = md.row_group(rg).column(c)
                if cc.path_in_schema == col and cc.statistics is not None:
                    s = cc.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def test_zorder_files_prune_on_both_columns(spark, tmp_path):
    """4096 rows over a 64×64 independent grid, 16 output files. A
    single-column sort gives perfect pruning on that column and NONE on
    the other (every file spans the full 0..63 domain). Z-order must
    leave every file covering a narrow slice of BOTH columns."""
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")

    zpath = str(tmp_path / "zorder")
    zorder_layout(df, "a", "b", n_partitions=16).write.parquet(zpath)
    spath = str(tmp_path / "sorted_a")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(
        spath
    )

    z_a, z_b = _file_ranges(zpath, "a"), _file_ranges(zpath, "b")
    s_b = _file_ranges(spath, "b")
    assert len(z_a) == len(z_b) == 16

    def mean_width(ranges):
        return sum(hi - lo for lo, hi in ranges) / len(ranges)

    # single-column sort: the unsorted column spans ~the whole domain
    assert mean_width(s_b) > 55
    # z-order: BOTH columns narrow — each file covers ~a 16x16 curve cell
    # (63 would mean no pruning; the Z curve gives ~quarter-domain tiles)
    assert mean_width(z_a) <= 24, z_a
    assert mean_width(z_b) <= 24, z_b
    # and the data survives intact
    back = spark.read.parquet(zpath)
    assert back.count() == 4096
    assert back.select(F.sum("a"), F.sum("b")).collect()[0] == (
        64 * 63 // 2 * 64,
        64 * 63 // 2 * 64,
    )
