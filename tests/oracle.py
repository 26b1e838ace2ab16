"""Order-insensitive Spark↔DuckDB result comparison, mirroring the driver's
correctness gate: sort columns by name, round doubles to 6 decimals, render
rows canonically, compare as multisets."""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 6):.6f}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        "|".join(_canon_value(row[i]) for i in order) for row in rows
    )


def spark_result(df):
    rows = df.collect()
    return df.columns, [tuple(r) for r in rows]


def duckdb_result(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_matches_oracle(df, con, sql: str, name: str = "?"):
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duckdb_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_canon, d_canon = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        only_s = list((s_canon - d_canon).items())[:5]
        only_d = list((d_canon - s_canon).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n only in spark: {only_s}\n only in duckdb: {only_d}"
        )
