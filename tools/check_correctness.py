"""Run every `queries()` / `oracle_sql()` pair side-by-side, mimicking the
driver's correctness gate at sf0.01: row count, schema, and an
order-insensitive value hash computed via pandas (sort columns by name,
``sort_values`` over all columns, round doubles to 6 decimals).

Run: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry
from hdfs_mapreduce_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(6)
    # The driver's canonicalizer sorts with pandas — unhashable cells
    # (lists/arrays/dicts) make this throw, which is itself a failure mode
    # we need to detect, so do NOT pre-stringify.
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f")
    return hashlib.sha256(payload.encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry.queries()
    oracles = entry.oracle_sql()
    report: dict[str, dict] = {}
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
            if name not in oracles:
                rec["status"] = "no_oracle"
                report[name] = rec
                continue
            odf = con.execute(oracles[name]).df()
            rec["oracle_rows"] = len(odf)
            rec["rows_match"] = len(sdf) == len(odf)
            rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            if not rec["schema_match"]:
                rec["spark_cols"] = sorted(sdf.columns)
                rec["oracle_cols"] = sorted(odf.columns)
            rec["hash_match"] = (
                rec["schema_match"] and _canon(sdf) == _canon(odf)
            )
            rec["status"] = (
                "pass"
                if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                else "FAIL"
            )
        except Exception as e:  # noqa: BLE001
            rec["status"] = "ERR"
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        if rec["status"] in ("FAIL", "ERR"):
            failed.append(name)
        print(f"{rec['status']:>9}  {name}", flush=True)
        report[name] = rec
    print(json.dumps({k: v for k, v in report.items() if v["status"] != "pass"}, indent=2))
    print(f"{len(report) - len(failed)}/{len(report)} pass; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
