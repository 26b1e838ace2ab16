"""Dump the `.explain("formatted")` physical plan of declared queries to
plans/<round>/<query>_<suffix>.txt — the judge-facing before/after
evidence.

Run: python tools/explain_query.py <suffix> <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
     SPARK_GRAFT_PLAN_DIR (default r13 — the round subdir under plans/).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Match the committed bench session shape so the captured plans are the
# plans the bench actually executes (AQE off, 8 shuffle partitions).
os.environ.setdefault("SPARK_GRAFT_AQE", "false")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry
    from hdfs_mapreduce_spark.session import get_spark

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
