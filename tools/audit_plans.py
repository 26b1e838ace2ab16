"""Audit: for every declared query, count Python-boundary nodes
(MapInPandas/ArrowEvalPython/BatchEvalPython/FlatMapGroupsInPandas),
Exchanges, and ReusedExchanges in the executed plan. Skips stream_*
queries (their callables execute a full pipeline eagerly).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
from hdfs_mapreduce_spark.session import get_spark
spark = get_spark("audit"); spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
sf = "/root/testdata/sf0.01"
rows = []
for name, fn in e.queries().items():
    if name.startswith("stream_"):
        continue
    t0 = time.perf_counter()
    try:
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception as exc:
        print(f"{name}: ERR {type(exc).__name__}")
        continue
    el = time.perf_counter() - t0
    py = sum(plan.count(k) for k in
             ("MapInPandas", "ArrowEvalPython", "BatchEvalPython",
              "FlatMapGroupsInPandas", "MapInArrow"))
    ex = plan.count("Exchange") - plan.count("ReusedExchange")
    rx = plan.count("ReusedExchange")
    scans = plan.count("Scan parquet")
    rows.append((name, py, ex, rx, scans, round(el, 2)))
print(f"{'query':36s} {'py':>3s} {'exch':>4s} {'reuse':>5s} {'scans':>5s} {'build_s':>7s}")
for name, py, ex, rx, scans, el in sorted(rows, key=lambda r: (-r[1], -r[3])):
    if py > 1 or rx > 0 or scans > 4:
        print(f"{name:36s} {py:3d} {ex:4d} {rx:5d} {scans:5d} {el:7.2f}")
print("-- rest (py<=1, no reuse, <=4 scans):",
      sum(1 for r in rows if not (r[1] > 1 or r[3] > 0 or r[4] > 4)))
spark.stop()
