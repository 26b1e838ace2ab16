"""Decompose one declared query's wall-clock into Spark job time vs
inter-job driver gaps (Catalyst analysis, codegen, streaming offset/
commit bookkeeping) — the measurement behind the r12/r13 streaming-
family work: at sf0.1 these queries are mostly driver-side fixed
machinery, and this tool is how that claim is quantified per change.

Usage: python tools/decompose_query.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), bench.py's session knobs.

Protocol: bench session config, one warm pass at the warm SF (codegen/
plan compilation excluded, same as bench.py), then ONE timed execution
with the noop sink; job rows come from the JVM AppStatusStore
(submission/completion per job), gap = wall − Σ job durations, and
overlapping jobs are merged interval-wise so concurrent jobs are not
double-counted. Phase tables (plans/streaming_plans.PHASE_SEC and
streaming/dedup.PHASE_TOTALS when present) print alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _merged_job_seconds(spark) -> tuple[float, int]:
    """Sum of job wall-clock with overlaps merged, + job count."""
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.jobsList(None).iterator()
    spans = []
    while it.hasNext():
        j = it.next()
        sub = j.submissionTime()
        com = j.completionTime()
        if sub.isEmpty() or com.isEmpty():
            continue
        spans.append(
            (sub.get().getTime() / 1000.0, com.get().getTime() / 1000.0)
        )
    spans.sort()
    total = 0.0
    cur_s = cur_e = None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total, len(spans)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: decompose_query.py <query> [<query> ...]")
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")

    from hdfs_mapreduce_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("decompose")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001"
    )
    for name in names:
        fn = queries[name]
        try:
            fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"warm {name} FAILED: {exc}", file=sys.stderr)
        base_job, base_n = _merged_job_seconds(spark)
        spark.sparkContext.setJobDescription(f"decompose:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        job, n = _merged_job_seconds(spark)
        out = {
            "query": name,
            "wall_sec": round(wall, 3),
            "job_sec_merged": round(job - base_job, 3),
            "driver_gap_sec": round(wall - (job - base_job), 3),
            "n_jobs": n - base_n,
        }
        try:
            from hdfs_mapreduce_spark.plans.streaming_plans import PHASE_SEC

            if name in PHASE_SEC:
                out["phase_sec"] = PHASE_SEC[name]
        except Exception:
            pass
        try:
            from hdfs_mapreduce_spark.streaming.dedup import PHASE_TOTALS

            if PHASE_TOTALS:
                out["dedup_phase_totals"] = {
                    k: round(v, 3) for k, v in PHASE_TOTALS.items()
                }
                PHASE_TOTALS.clear()
        except Exception:
            pass
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
