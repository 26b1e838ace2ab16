"""Round-12 octave: the online-dedup STATE MAINTENANCE verbs at
sf1 -> sf10 (VERDICT r11 item 4). The round-8 octaves covered the
steady-state dedup queries and round 11b the ingest GATE; this measures
the lifecycle verbs the round-11/12 work added — ``resketch_state`` (a
full-corpus one-pass rebuild at a new b/r point), ``compact_state``
(full merge vs the size-tiered bounded run), and the
``resketch_recommended`` advisory — so two claims stop being
extrapolations:

  1. resketch tracks the accepted corpus AT WORST linearly (one
     shingle+minhash pass over the corpus plus one partitioned write —
     nothing hidden should be superlinear);
  2. compact_state tracks the live below-tail state; the TIERED run
     (``max_batches_per_run``) reads only its tier, so per-run cost is
     bounded by the tier's share of the state, not the stream's age.

Plus one flatness proof: the per-micro-batch driver LISTING RPC count
(glob_parent_names / list_child_names / exists through sources/fs.py)
is identical for an ingest against 2-batch-old state and 6-batch-old
state — stream age buys zero extra round trips per batch.

Protocol: same as the BENCH_SF3 rounds — one session per SF, plan
shapes pre-warmed with a full pass at sf0.1, min-of-2 per timed verb
with a FRESH copytree of the built state per repetition (every timed
maintenance run mutates real state), noop-free (the verbs force their
own writes), SPARK_GRAFT_DRIVER_MEM=16g for the sf10 session.

Usage: python tools/octave_dedup_state.py <sf_dir> [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = 6
TIER = 3  # tiered compaction reads the 3 smallest of the 5 below-tail dirs


def _count_fs_listings(fn):
    """Run ``fn`` with the sources/fs listing entry points wrapped in
    counters; return (result, {fn_name: calls})."""
    from hdfs_mapreduce_spark.sources import fs as hfs

    counted = ["glob_parent_names", "list_child_names", "exists"]
    calls: dict[str, int] = {}
    saved = {}

    def wrap(name, orig):
        def inner(*a, **kw):
            calls[name] = calls.get(name, 0) + 1
            return orig(*a, **kw)

        return inner

    for name in counted:
        saved[name] = getattr(hfs, name)
        setattr(hfs, name, wrap(name, saved[name]))
    try:
        result = fn()
    finally:
        for name, orig in saved.items():
            setattr(hfs, name, orig)
    return result, calls


def run_maintenance(spark, sf_dir: str) -> dict[str, object]:
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.operators.dedup import WIDE_BANDS, WIDE_PERM
    from hdfs_mapreduce_spark.operators.materialize import session_scratch_dir
    from hdfs_mapreduce_spark.sources.catalog import load_table
    from hdfs_mapreduce_spark.streaming.dedup import (
        compact_state,
        dedup_ingest_batch,
        read_accepted,
        resketch_recommended,
        resketch_state,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    batches = [docs.filter(F.col("doc_id") % N_BATCHES == i) for i in range(N_BATCHES)]
    scratch = session_scratch_dir(spark)
    os.makedirs(scratch, exist_ok=True)

    out: dict[str, object] = {"n_docs": n_docs}

    def fresh(tag):
        return os.path.join(scratch, f"octave_{tag}_{uuid.uuid4().hex[:8]}")

    # -- build the base state: N_BATCHES ingest rounds (setup, timed once;
    #    also the per-batch number the round-11 phase instrumentation
    #    cross-checks) --
    base = fresh("state")
    t0 = time.monotonic()
    for i, b in enumerate(batches):
        dedup_ingest_batch(b, i, base)
    out["ingest_6batches_sec"] = round(time.monotonic() - t0, 4)
    out["n_admitted"] = read_accepted(spark, base).count()

    def timed(key, fn, reps=2):
        best = min(fn() for _ in range(reps))
        out[key] = round(best, 4)
        return best

    def on_copy(verb):
        def run():
            s = fresh("copy")
            shutil.copytree(base, s)
            t0 = time.monotonic()
            verb(s)
            return time.monotonic() - t0

        return run

    # -- resketch: one-pass wide rebuild of the whole accepted corpus --
    timed(
        "resketch_wide_sec",
        on_copy(lambda s: resketch_state(spark, s, WIDE_PERM, WIDE_BANDS)),
    )

    # -- compaction: full merge (5 below-tail dirs) vs one tiered run
    #    (the TIER smallest) --
    timed("compact_full_sec", on_copy(lambda s: compact_state(spark, s, keep_last=1)))
    timed(
        "compact_tiered_sec",
        on_copy(
            lambda s: compact_state(
                spark, s, keep_last=1, max_batches_per_run=TIER
            )
        ),
    )

    # -- the advisory (read-only): one count over accepted state --
    timed("advisory_sec", lambda: _timeit(lambda: resketch_recommended(spark, base)))

    # -- ingest one more batch against resketch'd (wide) state: the gate
    #    at the migrated point --
    wide_state = fresh("wide")
    shutil.copytree(base, wide_state)
    resketch_state(spark, wide_state, WIDE_PERM, WIDE_BANDS)
    extra = docs.filter(F.col("doc_id") % 97 == 3)

    def do_ingest_wide():
        s = fresh("wideing")
        shutil.copytree(wide_state, s)
        t0 = time.monotonic()
        dedup_ingest_batch(extra, N_BATCHES, s)
        return time.monotonic() - t0

    timed("ingest_after_resketch_sec", do_ingest_wide)

    # -- RPC flatness: listing calls for one ingest at state age 2 vs 6 --
    young = fresh("young")
    os.makedirs(young, exist_ok=True)
    for i in range(2):
        dedup_ingest_batch(batches[i], i, young)
    probe = docs.filter(F.col("doc_id") % 97 == 5)
    _, young_calls = _count_fs_listings(
        lambda: dedup_ingest_batch(probe, 2, young)
    )
    aged = fresh("aged")
    shutil.copytree(base, aged)
    _, aged_calls = _count_fs_listings(
        lambda: dedup_ingest_batch(probe, N_BATCHES, aged)
    )
    out["rpc_listings_ingest_age2"] = young_calls
    out["rpc_listings_ingest_age6"] = aged_calls
    out["rpc_flat_with_age"] = sum(young_calls.values()) == sum(
        aged_calls.values()
    )
    return out


def _timeit(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from hdfs_mapreduce_spark.session import get_spark

    spark = get_spark("octave-dedup-state")
    spark.sparkContext.setLogLevel("ERROR")
    # warm every plan shape (codegen, Python workers) at the small SF
    run_maintenance(spark, "/root/testdata/sf0.1")
    result = {"sf_dir": sf_dir, **run_maintenance(spark, sf_dir)}
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
