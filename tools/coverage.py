"""Emit COVERAGE.json: every declared query → its verification status.

Makes the driver-window bookkeeping visible in-repo (VERDICT r2 "What's
wrong" #3): which CORRECTNESS round most recently verified each query,
what kind of check it gets (value-hash oracle vs rows-only), and whether
it sits inside the driver's 50-row window for the NEXT round. The
registry itself rotates stalest-first (hdfs_mapreduce_spark/plans/
__init__.py), so ``in_next_window`` true for every stale query is the
invariant tests/test_coverage.py pins.

Run: python tools/coverage.py   (writes COVERAGE.json at the repo root)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def build_coverage() -> dict[str, dict[str, object]]:
    from hdfs_mapreduce_spark.plans import (
        DRIVER_WINDOW,
        ORACLE_SQL,
        QUERIES,
        last_green_rounds,
    )

    green = last_green_rounds(ROOT)
    names = list(QUERIES)  # already rotated stalest-first
    window = set(names[:DRIVER_WINDOW])
    return {
        name: {
            "last_green_round": green.get(name),
            "oracle_kind": "hash" if name in ORACLE_SQL else "rows_only",
            "in_next_window": name in window,
        }
        for name in sorted(names)
    }


def main() -> None:
    cov = build_coverage()
    out = ROOT / "COVERAGE.json"
    out.write_text(json.dumps(cov, indent=1, sort_keys=True) + "\n")
    n = len(cov)
    never = sum(1 for v in cov.values() if v["last_green_round"] is None)
    rounds = [
        v["last_green_round"]
        for v in cov.values()
        if v["last_green_round"] is not None
    ]
    latest = max(rounds) if rounds else 0
    stale = sum(1 for r in rounds if r < latest) + never
    windowed_stale = sum(
        1
        for v in cov.values()
        if v["in_next_window"]
        and (v["last_green_round"] or -1) < latest
    )
    print(
        f"{out.name}: {n} queries, {never} never verified, {stale} stale, "
        f"{windowed_stale} stale-in-next-window"
    )


if __name__ == "__main__":
    main()
