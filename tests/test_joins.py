"""Bloom-prefiltered semi join: exactness vs the plain join, and genuine
prefilter selectivity (the point of the construct at 100 TB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.functions.joins import (
    BLOOM_BITS_PER_KEY,
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


def test_bloom_semi_join_equals_plain_semi_join(spark):
    big = spark.range(0, 20_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    small = spark.range(0, 20_000, 37).select(F.col("id").alias("sk"))  # ~541 keys
    got = bloom_semi_join(big, small, "k", "sk", est_keys=1_000)
    want = big.join(small, big.k == small.sk, "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == small.count()


def test_bloom_prefilter_is_selective(spark):
    """The Bloom stage alone must pass all members and only a small FP tail
    of non-members — otherwise it saves no shuffle volume at scale."""
    n_keys = 500
    small = spark.range(n_keys).select(F.col("id").alias("sk"))
    big = spark.range(0, 50_000).select(F.col("id").alias("k"))
    m_bits = ((n_keys * BLOOM_BITS_PER_KEY + 63) // 64) * 64
    bloom = bloom_build(small, "sk", n_keys)
    passed = (
        big.join(F.broadcast(bloom))
        .filter(bloom_might_contain("k", m_bits))
        .count()
    )
    # all 500 members pass; FP rate over the 49.5k non-members stays under 10%
    assert passed >= n_keys
    assert passed - n_keys < 0.10 * (50_000 - n_keys)


def test_asof_join_tolerance_matches_pandas_merge_asof(spark):
    """as_of_join with tolerance_us must agree with pandas.merge_asof
    (direction='backward', tolerance) on random keyed series — an
    independent reference implementation of the same semantics. Right
    (key, time) pairs are unique so tie-break conventions can't differ."""
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    from hdfs_mapreduce_spark.operators.asof import as_of_join

    rng = random.Random(5)
    base = datetime(2024, 1, 1)
    right_rows = []
    used = set()
    for _ in range(120):
        k = rng.randrange(4)
        t = rng.randrange(0, 10_000)
        if (k, t) in used:
            continue
        used.add((k, t))
        right_rows.append(
            (k, base + timedelta(seconds=t), float(len(right_rows)), len(right_rows))
        )
    left_rows = [
        (i, rng.randrange(4), base + timedelta(seconds=rng.randrange(0, 10_000)))
        for i in range(200)
    ]
    left = spark.createDataFrame(
        left_rows, "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        right_rows, "rk long, rts timestamp, v double, tb long"
    )
    tol_s = 500
    got = {
        r["id"]: r["v"]
        for r in as_of_join(
            left, right,
            left_key="k", right_key="rk",
            left_time="ts", right_time="rts",
            value_cols=["v"], right_tiebreak="tb",
            tolerance_us=tol_s * 1_000_000,
        ).collect()
    }
    lpdf = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(
        right_rows, columns=["k", "rts", "v", "tb"]
    ).sort_values("rts")
    merged = pd.merge_asof(
        lpdf, rpdf, left_on="ts", right_on="rts", by="k",
        direction="backward", tolerance=pd.Timedelta(seconds=tol_s),
    )
    want = {
        int(r.id): (None if pd.isna(r.v) else float(r.v))
        for r in merged.itertuples()
    }
    assert got == want
    # and without tolerance, our result matches pandas with none either
    got_nt = {
        r["id"]: r["v"]
        for r in as_of_join(
            left, right,
            left_key="k", right_key="rk",
            left_time="ts", right_time="rts",
            value_cols=["v"], right_tiebreak="tb",
        ).collect()
    }
    merged_nt = pd.merge_asof(
        lpdf, rpdf, left_on="ts", right_on="rts", by="k",
        direction="backward",
    )
    want_nt = {
        int(r.id): (None if pd.isna(r.v) else float(r.v))
        for r in merged_nt.itertuples()
    }
    assert got_nt == want_nt


def test_asof_join_forward_matches_pandas(spark):
    """direction='forward' (next event at or after the left time) must
    agree with pandas.merge_asof(direction='forward'), with and without
    tolerance, on random keyed series with unique right (key, time)."""
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    from hdfs_mapreduce_spark.operators.asof import as_of_join

    rng = random.Random(9)
    base = datetime(2024, 1, 1)
    right_rows, used = [], set()
    for _ in range(120):
        k, t = rng.randrange(4), rng.randrange(0, 10_000)
        if (k, t) in used:
            continue
        used.add((k, t))
        right_rows.append(
            (k, base + timedelta(seconds=t), float(len(right_rows)),
             len(right_rows))
        )
    left_rows = [
        (i, rng.randrange(4), base + timedelta(seconds=rng.randrange(0, 10_000)))
        for i in range(200)
    ]
    left = spark.createDataFrame(left_rows, "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        right_rows, "rk long, rts timestamp, v double, tb long"
    )
    lpdf = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(
        right_rows, columns=["k", "rts", "v", "tb"]
    ).sort_values("rts")
    for tol_s in (None, 300):
        got = {
            r["id"]: r["v"]
            for r in as_of_join(
                left, right,
                left_key="k", right_key="rk",
                left_time="ts", right_time="rts",
                value_cols=["v"], right_tiebreak="tb",
                direction="forward",
                tolerance_us=None if tol_s is None else tol_s * 1_000_000,
            ).collect()
        }
        merged = pd.merge_asof(
            lpdf, rpdf, left_on="ts", right_on="rts", by="k",
            direction="forward",
            tolerance=None if tol_s is None else pd.Timedelta(seconds=tol_s),
        )
        want = {
            int(r.id): (None if pd.isna(r.v) else float(r.v))
            for r in merged.itertuples()
        }
        assert got == want, f"tolerance={tol_s}"
