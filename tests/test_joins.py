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
