"""Join prefilters: Bloom-filter semi-join reduction.

The 100 TB problem this solves: a semi/inner join of a huge fact table
against a dim that is too big to broadcast normally shuffles the ENTIRE
fact on the join key — even though only a small fraction survives. A Bloom
filter over the dim's keys is kilobytes at any realistic dim size,
broadcasts trivially, and drops non-matching fact rows at scan time, so
the shuffle moves only (survivors + false positives). The exact join
afterwards removes the false positives — the result is provably identical
to the plain join, which is exactly what the declared query's oracle
checks (plans/analytics_plans.py:events_bloom_semi).

Spark plants the same construct automatically as a *runtime* filter
(spark.sql.optimizer.runtime.bloomFilter.enabled) when its cost model
fires; the aggregate it uses (BloomFilterAggregate) is optimizer-internal
and not SQL-invocable, so this module builds the filter in plain
relational algebra — which also keeps it materializable and reusable
across queries:

  build:  keys × k seeded xxhash64 → bit position → (slot, bit_or mask)
          aggregate → one map<slot, mask> row (m/64 entries ≈ KBs)
  probe:  broadcast cross join + k codegen'd mask tests, no UDF

Everything stays inside whole-stage codegen on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# k=3 seeded hashes with ~9.6 bits/key gives ≈ 2.5% false positives
# (p = (1 - e^{-k n/m})^k); the prefilter only needs to be selective,
# not exact — the verifying join eats the FP tail.
BLOOM_K = 3
BLOOM_BITS_PER_KEY = 10


def _pos_sql(key_col: str, seed: int, m_bits: int) -> str:
    # k distinct hashes = xxhash64 over (key, seed) — the seed rides along
    # as a hashed column, giving independent bit positions per seed.
    return f"pmod(xxhash64({key_col}, {seed}), CAST({m_bits} AS BIGINT))"


def bloom_build(keys: DataFrame, key_col: str, est_keys: int) -> DataFrame:
    """One-row DataFrame with a ``map<long, long>`` Bloom filter (slot →
    64-bit mask) over ``keys[key_col]``. m is rounded up to a multiple of
    64; the aggregate output is m/64 rows shrunk to one map row — KBs for
    any dim that was ever too big to broadcast raw. (SQL expr fragments,
    not Column ops: the Python API wants literal shift amounts.)"""
    m_bits = ((est_keys * BLOOM_BITS_PER_KEY + 63) // 64) * 64
    pos_array = ", ".join(
        _pos_sql(key_col, s, m_bits) for s in range(BLOOM_K)
    )
    slots = (
        keys.select(F.explode(F.expr(f"array({pos_array})")).alias("pos"))
        .select(
            F.expr("pos DIV 64").alias("slot"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("slot")
        .agg(F.bit_or("bit").alias("mask"))
    )
    return slots.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("slot", "mask")))
        ).alias("__bloom")
    )


def bloom_might_contain(key_col: str, m_bits: int) -> Column:
    """Membership test against the ``__bloom`` map column (attach the
    ``bloom_build`` row via a broadcast cross join first)."""
    tests = []
    for seed in range(BLOOM_K):
        p = _pos_sql(key_col, seed, m_bits)
        tests.append(
            f"((shiftrightunsigned("
            f"coalesce(element_at(__bloom, ({p}) DIV 64), CAST(0 AS BIGINT)), "
            f"CAST(({p}) % 64 AS INT)) & 1) = 1)"
        )
    return F.expr(" AND ".join(tests))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    est_keys: int = 100_000,
) -> DataFrame:
    """``big`` semi-join ``small`` with a Bloom prefilter on the big side.

    Returns the rows of ``big`` whose ``big_key`` appears in ``small``
    (exact — false positives are removed by a real left-semi join). The
    filter build is one tiny aggregate over the dim's keys; the probe is
    k codegen'd mask tests per fact row, before any exchange.
    """
    m_bits = ((est_keys * BLOOM_BITS_PER_KEY + 63) // 64) * 64
    bloom = bloom_build(small.select(small_key), small_key, est_keys)
    prefiltered = (
        big.join(F.broadcast(bloom))
        .filter(bloom_might_contain(big_key, m_bits))
        .drop("__bloom")
    )
    return prefiltered.join(
        small.select(small_key),
        prefiltered[big_key] == F.col(small_key),
        "left_semi",
    )
