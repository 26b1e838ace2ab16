"""Skew mitigation: deterministic salting for hot aggregation keys.

At 100 TB a handful of hot keys (empty documents, boilerplate tokens, null
user ids) concentrate a shuffle partition onto one executor. AQE's skew-join
splitting handles *joins*; for aggregations the classic fix is two-phase
salted aggregation:

    groupBy(key, salt) partial-agg   -- spreads a hot key over n_salts tasks
      → groupBy(key) final-agg       -- recombines the partials

Only algebraic aggregates survive re-aggregation (sum/count/min/max — avg is
computed as sum/count). The salt is deterministic (hash of a caller-chosen
distributor column, not rand()), so runs are reproducible and tests can
assert exact equality with the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {"sum", "count", "min", "max", "avg"}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    distributor: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output-column → (fn, input-col)
    with fn in {sum, count, min, max, avg}. ``distributor`` is any column
    with per-row variety (an id, a timestamp) used to derive the salt."""
    for fn, _ in aggs.values():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate cannot be salted: {fn}")

    salt = F.pmod(F.xxhash64(distributor), F.lit(n_salts)).alias("__salt")

    partial_cols, final_cols = [], []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_cols.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_cols.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_cols.append(F.sum(col).alias(f"__p_{out}"))
            final_cols.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_cols.append(F.min(col).alias(f"__p_{out}"))
            final_cols.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_cols.append(F.max(col).alias(f"__p_{out}"))
            final_cols.append(F.max(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_cols.append(F.sum(col).alias(f"__ps_{out}"))
            partial_cols.append(F.count(col).alias(f"__pc_{out}"))
            final_cols.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )

    partial = df.groupBy(*keys, salt).agg(*partial_cols)
    return partial.groupBy(*keys).agg(*final_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    distributor: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key with a deterministic
    hash of ``distributor`` and replicate every small-side row across all
    ``n_salts`` salt values, then equi-join on (key, salt). A hot key's rows
    spread over ``n_salts`` shuffle partitions instead of landing on one
    executor.

    This is the static-plan fallback for when AQE's runtime skew-join split
    isn't available (AQE off, or a key so hot a single split still spills).
    Small side grows ``n_salts``x — use only when |small| * n_salts stays
    broadcast-or-shuffle-cheap.

    ``how`` is restricted to inner/left (the directions that preserve the
    plain join's result exactly; asserted in tests): each big-side row
    carries exactly one salt, so unmatched big rows surface once under
    'left'. Under 'right'/'full' every *unmatched small-side* row would
    surface once per salt replica — n_salts null-padded duplicates — so
    those directions are rejected rather than silently wrong."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "unmatched small-side rows are replicated n_salts times under "
            "right/full outer joins"
        )
    salt = F.pmod(F.xxhash64(distributor), F.lit(n_salts))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = b.join(
        s, (b[big_key] == s[small_key]) & (b["__salt"] == s["__salt"]), how
    )
    return joined.drop("__salt")


def hot_keys(
    big: DataFrame,
    big_key: str,
    threshold: float = 4.0,
    top: int = 20,
) -> list:
    """The probe half of ``auto_salt_join``, shared with the declared
    ``profile_skew`` diagnostics: per-key counts (one map-side-combined
    groupBy), the 1-row (total, n_keys) stats, and the top-k loads —
    returning only the NON-NULL key values whose load exceeds
    ``threshold`` × the mean key load. NULL keys are excluded (they
    can't equi-join, so ``auto_salt_join`` handles them with no join at
    all — a NULL entry here would only waste a probe slot). Driver
    state is ≤ ``top`` rows at any corpus size; everything heavier
    stays engine-side."""
    counts = (
        big.filter(F.col(big_key).isNotNull())
        .groupBy(big_key)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    probe = (
        counts.orderBy(F.col("cnt").desc(), big_key)
        .limit(top)
        .crossJoin(F.broadcast(stats))
        .select(
            big_key,
            # cnt·n_keys as double: the long*long product wraps negative
            # past 2^63 under non-ANSI Spark (a 1e10-row hot key over 1e9
            # distinct keys), which would silently drop the hottest key —
            # disabling the mitigation exactly where it matters most.
            (
                (F.col("cnt").cast("double") * F.col("n_keys"))
                / F.col("total")
            ).alias("x_mean"),
        )
        .collect()
    )
    return [r[0] for r in probe if r["x_mean"] > threshold]


def auto_salt_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    distributor: str | Column,
    threshold: float = 4.0,
    top: int = 20,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Probe-then-plan skew join: measure the big side's key profile
    (``hot_keys`` — exactly what the declared ``profile_skew`` query
    reports), then salt ONLY the keys whose load exceeds ``threshold``
    × the mean. Hot rows take the salted (key, salt) join against the
    small side's hot slice replicated ``n_salts``×; everything else
    takes the plain equi-join untouched; the union is the result. This
    closes the loop the r6 verdict called out: previously a user had to
    eyeball profile_skew and hand-configure salted_join — and blanket
    salting replicates the WHOLE small side n_salts× when typically
    only a handful of keys are hot.

    Correctness: salting is distribution-only, so the result is ≡ the
    plain join for how='inner'/'left' (the declared query's oracle IS
    the plain join); 'right'/'full' are rejected UP FRONT with
    salted_join's rule — deferring that check to the hot path would
    make the call work for weeks on calm data and then crash the day a
    key crosses the threshold.

    NULL keys never equi-join, so they are the one skew class no join
    strategy can spread — and in real data the NULL group is often THE
    hot key. They skip the join entirely: dropped under 'inner' (a
    NULL key can't match), union-back null-padded under 'left' — a
    map-only path, so a billion NULL-keyed rows cost zero shuffle
    instead of hashing onto one cold-join partition.

    Cost: the probe is one map-side-combined count + a ``top``-row
    driver collect — the same pass AQE's runtime statistics get for
    free at the shuffle, spent here once to keep the salted plan
    static, reproducible, and AQE-independent. With no key above the
    threshold the plain join (minus the NULL-key fast path) is
    returned unchanged."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"auto_salt_join supports how='inner'|'left', got {how!r}: "
            "unmatched small-side rows are replicated n_salts times "
            "under right/full outer joins"
        )
    shared = set(big.columns) & set(small.columns)
    if shared:
        raise ValueError(
            "auto_salt_join requires disjoint column names between big "
            f"and small sides; shared: {sorted(shared)} — the left-join "
            "NULL-pad path selects small's columns alongside big's, and "
            "a shared name makes the unionByName ambiguous"
        )
    key_null = F.col(big_key).isNull()
    b_nn = big.filter(~key_null)
    hot = hot_keys(big, big_key, threshold, top)
    if hot:
        is_hot = F.coalesce(F.col(big_key).isin(hot), F.lit(False))
        salted = salted_join(
            b_nn.filter(is_hot),
            small.filter(F.col(small_key).isin(hot)),
            big_key,
            small_key,
            distributor,
            n_salts,
            how,
        )
        b_cold = b_nn.filter(~is_hot)
        out = salted.unionByName(
            b_cold.join(small, b_cold[big_key] == small[small_key], how)
        )
    else:
        out = b_nn.join(small, b_nn[big_key] == small[small_key], how)
    if how == "left":
        # NULL-keyed rows surface once, null-padded — no join touched
        nulls = big.filter(key_null).select(
            "*",
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in small.schema.fields
            ],
        )
        out = out.unionByName(nulls)
    return out
