"""Warehouse analytics queries: multi-join TPC-H-shaped plans, JSON
extraction, exact percentiles, and statistical outlier detection.

These extend the declared set past the reference's single-table MapReduce
ceiling (SURVEY §2.6-§2.9): the reference has no join machinery at all —
every query here is the Spark-native completion of its partition+shuffle
primitives (dfs/compute_engine/compute_engine.go:96-142), expressed
declaratively so Catalyst owns join order, broadcast choice, and pushdown.

Scale notes per query are in the docstrings; the common posture: constant
dims (nation/region) are broadcast explicitly, fact-fact joins shuffle on
their keys and stay AQE-re-plannable, filters sit against the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs_mapreduce_spark.sources.catalog import load_table

# Shared literals (both faces read these so they cannot drift).
Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-01-01"
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1997-01-01", "1999-01-01"
Q10_FROM, Q10_TO = "1998-01-01", "1999-01-01"
ANOMALY_Z = 3.0


def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 open orders by in-flight revenue.

    customer(filtered segment) ⋈ orders(date-pruned) ⋈ lineitem(date-pruned).
    Both date predicates push to the parquet scans; customer is the small
    side after its segment filter (1/5 of customers) — Catalyst/AQE picks
    broadcast vs shuffle by runtime size, which is exactly the decision we
    want automated at 100 TB. lineitem is written as the streamed (left)
    side of its join so the fact table is never a hash-build candidate:
    with it on the right, local AQE happily broadcasts the whole filtered
    fact (measured 3-7x slower from the hash-relation build alone), and at
    100 TB the same written shape would pick the build side exactly wrong.
    The final top-10 is TakeOrderedAndProject on the aggregated (orderkey)
    domain — no global sort."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


def tpch_q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for one region, six-table join.

    region(5 rows) and nation(25 rows) are broadcast — constant size at any
    SF. supplier joins lineitem on suppkey with the TPC-H "local supplier"
    constraint c_nationkey = s_nationkey applied as a post-join filter.
    lineitem is the streamed (left) side throughout — see tpch_q3_shipping
    for why the fact table must never be a hash-build candidate. orders,
    customer and supplier broadcast at small SF via AQE; at 100 TB they
    grow past the threshold and the same written plan degrades gracefully
    to shuffle joins on orderkey/custkey/suppkey."""
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q5_REGION)
        .select("r_regionkey")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation_in = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation_in), F.col("s_nationkey") == nation_in.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter-year window. lineitem is pre-filtered to returnflag='R' before
    the join (the selective predicate goes under the shuffle), streamed on
    the left so it is never the hash-build side (see tpch_q3_shipping),
    aggregation is partial→final on c_custkey, and the top-20 never sorts
    the world."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (§2.9): events.props is a JSON document; pull
    $.k out as an integer and aggregate it per event type. get_json_object
    runs JVM-side (Jackson) inside whole-stage codegen — the reference
    would need a custom plugin binary for this (SURVEY §2.11)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("k").alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q24_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the non-sketch twin of
    q17_approx_quantiles). Exact percentile requires the full sorted value
    set per group — fine when the group count is bounded (5 event types);
    at unbounded cardinality the sketch variant is the scale path, which is
    why both are declared."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
        )
        .orderBy("event_type")
    )


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outliers: events whose value is more than 3 sample
    standard deviations from their event type's mean. The per-type moments
    are a tiny aggregate (one row per type) joined back by broadcast — two
    passes over the fact table, no wide shuffle of the facts themselves.
    The count-per-type output keeps the declared result stable (individual
    outlier ids are already covered by q6-style scans)."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("mu")) > ANOMALY_Z * F.col("sigma"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.min("value").alias("min_val"),
            F.max("value").alias("max_val"),
        )
        .orderBy("event_type")
    )


HLL_BOUND = 0.10  # lgConfigK=12 → rse ~1.6%; 10% is >6 sigma


def events_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Datasketches HLL): per-day user
    sketches unioned into a corpus total, next to the direct single-pass
    sketch. At 100 TB this is THE pattern for distinct counts over
    arbitrary slices: materialize per-partition sketches once, answer any
    rollup by register-wise union — never rescan. The estimates are
    engine-specific, so the emitted relation carries the exact facts plus
    two booleans the oracle pins with literal TRUEs: the MERGED estimate
    sits inside the sketch's error bound of the exact distinct count, and
    so does the direct one. The merged claim was originally
    ``merged == direct bit-for-bit`` — true register-for-register, but
    Datasketches promotes sparse→dense at a coupon threshold and the
    union path can promote when the direct path hasn't, so the ESTIMATES
    diverge exactly at the mode boundary (the round-9 sf0.1 sweep caught
    it: 1,500 distinct users sits at the lgK=12 promotion edge — green at
    sf0.01, false at sf0.1). The guarantee a rollup consumer actually
    relies on is the estimator's error bound, which is mode-independent
    and scale-invariant — that is what the hash now certifies (promoted
    from rows-only in round 4; claim made scale-invariant in round 9)."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    per_day = events.select(day, "user_id").groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_day.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("users_merged"),
    )
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("users_direct"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return merged.crossJoin(direct).select(
        "n_days",
        "exact_users",
        (
            F.abs(F.col("users_merged") - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(HLL_BOUND)
        ).alias("merged_within_bound"),
        (
            F.abs(F.col("users_direct") - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(HLL_BOUND)
        ).alias("within_bound"),
    )


def events_cm_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of event user ids (operators/sketches.py): the
    depth x width counter grid, built in one corpus pass with map-side
    partials. The cells are exact GROUP BY counts over the shared h56
    bucket hash, so the whole sketch relation has an exact SQL twin —
    declared in round 4 (was pytest-only: tests/test_sketches.py bound
    and merge checks)."""
    from hdfs_mapreduce_spark.operators.sketches import cm_sketch

    events = load_table(spark, sf_dir, "events")
    return cm_sketch(
        events.select(F.col("user_id").cast("string").alias("uid")), "uid"
    ).orderBy("row", "bucket")


BLOOM_SEGMENT = "BUILDING"


def events_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join (functions/joins.py): events by users in
    one customer segment. The Bloom filter built from the dim's keys drops
    non-matching fact rows at scan time; the verifying semi join removes
    false positives, so the oracle — the PLAIN semi join — proves the
    prefilter is invisible to the result. At 100 TB this cuts the fact
    shuffle to (matches + ~2% FP) instead of every row."""
    from hdfs_mapreduce_spark.functions.joins import bloom_semi_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    dim = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == BLOOM_SEGMENT
    )
    kept = bloom_semi_join(events, dim, "user_id", "c_custkey")
    return (
        kept.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .orderBy("event_type")
    )


HIST_WIDTH = 10.0


def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type — the distribution
    profile a pipeline checks before choosing filters/clamps. Bucket =
    floor(value / width): a pure map expression, so the whole histogram is
    one partial→final aggregate on the tiny (type, bucket) domain; no
    sort, no sketch, exact at any scale."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / HIST_WIDTH).cast("long")
    return (
        events.groupBy(F.col("event_type"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


QHIST_BINS = 64
QHIST_QS = [0.25, 0.5, 0.9, 0.99]


def events_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-interpolated quantiles per event type — the
    DETERMINISTIC scalable quantile path between q24's exact percentile
    (needs the full sorted set per group) and q17's approx sketch
    (rank-error-bounded but engine-specific): two aggregate passes
    (min/max/count, then fixed-bin counts), cumulative over the B-row
    bin domain, linear interpolation inside the selected bin. The
    estimate lands within ONE BIN WIDTH of the rank-⌈qN⌉ order
    statistic (the selected bin provably contains it; interpolated
    definitions of "percentile" can additionally sit between sparse
    tail values — tests pin the order-statistic bound), the state is
    O(B) per group and MERGEABLE
    (bin counts add) — the shape a streaming sink or a 1000-way partial
    aggregation preserves exactly. Every arithmetic step is identical
    scalar math on both engines (no float accumulations beyond integer
    counts), so unlike the sketch this carries a full hash oracle.
    Entirely relational: the min/max pass joins back as a broadcast
    (one row per type), no driver collect."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count(F.lit(1)).alias("n_total"),
    )
    binned = (
        events.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "n_total",
            "vmin",
            "vmax",
            F.least(
                F.lit(QHIST_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * QHIST_BINS
                ).cast("int"),
            ).alias("bin"),
        )
        .groupBy("event_type", "n_total", "vmin", "vmax", "bin")
        .agg(F.count(F.lit(1)).alias("n_bin"))
    )
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = binned.withColumn("cum", F.sum("n_bin").over(w))
    qs = spark.createDataFrame([(q,) for q in QHIST_QS], "q double")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("target", F.col("q") * F.col("n_total"))
        .filter(F.col("cum") >= F.col("target"))
    )
    pick = Window.partitionBy("event_type", "q").orderBy("bin")
    width = (F.col("vmax") - F.col("vmin")) / QHIST_BINS
    est = F.when(F.col("vmax") == F.col("vmin"), F.col("vmin")).otherwise(
        F.col("vmin")
        + width
        * (
            F.col("bin")
            + (F.col("target") - (F.col("cum") - F.col("n_bin")))
            / F.col("n_bin")
        )
    )
    return (
        hit.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "q",
            (F.round(est, 6) + F.lit(0.0)).alias("est"),
        )
        .orderBy("event_type", "q")
    )


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table: per-column null counts,
    distinct counts, and numeric min/max — the reference's `stats` verb
    (dfs/storageNode/stats.go:43-108) upgraded from byte counters to
    content profiling. One pass, every statistic an algebraic or
    distinct-style aggregate; emitted as one row per profiled column so
    the result shape survives schema growth."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            c
            for name in ("o_custkey", "o_totalprice", "o_orderdate")
            for c in (
                F.sum(F.col(name).isNull().cast("long")).alias(f"nulls_{name}"),
                F.count_distinct(F.col(name)).alias(f"distinct_{name}"),
            )
        ],
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    cols = ["o_custkey", "o_totalprice", "o_orderdate"]
    per_col = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col(f"nulls_{name}").alias("n_nulls"),
                F.col(f"distinct_{name}").alias("n_distinct"),
            )
            for name in cols
        ]
    )
    return (
        agg.select(
            "n_rows", "min_price", "max_price", F.explode(per_col).alias("c")
        )
        .select(
            F.col("c.col_name").alias("col_name"),
            F.col("c.n_nulls").alias("n_nulls"),
            F.col("c.n_distinct").alias("n_distinct"),
            "n_rows",
            "min_price",
            "max_price",
        )
        .orderBy("col_name")
    )


SKEW_SALTS = 8


def events_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-dim enrichment: events left-join customer on
    user_id via the deterministic salted join (functions/skew.py), then
    revenue-by-segment. The declared query pins the salted plan as the
    *verified* path — the oracle is the plain join, so the check proves
    salting changes the distribution, never the answer. At 100 TB this is
    the shape for a hot-key join where AQE's runtime skew split isn't
    enough (one user id owning a measurable fraction of the fact table);
    the small side replicates SKEW_SALTS times, the hot key spreads over
    SKEW_SALTS shuffle partitions."""
    from hdfs_mapreduce_spark.functions.skew import salted_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(
        events, cust, "user_id", "c_custkey", distributor="event_id",
        n_salts=SKEW_SALTS, how="left",
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


# auto_salt_join's declared knobs: a key is hot above this multiple of
# the mean key load (1.2 exercises the salted path at every fixture SF —
# the synthetic user_id distribution is nearly uniform, max ~1.5× mean;
# production skew is orders of magnitude above any sane threshold), and
# the probe considers the top-k loads only, bounding driver state.
AUTO_SALT_THRESHOLD = 1.2
AUTO_SALT_TOP = 20


def events_auto_salt_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-driven skew join (functions/skew.py auto_salt_join —
    VERDICT r6 item 5): probe the fact side's key loads (the same
    measurement the declared profile_skew query reports), salt ONLY
    keys above AUTO_SALT_THRESHOLD × mean, and run everything else
    through the untouched plain join — closing the loop between the
    r6 observability operator and the r2 mitigation, which previously
    needed a human to connect. The oracle is the plain join: salting
    is distribution-only, so the hashed check proves the hybrid plan
    never changes the answer; the plan pytest asserts the salted path
    applies exactly to the probed hot keys."""
    from hdfs_mapreduce_spark.functions.skew import auto_salt_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = auto_salt_join(
        events, cust, "user_id", "c_custkey", distributor="event_id",
        threshold=AUTO_SALT_THRESHOLD, top=AUTO_SALT_TOP,
        n_salts=SKEW_SALTS, how="left",
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


SCALAR_EPOCH = "1999-01-01"


def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar-function parity in one map-only pass: date extraction and
    arithmetic, math (sqrt/ln/floor/ceil/abs), and string functions, every
    expression inside whole-stage codegen — the reference needs a compiled
    plugin binary for any one of these (SURVEY §2.11)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        # ISO string, not DateType: Spark dates collect as datetime.date
        # while DuckDB DATEs land as datetime64 — they render differently
        # under the driver's hash. A string is identical on both sides.
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(
            F.lit(SCALAR_EPOCH).cast("date"), F.col("o_orderdate")
        ).alias("days_to_epoch"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.log(F.col("o_totalprice")).alias("price_ln"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.ceil("o_totalprice").cast("long").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("price_dist"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
    ).orderBy("o_orderkey")


# Co-activity graph for the triangle query: two users are connected when
# they share at least TRI_MIN_SHARED distinct (event_type, hour) activity
# cells. A cell's pair expansion is quadratic in its membership, so hot
# cells are SAMPLED down to TRI_CELL_MAX members by deterministic hash
# rank (the standard sub-sampling estimator for triangle census on dense
# co-occurrence graphs). Sampling — not dropping: a first cut dropped
# over-cap cells wholesale, and the 10x scale smoke showed every cell
# blowing the cap, collapsing the graph to empty; hash-rank sampling
# keeps per-cell cost bounded at C(cap,2) while the census stays
# populated at any density. The per-user hash is cell-independent, so
# the retained membership is a stable user subsample and shared-cell
# counts accumulate coherently across cells.
TRI_MIN_SHARED = 4
TRI_CELL_MAX = 64


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the user co-activity graph: per-node triangle
    counts (operators/components.py triangle_counts — degree-ordered
    orientation, each triangle enumerated exactly once) over edges
    "users sharing ≥ TRI_MIN_SHARED distinct (event_type, hour) cells".
    Triangle density is the standard cohesion signal over co-occurrence
    graphs (community/bot detection, curation weighting); alongside
    graph_pagerank (centrality) and dedup_components (partition) it
    completes the graph-analytics trio over declared relations.

    Scale: the cell join is keyed on (event_type, hour) with hash-rank
    sampling bounding per-key expansion at C(TRI_CELL_MAX, 2); the pair
    aggregate shuffles on the (a, b) key with map-side partials; the
    triangle join is bounded O(|E|^1.5) by the orientation (see the
    operator docstring). No corpus-sized collect, no float surface —
    all integers."""
    from hdfs_mapreduce_spark.functions.hashing import h56

    events = load_table(spark, sf_dir, "events")
    act = events.select(
        "user_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hb"),
    ).distinct()
    hcol = h56(F.concat(F.lit("tri:"), F.col("user_id").cast("string")))
    cell_rank = (
        Window.partitionBy("event_type", "hb")
        .orderBy(F.col("hu").asc(), F.col("user_id").asc())
    )
    capped = (
        act.withColumn("hu", hcol)
        .withColumn("rk", F.row_number().over(cell_rank))
        .where(F.col("rk") <= TRI_CELL_MAX)
        .select("user_id", "event_type", "hb")
    )
    left = capped.select(
        "event_type", "hb", F.col("user_id").alias("a")
    )
    right = capped.select(
        "event_type", "hb", F.col("user_id").alias("b")
    )
    pairs = (
        left.join(right, ["event_type", "hb"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= TRI_MIN_SHARED)
        .select("a", "b")
    )
    # Materialize-then-probe (the components-family 100 TB pattern): the
    # operator consumes the edge relation from eight plan positions (sym
    # both ways, degrees, orientation, two wedge spokes, closing edges);
    # inlined, each branch re-derives the whole cell-join pipeline — the
    # plan measured 590 exchanges. The edge list is ~1000x smaller than
    # the events table, so every consumer scans tiny parquet instead.
    import os

    from hdfs_mapreduce_spark.operators.components import triangle_counts
    from hdfs_mapreduce_spark.operators.materialize import materialize

    edges = materialize(
        pairs,
        name=f"triangle_edges_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    return triangle_counts(edges, "a", "b").orderBy("node")


def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations suite (operators/dq.py): per-table
    row-level checks as ONE conditional-aggregate pass each, exact
    uniqueness, and referential-integrity anti-joins, unioned into the
    (tbl, check, n_rows, violations, pass) audit relation every
    pipeline gates a batch promotion on."""
    from hdfs_mapreduce_spark.operators.dq import dq_report

    return dq_report(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
    )


# Temporal split: 4/5 of the observed time range trains, a 60-minute
# embargo band after the cutoff is DISCARDED, the rest evaluates.
TS_EMBARGO_US = 60 * 60 * 1_000_000


def dataset_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal split with an embargo gap (the forecasting/
    backtest discipline): train = first 4/5 of the time range, test =
    after cutoff + 60 min, the embargo band between them discarded so
    windowed/lagged features built on train rows can never observe test
    rows. The cutoff is integer epoch-microsecond arithmetic
    ((mx−mn)*4 DIV 5) — exact in any engine, unlike a float quantile.
    Complements dataset_split (hash split: exchangeable rows) and
    dataset_split_safe (group split: correlated duplicates); time series
    need THIS one. One agg for the bounds (broadcast back), one map
    labeling pass, one 3-group aggregate."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = events.agg(
        F.min(us).alias("mn"), F.max(us).alias("mx")
    )
    lab = events.crossJoin(F.broadcast(bounds)).withColumn(
        "cut", F.expr("mn + (mx - mn) * 4 DIV 5")
    )
    split = (
        F.when(us <= F.col("cut"), "train")
        .when(us >= F.col("cut") + F.lit(TS_EMBARGO_US), "test")
        .otherwise("embargo")
    )
    return (
        lab.select(split.alias("split"), "ts")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("split")
    )


SKEW_TOP = 10


def profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for events.user_id — the probe run
    before sizing a big join (salting / AQE skew-split decisions): the
    top heavy keys with their share of all rows and their ratio to the
    mean key load. One map-side-combined groupBy + a TakeOrdered top-k +
    a 1-row stats broadcast; integer counts, each double produced by a
    single division so both engines round identically."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    # The unpartitioned window ranks the ALREADY-LIMITED k-row relation
    # (TakeOrdered output), not the counts — its single-partition move
    # is k rows at any scale.
    w = Window.orderBy(F.col("cnt").desc(), "user_id")
    top = (
        counts.orderBy(F.col("cnt").desc(), "user_id")
        .limit(SKEW_TOP)
        .withColumn("rank", F.row_number().over(w))
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "rank",
        "user_id",
        "cnt",
        (F.col("cnt") / F.col("total")).alias("share"),
        ((F.col("cnt") * F.col("n_keys")) / F.col("total")).alias(
            "x_mean"
        ),
        "n_keys",
    ).orderBy("rank")


def events_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join sizing (operators/sketches.py cm_inner_product):
    estimate |events ⋈ orders ON user_id = o_custkey| from two CM
    sketches — per depth row the bucket inner product, which provably
    overestimates — next to the exact size (computed scalably as
    Σ cA(k)·cB(k) over per-key counts, never materializing the join).
    The relation pins the overestimate invariant per row plus the exact
    ratio; everything is integer arithmetic or a single division."""
    from hdfs_mapreduce_spark.operators.sketches import (
        cm_inner_product,
        cm_sketch,
    )

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    ska = cm_sketch(
        events.select(F.col("user_id").cast("string").alias("k")), "k"
    )
    skb = cm_sketch(
        orders.select(F.col("o_custkey").cast("string").alias("k")), "k"
    )
    est = cm_inner_product(ska, skb)
    ca = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("ca"))
    cb = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cb"))
    exact = (
        ca.join(cb, ca.user_id == cb.o_custkey)
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("exact"))
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "row",
            "est",
            "exact",
            (F.col("est") >= F.col("exact")).alias("overestimates"),
            (F.col("est") / F.col("exact")).alias("est_over_exact"),
        )
        .orderBy("row")
    )


def events_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frames (§2.7's value-based frame kind —
    q18/q23 cover only ROWS frames): per user, the count and value-sum
    of everything in the PRECEDING HOUR of event time, per event. ROWS
    frames can't express this (a frame of "the last N rows" is wrong
    whenever event density varies); RANGE BETWEEN is how running
    time-windowed features (rate limits, rolling spend, burst scores)
    are computed without a self-join. The frame runs on microsecond
    epoch ticks — the fixture's timestamps are sub-second, so
    second-truncated bounds would disagree with the oracle's INTERVAL
    arithmetic at the frame edges. The ticks come from timestamp_diff
    against the NTZ epoch — pure wall-clock arithmetic that never
    consults the session timezone, so it equals DuckDB's epoch_us(ts)
    exactly even for a partition spanning a DST transition (the old
    NTZ→LTZ cast's offset only cancelled in bound differences while
    the offset stayed constant). The count column makes frame inclusion
    EXACT (integers), so the hash proves boundary semantics, not just
    sums. One user-keyed shuffle; whole-stage window, no join."""
    events = load_table(spark, sf_dir, "events")
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts").cast("timestamp_ntz"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "value",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
            F.sum("value").over(w).alias("sum_last_hour"),
        )
        .orderBy("event_id")
    )


_STATS_COLS = ("l_discount", "l_extendedprice", "l_quantity", "l_tax")


def _stats_agg(li: DataFrame) -> DataFrame:
    """The one-pass stats aggregate (1 row × 6·k columns) — separate so
    the plan test can pin the single-scan shape before the collect."""
    aggs = []
    for c in _STATS_COLS:
        cd = F.col(c).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__ndv"),
            F.min(cd).alias(f"{c}__min"),
            F.max(cd).alias(f"{c}__max"),
            F.avg(cd).alias(f"{c}__avg"),
        ]
    return li.agg(*aggs)


def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style column statistics over lineitem's measure
    columns in ONE corpus scan: per column the row count, null count,
    exact NDV, min/max, and mean — the inputs a cost-based optimizer
    (and a data-quality baseline) wants. All aggregates land in a
    single ``agg`` call, so Spark plans one pass with an Expand for the
    multiple count-distincts instead of one scan per column — the shape
    that matters when the table is 100 TB. The 1×(6·k) stats row is
    collected (driver-bounded by construction — it IS the statistics)
    and unpivoted to the (col, …) relation. Mean is the only
    order-sensitive double (6dp canon absorbs the association error);
    everything else is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    row = _stats_agg(li).collect()[0]
    return spark.createDataFrame(
        [
            (
                c,
                row[f"{c}__n"],
                row[f"{c}__nulls"],
                row[f"{c}__ndv"],
                row[f"{c}__min"],
                row[f"{c}__max"],
                row[f"{c}__avg"],
            )
            for c in _STATS_COLS
        ],
        "col string, n_rows long, n_nulls long, ndv long, "
        "min_v double, max_v double, avg_v double",
    ).orderBy("col")


QUERIES = {
    "events_range_frame": events_range_frame,
    "profile_column_stats": profile_column_stats,
    "tpch_q3_shipping": tpch_q3_shipping,
    "dq_checks": dq_checks,
    "dataset_time_split": dataset_time_split,
    "profile_skew": profile_skew,
    "events_join_cardinality": events_join_cardinality,
    "scalar_funcs": scalar_funcs,
    "tpch_q5_region": tpch_q5_region,
    "tpch_q10_returns": tpch_q10_returns,
    "events_props_json": events_props_json,
    "q24_exact_percentile": q24_exact_percentile,
    "events_anomaly": events_anomaly,
    "events_skew_join": events_skew_join,
    "events_auto_salt_join": events_auto_salt_join,
    "events_histogram": events_histogram,
    "events_quantile_hist": events_quantile_hist,
    "profile_orders": profile_orders,
    "events_bloom_semi": events_bloom_semi,
    "events_hll_mergeable": events_hll_mergeable,
    "events_cm_sketch": events_cm_sketch,
    "graph_triangles": graph_triangles,
}

from hdfs_mapreduce_spark.functions.hashing import h56_sql  # noqa: E402
from hdfs_mapreduce_spark.operators.sketches import (  # noqa: E402
    CM_DEPTH,
    CM_WIDTH,
)

# Exact twin of the count-min counter grid: same h56 bucket hash per depth
# row, same GROUP BY counts.
def _cm_cells_sql(table: str, key: str) -> str:
    return " UNION ALL ".join(
        "SELECT {d} AS row, ({h}) % {w} AS bucket FROM {t}".format(
            d=d,
            h=h56_sql(f"'cm{d}:' || CAST({key} AS VARCHAR)"),
            w=CM_WIDTH,
            t=table,
        )
        for d in range(CM_DEPTH)
    )


_CM_CELLS = _cm_cells_sql("events", "user_id")

def _dq_sql() -> str:
    """Mirror of operators/dq.py dq_report: one aggregate CTE per table
    (identical violated-row predicates), a check row per aggregate
    column, NOT EXISTS twins of the anti-join RI rules (NULL fk counts
    as orphaned in both), unioned and ordered."""
    from hdfs_mapreduce_spark.operators.dq import EVENT_TYPE_DOMAIN

    dom = ", ".join(f"'{t}'" for t in EVENT_TYPE_DOMAIN)
    tables: dict[str, dict[str, str]] = {
        "events": {
            "event_id_not_null": "event_id IS NULL",
            "ts_not_null": "ts IS NULL",
            "value_positive": "value IS NULL OR value <= 0",
            "event_type_in_domain": (
                f"event_type IS NULL OR event_type NOT IN ({dom})"
            ),
        },
        "documents": {"n_chars_consistent": "n_chars <> length(text)"},
        "embeddings": {"embedding_dim_64": "len(embedding) <> 64"},
        "orders": {
            "o_totalprice_positive": (
                "o_totalprice IS NULL OR o_totalprice <= 0"
            ),
        },
        "lineitem": {
            "l_quantity_in_1_50": (
                "l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50"
            ),
            "l_discount_in_0_01": (
                "l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1"
            ),
        },
    }
    uniq = {
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    ctes, selects = [], []
    for tbl, checks in tables.items():
        names = list(checks)
        cols = ["COUNT(*) AS n_rows"] + [
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS {name}"
            for name, cond in checks.items()
        ]
        if tbl in uniq:
            c = uniq[tbl]
            cols.append(
                f"CAST(COUNT({c}) - COUNT(DISTINCT {c}) AS BIGINT)"
                f" AS {c}_unique"
            )
            names.append(f"{c}_unique")
        ctes.append(f"agg_{tbl} AS (SELECT {', '.join(cols)} FROM {tbl})")
        selects.extend(
            f"""SELECT '{tbl}' AS tbl, '{name}' AS "check", n_rows,
                {name} AS violations, {name} = 0 AS "pass"
                FROM agg_{tbl}"""
            for name in names
        )
    for tbl, name, fk, ptbl, pk in (
        ("orders", "o_custkey_ri_customer", "o_custkey", "customer",
         "c_custkey"),
        ("lineitem", "l_orderkey_ri_orders", "l_orderkey", "orders",
         "o_orderkey"),
    ):
        selects.append(
            f"""SELECT '{tbl}' AS tbl, '{name}' AS "check",
                (SELECT COUNT(*) FROM {tbl}) AS n_rows, v AS violations,
                v = 0 AS "pass"
                FROM (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM {tbl} c
                      WHERE NOT EXISTS (SELECT 1 FROM {ptbl} p
                                        WHERE p.{pk} = c.{fk}))"""
        )
    return (
        "WITH " + ",\n        ".join(ctes) + "\n        "
        + "\n        UNION ALL ".join(selects)
        + '\n        ORDER BY tbl, "check"'
    )


ORACLE_SQL = {
    # RANGE frame in microsecond epoch ticks, the engine's exact frame:
    # [ts - 1h, ts] inclusive both ends, all peers included.
    "events_range_frame": """
        SELECT event_id, user_id, value,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
               SUM(value) OVER w AS sum_last_hour
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
        )
        ORDER BY event_id
    """,
    "dq_checks": _dq_sql(),
    "profile_column_stats": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS ndv,
               MIN(CAST({c} AS DOUBLE)) AS min_v,
               MAX(CAST({c} AS DOUBLE)) AS max_v,
               AVG(CAST({c} AS DOUBLE)) AS avg_v
        FROM lineitem"""
        for c in _STATS_COLS
    )
    + " ORDER BY col",
    "events_join_cardinality": f"""
        WITH ca AS (
            SELECT row, bucket, COUNT(*) AS cnt
            FROM ({_cm_cells_sql("events", "user_id")}) GROUP BY 1, 2
        ),
        cb AS (
            SELECT row, bucket, COUNT(*) AS cnt
            FROM ({_cm_cells_sql("orders", "o_custkey")}) GROUP BY 1, 2
        ),
        est AS (
            SELECT ca.row, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS est
            FROM ca JOIN cb USING (row, bucket) GROUP BY ca.row
        ),
        ex AS (
            SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS exact
            FROM (SELECT user_id AS k, COUNT(*) AS c
                  FROM events GROUP BY 1) a
            JOIN (SELECT o_custkey AS k, COUNT(*) AS c
                  FROM orders GROUP BY 1) b ON a.k = b.k
        )
        SELECT row, est, exact, est >= exact AS overestimates,
               CAST(est AS DOUBLE) / exact AS est_over_exact
        FROM est, ex ORDER BY row
    """,
    "dataset_time_split": f"""
        WITH b AS (
            SELECT epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx
            FROM events
        ),
        lab AS (
            SELECT ts,
                   CASE WHEN epoch_us(ts) <= mn + (mx - mn) * 4 // 5
                            THEN 'train'
                        WHEN epoch_us(ts) >= mn + (mx - mn) * 4 // 5
                                             + {TS_EMBARGO_US}
                            THEN 'test'
                        ELSE 'embargo' END AS split
            FROM events, b
        )
        SELECT split, COUNT(*) AS n_rows,
               MIN(ts) AS min_ts, MAX(ts) AS max_ts
        FROM lab GROUP BY split ORDER BY split
    """,
    "profile_skew": f"""
        WITH counts AS (
            SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
        ),
        stats AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                   COUNT(*) AS n_keys
            FROM counts
        ),
        top AS (
            SELECT user_id, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rank
            FROM counts ORDER BY cnt DESC, user_id LIMIT {SKEW_TOP}
        )
        SELECT rank, user_id, cnt,
               CAST(cnt AS DOUBLE) / total AS share,
               CAST(cnt * n_keys AS DOUBLE) / total AS x_mean,
               n_keys
        FROM top, stats ORDER BY rank
    """,
    "events_cm_sketch": f"""
        SELECT row, bucket, COUNT(*) AS cnt
        FROM ({_CM_CELLS})
        GROUP BY row, bucket ORDER BY row, bucket
    """,
    # Sketch estimates are engine-specific; the query emits exact facts +
    # booleans the oracle pins with TRUE (see events_hll_mergeable doc).
    "events_hll_mergeable": """
        SELECT COUNT(DISTINCT date_trunc('day', ts)) AS n_days,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS merged_within_bound, TRUE AS within_bound
        FROM events
    """,
    # The oracle is the UNSALTED join: the check proves salting is purely
    # a physical-distribution change.
    "events_skew_join": """
        SELECT c.c_mktsegment, COUNT(*) AS n_events, SUM(e.value) AS sum_value
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY c_mktsegment
    """,
    # the hybrid hot/cold salted plan is distribution-only: its oracle
    # is the very plain join it avoids executing for hot keys
    "events_auto_salt_join": """
        SELECT c.c_mktsegment, COUNT(*) AS n_events, SUM(e.value) AS sum_value
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY c_mktsegment
    """,
    "events_bloom_semi": f"""
        SELECT event_type, COUNT(*) AS n_events, SUM(value) AS sum_value
        FROM events e
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = e.user_id
                        AND c.c_mktsegment = '{BLOOM_SEGMENT}')
        GROUP BY 1 ORDER BY event_type
    """,
    # same two-pass histogram interpolation, identical scalar math:
    # bin = least(B-1, floor((v-min)/(max-min)*B)); first bin with
    # cum >= q*n; est = min + w*(bin + (target - cum_prev)/n_bin)
    "events_quantile_hist": f"""
        WITH stats AS (
            SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax,
                   COUNT(*) AS n_total
            FROM events GROUP BY event_type
        ),
        binned AS (
            SELECT e.event_type, s.n_total, s.vmin, s.vmax,
                   LEAST({QHIST_BINS - 1}, CAST(FLOOR(
                       (e.value - s.vmin) / (s.vmax - s.vmin)
                       * {QHIST_BINS}) AS INT)) AS bin,
                   COUNT(*) AS n_bin
            FROM events e JOIN stats s USING (event_type)
            GROUP BY 1, 2, 3, 4, 5
        ),
        cum AS (
            SELECT *, SUM(n_bin) OVER (
                PARTITION BY event_type ORDER BY bin) AS cum
            FROM binned
        ),
        qs AS (SELECT CAST(unnest([{', '.join(str(q) for q in QHIST_QS)}])
                      AS DOUBLE) AS q),
        hit AS (
            SELECT c.*, qs.q, qs.q * c.n_total AS target,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.event_type, qs.q ORDER BY c.bin) AS rn
            FROM cum c, qs
            WHERE c.cum >= qs.q * c.n_total
        )
        SELECT event_type, q,
               ROUND(CASE WHEN vmax = vmin THEN vmin
                     ELSE vmin + (vmax - vmin) / {QHIST_BINS}
                          * (bin + (target - (cum - n_bin)) / n_bin)
                     END, 6) + 0.0 AS est
        FROM hit WHERE rn = 1
        ORDER BY event_type, q
    """,
    "events_histogram": f"""
        SELECT event_type,
               CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY event_type, bucket
    """,
    "profile_orders": """
        WITH agg AS (
            SELECT COUNT(*) AS n_rows,
                   -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which .df()
                   -- renders as float64 and breaks integer hash parity.
                   CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_custkey,
                   COUNT(DISTINCT o_custkey) AS distinct_o_custkey,
                   CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_totalprice,
                   COUNT(DISTINCT o_totalprice) AS distinct_o_totalprice,
                   CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderdate,
                   COUNT(DISTINCT o_orderdate) AS distinct_o_orderdate,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price
            FROM orders
        )
        SELECT c.col_name, c.n_nulls, c.n_distinct, n_rows, min_price, max_price
        FROM agg, LATERAL (VALUES
            ('o_custkey', nulls_o_custkey, distinct_o_custkey),
            ('o_totalprice', nulls_o_totalprice, distinct_o_totalprice),
            ('o_orderdate', nulls_o_orderdate, distinct_o_orderdate)
        ) AS c(col_name, n_nulls, n_distinct)
        ORDER BY c.col_name
    """,
    "scalar_funcs": f"""
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               month(o_orderdate) AS mo,
               day(o_orderdate) AS dom,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               date_diff('day', CAST(o_orderdate AS DATE),
                         DATE '{SCALAR_EPOCH}') AS days_to_epoch,
               sqrt(o_totalprice) AS price_sqrt,
               ln(o_totalprice) AS price_ln,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
               CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
               abs(o_totalprice - 1000.0) AS price_dist,
               upper(o_orderpriority) AS prio_upper,
               substr(o_orderpriority, 1, 1) AS prio_code,
               length(o_orderpriority) AS prio_len
        FROM orders ORDER BY o_orderkey
    """,
    "tpch_q3_shipping": f"""
        SELECT o_orderkey, o_orderdate,
               SUM(l_extendedprice * (1 - l_discount)) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = '{Q3_SEGMENT}'
          AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
          AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    "tpch_q5_region": f"""
        SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name = '{Q5_REGION}'
          AND o_orderdate >= TIMESTAMP '{Q5_FROM}'
          AND o_orderdate < TIMESTAMP '{Q5_TO}'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "tpch_q10_returns": f"""
        SELECT c_custkey, c_name, c_acctbal,
               SUM(l_extendedprice * (1 - l_discount)) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '{Q10_FROM}'
          AND o_orderdate < TIMESTAMP '{Q10_TO}'
        GROUP BY c_custkey, c_name, c_acctbal
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "events_props_json": """
        SELECT event_type, COUNT(*) AS n,
               AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q24_exact_percentile": """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "events_anomaly": f"""
        WITH stats AS (
            SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, COUNT(*) AS n_outliers,
               MIN(e.value) AS min_val, MAX(e.value) AS max_val
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE ABS(e.value - s.mu) > {ANOMALY_Z} * s.sigma
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    # Same co-activity edges (identical h56 cell-sample rank), same
    # degree-ordered orientation ((d, id) tuple compare on both engines),
    # each triangle enumerated once as an oriented wedge + closing edge —
    # integer-only, no float surface.
    "graph_triangles": f"""
        WITH act AS (
            SELECT DISTINCT user_id, event_type,
                   date_trunc('hour', ts) AS hb
            FROM events
        ),
        capped AS (
            SELECT user_id, event_type, hb FROM (
                SELECT user_id, event_type, hb,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type, hb
                           ORDER BY {h56_sql("'tri:' || CAST(user_id AS VARCHAR)")},
                                    user_id) AS rk
                FROM act
            ) WHERE rk <= {TRI_CELL_MAX}
        ),
        pairs AS (
            SELECT l.user_id AS a, r.user_id AS b
            FROM capped l JOIN capped r
              ON l.event_type = r.event_type AND l.hb = r.hb
             AND l.user_id < r.user_id
            GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_SHARED}
        ),
        sym AS (
            SELECT a AS s, b AS t FROM pairs
            UNION ALL SELECT b AS s, a AS t FROM pairs
        ),
        deg AS (SELECT s AS node, COUNT(*) AS d FROM sym GROUP BY 1),
        oriented AS (
            SELECT sym.s, sym.t, dt.d AS td
            FROM sym
            JOIN deg ds ON ds.node = sym.s
            JOIN deg dt ON dt.node = sym.t
            WHERE (ds.d, sym.s) < (dt.d, sym.t)
        ),
        tri AS (
            SELECT o1.s AS u, o1.t AS v, o2.t AS w
            FROM oriented o1
            JOIN oriented o2 ON o1.s = o2.s
            JOIN oriented c ON c.s = o1.t AND c.t = o2.t
            WHERE (o1.td, o1.t) < (o2.td, o2.t)
        )
        SELECT node, COUNT(*) AS n_tri FROM (
            SELECT u AS node FROM tri
            UNION ALL SELECT v AS node FROM tri
            UNION ALL SELECT w AS node FROM tri
        ) GROUP BY node ORDER BY node
    """,
}
