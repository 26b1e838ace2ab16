"""Declared relational query set Q1-Q10 (FIXTURES.md §2) as DataFrame plans.

Each query has two faces kept in lock-step:
  * a DataFrame builder ``(spark, sf_dir) -> DataFrame`` (this module), and
  * an ANSI-SQL oracle string (ORACLE_SQL) that DuckDB runs on the same
    parquet — the driver hash-compares the two at sf0.01.

Column-name discipline: every computed column is aliased identically on both
sides (the driver sorts columns by name before hashing).

Reference parity notes (SURVEY §2): Q1 reproduces the word-count plugin's
dataflow (mapreduce_plugin_mock/word-count.go:55-79 — tab→space, split on
single space, drop empty tokens, count per token) as pure Column expressions;
Q2/Q3 are the reviews plugin's filter-project + group-avg semantics
(mapreduce_plugin_mock/reviews.go:56-75); Q4-Q5 exercise the engine's
sort/group machinery (dfs/storageNode/storageNode.go:368-458) — minus its
lost-last-group bug (SURVEY §4.4). Q6-Q10 are the Spark-native completion the
reference lacks entirely (joins §2.6, windows §2.7, set ops §2.8, limits §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs_mapreduce_spark.sources.catalog import load_table


# --- Q1: flatMap + group-count (word count) ---------------------------------
def q1_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count over documents.text with the reference plugin's exact token
    semantics: tabs become spaces, split on *single* spaces (consecutive
    spaces yield empty tokens), empty tokens dropped
    (word-count.go:57-70), then count per token.

    Scale shape: FileScan(text only) → generate(explode) → partial count →
    Exchange(hash token) → final count. Map-side partial aggregation is the
    combiner the reference never had (retrospective.md:13-15).
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.regexp_replace("text", "\t", " "), " ")).alias("token")
    )
    return (
        tokens.filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("token")
    )


def plugin_binary_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1's word count run through a real plugin EXECUTABLE via the
    binary-plugin adapter (operators/binary_plugin.py) — the literal
    compiled-plugin protocol parity surface (dfs/compute_engine/
    compute_engine.go:49-69,111-131), batched stdin transport. Must hash
    to the same relation as the q1_wordcount oracle: the plugin embeds
    word-count.go's exact token rules."""
    from hdfs_mapreduce_spark.operators.binary_plugin import (
        WORDCOUNT_PLUGIN_SRC,
        materialize_plugin,
        run_binary_mapreduce,
    )

    plugin = materialize_plugin(
        WORDCOUNT_PLUGIN_SRC, "spark_graft_wordcount_plugin.py"
    )
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(
        F.col("doc_id").alias("key"), F.col("text").alias("value")
    )
    out = run_binary_mapreduce(lines, plugin)
    return out.select(
        F.col("key").alias("token"),
        F.col("value").cast("long").alias("cnt"),
    ).orderBy("token")


# --- Q2: filter + project ----------------------------------------------------
def q2_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + range predicate; both push into the parquet scan
    (PushedFilters + 3-column ReadSchema — the reference can only do this
    inside a map plugin, reviews.go:56-65)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size").between(10, 40))
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")
    )


# --- Q3: group-avg (reviews-reduce analog) -----------------------------------
def q3_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.avg("value").alias("avg_value"))
        .orderBy("event_type")
    )


# --- Q4: multi-aggregate group-by (TPC-H Q1 shape) ---------------------------
def q4_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q5: sorted distinct ------------------------------------------------------
def q5_sorted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select("event_type").distinct().orderBy("event_type")


# --- Q6: global sort + top-k --------------------------------------------------
def q6_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TakeOrderedAndProject: per-partition top-100 then a driver-side merge —
    no global sort materializes, which is the point at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "user_id", "value")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(100)
    )


# --- Q7: equi-join + group ----------------------------------------------------
def q7_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation → per-nation revenue. nation (25 rows at any
    SF) is explicitly broadcast; customer⋈orders is left to Catalyst/AQE
    (shuffle joins on the fact side at real scale)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.select("o_custkey", "o_totalprice")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
        .orderBy("n_name")
    )


# --- Q8: anti-join -------------------------------------------------------------
def q8_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --- Q9: window / ranking -------------------------------------------------------
def q9_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", F.col("o_totalprice").desc(), "o_orderkey")
    )


# --- Q10a: exact distinct aggregate --------------------------------------------
def q10a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(F.countDistinct("user_id").alias("u"))


# --- Q10b: set op (INTERSECT) ----------------------------------------------------
def q10b_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.select("user_id")
        .intersect(customer.select(F.col("c_custkey").alias("user_id")))
        .orderBy("user_id")
    )


# --- Q11: semi join (complement of Q8) ----------------------------------------
def q11_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- Q12: ROLLUP subtotals ------------------------------------------------------
def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --- Q13: CUBE ------------------------------------------------------------------
def q13_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    small = events.select(
        "event_type", F.pmod("user_id", F.lit(2)).cast("int").alias("user_bucket"), "value"
    )
    return (
        small.cube("event_type", "user_bucket")
        .agg(F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("event_type").asc_nulls_first(),
            F.col("user_bucket").asc_nulls_first(),
        )
    )


# --- Q25: GROUPING SETS ---------------------------------------------------------
def q25_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set combinations (SURVEY §2.4, beyond
    ROLLUP/CUBE): the two single-column marginals plus the full pair —
    a set list neither rollup nor cube generates (no grand total).
    ``grouping_id`` disambiguates which set produced each row (Spark and
    DuckDB share the bit convention: bit set = column aggregated away).
    One Expand + one aggregate in the plan — same execution shape as
    rollup, the sets are just explicit."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [
                [F.col("o_orderstatus"), F.col("o_orderpriority")],
                [F.col("o_orderstatus")],
                [F.col("o_orderpriority")],
            ],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("o_totalprice").alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --- Q14: UNION ALL + EXCEPT ----------------------------------------------------
def q14_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op coverage: (event users ∪ALL supplier keys) minus customer keys,
    deduplicated by EXCEPT."""
    events = load_table(spark, sf_dir, "events")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    pool = events.select(F.col("user_id").alias("id")).unionAll(
        supplier.select(F.col("s_suppkey").cast("long").alias("id"))
    )
    return (
        pool.exceptAll(customer.select(F.col("c_custkey").alias("id")))
        .distinct()
        .orderBy("id")
    )


# --- Q15: as-of join ------------------------------------------------------------
def q15_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every order: the most recent event of that customer at or before
    the order date (point-in-time correctness — no future leakage). See
    operators/asof.py for the union+forward-fill plan shape."""
    from hdfs_mapreduce_spark.operators.asof import as_of_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    out = as_of_join(
        orders,
        events,
        left_key="o_custkey",
        right_key="user_id",
        left_time="o_orderdate",
        right_time="ts",
        value_cols=["event_id", "event_type", "value"],
        right_tiebreak="event_id",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_event_value"),
    ).orderBy("o_orderkey")


# --- Q16: approximate distinct (sketch; error bound pinned by the hash) ---------
Q16_RSD = 0.02
Q16_BOUND = 0.10  # 5x rsd — far beyond any plausible HLL++ excursion


def q16_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimates differ across engines by design, so the emitted
    relation is the EXACT distinct count next to a boolean bound check on
    the sketch: |approx - exact| / exact <= 5*rsd. The oracle computes the
    same exact count and a literal TRUE — the driver's value hash matches
    iff Spark's sketch really is inside its declared error bound (the
    trick that turned this from a rows-only row into a hash row)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count_distinct("user_id").alias("exact_u"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=Q16_RSD)
                - F.count_distinct("user_id")
            )
            / F.count_distinct("user_id")
            <= F.lit(Q16_BOUND)
        ).alias("within_bound"),
    )


Q17_ACCURACY = 10000
Q17_RANK_EPS = 0.01  # rank-error budget: accuracy 10000 guarantees 1e-4


def q17_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (Greenwald-Khanna via percentile_approx) per event
    type — mergeable partial sketches, one shuffle, bounded memory at any
    scale where exact percentile would sort the world. Sketch VALUES are
    engine-specific, so the emitted relation is a rank-error audit the
    oracle can pin with literal TRUEs: for each approx quantile v at target
    q, the sketch contract is that v's rank sits within eps of q —
    frac(value <= v) >= q - eps and frac(value < v) <= q + eps. The check
    columns are booleans over exact counts, so the hash match certifies
    the sketch's guarantee, not its engine-specific output."""
    events = load_table(spark, sf_dir, "events")
    approx = events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], Q17_ACCURACY).alias("q")
    )
    joined = events.join(F.broadcast(approx), "event_type")
    checks = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            agg
            for i in range(3)
            for agg in (
                F.sum((F.col("value") <= F.col("q")[i]).cast("long")).alias(
                    f"le_{i}"
                ),
                F.sum((F.col("value") < F.col("q")[i]).cast("long")).alias(
                    f"lt_{i}"
                ),
            )
        ],
    )
    targets = [0.5, 0.95, 0.99]
    names = ["p50_ok", "p95_ok", "p99_ok"]
    return checks.select(
        "event_type",
        "n",
        *[
            (
                (F.col(f"le_{i}") / F.col("n") >= F.lit(t - Q17_RANK_EPS))
                & (F.col(f"lt_{i}") / F.col("n") <= F.lit(t + Q17_RANK_EPS))
            ).alias(nm)
            for i, (t, nm) in enumerate(zip(targets, names))
        ],
    ).orderBy("event_type")


def q18_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window-frame analytic (4-order moving average per customer) —
    the rowsBetween frame machinery q9's ranking doesn't exercise. One hash
    shuffle on the partition key + per-partition sort; frame evaluation is
    streaming within the sorted run (no per-row re-scan)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.avg("o_totalprice").over(w).alias("moving_avg"),
    ).orderBy("o_custkey", "o_orderkey")


def grouped_values_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's group encoding, typed: each reduce group's value list
    (`key\\tv1\\tv2...`, dfs/storageNode/storageNode.go:437-458) becomes an
    ArrayType column. sort_array pins the order — collect_list order is
    partition-dependent (SURVEY §7 hard parts), the reference's was
    merge-order; neither is semantic, so the declared form is the sorted
    multiset. This array-typed variant is the library API; the *declared*
    query (q19_grouped_values) serializes the list to a scalar because the
    driver's canonicalizer cannot hash Python lists."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("event_type")).alias("event_types"))
        .orderBy("user_id")
    )


def q19_grouped_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared (oracle-checked) form of grouped_values_array: the sorted
    value list rendered as a comma-joined scalar so the result is hashable
    by the driver's pandas canonicalization. Same reference semantics
    (dfs/storageNode/storageNode.go:437-458), scalar encoding — which is in
    fact closer to the reference's own tab-joined group lines."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("event_type")), ","
            ).alias("event_types")
        )
        .orderBy("user_id")
    )


def q20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-day event counts, one column per event type — planned as a
    single pass of conditional aggregates (no per-category scan)."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.select(F.date_trunc("day", "ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("day")
    )


def q21_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving outer join: every customer with their event count and
    last event time — customers with no events keep a 0/NULL row (~27% of
    customers in the test data). Broadcast of the dim side still applies;
    the aggregate is partial->final on the join output."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return (
        customer.join(events, customer["c_custkey"] == events["user_id"], "left")
        .groupBy("c_custkey")
        .agg(
            F.count("event_id").alias("n_events"),
            F.max("ts").alias("last_event"),
        )
        .orderBy("c_custkey")
    )


def q22_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week, then
    distinct active users per (cohort, week offset) — the canonical
    product-analytics self-composition (first-touch agg → activity join →
    distinct count). Two shuffles on user_id (cohort agg + activity
    distinct) land co-partitioned, so the join is exchange-free on the
    user side; the final count groups (cohort, offset), a tiny domain."""
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = events.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def q23_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the §2.7 window-function family in one plan: lead, lag,
    ntile and cume_dist over the same per-customer ordering — one shuffle on
    the partition key, one per-partition sort, all four functions evaluated
    in a single Window operator (no per-function re-sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    ).orderBy("o_custkey", "o_orderkey")


QUERIES = {
    "q1_wordcount": q1_wordcount,
    "q23_window_suite": q23_window_suite,
    "q2_filter_project": q2_filter_project,
    "q3_group_avg": q3_group_avg,
    "q4_multi_agg": q4_multi_agg,
    "q5_sorted_distinct": q5_sorted_distinct,
    "q6_topk": q6_topk,
    "q7_join_agg": q7_join_agg,
    "q8_anti_join": q8_anti_join,
    "q9_window_rank": q9_window_rank,
    "q10a_count_distinct": q10a_count_distinct,
    "q10b_intersect": q10b_intersect,
    "q11_semi_join": q11_semi_join,
    "q12_rollup": q12_rollup,
    "q13_cube": q13_cube,
    "q25_grouping_sets": q25_grouping_sets,
    "q14_union_except": q14_union_except,
    "q15_asof_join": q15_asof_join,
    "q16_approx_distinct": q16_approx_distinct,
    "q17_approx_quantiles": q17_approx_quantiles,
    "q18_moving_avg": q18_moving_avg,
    "q19_grouped_values": q19_grouped_values,
    "q20_pivot": q20_pivot,
    "q21_outer_join": q21_outer_join,
    "q22_retention": q22_retention,
    "plugin_binary_wordcount": plugin_binary_wordcount,
}

ORACLE_SQL = {
    "q1_wordcount": """
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(replace(text, chr(9), ' '), ' ')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY token ORDER BY token
    """,
    # Same relation as q1: the binary plugin embeds word-count.go's exact
    # token semantics, so the executable path must hash-match the SQL twin.
    "plugin_binary_wordcount": """
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(replace(text, chr(9), ' '), ' ')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY token ORDER BY token
    """,
    "q2_filter_project": """
        SELECT p_partkey, p_brand, p_size FROM part
        WHERE p_size BETWEEN 10 AND 40 ORDER BY p_partkey
    """,
    "q3_group_avg": """
        SELECT event_type, AVG(value) AS avg_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q4_multi_agg": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(l_extendedprice) AS sum_price,
               AVG(l_discount) AS avg_disc,
               COUNT(*) AS cnt
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q5_sorted_distinct": """
        SELECT DISTINCT event_type FROM events ORDER BY event_type
    """,
    "q6_topk": """
        SELECT event_id, user_id, value FROM events
        ORDER BY value DESC, event_id LIMIT 100
    """,
    "q7_join_agg": """
        SELECT n_name, COUNT(*) AS num_orders, SUM(o_totalprice) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q8_anti_join": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "q9_window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    "q10a_count_distinct": """
        SELECT COUNT(DISTINCT user_id) AS u FROM events
    """,
    "q10b_intersect": """
        SELECT user_id FROM events
        INTERSECT
        SELECT c_custkey FROM customer
        ORDER BY user_id
    """,
    "q11_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "q12_rollup": """
        SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q13_cube": """
        SELECT event_type, user_bucket, SUM(value) AS sum_value, COUNT(*) AS cnt
        FROM (SELECT event_type, CAST(user_id % 2 AS INT) AS user_bucket, value
              FROM events)
        GROUP BY CUBE(event_type, user_bucket)
        ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST
    """,
    "q25_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
               SUM(o_totalprice) AS sum_price, COUNT(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        ORDER BY gid, o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST
    """,
    "q14_union_except": """
        SELECT DISTINCT id FROM (
            SELECT id FROM (
                SELECT user_id AS id FROM events
                UNION ALL
                SELECT CAST(s_suppkey AS BIGINT) AS id FROM supplier
            )
            EXCEPT ALL
            SELECT c_custkey AS id FROM customer
        ) ORDER BY id
    """,
    "q15_asof_join": """
        WITH l AS (
            SELECT o_custkey AS k, o_orderdate AS t, 1 AS side,
                   CAST(NULL AS BIGINT) AS tb,
                   o_orderkey, o_custkey,
                   CAST(NULL AS BIGINT) AS v_event_id,
                   CAST(NULL AS VARCHAR) AS v_event_type,
                   CAST(NULL AS DOUBLE) AS v_value
            FROM orders
        ),
        r AS (
            SELECT user_id AS k, ts AS t, 0 AS side, event_id AS tb,
                   CAST(NULL AS BIGINT) AS o_orderkey,
                   CAST(NULL AS BIGINT) AS o_custkey,
                   event_id AS v_event_id, event_type AS v_event_type,
                   value AS v_value
            FROM events
        ),
        filled AS (
            SELECT *,
                   last_value(v_event_id IGNORE NULLS) OVER w AS last_event_id,
                   last_value(v_event_type IGNORE NULLS) OVER w AS last_event_type,
                   last_value(v_value IGNORE NULLS) OVER w AS last_event_value
            FROM (SELECT * FROM l UNION ALL SELECT * FROM r)
            WINDOW w AS (PARTITION BY k ORDER BY t, side, tb
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT o_orderkey, o_custkey, last_event_id, last_event_type,
               last_event_value
        FROM filled WHERE side = 1 ORDER BY o_orderkey
    """,
    "q18_moving_avg": """
        SELECT o_custkey, o_orderkey,
               AVG(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_avg
        FROM orders ORDER BY o_custkey, o_orderkey
    """,
    "q23_window_suite": """
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               ntile(4) OVER w AS quartile,
               cume_dist() OVER w AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    "q19_grouped_values": """
        SELECT user_id,
               array_to_string(list_sort(list(event_type)), ',') AS event_types
        FROM events WHERE user_id < 20
        GROUP BY user_id ORDER BY user_id
    """,
    "q20_pivot": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) FILTER (event_type = 'click') AS click,
               COUNT(*) FILTER (event_type = 'error') AS error,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'signup') AS signup,
               COUNT(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY 1 ORDER BY day
    """,
    "q21_outer_join": """
        SELECT c_custkey, COUNT(event_id) AS n_events, MAX(ts) AS last_event
        FROM customer LEFT JOIN events ON c_custkey = user_id
        GROUP BY c_custkey ORDER BY c_custkey
    """,
    "q22_retention": """
        WITH first AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        ),
        act AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
            FROM events
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.act_week) // 7
                    AS BIGINT) AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM act a JOIN first f ON a.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY cohort_week, week_offset
    """,
    # q16/q17: the sketch VALUES are engine-specific, so both queries emit
    # exact counts + boolean bound checks; the oracle computes the same
    # exact side and literal TRUEs — a hash match certifies the sketch sat
    # inside its declared error bound (FIXTURES.md tolerance protocol,
    # promoted to a hash row in round 4).
    "q16_approx_distinct": """
        SELECT COUNT(DISTINCT user_id) AS exact_u, TRUE AS within_bound
        FROM events
    """,
    "q17_approx_quantiles": """
        SELECT event_type, COUNT(*) AS n,
               TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}
