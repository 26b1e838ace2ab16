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


QUERIES = {
    "q1_wordcount": q1_wordcount,
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
}

ORACLE_SQL = {
    "q1_wordcount": """
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
}
