"""Sequence-packing invariants: exactly-once assignment, budget respected
(single-doc overflow bins excepted), bounded waste."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.packing import pack_sequences

BUDGET = 100


def test_packing_invariants_fixture(spark):
    rows = [(i, n) for i, n in enumerate([40, 40, 40, 90, 150, 10, 10, 95, 5])]
    df = spark.createDataFrame(rows, "doc_id long, n long").coalesce(2)
    out = pack_sequences(df, "doc_id", "n", budget=BUDGET).collect()

    # every doc exactly once
    assert sorted(r["doc"] for r in out) == [r[0] for r in rows]

    bins: dict[int, list[int]] = {}
    for r in out:
        bins.setdefault(r["bin_id"], []).append(int(r["n_tokens"]))
    for members in bins.values():
        # budget respected, except a bin holding one oversized doc
        assert sum(members) <= BUDGET or len(members) == 1


def test_packing_on_documents(spark):
    from hdfs_mapreduce_spark.functions.text import bpe_token_count
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    packed = pack_sequences(
        docs, "doc_id", bpe_token_count(F.col("text")), budget=2048
    )
    n_docs = docs.count()
    assert packed.count() == n_docs
    assert packed.select("doc").distinct().count() == n_docs
    over = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("c"))
        .filter((F.col("t") > 2048) & (F.col("c") > 1))
        .count()
    )
    assert over == 0
    # waste bound: bins should average at least half full on real data
    stats = packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("t")).agg(
        F.avg("t").alias("fill")
    ).collect()[0]
    assert stats["fill"] >= 2048 * 0.5
