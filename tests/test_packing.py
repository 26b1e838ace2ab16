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


def test_global_offsets_equals_naive_cumsum(spark):
    import random

    from hdfs_mapreduce_spark.operators.packing import global_offsets

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 500)) for i in range(0, 5000, 3)]
    df = spark.createDataFrame(rows, "doc_id long, w long").repartition(8)
    got = {
        r["doc_id"]: r["start_off"]
        for r in global_offsets(df, "doc_id", "w", bucket_size=128).collect()
    }
    acc = 0
    for i, w in rows:  # rows are already in doc_id order
        assert got[i] == acc, (i, got[i], acc)
        acc += w


def test_pack_concat_accounting_bins(spark):
    from hdfs_mapreduce_spark.operators.packing import pack_concat_accounting

    df = spark.createDataFrame(
        [(1, 100), (2, 50), (3, 0), (4, 120)], "doc_id long, n long"
    )
    rows = {
        r["doc_id"]: r
        for r in pack_concat_accounting(df, "doc_id", "n", budget=128).collect()
    }
    assert 3 not in rows  # zero-token doc dropped
    assert rows[1]["start_off"] == 0 and rows[1]["first_bin"] == 0
    assert rows[2]["start_off"] == 100
    # doc 2 spans tokens 100..149 -> crosses the 128 boundary -> split
    assert rows[2]["is_split"] == 1
    assert (rows[2]["first_bin"], rows[2]["last_bin"]) == (0, 1)
    assert rows[4]["start_off"] == 150 and rows[4]["is_split"] == 1
