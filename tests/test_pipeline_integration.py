"""End-to-end integration: the full training-data curation pipeline a
reference user would run after switching, driven entirely through the
Engine facade and warehouse — ingest, SQL, near-dup clustering over a
materialized edge list, survivor selection, leakage-safe split, compact,
egress. Each stage is unit-tested elsewhere; this test pins that they
compose over one shared warehouse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_mapreduce_spark.engine import Engine
from hdfs_mapreduce_spark.operators.components import canonical_assignment
from hdfs_mapreduce_spark.operators.dedup import minhash_pairs

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def test_curation_pipeline_over_one_warehouse(engine, spark):
    # 1. ingest the corpus into the warehouse (PUT)
    engine.put(f"{SF}/documents.parquet", "docs", fmt="parquet")
    n_docs = engine.sql("SELECT COUNT(*) AS n FROM docs").collect()[0]["n"]
    assert n_docs > 0

    # 2. near-dup pair graph, materialized as a durable warehouse artifact
    docs = engine.get("docs")
    pairs = minhash_pairs(docs, "doc_id", "text", 0.7)
    edges = engine.materialize(pairs.select("doc_a", "doc_b"), "dedup_edges")
    assert "dedup_edges" in engine.ls()

    # 3. cluster -> canonical survivor per component, persisted (sink)
    assign = canonical_assignment(
        docs.select("doc_id"), "doc_id", edges, "doc_a", "doc_b"
    )
    survivors = (
        docs.join(
            assign.filter(F.col("doc_id") == F.col("canonical")).select(
                "doc_id"
            ),
            "doc_id",
        )
    )
    engine.materialize(survivors, "docs_dedup")
    n_kept = engine.sql("SELECT COUNT(*) AS n FROM docs_dedup").collect()[0]["n"]
    n_clusters = assign.select("canonical").distinct().count()
    assert n_kept == n_clusters <= n_docs

    # 4. leakage-safe split on the CLUSTER id: every member of a near-dup
    #    cluster lands in one split, so dropped duplicates can never leak
    #    a survivor's content across the boundary
    from hdfs_mapreduce_spark.functions.hashing import h56

    bucket = h56(F.concat(F.lit("split:"), F.col("canonical"))) % 100
    split = F.when(bucket < 98, "train").otherwise("holdout")
    labeled = assign.select("doc_id", "canonical", split.alias("split"))
    leaks = (
        labeled.groupBy("canonical")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leaks == 0

    # 5. operational verbs on the artifact: stats + compact + ordered GET
    before = engine.stats()["docs_dedup"]
    out = engine.compact("docs_dedup", target_files=1)
    assert out["files_after"] == 1 and out["n_bytes"] > 0
    after_rows = engine.get("docs_dedup").count()
    assert after_rows == n_kept
    assert set(engine.ls()) >= {"docs", "dedup_edges", "docs_dedup"}
    assert before["n_bytes"] > 0

    # 6. SQL over the final namespace joins raw and curated tables
    ratio = engine.sql(
        "SELECT CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM docs) AS r "
        "FROM docs_dedup"
    ).collect()[0]["r"]
    assert 0 < ratio <= 1.0
