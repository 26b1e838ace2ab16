"""Reference-semantics unit fixtures (FIXTURES.md §3): exact expected outputs
for the two shipped reference plugins, plus plugin-surface ≡ column-expression
equivalence."""

from __future__ import annotations

import pytest

from hdfs_mapreduce_spark.functions.reference_jobs import (
    reviews_avg_csv_expr,
    reviews_avg_plugin,
    word_count_expr,
    word_count_plugin,
)

# FIXTURES.md §3.1 — wordcount-mini: tabs, repeated tokens, empty lines,
# consecutive spaces (which the single-space split turns into empty tokens
# that get dropped — word-count.go:66-68 semantics).
WORDCOUNT_LINES = [
    "the quick\tbrown fox",
    "the  lazy dog",
    "",
    "fox\tfox fox",
    "dog",
    "\t",
]
WORDCOUNT_EXPECTED = {
    "brown": 1,
    "dog": 2,
    "fox": 4,
    "lazy": 1,
    "quick": 1,
    "the": 2,
}

# FIXTURES.md §3.2 — reviews-mini: 8 CSV rows with integer ratings ("4"),
# floats ("4.5" — filtered), junk ("N/A" — filtered), duplicate brands.
# Schema: asin,brand,title,url,image,rating,reviewUrl,totalReviews,price,originalPrice
REVIEWS_LINES = [
    "a1,acme,t,u,i,4,r,10,9.99,12.99",
    "a2,acme,t,u,i,5,r,10,9.99,12.99",
    "a3,acme,t,u,i,4.5,r,10,9.99,12.99",
    "a4,bravo,t,u,i,N/A,r,10,9.99,12.99",
    "a5,bravo,t,u,i,3,r,10,9.99,12.99",
    "a6,bravo,t,u,i,2,r,10,9.99,12.99",
    "a7,charlie,t,u,i,5,r,10,9.99,12.99",
    "a8,charlie,t,u,i,junk,r,10,9.99,12.99",
]
REVIEWS_EXPECTED = {"acme": 4.5, "bravo": 2.5, "charlie": 5.0}


@pytest.fixture()
def wordcount_df(spark):
    return spark.createDataFrame([(t,) for t in WORDCOUNT_LINES], "text string")


@pytest.fixture()
def reviews_df(spark):
    return spark.createDataFrame([(t,) for t in REVIEWS_LINES], "text string")


def test_word_count_expr(wordcount_df):
    got = {r["token"]: r["cnt"] for r in word_count_expr(wordcount_df).collect()}
    assert got == WORDCOUNT_EXPECTED


def test_word_count_plugin_surface(wordcount_df):
    got = {r["token"]: r["cnt"] for r in word_count_plugin(wordcount_df).collect()}
    assert got == WORDCOUNT_EXPECTED


def test_reviews_avg_expr(reviews_df):
    got = {
        r["brand"]: r["avg_rating"]
        for r in reviews_avg_csv_expr(reviews_df).collect()
    }
    assert got == pytest.approx(REVIEWS_EXPECTED)


def test_reviews_avg_plugin_surface(reviews_df):
    got = {
        r["brand"]: r["avg_rating"] for r in reviews_avg_plugin(reviews_df).collect()
    }
    assert got == pytest.approx(REVIEWS_EXPECTED)


def test_plugin_equals_expr_on_documents(spark):
    """Plugin surface and column expressions must agree on real data
    (documents table, sf0.001)."""
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select("text")
    a = {r["token"]: r["cnt"] for r in word_count_expr(docs).collect()}
    b = {r["token"]: r["cnt"] for r in word_count_plugin(docs).collect()}
    assert a == b


def test_map_records_udtf_semantics(spark):
    """map_records emits 0..n rows per input (UDTF), like plugin MAP."""
    from hdfs_mapreduce_spark.functions.plugin import map_records

    df = spark.createDataFrame([(1,), (2,), (3,)], "n long")

    def fn(rec):
        for i in range(rec["n"]):
            yield {"n": rec["n"], "i": i}

    out = map_records(df, fn, "n long, i long").collect()
    assert len(out) == 6
    assert {(r["n"], r["i"]) for r in out} == {
        (1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2),
    }


def test_reduce_groups_no_lost_last_group(spark):
    """The reference drops the final group (storageNode.go:449-464 never
    flushes it); ours must not."""
    from hdfs_mapreduce_spark.functions.plugin import reduce_groups

    import pandas as pd

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("z", 9)], "key string, value long"
    )

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": [key[0]], "total": [int(pdf.value.sum())]})

    got = {r["key"]: r["total"] for r in reduce_groups(df, "key", fn, "key string, total long").collect()}
    assert got == {"a": 3, "b": 3, "z": 9}  # 'z' (last key) present
