"""The two jobs the reference actually shipped, re-expressed twice each:
once as pure Column expressions (the preferred, codegen'd path) and once on
the generic plugin surface (proving the arbitrary-code capability).

1. **word count** (mapreduce_plugin_mock/word-count.go):
   MAP (lines 55-71): replace tabs with spaces, split on single spaces, drop
   empty tokens, emit ``(token, 1)``. REDUCE (lines 73-79): sum the 1s.
2. **reviews average** (mapreduce_plugin_mock/reviews.go):
   MAP (lines 53-65): naive comma-split of a CSV line (no quoting), project
   column 1 (brand) and 5 (rating), keep only rows whose rating parses as an
   INTEGER ("4" yes, "4.5" no, "N/A" no). REDUCE (lines 67-75): mean per brand.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdfs_mapreduce_spark.functions.plugin import run_mapreduce


# --- word count -------------------------------------------------------------
def word_count_expr(lines: DataFrame, text_col: str = "text") -> DataFrame:
    """Column-expression word count with the plugin's exact token semantics."""
    return (
        lines.select(
            F.explode(
                F.split(F.regexp_replace(text_col, "\t", " "), " ")
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("token")
    )


def word_count_plugin(lines: DataFrame, text_col: str = "text") -> DataFrame:
    """Same job through the generic plugin surface (mapInPandas +
    applyInPandas), mirroring word-count.go's MAP/REDUCE pair."""

    def mapper(rec):
        # word-count.go:57-70 — tab→space, split on single space, drop empties
        for token in rec[text_col].replace("\t", " ").split(" "):
            if token:
                yield {"key": token, "value": 1}

    def reducer(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # word-count.go:73-79 — sum of 1s
        return pd.DataFrame({"token": [key[0]], "cnt": [int(pdf["value"].sum())]})

    return run_mapreduce(
        lines.select(text_col),
        mapper,
        reducer,
        map_schema="key string, value long",
        reduce_schema="token string, cnt long",
    ).orderBy("token")


# --- reviews average ----------------------------------------------------------
def _int_rating(col):
    """reviews.go:59-63 keeps a row only when rating parses as an integer.
    TRY_CAST-to-long after trimming; '4.5' and 'N/A' become NULL and drop."""
    return F.trim(col).try_cast("long")


def reviews_avg_expr(reviews: DataFrame) -> DataFrame:
    """Column-expression filter+project+group-avg over a typed reviews table."""
    return (
        reviews.select("brand", _int_rating(F.col("rating")).alias("r"))
        .filter(F.col("r").isNotNull())
        .groupBy("brand")
        .agg(F.avg("r").alias("avg_rating"))
        .orderBy("brand")
    )


def reviews_avg_csv_expr(lines: DataFrame, text_col: str = "text") -> DataFrame:
    """The plugin's actual input shape: raw CSV *lines*, naive comma split
    (reviews.go:57 — no quoting), project cols 1 and 5."""
    parts = F.split(F.col(text_col), ",")
    return reviews_avg_expr(
        lines.select(
            parts.getItem(1).alias("brand"), parts.getItem(5).alias("rating")
        )
    )


def reviews_avg_plugin(lines: DataFrame, text_col: str = "text") -> DataFrame:
    """Same job through the plugin surface, mirroring reviews.go MAP/REDUCE."""

    def mapper(rec):
        # reviews.go:56-65
        fields = rec[text_col].split(",")
        if len(fields) < 6:
            return
        brand, rating = fields[1], fields[5].strip()
        try:
            value = int(rating)
        except ValueError:
            return
        yield {"key": brand, "value": value}

    def reducer(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # reviews.go:67-75
        return pd.DataFrame(
            {"brand": [key[0]], "avg_rating": [float(pdf["value"].mean())]}
        )

    return run_mapreduce(
        lines.select(text_col),
        mapper,
        reducer,
        map_schema="key string, value long",
        reduce_schema="brand string, avg_rating double",
    ).orderBy("brand")
