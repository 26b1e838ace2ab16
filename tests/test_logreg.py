"""Distributed logistic regression (operators/logreg.py): oracle parity,
learning behavior, and edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.logreg import (
    LOGREG_DIM,
    feature_cells,
    logreg_confusion,
    logreg_fit,
)
from hdfs_mapreduce_spark.plans import ORACLE_SQL, RAW_QUERIES
from hdfs_mapreduce_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECTNESS
from tests.oracle import assert_matches_oracle


def test_logreg_declared_queries_match_oracle(spark, ddb):
    for name in ("quality_logreg_fit", "quality_logreg_score"):
        df = RAW_QUERIES[name](spark, SF_CORRECTNESS)
        assert_matches_oracle(df, ddb, ORACLE_SQL[name], name)


def test_logreg_fit_reduces_log_loss(spark):
    """More rounds must not increase train log-loss (GD on a convex loss
    with a stable step actually descends on this data)."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    label = F.col("lang") == "en"

    def loss(rounds: int) -> float:
        from hdfs_mapreduce_spark.operators.logreg import (
            _margin,
            _sorted_cells,
        )

        w = logreg_fit(docs, label, rounds=rounds)
        base = docs.select(
            F.col("doc_id").alias("doc"),
            label.cast("double").alias("y"),
        ).join(_sorted_cells(feature_cells(docs)), "doc", "left")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w, LOGREG_DIM)))
        row = base.agg(
            F.avg(
                -F.col("y") * F.log(p)
                - (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
            )
        ).collect()[0]
        return row[0]

    l0, l3 = loss(0), loss(3)
    assert math.isfinite(l3)
    assert abs(l0 - math.log(2.0)) < 1e-12  # w=0 -> p=0.5 everywhere
    assert l3 < l0


def test_logreg_fit_is_deterministic(spark):
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    label = F.col("lang") == "en"
    assert logreg_fit(docs, label) == logreg_fit(docs, label)


def test_logreg_handles_zero_token_and_empty_docs(spark):
    """Docs with no tokens get a bias-only margin (no NULL propagation),
    and an empty corpus returns the zero vector."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en"), (2, "   ", "de"), (3, "", "fr")],
        "doc_id long, text string, lang string",
    )
    w = logreg_fit(docs, F.col("lang") == "en", rounds=2)
    assert len(w) == LOGREG_DIM + 1
    assert all(math.isfinite(x) for x in w)
    conf = logreg_confusion(docs, F.col("lang") == "en", rounds=2)
    assert conf.agg(F.sum("n")).collect()[0][0] == 3

    empty = docs.limit(0)
    assert logreg_fit(empty, F.col("lang") == "en") == [0.0] * (
        LOGREG_DIM + 1
    )


def test_feature_cells_are_integer_exact_ratios(spark):
    """Every cell is signed_count / n_tokens with |signed_count| bounded
    by the doc's token count."""
    docs = load_table(spark, SF_CORRECTNESS, "documents").limit(50)
    bad = (
        feature_cells(docs)
        .filter((F.abs(F.col("x")) > 1.0) | F.col("x").isNull())
        .count()
    )
    assert bad == 0
