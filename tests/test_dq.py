"""Data-quality expectations (operators/dq.py): the suite must detect
injected violations of every rule, and pass clean data."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.dq import dq_report
from hdfs_mapreduce_spark.plans import ORACLE_SQL, RAW_QUERIES
from tests.conftest import SF_CORRECTNESS
from tests.oracle import assert_matches_oracle


def test_dq_checks_matches_oracle(spark, ddb):
    df = RAW_QUERIES["dq_checks"](spark, SF_CORRECTNESS)
    assert_matches_oracle(df, ddb, ORACLE_SQL["dq_checks"], "dq_checks")


def _tables(spark, dirty: bool):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "click", 5.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "view", 1.0, "{}"),
            # dirty: duplicate id, bad type, non-positive value, null ts
            *(
                [
                    (2, "2024-01-01 00:02:00", 2, "hover", -1.0, "{}"),
                    (3, None, 2, "click", 0.0, "{}"),
                ]
                if dirty
                else []
            ),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    documents = spark.createDataFrame(
        [(1, "ab cd", "en", "s", 5)]
        + ([(1, "xyz", "en", "s", 99)] if dirty else []),
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    embeddings = spark.createDataFrame(
        [(1, [0.0] * 64)] + ([(1, [0.0] * 3)] if dirty else []),
        "vec_id long, embedding array<float>",
    )
    customer = spark.createDataFrame(
        [(10, "a", 0, 1.0, "B")],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(100, 10, "O", 5.0)]
        + ([(101, 99, "O", -2.0)] if dirty else []),  # orphan + bad price
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [(100, 5.0, 0.05)]
        + ([(999, 77.0, 0.5)] if dirty else []),  # orphan + both ranges
        "l_orderkey long, l_quantity double, l_discount double",
    )
    return events, documents, embeddings, orders, lineitem, customer


def test_dq_report_flags_every_injected_violation(spark):
    out = {
        (r["tbl"], r["check"]): (r["violations"], r["pass"])
        for r in dq_report(*_tables(spark, dirty=True)).collect()
    }
    expected_violations = {
        ("events", "event_id_unique"): 1,
        ("events", "event_type_in_domain"): 1,
        ("events", "value_positive"): 2,  # -1.0 and 0.0
        ("events", "ts_not_null"): 1,
        ("events", "event_id_not_null"): 0,
        ("documents", "doc_id_unique"): 1,
        ("documents", "n_chars_consistent"): 1,
        ("embeddings", "vec_id_unique"): 1,
        ("embeddings", "embedding_dim_64"): 1,
        ("orders", "o_custkey_ri_customer"): 1,
        ("orders", "o_totalprice_positive"): 1,
        ("lineitem", "l_orderkey_ri_orders"): 1,
        ("lineitem", "l_quantity_in_1_50"): 1,
        ("lineitem", "l_discount_in_0_01"): 1,
    }
    for key, v in expected_violations.items():
        assert out[key][0] == v, (key, out[key])
        assert out[key][1] is (v == 0)


def test_dq_report_passes_clean_data(spark):
    rows = dq_report(*_tables(spark, dirty=False)).collect()
    assert len(rows) == 14
    assert all(r["pass"] for r in rows)
    assert all(r["violations"] == 0 for r in rows)


def test_dq_checks_incremental_matches_oracle(spark, ddb):
    df = RAW_QUERIES["dq_checks_incremental"](spark, SF_CORRECTNESS)
    assert_matches_oracle(
        df, ddb, ORACLE_SQL["dq_checks_incremental"], "dq_checks_incremental"
    )


def test_ri_check_with_identical_fk_pk_column_names(spark):
    """ADVICE r6: _ri_check must not become ambiguous (or trivially
    true) when the child's fk and the parent's pk share a column name —
    the parent key is aliased before the anti-join."""
    from hdfs_mapreduce_spark.operators.dq import _ri_check

    child = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    row = _ri_check(child, parent, "k", "k", "child", "k_ri_parent").collect()[
        0
    ]
    assert row["violations"] == 1 and not row["pass"]  # only k=9 orphaned


def test_incremental_row_checks_equals_full_rescan(spark, tmp_path):
    """The Deequ-on-Delta contract: folding CDF deltas into the
    violation counters lands EXACTLY where a fresh full-scan pass over
    the final snapshot lands — across inserts, violation-flipping
    updates (both directions), deletes of violating and clean rows, and
    NULL values."""
    from hdfs_mapreduce_spark.operators.dq import (
        _row_checks,
        incremental_row_checks,
    )
    from hdfs_mapreduce_spark.streaming.logtable import (
        delete_batch,
        snapshot,
        table_changes,
        upsert_batch,
    )

    root = str(tmp_path / "t")
    rows = "k long, v double"
    # v0: 1 clean, 2+3 violating (v < 10), 4 NULL (violates)
    upsert_batch(
        spark.createDataFrame(
            [(1, 50.0), (2, 3.0), (3, 7.0), (4, None)], rows
        ),
        0,
        root,
        "k",
    )
    # v1: fix 2 (violating -> clean), break 1 (clean -> violating),
    #     insert clean 5 and violating 6
    upsert_batch(
        spark.createDataFrame(
            [(2, 30.0), (1, 4.0), (5, 99.0), (6, 1.0)], rows
        ),
        1,
        root,
        "k",
    )
    # v2: delete a violating row (3) and a clean row (5)
    delete_batch(
        spark.createDataFrame([(3,), (5,)], "k long"), 2, root, "k"
    )
    checks = {
        "v_at_least_10": lambda c: c("v").isNull() | (c("v") < 10.0),
        "v_positive": lambda c: c("v").isNull() | (c("v") <= 0.0),
    }
    inc = incremental_row_checks(
        snapshot(spark, root, "k", as_of=0),
        [
            table_changes(spark, root, "k", 0, 1),
            table_changes(spark, root, "k", 1, 2),
        ],
        "t",
        checks,
    )
    full = _row_checks(
        snapshot(spark, root, "k"),
        "t",
        {n: b(lambda c: F.col(c)) for n, b in checks.items()},
    )
    got = {
        r["check"]: (r["n_rows"], r["violations"], r["pass"])
        for r in inc.collect()
    }
    want = {
        r["check"]: (r["n_rows"], r["violations"], r["pass"])
        for r in full.collect()
    }
    assert got == want
    # spot-check the arithmetic: final = {1:4.0, 2:30.0, 4:NULL, 6:1.0}
    assert got["v_at_least_10"] == (4, 3, False)
    assert got["v_positive"] == (4, 1, False)


def test_incremental_row_checks_may_reference_key_col(spark, tmp_path):
    """ADVICE r7: table_changes emits the key column BARE (no
    _before/_after suffix), so a check referencing the key must resolve
    to the bare column on folds instead of failing analysis."""
    from hdfs_mapreduce_spark.operators.dq import (
        _row_checks,
        incremental_row_checks,
    )
    from hdfs_mapreduce_spark.streaming.logtable import (
        snapshot,
        table_changes,
        upsert_batch,
    )

    root = str(tmp_path / "t")
    rows = "k long, v double"
    upsert_batch(
        spark.createDataFrame([(-1, 1.0), (2, 2.0)], rows), 0, root, "k"
    )
    upsert_batch(
        spark.createDataFrame([(-3, 3.0), (2, 0.0)], rows), 1, root, "k"
    )
    checks = {
        "k_positive": lambda c: c("k") <= 0,  # references the key column
        "v_positive": lambda c: c("v").isNull() | (c("v") <= 0.0),
    }
    inc = incremental_row_checks(
        snapshot(spark, root, "k", as_of=0),
        [table_changes(spark, root, "k", 0, 1)],
        "t",
        checks,
    )
    full = _row_checks(
        snapshot(spark, root, "k"),
        "t",
        {n: b(lambda c: F.col(c)) for n, b in checks.items()},
    )
    got = {r["check"]: (r["n_rows"], r["violations"]) for r in inc.collect()}
    want = {
        r["check"]: (r["n_rows"], r["violations"]) for r in full.collect()
    }
    assert got == want
    assert got["k_positive"] == (3, 2)  # final: {-1, 2, -3}


def test_incremental_row_checks_empty_feeds_and_base(spark, tmp_path):
    """Zero-delta folds are identity; an empty base seeds all-zero
    counters (SUM-over-empty NULLs coalesced)."""
    from hdfs_mapreduce_spark.operators.dq import incremental_row_checks

    checks = {"v_positive": lambda c: c("v").isNull() | (c("v") <= 0.0)}
    base = spark.createDataFrame([], "k long, v double")
    out = incremental_row_checks(base, [None], "t", checks).collect()
    assert [(r["n_rows"], r["violations"], r["pass"]) for r in out] == [
        (0, 0, True)
    ]
