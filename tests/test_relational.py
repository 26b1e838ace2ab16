"""Q1-Q10 (FIXTURES.md §2) vs DuckDB oracle — mirrors the driver's t2 gate."""

from __future__ import annotations

import pytest

from hdfs_mapreduce_spark.plans import ORACLE_SQL, QUERIES
from tests.conftest import SF_CORRECTNESS
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_CORRECTNESS)
    if name not in ORACLE_SQL:
        # Non-SQL-expressible op: rows-only check (mirrors the driver).
        df.collect()
        return
    assert_matches_oracle(df, ddb, ORACLE_SQL[name], name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
