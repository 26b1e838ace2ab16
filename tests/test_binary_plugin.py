"""Binary-plugin adapter parity (operators/binary_plugin.py): a real
executable speaking the reference's plugin protocol
(mapreduce_plugin_mock/word-count.go, dfs/compute_engine/compute_engine.go)
run through both transports must reproduce the expression word count
exactly — including the tab→space / single-space-split / drop-empties
token quirks and the reference engine's trailing-tab reduce value string.
"""

from __future__ import annotations

import os
import stat

import pytest

from hdfs_mapreduce_spark.functions.reference_jobs import word_count_expr
from hdfs_mapreduce_spark.operators.binary_plugin import (
    WORDCOUNT_PLUGIN_SRC as PLUGIN_SRC,
    exec_map,
    run_binary_mapreduce,
)
from tests.test_reference_semantics import WORDCOUNT_EXPECTED, WORDCOUNT_LINES


@pytest.fixture(scope="module")
def plugin_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("plugins") / "word-count"
    p.write_text(PLUGIN_SRC)
    p.chmod(p.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    return str(p)


@pytest.fixture()
def lines_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(WORDCOUNT_LINES)],
        "key long, value string",
    )


@pytest.mark.parametrize("mode", ["stdin", "argv"])
def test_binary_wordcount_matches_reference_fixture(
    spark, lines_df, plugin_path, mode
):
    out = run_binary_mapreduce(lines_df, plugin_path, mode=mode).collect()
    got = {r["key"]: int(r["value"]) for r in out}
    assert got == WORDCOUNT_EXPECTED


def test_binary_wordcount_matches_expression_twin(spark, lines_df, plugin_path):
    docs = spark.createDataFrame([(t,) for t in WORDCOUNT_LINES], "text string")
    expr = {r["token"]: r["cnt"] for r in word_count_expr(docs).collect()}
    binary = {
        r["key"]: int(r["value"])
        for r in run_binary_mapreduce(lines_df, plugin_path).collect()
    }
    assert binary == expr


def test_map_phase_emits_raw_pairs(spark, plugin_path):
    df = spark.createDataFrame([(0, "a b a")], "key long, value string")
    pairs = [
        (r["key"], r["value"])
        for r in exec_map(df, plugin_path).collect()
    ]
    assert sorted(pairs) == [("a", "1"), ("a", "1"), ("b", "1")]


def test_malformed_plugin_output_lines_are_dropped(spark, tmp_path):
    # Emits a valid pair, a no-tab line, an empty-key line and an
    # empty-value line; only the valid pair must survive — the engine's
    # parse contract (compute_engine.go:165-176).
    src = (
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "for line in sys.stdin:\n"
        "    print('ok\\t1')\n"
        "    print('noTabLine')\n"
        "    print('\\tnokey')\n"
        "    print('novalue\\t')\n"
    )
    p = tmp_path / "messy"
    p.write_text(src)
    p.chmod(0o755)
    df = spark.createDataFrame([(0, "x")], "key long, value string")
    out = exec_map(df, str(p)).collect()
    assert [(r["key"], r["value"]) for r in out] == [("ok", "1")]


def test_failing_plugin_raises(spark, tmp_path):
    p = tmp_path / "boom"
    p.write_text("#!/usr/bin/env python3\nimport sys\nsys.exit(3)\n")
    p.chmod(0o755)
    df = spark.createDataFrame([(0, "x")], "key long, value string")
    with pytest.raises(Exception, match="rc=3|boom|PythonException|JobFailed"):
        exec_map(df, str(p)).collect()


def test_newlines_in_values_cannot_split_stdin_framing(spark, plugin_path):
    """A value containing newlines must behave as if they were spaces
    (the line protocol cannot carry them), never as extra records."""
    df = spark.createDataFrame(
        [(0, "a\nb"), (1, "c\r\nd e")], "key long, value string"
    )
    got = {
        r["key"]: int(r["value"])
        for r in run_binary_mapreduce(df, plugin_path).collect()
    }
    assert got == {"a": 1, "b": 1, "c": 1, "d": 1, "e": 1}
