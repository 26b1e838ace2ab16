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


# The reference's SECOND shipped plugin (reviews.go), Go-exact: map keeps
# integer-parsable ratings (reviews.go:59-63); reduce averages with
# ParseFloat's ignored-error-becomes-0.0 semantics (reviews.go:39 in the
# driver main) and %f output formatting (reviews.go:73-74).
REVIEWS_PLUGIN_SRC = """#!/usr/bin/env python3
import sys


def do_map(key, value):
    parts = value.split(",")
    if len(parts) < 6:
        return
    brand, rating = parts[1], parts[5]
    try:
        int(rating)
    except ValueError:
        return
    print(brand + "\\t" + rating)


def do_reduce(key, value_str):
    vals = []
    for v in value_str.split("\\t"):
        try:
            f = float(v)
        except ValueError:
            f = 0.0  # Go: f, _ := strconv.ParseFloat(v, 8) -> 0 on error
        vals.append(f)
    print(key + "\\t" + ("%f" % (sum(vals) / len(vals))))


verb = sys.argv[1].lower()
fn = do_map if verb == "map" else do_reduce
if len(sys.argv) == 4:
    fn(sys.argv[2], sys.argv[3])
else:
    for line in sys.stdin:
        k, _, v = line.rstrip("\\n").partition("\\t")
        fn(k, v)
"""


def test_reviews_binary_plugin_both_transports(spark, tmp_path):
    """The reviews plugin through both transports. The argv path is
    byte-faithful to the reference INCLUDING its latent bug: the engine
    joins reduce values WITH a trailing tab (compute_engine.go:117-121),
    the plugin driver ParseFloats the resulting empty string to 0.0 and
    COUNTS it (reviews.go-style `f, _ :=`), so every mean divides by
    n+1. The stdin transport frames cleanly and yields the correct
    means — the difference is the reference's bug, reproduced on purpose
    and documented here."""
    from tests.test_reference_semantics import REVIEWS_LINES

    p = tmp_path / "reviews"
    p.write_text(REVIEWS_PLUGIN_SRC)
    p.chmod(0o755)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REVIEWS_LINES)],
        "key long, value string",
    )
    correct = {"acme": "4.500000", "bravo": "2.500000", "charlie": "5.000000"}
    stdin_out = {
        r["key"]: r["value"]
        for r in run_binary_mapreduce(df, str(p), mode="stdin").collect()
    }
    assert stdin_out == correct
    # argv: trailing tab -> one extra 0.0 per group (reference-faithful)
    buggy = {"acme": "3.000000", "bravo": "1.666667", "charlie": "2.500000"}
    argv_out = {
        r["key"]: r["value"]
        for r in run_binary_mapreduce(df, str(p), mode="argv").collect()
    }
    assert argv_out == buggy
