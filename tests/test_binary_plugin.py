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


# ---------------------------------------------------------------------------
# _run_stdin lifecycle hardening (ADVICE r4): early generator close must not
# deadlock, and feed-side exceptions must fail the task instead of hanging it.


def _make_exec(tmp_path, name, src):
    p = tmp_path / name
    p.write_text(src)
    p.chmod(0o755)
    return str(p)


def test_early_close_kills_child_instead_of_deadlocking(tmp_path):
    """A consumer that stops early (pushed-down limit / task abort) closes
    the generator mid-stream. The old finally joined the writer thread
    while the child could be blocked writing stdout nobody drains — a
    permanent hang. Now the child is killed on early close and close()
    returns promptly."""
    import threading
    import time

    from hdfs_mapreduce_spark.operators.binary_plugin import _run_stdin

    # Child that echoes forever regardless of stdin EOF: worst case for
    # the old join-first teardown.
    plugin = _make_exec(
        tmp_path,
        "chatty",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "while True:\n"
        "    print('k\\tv', flush=True)\n",
    )

    def endless_input():
        while True:
            yield "a\tb"

    done = threading.Event()

    def consume():
        gen = _run_stdin(plugin, "map", endless_input())
        next(gen)
        gen.close()  # raises GeneratorExit at the yield point
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    deadline = time.monotonic() + 60
    while not done.is_set() and time.monotonic() < deadline:
        time.sleep(0.1)
    assert done.is_set(), "generator close deadlocked"


def test_feed_exception_fails_instead_of_hanging(tmp_path):
    """An exception raised by the INPUT generator (e.g. an upstream Arrow
    error) must close the child's stdin and surface as a RuntimeError —
    the old writer thread died silently, leaving the child blocked on
    stdin forever."""
    from hdfs_mapreduce_spark.operators.binary_plugin import _run_stdin

    plugin = _make_exec(
        tmp_path,
        "cat-kv",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "for line in sys.stdin:\n"
        "    sys.stdout.write(line)\n",
    )

    def exploding_input():
        yield "a\t1"
        raise ValueError("upstream batch decode failed")

    with pytest.raises(RuntimeError, match="input feed failed"):
        list(_run_stdin(plugin, "map", exploding_input()))


def test_reduce_stdin_framing_normalizes_tabs_in_values(spark, tmp_path):
    """Reduce framing tab-joins values, so a tab INSIDE a value would be
    read as a field separator; stdin mode normalizes it to a space (argv
    mode keeps the reference's byte-parity ambiguity)."""
    from hdfs_mapreduce_spark.operators.binary_plugin import exec_reduce

    # Plugin that reports how many values it saw per key.
    plugin = _make_exec(
        tmp_path,
        "count-values",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "for line in sys.stdin:\n"
        "    k, _, vs = line.rstrip('\\n').partition('\\t')\n"
        "    print(k + '\\t' + str(len(vs.split('\\t'))))\n",
    )
    mapped = spark.createDataFrame(
        [("k", "has\ttab"), ("k", "plain")], "key string, value string"
    )
    [row] = exec_reduce(mapped, plugin, mode="stdin").collect()
    assert (row["key"], row["value"]) == ("k", "2")
