"""CLI verb surface (python -m hdfs_mapreduce_spark) — the reference
client's command-line workflow end to end, driven in-process against the
shared test session (dfs/client/cli.go is the parity target)."""

from __future__ import annotations

import io
import textwrap

from hdfs_mapreduce_spark.__main__ import run


def _run(argv, spark):
    out = io.StringIO()
    assert run(argv, spark=spark, out=out) == 0
    return out.getvalue()


def test_cli_put_ls_sql_get_rm_roundtrip(spark, tmp_path):
    wh = str(tmp_path / "wh")
    csv = tmp_path / "sales.csv"
    csv.write_text("brand,amount\nacme,10\nacme,20\nglobex,5\n")
    _run(
        ["--warehouse", wh, "put", str(csv), "sales", "--fmt", "csv",
         "--header"],
        spark,
    )
    assert _run(["--warehouse", wh, "ls"], spark).split() == ["sales"]
    got = _run(
        ["--warehouse", wh, "sql",
         "SELECT brand, SUM(amount) AS t FROM sales GROUP BY brand "
         "ORDER BY brand"],
        spark,
    )
    assert got.splitlines() == ["acme\t30", "globex\t5"]
    out_file = tmp_path / "sales_out.tsv"
    _run(
        ["--warehouse", wh, "get", "sales", str(out_file),
         "--order-by", "brand,amount"],
        spark,
    )
    assert out_file.read_text() == "acme\t10\nacme\t20\nglobex\t5\n"
    stats = _run(["--warehouse", wh, "stats"], spark)
    assert '"sales"' in stats and '"n_bytes"' in stats
    _run(["--warehouse", wh, "rm", "sales"], spark)
    assert _run(["--warehouse", wh, "ls"], spark).strip() == ""


def test_cli_compute_runs_a_plugin_file(spark, tmp_path):
    """The reference's compiled-plugin workflow: a plain Python file with
    the mapper/reducer contract, loaded by path, run over a stored table,
    milestones streamed to stdout."""
    wh = str(tmp_path / "wh")
    book = tmp_path / "book.txt"
    book.write_text("the fox\nthe dog\nfox fox\n")
    plugin = tmp_path / "wc_plugin.py"
    plugin.write_text(
        textwrap.dedent(
            """
            import pandas as pd

            MAP_SCHEMA = "key string, value long"
            REDUCE_SCHEMA = "token string, cnt long"

            def mapper(rec):
                for tok in rec["value"].split(" "):
                    if tok:
                        yield {"key": tok, "value": 1}

            def reducer(key, pdf):
                return pd.DataFrame(
                    {"token": [key[0]], "cnt": [int(pdf["value"].sum())]}
                )
            """
        )
    )
    _run(["--warehouse", wh, "put", str(book), "book"], spark)
    out = _run(
        ["--warehouse", wh, "compute", "book", "--plugin", str(plugin),
         "--output", "wc"],
        spark,
    )
    assert out.split() == [
        "job_accepted", "job_mappers", "job_reducers", "job_done"
    ]
    got = _run(
        ["--warehouse", wh, "sql",
         "SELECT token, cnt FROM wc ORDER BY cnt DESC, token"],
        spark,
    )
    assert got.splitlines() == ["fox\t3", "the\t2", "dog\t1"]


def test_cli_rejects_incomplete_plugin(spark, tmp_path):
    import pytest

    wh = str(tmp_path / "wh")
    bad = tmp_path / "bad_plugin.py"
    bad.write_text("def mapper(rec): yield {}\n")
    with pytest.raises(SystemExit, match="missing"):
        run(
            ["--warehouse", wh, "compute", "x", "--plugin", str(bad),
             "--output", "y"],
            spark=spark,
        )


def test_cli_compute_runs_a_binary_plugin(spark, tmp_path):
    """A non-.py plugin path routes through the executable adapter — the
    reference client's actual submission shape (a compiled binary)."""
    from hdfs_mapreduce_spark.operators.binary_plugin import (
        WORDCOUNT_PLUGIN_SRC,
    )

    wh = str(tmp_path / "wh")
    book = tmp_path / "book.txt"
    book.write_text("the fox\nthe dog\nfox fox\n")
    plugin = tmp_path / "word-count"
    plugin.write_text(WORDCOUNT_PLUGIN_SRC)
    plugin.chmod(0o755)
    _run(["--warehouse", wh, "put", str(book), "book"], spark)
    out = _run(
        ["--warehouse", wh, "compute", "book", "--plugin", str(plugin),
         "--output", "wc"],
        spark,
    )
    assert out.splitlines()[0] == "job_accepted"
    assert out.splitlines()[-1] == "job_done"
    got = _run(
        ["--warehouse", wh, "sql",
         "SELECT key, value FROM wc ORDER BY key"],
        spark,
    )
    assert got.splitlines() == ["dog\t1", "fox\t3", "the\t2"]


def test_cli_compute_routes_py_executable_plugin_to_binary(spark, tmp_path):
    """A .py plugin that is really an EXECUTABLE speaking the binary
    protocol (no mapper/reducer module surface — e.g. WORDCOUNT_PLUGIN_SRC
    saved with a .py name) must route through compute_binary, not fail on
    missing module attributes (ADVICE r4, __main__.py routing)."""
    from hdfs_mapreduce_spark.operators.binary_plugin import (
        WORDCOUNT_PLUGIN_SRC,
    )

    wh = str(tmp_path / "wh")
    book = tmp_path / "book.txt"
    book.write_text("a b\nb b\n")
    plugin = tmp_path / "spark_graft_wordcount_plugin.py"
    plugin.write_text(WORDCOUNT_PLUGIN_SRC)
    plugin.chmod(0o755)
    _run(["--warehouse", wh, "put", str(book), "book"], spark)
    out = _run(
        ["--warehouse", wh, "compute", "book", "--plugin", str(plugin),
         "--output", "wc2"],
        spark,
    )
    assert out.splitlines()[-1] == "job_done"
    got = _run(
        ["--warehouse", wh, "sql",
         "SELECT key, value FROM wc2 ORDER BY key"],
        spark,
    )
    assert got.splitlines() == ["a\t1", "b\t3"]
