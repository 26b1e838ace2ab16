"""Interactive shell (hdfs_mapreduce_spark/shell.py) — the reference's
menu client driven end to end over a scripted stdin pipe
(dfs/client/cli.go:63-166 menu loop + dfs/client/dir.go:96-145 virtual
directory tree are the parity targets)."""

from __future__ import annotations

import io
import textwrap

from hdfs_mapreduce_spark.engine import Engine
from hdfs_mapreduce_spark.shell import (
    Shell,
    list_remote_paths,
    local_choices,
    remote_choices,
)


def _shell(eng, script: str, tmp_path) -> str:
    out = io.StringIO()
    sh = Shell(
        eng,
        in_stream=io.StringIO(script),
        out=out,
        home_dir=str(tmp_path),
    )
    assert sh.run() == 0
    return out.getvalue()


def test_remote_choices_dirs_first_then_files_sorted():
    """dir.go:96-145: folders sort first, then files, both alphabetical;
    only the current level is shown."""
    paths = ["zeta", "alpha/b", "alpha/a", "beta/x/deep", "aaa"]
    assert remote_choices("", paths) == [
        ("alpha", True),
        ("beta", True),
        ("aaa", False),
        ("zeta", False),
    ]
    assert remote_choices("alpha", paths) == [("a", False), ("b", False)]
    assert remote_choices("beta", paths) == [("x", True)]
    assert remote_choices("beta/x", paths) == [("deep", False)]


def test_local_choices_skips_hidden(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "b.txt").write_text("x")
    (tmp_path / ".hidden").write_text("x")
    assert local_choices(str(tmp_path)) == [("sub", True), ("b.txt", False)]


def test_list_remote_paths_renders_nested_tables(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    src = tmp_path / "f.txt"
    src.write_text("hello\n")
    eng.put(str(src), "raw/books/f1")
    eng.put(str(src), "raw/books/f2")
    eng.put(str(src), "top")
    assert list_remote_paths(eng) == ["raw/books/f1", "raw/books/f2", "top"]


def test_shell_menu_upload_download_delete_roundtrip(spark, tmp_path):
    """Full menu session: upload a local file, re-download it, delete it,
    exit — the cli.go Put/Get/Rm flows."""
    eng = Engine(spark, str(tmp_path / "wh"))
    (tmp_path / "notes.txt").write_text("alpha\nbeta\n")
    save_as = tmp_path / "fetched.txt"
    script = "\n".join(
        [
            "2",            # main menu: Upload file
            "notes.txt",    # pick local file by name
            "docs/notes",   # remote name
            "text",         # format
            "1",            # main menu: Download file
            "1",            # descend into docs/
            "1",            # pick notes
            str(save_as),   # save as
            "3",            # main menu: Delete file
            "1",            # descend into docs/
            "1",            # pick notes
            "6",            # Exit
            "",
        ]
    )
    out = _shell(eng, script, tmp_path)
    assert "uploaded" in out and "downloaded" in out and "deleted" in out
    assert sorted(save_as.read_text().splitlines()) == ["alpha", "beta"]
    assert list_remote_paths(eng) == []


def test_shell_invalid_choice_reprompts_and_eof_exits(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    out = _shell(eng, "99\nbogus\n", tmp_path)  # invalid, invalid, EOF
    assert out.count("What do you want to do?") >= 2
    assert "invalid choice: '99'" in out
    assert "bye" in out


def test_shell_cluster_stats_prints_node_blocks(spark, tmp_path):
    """print.go:11-22 parity: one dotted block per node, then back to
    the menu."""
    eng = Engine(spark, str(tmp_path / "wh"))
    out = _shell(eng, "5\n\n6\n", tmp_path)
    assert "StorageNode UUID: driver" in out
    assert "Transferred bytes" in out
    assert "------" in out


def test_shell_compute_runs_module_plugin(spark, tmp_path):
    """cli.go:147-166 Compute flow: remote input + local plugin file +
    output name, result queryable afterwards."""
    eng = Engine(spark, str(tmp_path / "wh"))
    (tmp_path / "book.txt").write_text("the fox\nthe dog\n")
    eng.put(str(tmp_path / "book.txt"), "book")
    (tmp_path / "wc_plugin.py").write_text(
        textwrap.dedent(
            """
            import pandas as pd
            MAP_SCHEMA = "key string, value long"
            REDUCE_SCHEMA = "word string, n long"
            def mapper(rec):
                for w in (rec["value"] or "").split():
                    yield {"key": w, "value": 1}
            def reducer(key, pdf):
                return pd.DataFrame({"word": [key[0]], "n": [len(pdf)]})
            """
        )
    )
    script = "\n".join(
        [
            "4",             # Compute file
            "1",             # remote: book
            "wc_plugin.py",  # local plugin by name
            "wc_out",        # output name
            "6",             # Exit
            "",
        ]
    )
    out = _shell(eng, script, tmp_path)
    assert "computed book -> wc_out" in out
    rows = {
        r["word"]: r["n"]
        for r in eng.sql("SELECT * FROM wc_out").collect()
    }
    assert rows == {"the": 2, "fox": 1, "dog": 1}
