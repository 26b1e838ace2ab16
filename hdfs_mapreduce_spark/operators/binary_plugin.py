"""Run a user-supplied plugin *binary* over a relation — the literal parity
surface for the reference's compiled-plugin protocol.

The reference ships a compiled executable with each job and forks it once
per record: ``plugin map <lineNo> <line>`` prints ``key\\tvalue`` output
lines (dfs/compute_engine/compute_engine.go:49-69), and ``plugin reduce
<key> <v1\\tv2\\t...>`` prints one result line per key group
(compute_engine.go:93-131, values tab-joined WITH a trailing tab by the
engine's own string building at :117-121). ``functions/plugin.py`` is the
idiomatic replacement (Python callables, Arrow-batched); this module covers
the remaining gap — plugins that exist only as executables.

Two transports:

* ``mode="stdin"`` (default, the scalable one): ONE subprocess per
  PARTITION (task). The adapter writes one framed line per record to the
  child's stdin (``<key>\\t<value>`` for map — the child splits on the
  FIRST tab, so tabs inside the value survive; embedded newlines are
  normalized to spaces by ``_frame_value`` since the line protocol cannot
  carry them; ``<key>\\t<v1>\\t<v2>...`` for reduce, where a tab INSIDE a
  value would BE the field separator and therefore normalizes to a space
  like tabs in keys — argv mode instead keeps the reference's own
  unescaped tab-join for byte parity) and reads
  ``key\\tvalue`` result lines from its stdout. Fork cost is amortized
  over the whole partition, the per-record cost is a pipe write — this is
  the transport a 100 TB run uses. The child is invoked as ``plugin
  <verb>`` and loops over stdin until EOF.
* ``mode="argv"`` (strict parity): byte-faithful to the reference — one
  fork per record with ``[plugin, verb, key, value]`` argv, including the
  trailing-tab value string the reference engine builds for reduce. This
  reproduces the reference's own bottleneck (retrospective.md names the
  fork-per-record design as its main cost) and exists for compatibility
  and parity testing, not for scale.

Both transports drop malformed output lines exactly like the engine's
``parse`` (compute_engine.go:165-176): no tab, empty key, or empty value
→ skipped.

Scale notes: map streams batch-by-batch with no group limit. Reduce groups
with ``collect_list``, so one key's values must fit in executor memory —
the same whole-group-in-one-string contract the reference's reducer had
(it passed ALL values as a single argv string); for unbounded hot keys use
the expression aggregates instead. Values are sorted per key
(``sort_array``) to mirror the reference's external-sort-then-merge order
(dfs/external_sort/extsort.go) and keep output deterministic.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
import threading
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAP_VERB = "map"
REDUCE_VERB = "reduce"

# word-count.go's exact semantics as a self-contained executable speaking
# both transports — the repo's stand-in for the reference's compiled
# plugin (their binary is Go; the protocol, not the implementation
# language, is the contract). Reduce treats unparseable ints as 0,
# matching Go's Atoi-on-error for the engine's trailing-tab value string.
WORDCOUNT_PLUGIN_SRC = """#!/usr/bin/env python3
import sys


def do_map(key, value):
    for w in value.replace("\\t", " ").split(" "):
        if w:
            print(w + "\\t1")


def do_reduce(key, value_str):
    total = 0
    for v in value_str.split("\\t"):
        try:
            total += int(v)
        except ValueError:
            pass
    print(key + "\\t" + str(total))


verb = sys.argv[1].lower()
fn = do_map if verb == "map" else do_reduce
if len(sys.argv) == 4:
    fn(sys.argv[2], sys.argv[3])
else:
    for line in sys.stdin:
        k, _, v = line.rstrip("\\n").partition("\\t")
        fn(k, v)
"""


_PLUGIN_DIR: str | None = None


def _plugin_dir() -> str:
    """Per-process private plugin directory (mode 0700 via mkdtemp), NOT
    the shared world-writable temp dir: a fixed predictable path under
    /tmp would let another local user on a shared host swap the
    executable between write and execution (classic /tmp TOCTOU). The
    directory is created lazily and re-created if deleted out-of-band so
    a cached prepared plan can always re-materialize its plugin."""
    global _PLUGIN_DIR
    if _PLUGIN_DIR is None or not os.path.isdir(_PLUGIN_DIR):
        _PLUGIN_DIR = tempfile.mkdtemp(prefix="spark_graft_plugins_")
        # Remove on interpreter exit so repeated driver processes don't
        # accumulate plugin copies in /tmp. Registered per directory (the
        # dir is re-created if deleted out-of-band, and each incarnation
        # needs its own cleanup); rmtree of an already-gone path is a
        # no-op under ignore_errors.
        import atexit
        import shutil

        atexit.register(shutil.rmtree, _PLUGIN_DIR, ignore_errors=True)
    return _PLUGIN_DIR


def materialize_plugin(src: str, name: str) -> str:
    """Write a plugin script as an executable in a private per-process
    directory (see ``_plugin_dir``), atomically (write-temp + rename), so
    concurrent plan builds can never expose a half-written file to an
    executor. Local-mode Python workers run as the same user, so they can
    exec from the 0700 directory; on a real cluster the same script would
    ship via ``SparkContext.addFile`` to each executor's private scratch
    dir instead."""
    d = _plugin_dir()
    path = os.path.join(d, name)
    fd, tmp = tempfile.mkstemp(dir=d)
    try:
        with os.fdopen(fd, "w") as f:
            f.write(src)
        os.chmod(tmp, 0o755)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def _frame_value(v: str) -> str:
    """Line-protocol framing guard: the reference's records are LINES, so
    values can never contain newlines there; arbitrary DataFrame columns
    can. Embedded newlines would silently split one record into several
    on the child's stdin, so they become spaces (the same normalization
    the word-count mapper applies to tabs). Tabs are left alone — the
    framing splits on the FIRST tab only."""
    if "\n" in v or "\r" in v:
        return v.replace("\r\n", " ").replace("\n", " ").replace("\r", " ")
    return v


def _frame_key(k: str) -> str:
    """Keys additionally may not contain tabs — the framing's field
    separator — so tabs normalize to spaces like newlines do."""
    k = _frame_value(k)
    return k.replace("\t", " ") if "\t" in k else k


def _parse_kv(line: str) -> tuple[str, str] | None:
    """The engine's output-line parse (compute_engine.go:165-176): split on
    the first tab; drop the line unless both key and value are non-empty."""
    if "\t" not in line:
        return None
    key, _, value = line.partition("\t")
    if not key or not value:
        return None
    return key, value


def _run_stdin(
    plugin: str, verb: str, lines: "Iterator[str] | list[str]"
) -> Iterator[str]:
    """One child process per call, fully streaming: a side thread pulls
    framed records from ``lines`` (which may be a lazy generator over the
    task's Arrow batches) and writes them to the child's stdin while the
    caller iterates stdout lines — so neither the input nor the output of
    a partition is ever materialized in memory, and a child that streams
    output can never deadlock the pipes. stderr goes to an unlinked temp
    FILE, not a pipe: a chatty plugin writing more than the ~64 KB pipe
    buffer of diagnostics would otherwise block (nobody drains stderr
    until EOF) and hang the task. Explicit UTF-8 on every stream — the
    executor's locale must not decide whether non-ASCII data round-trips
    — and output splits on '\\n' ONLY (the engine's contract), never on
    the Unicode line separators str.splitlines() would also honor."""
    with tempfile.TemporaryFile() as errf:
        proc = subprocess.Popen(
            [plugin, verb],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=errf,
            text=True,
            encoding="utf-8",
        )

        feed_error: list[BaseException] = []

        def _feed() -> None:
            # Any exception here (not just BrokenPipeError — e.g. a
            # UnicodeEncodeError on a lone surrogate, or an upstream Arrow
            # error from the lazy ``lines`` generator) must still close
            # the child's stdin, or the child blocks reading forever and
            # the task hangs instead of failing. Unexpected exceptions are
            # recorded and re-raised on the consuming side after join.
            try:
                for line in lines:
                    proc.stdin.write(line + "\n")
            except BrokenPipeError:  # child exited early; surfaced below
                pass
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                feed_error.append(exc)
            finally:
                try:
                    proc.stdin.close()
                except (BrokenPipeError, OSError):
                    pass

        writer = threading.Thread(target=_feed)
        writer.start()
        completed = False
        try:
            for out_line in proc.stdout:
                yield out_line[:-1] if out_line.endswith("\n") else out_line
            completed = True
        finally:
            if not completed:
                # Early close (a pushed-down limit stopped consuming this
                # generator, or the task aborted): nobody will drain the
                # child's stdout anymore, so a child blocked writing would
                # never reach stdin EOF and writer.join() would hang the
                # task forever. Kill the child first so both pipes break
                # and the writer thread is guaranteed to finish.
                proc.kill()
            writer.join(timeout=30)
            if writer.is_alive():
                # Writer still blocked (child alive but not reading):
                # terminate the child to break the pipe, then re-join.
                proc.kill()
                writer.join(timeout=30)
            rc = proc.wait()
            proc.stdout.close()
        if feed_error:
            raise RuntimeError(
                f"plugin {plugin!r} {verb} input feed failed"
            ) from feed_error[0]
        if rc != 0:
            errf.seek(0)
            err = errf.read(500).decode("utf-8", "replace")
            raise RuntimeError(
                f"plugin {plugin!r} {verb} failed (rc={rc}): {err}"
            )


def _run_argv(plugin: str, verb: str, key: str, value: str) -> list[str]:
    """The reference's exact invocation: one fork per record
    (compute_engine.go:52-54 / :122)."""
    res = subprocess.run(
        [plugin, verb, key, value],
        capture_output=True,
        text=True,
        encoding="utf-8",
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"plugin {plugin!r} {verb} failed (rc={res.returncode}): "
            f"{res.stderr[:500]}"
        )
    # '\n' only — the engine's contract; splitlines() would also split on
    # Unicode separators embedded in keys/values.
    out = res.stdout.split("\n")
    return out[:-1] if out and out[-1] == "" else out


_PAIR_CHUNK = 10_000


def _chunked_pairs(out_lines: Iterator[str]) -> Iterator[pd.DataFrame]:
    """Parse child output lines into (key, value) DataFrames of at most
    _PAIR_CHUNK rows each — the bounded-memory bridge from the streaming
    pipe to Arrow batches."""
    buf: list[tuple[str, str]] = []
    for line in out_lines:
        p = _parse_kv(line)
        if p:
            buf.append(p)
            if len(buf) >= _PAIR_CHUNK:
                yield pd.DataFrame(buf, columns=["key", "value"])
                buf = []
    if buf:
        yield pd.DataFrame(buf, columns=["key", "value"])


def exec_map(
    df: DataFrame,
    plugin: str,
    key_col: str = "key",
    value_col: str = "value",
    mode: str = "stdin",
) -> DataFrame:
    """MAP phase over a (key, value) relation → (key, value) string pairs.
    The input mirrors the reference's mapper input: key = line number,
    value = line text (sources/catalog.py's line-numbered text loader
    produces exactly this shape). Output rows flow straight into Spark's
    shuffle — the engine's hand-rolled partition/sort/send pipeline
    (compute_engine.go Shuffle) is not re-implemented."""
    if mode not in ("stdin", "argv"):
        raise ValueError(f"unknown plugin transport {mode!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "argv":
            for pdf in batches:
                if not len(pdf):
                    continue
                out_lines: list[str] = []
                for k, v in zip(
                    pdf[key_col].astype(str), pdf[value_col].astype(str)
                ):
                    out_lines.extend(_run_argv(plugin, MAP_VERB, k, v))
                pairs = [p for p in map(_parse_kv, out_lines) if p]
                if pairs:
                    yield pd.DataFrame(pairs, columns=["key", "value"])
            return
        # stdin transport: ONE fork per PARTITION (this generator runs
        # once per task); input batches stream to the child and output
        # lines stream back in bounded chunks — neither side of a large
        # partition is ever held in memory whole.
        def framed() -> Iterator[str]:
            for pdf in batches:
                if len(pdf):
                    yield from (
                        f"{_frame_key(k)}\t{_frame_value(v)}"
                        for k, v in zip(
                            pdf[key_col].astype(str),
                            pdf[value_col].astype(str),
                        )
                    )

        yield from _chunked_pairs(_run_stdin(plugin, MAP_VERB, framed()))

    return df.mapInPandas(gen, "key string, value string")


def exec_reduce(
    mapped: DataFrame,
    plugin: str,
    mode: str = "stdin",
) -> DataFrame:
    """REDUCE phase: group the mapper's (key, value) pairs by key, hand
    each key with its tab-joined values to the plugin, parse one result
    line per key. Values are sorted per key to mirror the reference's
    sort-merge order. In argv mode the value string carries the
    reference's trailing tab (compute_engine.go:117-121)."""
    if mode not in ("stdin", "argv"):
        raise ValueError(f"unknown plugin transport {mode!r}")
    grouped = mapped.groupBy("key").agg(
        F.sort_array(F.collect_list("value")).alias("values")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "argv":
            for pdf in batches:
                if not len(pdf):
                    continue
                rows: list[tuple[str, str]] = []
                for k, vs in zip(pdf["key"], pdf["values"]):
                    joined = "".join(str(v) + "\t" for v in vs)
                    for line in _run_argv(plugin, REDUCE_VERB, str(k), joined):
                        p = _parse_kv(line)
                        if p:
                            rows.append(p)
                if rows:
                    yield pd.DataFrame(rows, columns=["key", "value"])
            return
        # stdin transport: one fork per partition, streaming as in
        # exec_map. Reduce framing tab-JOINS the values, so here (unlike
        # the map phase, which splits on the first tab only) a tab INSIDE
        # a value is the field separator — it is normalized to a space
        # exactly like tabs in keys, keeping the framing unambiguous.
        # argv mode (branch above) retains the reference's own
        # tab-ambiguity for byte parity (its engine tab-joins unescaped
        # values too, compute_engine.go:117-121).
        def framed() -> Iterator[str]:
            for pdf in batches:
                if len(pdf):
                    yield from (
                        _frame_key(str(k))
                        + "\t"
                        + "\t".join(_frame_key(str(v)) for v in vs)
                        for k, vs in zip(pdf["key"], pdf["values"])
                    )

        yield from _chunked_pairs(_run_stdin(plugin, REDUCE_VERB, framed()))

    return grouped.mapInPandas(gen, "key string, value string")


def run_binary_mapreduce(
    df: DataFrame,
    plugin: str,
    key_col: str = "key",
    value_col: str = "value",
    mode: str = "stdin",
) -> DataFrame:
    """The reference's full two-phase binary job: scan → fork map →
    [Spark shuffle] → fork reduce. Returns (key, value) strings — the
    reducer output file's schema."""
    return exec_reduce(
        exec_map(df, plugin, key_col, value_col, mode), plugin, mode
    )
