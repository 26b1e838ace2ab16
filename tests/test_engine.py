"""Engine facade (PUT/GET/ls/rm/stats/COMPUTE) and skew-salting tests."""

from __future__ import annotations

import pandas as pd
import pytest

from hdfs_mapreduce_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "warehouse"))


def test_put_get_ls_rm_stats(engine, tmp_path):
    src = tmp_path / "dracula.txt"
    src.write_text("the quick brown fox\nthe lazy dog\n")
    engine.put(str(src), "dracula", fmt="text")
    assert engine.ls() == ["dracula"]
    df = engine.get("dracula")
    assert df.count() == 2
    stats = engine.stats()
    assert stats["dracula"]["n_files"] >= 1 and stats["dracula"]["n_bytes"] > 0
    engine.rm("dracula")
    assert engine.ls() == []
    with pytest.raises(FileNotFoundError):
        engine.rm("dracula")


def test_put_collision_rejected(engine, tmp_path):
    src = tmp_path / "f.txt"
    src.write_text("x\n")
    engine.put(str(src), "t", fmt="text")
    with pytest.raises(Exception):  # name collision, like the controller check
        engine.put(str(src), "t", fmt="text")


def test_compute_word_count_end_to_end(engine, tmp_path):
    """The reference's flagship job through the full verb surface:
    PUT text → COMPUTE(map, reduce) → output stored as a table → GET."""
    src = tmp_path / "book.txt"
    src.write_text("the quick\tbrown fox\nthe  lazy dog\n\nfox\tfox fox\ndog\n")

    def mapper(rec):
        for tok in rec["value"].replace("\t", " ").split(" "):
            if tok:
                yield {"key": tok, "value": 1}

    def reducer(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"token": [key[0]], "cnt": [int(pdf["value"].sum())]})

    engine.put(str(src), "book", fmt="text")
    out = engine.compute(
        "book",
        mapper,
        reducer,
        map_schema="key string, value long",
        reduce_schema="token string, cnt long",
        output_name="wc",
    )
    got = {r["token"]: r["cnt"] for r in out.collect()}
    assert got == {"the": 2, "quick": 1, "brown": 1, "fox": 4, "lazy": 1, "dog": 2}
    assert "wc" in engine.ls()


def test_get_file_roundtrip_bytes(engine, tmp_path):
    """PUT a text file, GET it back to a local file — byte-identical, in
    original line order (reference GET semantics: chunk-serial concat,
    dfs/client/downloader.go:144-188)."""
    content = "".join(f"line {i} of the book\n" for i in range(500))
    src = tmp_path / "book.txt"
    src.write_text(content)
    engine.put(str(src), "book_for_get", fmt="text")
    dst = tmp_path / "fetched.txt"
    engine.get_file("book_for_get", str(dst))
    assert dst.read_bytes() == src.read_bytes()


def test_get_file_multicolumn_tsv(engine, tmp_path):
    """Multi-column tables egress as tab-separated KV lines (the
    reference's own intermediate encoding, context.go:146-151)."""
    csv = tmp_path / "kv.csv"
    csv.write_text("k,v\nalpha,1\nbeta,2\n")
    engine.put(str(csv), "kv_table", fmt="csv", header=True, inferSchema=True)
    dst = tmp_path / "kv.tsv"
    engine.get_file("kv_table", str(dst), order_by=["k"])
    assert dst.read_text() == "alpha\t1\nbeta\t2\n"


def test_compute_reports_milestones(engine, tmp_path):
    """on_status sees the reference's ComputationStatus sequence exactly
    once each, in order (proto/dfs.proto:95-107)."""
    import pandas as pd

    from hdfs_mapreduce_spark.engine import JOB_MILESTONES

    src = tmp_path / "status_book.txt"
    src.write_text("".join(f"w{i % 50} w{i % 97}\n" for i in range(20000)))

    def mapper(rec):
        for tok in rec["value"].split(" "):
            if tok:
                yield {"key": tok, "value": 1}

    def reducer(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"token": [key[0]], "cnt": [int(pdf["value"].sum())]})

    seen: list[str] = []
    engine.put(str(src), "status_book", fmt="text")
    engine.compute(
        "status_book",
        mapper,
        reducer,
        map_schema="key string, value long",
        reduce_schema="token string, cnt long",
        output_name="status_wc",
        on_status=seen.append,
    )
    assert tuple(seen) == JOB_MILESTONES


def test_ingest_text_with_lineno_multifile(spark, tmp_path):
    """Per-file 0-based line numbers survive multi-file, multi-partition
    reads (the reference's mapper key, compute_engine.go:47-53)."""
    from hdfs_mapreduce_spark.sources.catalog import ingest_text_with_lineno

    d = tmp_path / "texts"
    d.mkdir()
    for fname, n in (("a.txt", 100), ("b.txt", 37)):
        (d / fname).write_text("".join(f"{fname}:{i}\n" for i in range(n)))
    out = ingest_text_with_lineno(spark, str(d)).collect()
    assert len(out) == 137
    for r in out:
        fname, i = r["value"].split(":")
        assert r["file"].endswith(fname)
        assert r["line_no"] == int(i)


def test_ingest_text_with_lineno_raises_if_input_changes_between_passes(
    spark, tmp_path
):
    """The two-pass numbering plans splits twice; a file that grows between
    pass 1 (count) and pass 2 (assign) must fail LOUDLY, not silently
    mis-number (r2 verdict item 9). The append happens after the eager
    count collect but before the lazy second scan executes."""
    import pytest

    from hdfs_mapreduce_spark.sources.catalog import ingest_text_with_lineno

    d = tmp_path / "texts"
    d.mkdir()
    f = d / "grow.txt"
    f.write_text("".join(f"line{i}\n" for i in range(50)))
    df = ingest_text_with_lineno(spark, str(d))  # pass 1 runs here
    with f.open("a") as fh:
        fh.write("appended-after-pass-1\n")
    with pytest.raises(Exception, match="input changed between passes"):
        df.collect()  # pass 2 recounts and must detect the drift


def test_salted_aggregate_equals_plain(spark):
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.functions.skew import salted_aggregate
    from hdfs_mapreduce_spark.sources.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    plain = {
        r["event_type"]: (r["n"], r["s"], round(r["a"], 9), r["mn"], r["mx"])
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.avg("value").alias("a"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["s"], round(r["a"], 9), r["mn"], r["mx"])
        for r in salted_aggregate(
            events,
            keys=["event_type"],
            aggs={
                "n": ("count", "value"),
                "s": ("sum", "value"),
                "a": ("avg", "value"),
                "mn": ("min", "value"),
                "mx": ("max", "value"),
            },
            distributor="event_id",
            n_salts=8,
        ).collect()
    }
    # float sums can differ in association order; compare at 9 decimals
    assert plain.keys() == salted.keys()
    for k in plain:
        pn, ps, pa, pmn, pmx = plain[k]
        sn, ss, sa, smn, smx = salted[k]
        assert (pn, pmn, pmx) == (sn, smn, smx)
        assert abs(ps - ss) < 1e-6 and abs(pa - sa) < 1e-9


def test_salted_rejects_non_algebraic(spark):
    from hdfs_mapreduce_spark.functions.skew import salted_aggregate
    from hdfs_mapreduce_spark.sources.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    with pytest.raises(ValueError):
        salted_aggregate(
            events, ["event_type"], {"m": ("median", "value")}, "event_id"
        )

def test_salted_join_equals_plain(spark):
    from hdfs_mapreduce_spark.functions.skew import salted_join
    from hdfs_mapreduce_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    plain = {
        (r["o_orderkey"], r["c_name"])
        for r in orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        ).collect()
    }
    salted = {
        (r["o_orderkey"], r["c_name"])
        for r in salted_join(
            orders, customer, "o_custkey", "c_custkey",
            distributor="o_orderkey", n_salts=8,
        ).collect()
    }
    assert salted == plain and len(plain) > 0


def test_put_csv_and_json_roundtrip(engine, tmp_path):
    """S5: every reader format lands as a typed parquet table."""
    csv = tmp_path / "brands.csv"
    csv.write_text("brand,rating\nacme,4\nglobex,5\nacme,3\n")
    engine.put(str(csv), "brands_csv", fmt="csv", header=True, inferSchema=True)
    got = engine.get("brands_csv")
    assert dict(got.groupBy("brand").count().collect()) == {"acme": 2, "globex": 1}
    assert got.schema["rating"].dataType.typeName() in ("integer", "long")

    js = tmp_path / "brands.jsonl"
    js.write_text('{"brand":"acme","rating":4}\n{"brand":"globex","rating":5}\n')
    engine.put(str(js), "brands_json", fmt="json")
    assert engine.get("brands_json").count() == 2
    assert set(engine.ls()) >= {"brands_csv", "brands_json"}

    # ORC round-trip: write an ORC source with Spark, ingest via put
    orc_src = str(tmp_path / "brands_orc_src")
    engine.get("brands_csv").write.orc(orc_src)
    engine.put(orc_src, "brands_orc", fmt="orc")
    got_orc = engine.get("brands_orc")
    assert got_orc.count() == 3
    assert set(got_orc.columns) == {"brand", "rating"}


def test_engine_sql_over_warehouse(engine, tmp_path):
    csv = tmp_path / "sales.csv"
    csv.write_text("brand,amount\nacme,10\nacme,20\nglobex,5\n")
    engine.put(str(csv), "sales", fmt="csv", header=True, inferSchema=True)
    rows = engine.sql(
        "SELECT brand, SUM(amount) AS total FROM sales GROUP BY brand ORDER BY brand"
    ).collect()
    assert [(r["brand"], r["total"]) for r in rows] == [("acme", 30), ("globex", 5)]


def test_engine_sql_view_cache_sees_mutations(engine, tmp_path):
    """sql() registers views incrementally (not a full warehouse re-list
    per call) but must never serve stale views: rm + re-put under the
    same name, and a materialize overwrite, both show fresh data."""
    csv1 = tmp_path / "v1.csv"
    csv1.write_text("k,v\na,1\n")
    engine.put(str(csv1), "t", fmt="csv", header=True, inferSchema=True)
    assert engine.sql("SELECT SUM(v) AS s FROM t").collect()[0]["s"] == 1
    engine.rm("t")
    csv2 = tmp_path / "v2.csv"
    csv2.write_text("k,v\na,5\nb,6\n")
    engine.put(str(csv2), "t", fmt="csv", header=True, inferSchema=True)
    assert engine.sql("SELECT SUM(v) AS s FROM t").collect()[0]["s"] == 11
    # materialize overwrite under a registered name
    spark = engine.spark
    engine.materialize(spark.range(3).selectExpr("id AS v"), "m")
    assert engine.sql("SELECT SUM(v) AS s FROM m").collect()[0]["s"] == 3
    engine.materialize(spark.range(10).selectExpr("id AS v"), "m")
    assert engine.sql("SELECT SUM(v) AS s FROM m").collect()[0]["s"] == 45
    # a removed table disappears from the namespace IMMEDIATELY — the view
    # is dropped at rm() time, so the failure is TABLE_OR_VIEW_NOT_FOUND
    # at analysis, not a confusing FileNotFound at scan time
    engine.rm("m")
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException):
        engine.spark.sql("SELECT * FROM m")  # no sql() re-registration
    with _pytest.raises(AnalysisException):
        engine.sql("SELECT * FROM m").collect()


def test_salted_join_rejects_outer_directions(spark):
    """right/full would replicate unmatched small-side rows n_salts times —
    rejected rather than silently wrong."""
    import pytest as _pytest

    from hdfs_mapreduce_spark.functions.skew import salted_join
    from hdfs_mapreduce_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError):
            salted_join(
                orders, customer, "o_custkey", "c_custkey",
                distributor="o_orderkey", how=how,
            )


def test_compact_merges_small_files_preserving_data(engine, tmp_path):
    src = tmp_path / "many.txt"
    src.write_text("".join(f"line {i}\n" for i in range(100)))
    engine.put(str(src), "many", fmt="text", partitions=8)
    assert engine.stats()["many"]["n_files"] == 8
    before = sorted(r["value"] for r in engine.get("many").collect())
    report = engine.compact("many", target_files=1)
    assert report["files_before"] == 8 and report["files_after"] == 1
    assert engine.stats()["many"]["n_files"] == 1
    after = sorted(r["value"] for r in engine.get("many").collect())
    assert after == before  # byte-identical content, fewer files
    # no temp/backup dirs left behind
    assert engine.ls() == ["many"]
    with pytest.raises(FileNotFoundError):
        engine.compact("missing")


def test_put_partition_by_prunes_at_planning(engine, tmp_path):
    """A hive-partitioned put + a predicate on the partition column must
    prune directories at planning (PartitionFilters), and sql() over the
    table sees the partition column reconstructed."""
    import contextlib
    import io

    src = tmp_path / "ev.csv"
    src.write_text(
        "day,n\n" + "".join(f"d{i % 3},{i}\n" for i in range(30))
    )
    engine.put(
        str(src), "ev", fmt="csv", header=True, inferSchema=True,
        partition_by=["day"],
    )
    from pyspark.sql import functions as F

    q = engine.get("ev").filter(F.col("day") == "d1")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters")[1].split("]")[0]
    assert q.count() == 10
    rows = engine.sql(
        "SELECT day, COUNT(*) AS c FROM ev GROUP BY day ORDER BY day"
    ).collect()
    assert [(r["day"], r["c"]) for r in rows] == [
        ("d0", 10), ("d1", 10), ("d2", 10)
    ]


def test_append_grows_table_and_compact_folds_files(engine, spark):
    """The incremental-ingest arc: append -> row count grows and sql()
    sees fresh data -> compact folds the accumulated files to one."""
    engine.materialize(spark.range(10).selectExpr("id AS v"), "inc")
    for k in range(3):
        engine.append(
            spark.range(5).selectExpr(f"id + {100 + k * 10} AS v"), "inc"
        )
    assert engine.get("inc").count() == 25
    assert engine.sql("SELECT COUNT(*) AS n FROM inc").collect()[0]["n"] == 25
    before = engine.stats()["inc"]["n_files"]
    out = engine.compact("inc", target_files=1)
    assert before > 1 and out["files_after"] == 1
    assert engine.get("inc").count() == 25


def test_append_respects_partitioned_layout(engine, tmp_path, spark):
    """Appending into a hive-partitioned table must keep the layout (same
    partition_by required and honored); mismatched layouts are rejected
    before any file lands."""
    src = tmp_path / "p.csv"
    src.write_text("day,n\nd0,1\nd1,2\n")
    engine.put(
        str(src), "pt", fmt="csv", header=True, inferSchema=True,
        partition_by=["day"],
    )
    import pytest as _pytest

    new = spark.createDataFrame([("d1", 7), ("d2", 8)], "day string, n int")
    with _pytest.raises(ValueError, match="hive-partitioned"):
        engine.append(new, "pt")  # flat append would mix layouts
    engine.append(new, "pt", partition_by=["day"])
    rows = engine.sql(
        "SELECT day, SUM(n) AS s FROM pt GROUP BY day ORDER BY day"
    ).collect()
    assert [(r["day"], r["s"]) for r in rows] == [
        ("d0", 1), ("d1", 9), ("d2", 8)
    ]
    # and the inverse: partitioned append into a flat table is rejected
    engine.materialize(spark.range(3).selectExpr("id AS n"), "flat")
    with _pytest.raises(ValueError, match="unpartitioned"):
        engine.append(
            spark.createDataFrame([("d0", 1)], "day string, n int"),
            "flat",
            partition_by=["day"],
        )


def test_ingest_text_with_lineno_raises_if_file_truncated(spark, tmp_path):
    """A file truncated between the two passes yields fewer pass-2 rows
    for its split; the per-split recount must fail loudly. (Truncation to
    exactly zero bytes in a partition of its own is the one documented
    lazy blind spot — the empty partition runs no check.)"""
    import pytest

    from hdfs_mapreduce_spark.sources.catalog import ingest_text_with_lineno

    d = tmp_path / "texts"
    d.mkdir()
    shrink = d / "shrink.txt"
    shrink.write_text("".join(f"s{i}\n" for i in range(50)))
    df = ingest_text_with_lineno(spark, str(d))  # pass 1 counts 50
    shrink.write_text("".join(f"s{i}\n" for i in range(5)))
    with pytest.raises(Exception, match="input changed between passes"):
        df.collect()


def test_compact_preserves_partitioned_layout_and_stats_sees_nested_files(
    engine, tmp_path
):
    """stats() must count the files inside col=value subdirectories, and
    compact() must rewrite a hive-partitioned table WITH its layout —
    a flat rewrite would keep the data but silently lose directory
    pruning for every later query."""
    import contextlib
    import io

    src = tmp_path / "pp.csv"
    src.write_text("day,n\n" + "".join(f"d{i % 2},{i}\n" for i in range(20)))
    engine.put(
        str(src), "pp", fmt="csv", header=True, inferSchema=True,
        partition_by=["day"],
    )
    st = engine.stats()["pp"]
    assert st["n_files"] >= 2 and st["n_bytes"] > 0  # nested files counted
    out = engine.compact("pp", target_files=1)
    assert out["n_bytes"] > 0
    # layout survived: pruning still plans on the partition column
    from pyspark.sql import functions as F

    q = engine.get("pp").filter(F.col("day") == "d0")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert "day" in buf.getvalue().split("PartitionFilters")[1].split("]")[0]
    assert q.count() == 10
    assert engine.get("pp").count() == 20


def test_multilevel_partitioning_survives_compact_and_append(
    engine, tmp_path, spark
):
    """Two-level hive layout (day=/src=): compact must preserve BOTH
    levels in nesting order (the review repro showed the src= level
    silently flattening), append must validate the ordered column list,
    and pruning on the second level still plans after the rewrite."""
    import contextlib
    import io

    import pytest as _pytest
    from pyspark.sql import functions as F

    src = tmp_path / "ml.csv"
    src.write_text(
        "day,src,n\n"
        + "".join(f"d{i % 2},s{i % 3},{i}\n" for i in range(30))
    )
    engine.put(
        str(src), "ml", fmt="csv", header=True, inferSchema=True,
        partition_by=["day", "src"],
    )
    assert engine._partition_cols("ml") == ["day", "src"]
    engine.compact("ml", target_files=1)
    assert engine._partition_cols("ml") == ["day", "src"]  # both levels kept
    q = engine.get("ml").filter(F.col("src") == "s1")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="formatted")
    pf = buf.getvalue().split("PartitionFilters")[1].split("]")[0]
    assert "src" in pf  # second-level pruning survived the rewrite
    assert engine.get("ml").count() == 30
    # append: order matters — the reversed column list is a different layout
    new = spark.createDataFrame(
        [("d0", "s9", 99)], "day string, src string, n int"
    )
    with _pytest.raises(ValueError, match="in\\s+that order"):
        engine.append(new, "ml", partition_by=["src", "day"])
    engine.append(new, "ml", partition_by=["day", "src"])
    assert engine.get("ml").count() == 31


def test_node_stats_reports_executor_counters(engine, tmp_path):
    """S8's executor-level half (reference dfs/storageNode/stats.go:43-108:
    per-node upload/download counters + free space): after a real scan,
    node_stats reports at least one node with capacity and task counters."""
    src = tmp_path / "ns.txt"
    src.write_text("".join(f"row {i}\n" for i in range(100)))
    engine.put(str(src), "ns", fmt="text")
    assert engine.get("ns").count() == 100
    nodes = engine.node_stats()
    assert len(nodes) >= 1
    active = [n for n in nodes.values() if n["is_active"]]
    assert active, nodes
    for n in active:
        assert n["max_memory"] > 0
        assert n["total_tasks"] > 0
        assert set(n) >= {
            "host_port", "input_bytes", "shuffle_read_bytes",
            "shuffle_write_bytes", "memory_used", "disk_used",
        }


def test_append_into_empty_partitioned_table_defines_layout(
    engine, spark, tmp_path
):
    """A table created with put(partition_by=...) but ZERO rows has no
    col=value directories, so layout inference sees nothing — the first
    real append with a partition layout must be accepted (it defines the
    layout), not rejected as 'unpartitioned' (r3 ADVICE)."""
    src = tmp_path / "empty.csv"
    src.write_text("day,n\n")  # header only: zero data rows
    engine.put(
        str(src), "evt", fmt="csv", header=True,
        schema="day string, n int", partition_by=["day"],
    )
    rows = spark.createDataFrame([("d0", 1), ("d1", 2)], "day string, n int")
    engine.append(rows, "evt", partition_by=["day"])  # must not raise
    assert engine.get("evt").count() == 2
    assert engine._partition_cols("evt") == ["day"]
    # and the layout is now pinned: a different order is rejected
    import pytest as _pytest

    more = spark.createDataFrame([("d2", 3)], "day string, n int")
    engine.append(more, "evt", partition_by=["day"])
    with _pytest.raises(ValueError):
        engine.append(more.select("n", "day"), "evt", partition_by=["n"])


def test_refresh_picks_up_external_writer(engine, spark, tmp_path):
    """Files appended to an EXISTING table by an external writer (outside
    the Engine verbs) are invisible to the pinned view until refresh(name)
    — and visible after it (r3 ADVICE: the docstring used to overclaim)."""
    src = tmp_path / "r.txt"
    src.write_text("a\nb\n")
    engine.put(str(src), "rt", fmt="text")
    assert engine.sql("SELECT COUNT(*) AS n FROM rt").collect()[0]["n"] == 2
    # external writer: append parquet files directly, bypassing the Engine
    extra = spark.createDataFrame([("c",)], "value string")
    extra.write.mode("append").parquet(engine._path("rt"))
    engine.refresh("rt")
    assert engine.sql("SELECT COUNT(*) AS n FROM rt").collect()[0]["n"] == 3


def test_compute_binary_word_count_end_to_end(engine, tmp_path):
    """The literal compute verb: store a text file, run a word-count
    EXECUTABLE through the binary-plugin adapter, persist the reducer
    output as a new table, and get reference-exact counts (milestones
    included)."""
    from hdfs_mapreduce_spark.operators.binary_plugin import (
        WORDCOUNT_PLUGIN_SRC,
    )

    plugin = tmp_path / "word-count"
    plugin.write_text(WORDCOUNT_PLUGIN_SRC)
    plugin.chmod(0o755)
    src = tmp_path / "lines.txt"
    src.write_text("the quick\tbrown fox\nthe  lazy dog\nfox\tfox fox\n")
    engine.put(str(src), "lines", fmt="text")
    seen: list[str] = []
    out = engine.compute_binary(
        "lines", str(plugin), "wc_out", on_status=seen.append
    )
    got = {r["key"]: int(r["value"]) for r in out.collect()}
    assert got == {
        "brown": 1, "dog": 1, "fox": 4, "lazy": 1, "quick": 1, "the": 2,
    }
    assert seen[0] == "job_accepted" and seen[-1] == "job_done"
    assert "wc_out" in engine.ls()


def test_compute_binary_rejects_ambiguous_table(engine, tmp_path):
    import pandas as pd  # noqa: F811

    pdf = pd.DataFrame({"a": ["x"], "b": ["y"], "c": ["z"]})
    engine.spark.createDataFrame(pdf).write.parquet(
        engine._path("wide")
    )
    plugin = tmp_path / "noop"
    plugin.write_text("#!/usr/bin/env python3\n")
    plugin.chmod(0o755)
    with pytest.raises(ValueError, match="key_col/value_col"):
        engine.compute_binary("wide", str(plugin), "out")


def test_auto_salt_join_salts_only_hot_keys_and_equals_plain(spark):
    """VERDICT r6 item 5: auto_salt_join probes the key profile and
    salts exactly the keys above threshold x mean — the hybrid plan's
    salted branch must contain only hot-key rows, the cold branch none
    of them, and the union must equal the plain join row-for-row
    (salting is distribution-only). NULL keys must survive 'left'."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.functions.skew import auto_salt_join, hot_keys

    # key 1 owns 60 of 75 rows (~9.6x mean over 12 keys); key 2 has 5;
    # the rest have 1 each; one NULL-keyed row
    rows = (
        [(i, 1, float(i)) for i in range(60)]
        + [(100 + i, 2, 1.0) for i in range(5)]
        + [(200 + i, 10 + i, 2.0) for i in range(9)]
        + [(300, None, 7.0)]
    )
    big = spark.createDataFrame(rows, "event_id long, k long, v double")
    small = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (10, "cold"), (11, "cold")],
        "sk long, tag string",
    )

    assert hot_keys(big, "k", threshold=4.0, top=20) == [1]

    out = auto_salt_join(
        big, small, "k", "sk", distributor="event_id", threshold=4.0,
        n_salts=4, how="left",
    )
    plain = big.join(small, big["k"] == small["sk"], "left")
    key = lambda r: (r["event_id"], r["k"], r["v"], r["sk"], r["tag"])
    assert sorted(map(key, out.collect())) == sorted(
        map(key, plain.collect())
    )
    # the salted branch replicates ONLY the hot slice of the small side:
    # the plan carries one explode whose input is the filtered (sk = 1)
    # relation, so the cold keys never pay the n_salts-x replication
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "explode" in plan
    import re

    assert len(re.findall(r"Generate explode", plan)) == 1
    # no hot keys above threshold -> the plain join plan, no explode
    calm = auto_salt_join(
        big, small, "k", "sk", distributor="event_id", threshold=50.0,
        n_salts=4, how="left",
    )
    assert "explode" not in calm._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(map(key, calm.collect())) == sorted(
        map(key, plain.collect())
    )


def test_auto_salt_join_rejects_outer_directions_up_front(spark):
    """how='right'/'full' must fail at CALL time, not only on the day a
    key crosses the hot threshold (a data-dependent production crash)."""
    import pytest

    from hdfs_mapreduce_spark.functions.skew import auto_salt_join

    big = spark.createDataFrame([(1, 1)], "event_id long, k long")
    small = spark.createDataFrame([(1, "x")], "sk long, tag string")
    for how in ("right", "full"):
        with pytest.raises(ValueError, match="auto_salt_join supports"):
            auto_salt_join(
                big, small, "k", "sk", distributor="event_id",
                threshold=1e9, how=how,  # calm data: nothing hot
            )


def test_auto_salt_join_rejects_shared_column_names(spark):
    """ADVICE r7: the left-join NULL-pad path selects small's columns
    alongside big's, so a shared name makes the unionByName ambiguous —
    fail at call time with a clear message, not deep in the plan."""
    import pytest

    from hdfs_mapreduce_spark.functions.skew import auto_salt_join

    big = spark.createDataFrame([(1, 1)], "event_id long, k long")
    small = spark.createDataFrame([(1, "x")], "k long, tag string")
    with pytest.raises(ValueError, match="disjoint column names"):
        auto_salt_join(
            big, small, "k", "k", distributor="event_id", how="left"
        )


def test_auto_salt_join_null_keys_skip_the_join(spark):
    """A hot NULL key group is the one skew no join strategy can spread:
    NULL rows must bypass the join entirely — dropped under inner,
    union-back null-padded under left — and never occupy a hot-key
    probe slot."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.functions.skew import auto_salt_join, hot_keys

    rows = [(i, None, 1.0) for i in range(50)]  # hot NULL group
    rows += [(100 + i, 1, 2.0) for i in range(10)]
    rows += [(200 + i, 10 + i, 3.0) for i in range(5)]
    big = spark.createDataFrame(rows, "event_id long, k long, v double")
    small = spark.createDataFrame(
        [(1, "one"), (10, "ten")], "sk long, tag string"
    )
    # the NULL group (the largest!) must not occupy a probe slot
    assert hot_keys(big, "k", threshold=2.0, top=20) == [1]
    for how in ("inner", "left"):
        out = auto_salt_join(
            big, small, "k", "sk", distributor="event_id",
            threshold=2.0, n_salts=4, how=how,
        )
        plain = big.join(small, big["k"] == small["sk"], how)
        key = lambda r: (r["event_id"], r["k"], r["v"], r["sk"], r["tag"])
        assert sorted(map(key, out.collect())) == sorted(
            map(key, plain.collect())
        ), how
