"""Materialize-then-probe API (r2 verdict item 2): session-unique
scratch paths, round-trip fidelity, and no fixed /tmp collisions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.materialize import (
    materialize,
    materialize_minhash_pairs,
    purge_scratch,
    session_scratch_dir,
)
from hdfs_mapreduce_spark.sources.catalog import load_table

from conftest import SF_SMOKE


def test_scratch_dir_is_keyed_by_application_id(spark):
    path = session_scratch_dir(spark)
    app_id = spark.sparkContext.applicationId
    assert app_id in path
    # two sessions (distinct applicationIds by construction) can never
    # share a scratch tree — the path is a pure function of the id
    class _Ctx:
        applicationId = "app-other-999"

    class _Sess:
        sparkContext = _Ctx()

    other = session_scratch_dir(_Sess())
    assert os.path.dirname(other) == os.path.dirname(path)
    assert other != path


def test_materialize_round_trip_and_cleanup(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("mod")
    )
    out = materialize(df, "mat_test")
    assert sorted(r["id"] for r in out.collect()) == list(range(100))
    # the files landed under this session's scratch, nowhere else
    files = out.inputFiles()
    assert files and all(session_scratch_dir(spark) in f for f in files)
    # overwrite with new content: the probe re-read sees the fresh rows
    out2 = materialize(spark.range(5).select("id"), "mat_test2")
    assert out2.count() == 5
    purge_scratch(spark)
    assert not os.path.exists(session_scratch_dir(spark))


def test_materialized_pairs_match_live_pipeline(spark):
    from hdfs_mapreduce_spark.operators.dedup import minhash_pairs
    from hdfs_mapreduce_spark.plans.dedup_plans import MINHASH_THRESHOLD

    docs = load_table(spark, SF_SMOKE, "documents")
    live = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_pairs(docs, "doc_id", "text", MINHASH_THRESHOLD)
        .select("doc_a", "doc_b")
        .collect()
    }
    mat = {
        (r["doc_a"], r["doc_b"])
        for r in materialize_minhash_pairs(
            docs, "doc_id", "text", MINHASH_THRESHOLD, name="pairs_rt"
        ).collect()
    }
    assert mat == live


def test_two_concurrent_sessions_do_not_collide(spark, tmp_path):
    """A SECOND real SparkSession (separate JVM, own applicationId)
    materializes under the same logical name at the same time as this
    session; both must read back their own rows — the r2 fixed-/tmp bug
    had the second write clobbering the first reader."""
    import subprocess
    import sys
    import textwrap

    mine = materialize(
        spark.range(100).selectExpr("id AS v"), "collide_test"
    )
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from hdfs_mapreduce_spark.session import get_spark
        from hdfs_mapreduce_spark.operators.materialize import (
            materialize, session_scratch_dir,
        )
        spark = get_spark("collide-other")
        spark.sparkContext.setLogLevel("ERROR")
        out = materialize(spark.range(7).selectExpr("id AS v"), "collide_test")
        assert out.count() == 7
        print("OTHER_SCRATCH=" + session_scratch_dir(spark))
        spark.stop()
        """
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    other = [
        line.split("=", 1)[1]
        for line in proc.stdout.splitlines()
        if line.startswith("OTHER_SCRATCH=")
    ][0]
    assert other != session_scratch_dir(spark)
    # this session's artifact survived the other session's same-name write
    assert mine.count() == 100


def test_incremental_probe_against_materialized_sketch(spark):
    """The production incremental-dedup path: materialize the corpus's
    banded sketch once, then probe it with a new batch — results must
    equal the self-contained text-path variant, and the probe plan must
    scan the sketch parquet, never the corpus text."""
    from hdfs_mapreduce_spark.operators.dedup import (
        incremental_minhash_pairs,
        incremental_pairs_against_sketch,
    )
    from hdfs_mapreduce_spark.operators.materialize import (
        materialize_banded_sketch,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    want = {
        (r["new_doc"], r["dup_of"])
        for r in incremental_minhash_pairs(
            corpus, batch, "doc_id", "text", 0.5
        ).collect()
    }
    sketch = materialize_banded_sketch(
        corpus, "doc_id", "text", name="inc_sketch"
    )
    probe = incremental_pairs_against_sketch(
        sketch, batch, "doc_id", "text", 0.5
    )
    got = {(r["new_doc"], r["dup_of"]) for r in probe.collect()}
    assert got == want
    # the corpus side of the probe is the sketch parquet, not documents
    plan = probe._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]  # AQE echoes the initial plan too
    assert "inc_sketch" in final
    assert final.count("documents.parquet") == 1  # batch side only


def test_banded_sketch_is_append_safe_under_corpus_growth(spark, tmp_path):
    """Continuous-ingest contract: each doc's banded sketch rows depend
    only on that doc (minhash permutations are corpus-independent), so
    growing the corpus appends sketch rows instead of rebuilding —
    sketch(A) ++ sketch(B) must equal sketch(A ∪ B) row for row, and a
    probe against the appended warehouse table must equal a probe against
    a from-scratch sketch of the grown corpus."""
    from hdfs_mapreduce_spark.engine import Engine
    from hdfs_mapreduce_spark.operators.dedup import (
        _banded_sketch,
        incremental_pairs_against_sketch,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    part_a = docs.filter(F.col("doc_id") % 3 != 0)
    part_b = docs.filter(F.col("doc_id") % 3 == 0).filter(
        F.col("doc_id") % 2 == 0
    )
    grown = part_a.unionByName(part_b)
    key = lambda r: (r["doc"], r["band_idx"])  # noqa: E731

    whole = {
        key(r): (r["band_key"], sorted(r["sh"]))
        for r in _banded_sketch(grown, "doc_id", "text").collect()
    }
    pieces = {}
    for part in (part_a, part_b):
        for r in _banded_sketch(part, "doc_id", "text").collect():
            pieces[key(r)] = (r["band_key"], sorted(r["sh"]))
    assert pieces == whole

    # warehouse arc: materialize sketch(A), append sketch(B), probe
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.materialize(_banded_sketch(part_a, "doc_id", "text"), "sk")
    eng.append(_banded_sketch(part_b, "doc_id", "text"), "sk")
    batch = docs.filter(F.col("doc_id") % 3 == 0).filter(
        F.col("doc_id") % 2 == 1
    )
    via_table = {
        (r["new_doc"], r["dup_of"])
        for r in incremental_pairs_against_sketch(
            eng.get("sk"), batch, "doc_id", "text", 0.5
        ).collect()
    }
    fresh = {
        (r["new_doc"], r["dup_of"])
        for r in incremental_pairs_against_sketch(
            _banded_sketch(grown, "doc_id", "text"),
            batch, "doc_id", "text", 0.5,
        ).collect()
    }
    assert via_table == fresh


def test_engine_materialize_writes_into_warehouse(spark, tmp_path):
    from hdfs_mapreduce_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    out = eng.materialize(spark.range(10).select("id"), "edges")
    assert out.count() == 10
    assert "edges" in eng.ls()
    # durable: survives independent of the session scratch
    assert all(str(tmp_path / "wh") in f for f in out.inputFiles())


def test_materialize_refresh_from_itself_is_safe(spark, tmp_path):
    """Overwriting an artifact with a plan THAT READS the artifact must
    not destroy it: materialize writes to a temp sibling (executing the
    lazy input against the old files) and renames into place — the
    compact() pattern (r3 ADVICE: in-place mode=overwrite deleted the
    source before the read ran)."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.operators.materialize import materialize

    base = str(tmp_path / "mat")
    first = materialize(
        spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v")),
        "art",
        base=base,
    )
    assert first.count() == 10
    # refresh the artifact FROM ITSELF: increment v in place
    refreshed = materialize(
        first.select("id", (F.col("v") + 1).alias("v")), "art", base=base
    )
    got = {r["id"]: r["v"] for r in refreshed.collect()}
    assert got == {i: i * 2 + 1 for i in range(10)}


def test_incremental_probe_validates_sketch_band_shape(spark):
    """A wide-config probe against a default-config sketch must RAISE,
    not silently join nothing (band keys are r-part strings — a shape
    mismatch matches zero rows, the worst failure for an ingest gate);
    and the wide sketch built via materialize_banded_sketch round-trips
    with a wide probe."""
    import pytest as _pytest

    from hdfs_mapreduce_spark.operators.dedup import (
        incremental_minhash_pairs,
        incremental_pairs_against_sketch,
    )
    from hdfs_mapreduce_spark.operators.materialize import (
        materialize_banded_sketch,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    default_sketch = materialize_banded_sketch(
        corpus, "doc_id", "text", name="inc_sketch_r2"
    )
    with _pytest.raises(ValueError, match="shape mismatch"):
        incremental_pairs_against_sketch(
            default_sketch, batch, "doc_id", "text", 0.5,
            n_perm=32, n_bands=8,
        )
    wide_sketch = materialize_banded_sketch(
        corpus, "doc_id", "text", name="inc_sketch_r4",
        n_perm=32, n_bands=8,
    )
    got = {
        (r["new_doc"], r["dup_of"])
        for r in incremental_pairs_against_sketch(
            wide_sketch, batch, "doc_id", "text", 0.5,
            n_perm=32, n_bands=8,
        ).collect()
    }
    want = {
        (r["new_doc"], r["dup_of"])
        for r in incremental_minhash_pairs(
            corpus, batch, "doc_id", "text", 0.5, n_perm=32, n_bands=8
        ).collect()
    }
    assert got == want
