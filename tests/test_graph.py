"""Graph analytics: triangle counting (degree-ordered orientation)."""

from __future__ import annotations

from hdfs_mapreduce_spark.operators.components import triangle_counts


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: r["n_tri"]
        for r in triangle_counts(df, "a", "b").collect()
    }


def test_triangles_k4_every_node_in_three(spark):
    """K4 has C(4,3)=4 triangles; every node sits in exactly 3."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert _counts(spark, k4) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_path_and_open_wedge_yield_none(spark):
    """Paths and stars close no triangle — empty result, not zeros."""
    assert _counts(spark, [(1, 2), (2, 3), (3, 4), (2, 5)]) == {}


def test_triangles_counted_once_with_hub(spark):
    """A hub node in two edge-disjoint triangles counts 2; spokes 1 each.
    Degree ordering must not double- or zero-count around the hub."""
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)]
    assert _counts(spark, edges) == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_graph_triangles_hot_cell_sampling(spark, tmp_path, monkeypatch):
    """A cell denser than TRI_CELL_MAX is SAMPLED to the cap (stable
    per-user hash rank), not dropped: the census stays populated and
    per-cell pair expansion is bounded at C(cap, 2). Regression for the
    sf1 smoke finding where drop-the-cell semantics emptied the graph."""
    import datetime

    from hdfs_mapreduce_spark.plans import analytics_plans as ap

    # 12 users all active in the same six (event_type, hour) cells —
    # far over a cap of 4.
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h in range(6):
        for u in range(12):
            rows.append(
                (eid, ts0 + datetime.timedelta(hours=h), u, "click", 1.0, "{}")
            )
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    # single FILE like the driver fixtures (load_table's unit probe
    # reads the schema with pyarrow, which wants a file, not a dir)
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    monkeypatch.setattr(ap, "TRI_CELL_MAX", 4)
    out = ap.graph_triangles(spark, str(tmp_path)).collect()
    nodes = {r["node"] for r in out}
    # Every cell has identical membership, so the SAME 4 hash-ranked
    # users survive in each cell; they share 6 >= TRI_MIN_SHARED cells,
    # forming K4 -> exactly those 4 nodes, 3 triangles each.
    assert len(nodes) == 4
    assert all(r["n_tri"] == 3 for r in out)
