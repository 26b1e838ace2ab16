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
