"""Covariance / PCA / projection operators (operators/embedding_stats.py):
the distributed partials must reproduce numpy's answers exactly at 6dp,
and the fitted model must satisfy the PCA invariants the declared audit
query certifies."""

from __future__ import annotations

import numpy as np

from hdfs_mapreduce_spark.operators.embedding_stats import (
    _eig_from_cov,
    covariance_long,
    pca_fit,
    pca_project,
)


def _toy(spark, n=40, dim=6, parts=8, seed=7):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim) * rng.uniform(0.5, 2.0, dim) + rng.randn(dim)
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)
    return df, m


def test_covariance_matches_numpy_exactly_at_6dp(spark):
    df, m = _toy(spark)
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_long(df, dim=6).collect()
    }
    want = np.cov(m, rowvar=False, bias=True)  # population covariance
    assert len(got) == 6 * 7 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert abs(v - round(want[i, j], 6)) < 2e-6, (i, j, v, want[i, j])
    # more partitions than rows: empty partitions must contribute nothing
    sparse = df.repartition(64)
    got2 = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_long(sparse, dim=6).collect()
    }
    assert got2 == got


def test_pca_fit_invariants_and_projection(spark):
    df, m = _toy(spark, n=60, dim=6)
    comps, vals = pca_fit(df, k=3, dim=6)
    # eigenvalues descending, nonnegative for a covariance matrix
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(5))
    assert vals[-1] > -1e-9
    # components orthonormal
    assert np.max(np.abs(comps @ comps.T - np.eye(3))) < 1e-9
    # sign convention: largest-|coef| entry positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0
    # distributed projection == numpy matmul
    proj = {
        r["vid"]: np.array(r["proj"])
        for r in pca_project(df, comps).collect()
    }
    want = m @ comps.T
    for vid, p in proj.items():
        assert np.allclose(p, want[vid], atol=1e-9)
    # the PCA identity the audit certifies: variance along component c
    # equals eigenvalue c (population variance, same bias as covariance)
    pm = np.stack([proj[i] for i in range(60)])
    pv = pm.var(axis=0)
    assert np.allclose(pv, vals[:3], atol=1e-6)


def test_eig_from_cov_recovers_planted_axes():
    # planted diagonal covariance: components are the axes, eigenvalues
    # the diagonal, descending
    cov = np.diag([9.0, 4.0, 1.0])
    comps, vals = _eig_from_cov(cov, 2)
    assert np.allclose(vals, [9.0, 4.0, 1.0])
    assert np.allclose(np.abs(comps), [[1, 0, 0], [0, 1, 0]], atol=1e-12)
