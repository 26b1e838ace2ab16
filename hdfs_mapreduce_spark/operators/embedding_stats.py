"""Second-moment statistics over an embedding column: covariance, PCA,
projection — the whitening / dimensionality-reduction toolbox an
embedding pipeline runs before indexing or clustering at scale.

Scale shape (the "small model locally" pattern every centroid operator
here uses): one ``mapInPandas`` pass accumulates per-task partials —
XᵀX (dim × dim), Σx (dim), n — as BLAS ops over Arrow batches, emits
them as O(dim²) ROWS, and a tiny groupBy-sum reduces across tasks. The
shuffle carries dim(dim+1)/2 rows per task (2,080 for dim=64) no matter
how many vectors scanned; nothing corpus-sized moves. The fitted model
(eigenvectors) is dim × dim doubles — broadcast by closure into the
map-side projection, same as the k-means centroid model.

The reference engine has no linear algebra; this extends the
LLM-pipeline surface (SURVEY §2.12) alongside k-means/PQ/ANN.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64


def covariance_long(
    embeddings: DataFrame,
    dim: int = EMB_DIM,
    vec_col: str = "embedding",
) -> DataFrame:
    """Population covariance of the embedding column as an upper-triangle
    long relation (i, j, cov), i ≤ j, 0-based, rounded to 6 decimals
    (the hash-pinning precision: per-task BLAS partials sum in a
    different order than a sequential engine — ~1e-13 apart on sf-scale
    sums, invisible at 6dp). cov = E[x_i x_j] − E[x_i]E[x_j]."""

    def partials(batches):
        import numpy as np

        s_xx = np.zeros((dim, dim))
        s_x = np.zeros(dim)
        n = 0
        for batch in batches:
            if not len(batch):
                continue
            m = np.stack(batch[vec_col].values).astype(np.float64)
            s_xx += m.T @ m
            s_x += m.sum(axis=0)
            n += m.shape[0]
        if n == 0:
            return  # empty partition: emit nothing (Arrow empty-batch trap)
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": iu.astype("int32"),
                "j": ju.astype("int32"),
                "sxx": s_xx[iu, ju],
                "sxi": s_x[iu],
                "sxj": s_x[ju],
                "n": np.full(len(iu), n, dtype="int64"),
            }
        )

    parts = embeddings.select(vec_col).mapInPandas(
        partials, "i int, j int, sxx double, sxi double, sxj double, n long"
    )
    return (
        parts.groupBy("i", "j")
        .agg(
            F.sum("sxx").alias("sxx"),
            F.sum("sxi").alias("sxi"),
            F.sum("sxj").alias("sxj"),
            F.sum("n").alias("n"),
        )
        .select(
            "i",
            "j",
            # + 0.0 normalizes IEEE -0.0 (a tiny negative covariance
            # rounds to it) so both engines hash the same "0.0" text
            (
                F.round(
                    F.col("sxx") / F.col("n")
                    - (F.col("sxi") / F.col("n"))
                    * (F.col("sxj") / F.col("n")),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def _covariance_matrix(
    embeddings: DataFrame, dim: int = EMB_DIM, vec_col: str = "embedding"
):
    """dim × dim numpy covariance + mean vector, assembled driver-side
    from the long relation (dim(dim+1)/2 rows — bounded collect)."""
    import numpy as np

    rows = covariance_long(embeddings, dim, vec_col).collect()
    cov = np.zeros((dim, dim))
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    return cov


def pca_fit(
    embeddings: DataFrame,
    k: int,
    dim: int = EMB_DIM,
    vec_col: str = "embedding",
):
    """Top-k principal components: distributed covariance (one pass) +
    driver-side eigh of the dim × dim matrix — exactly how a production
    pipeline fits PCA when dim is model-sized and N is corpus-sized
    (the O(dim³) eigensolve is microseconds; the corpus never leaves the
    executors). Returns (components [k × dim, rows = descending
    eigenvalue order], eigenvalues [all dim, descending])."""
    cov = _covariance_matrix(embeddings, dim, vec_col)
    comps, vals = _eig_from_cov(cov, k)
    return comps, vals


def _eig_from_cov(cov, k: int):
    """(top-k components [k × dim], all eigenvalues descending) from a
    covariance matrix — the driver-side O(dim³) step of pca_fit, split
    out so audits can reuse one covariance collect."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1]
    vals = vals[order]
    vecs = vecs[:, order]
    # sign convention: largest-|coef| entry of each component positive —
    # eigh's sign is arbitrary and this pins a deterministic choice
    comps = vecs[:, :k].T.copy()
    for c in comps:
        pivot = np.argmax(np.abs(c))
        if c[pivot] < 0:
            c *= -1.0
    return comps, vals


def pca_project(
    embeddings: DataFrame,
    components,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, proj array<double>): map-side projection onto the fitted
    components (k × dim in the kernel closure — broadcast by value, no
    join, no shuffle). The downstream of every PCA: whiten, compress,
    or feed a lower-dim ANN index."""
    import numpy as np

    cmat = np.asarray(components, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(vecs.values).astype(np.float64)
        out = m @ cmat.T
        return pd.Series(list(out))

    return embeddings.select(
        F.col(id_col).alias("vid"), _proj(F.col(vec_col)).alias("proj")
    )
