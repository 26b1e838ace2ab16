"""Similarity-search behavioral tests: LSH on planted clusters, brute-force
consistency."""

from __future__ import annotations

from hdfs_mapreduce_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_lsh,
)

DIM = 8


def _clustered(spark):
    """Deterministic corpus: a base direction, 5 tiny perturbations of it,
    and 20 orthogonal-ish distractors. No RNG — perturbations are hash-free
    fixed offsets."""
    rows = []
    base = [1.0] * DIM
    rows.append((0, base))
    for i in range(1, 6):  # near-duplicates of vec 0
        rows.append((i, [1.0 + 0.01 * ((i + d) % 3) for d in range(DIM)]))
    for i in range(6, 26):  # distractors pointing elsewhere
        v = [0.0] * DIM
        v[i % DIM] = 1.0
        v[(i + 3) % DIM] = -1.0
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_ranks_cluster_first(spark):
    emb = _clustered(spark)
    out = ann_topk_bruteforce(emb, [0], k=5, id_col="vec_id").collect()
    # the 5 perturbed copies of vec 0 outrank every distractor (order within
    # the cluster depends on the mod-3 perturbation pattern, so set-compare)
    assert {r["neighbor_id"] for r in out} == {1, 2, 3, 4, 5}
    assert all(r["cos_sim"] > 0.99 for r in out)


def test_lsh_recall_on_cluster(spark):
    """Near-identical vectors share hyperplane signs, so multi-probe LSH must
    recover the full cluster — recall 1.0 on this fixture."""
    emb = _clustered(spark)
    brute = {
        r["neighbor_id"]
        for r in ann_topk_bruteforce(emb, [0], k=5, id_col="vec_id").collect()
    }
    lsh = {
        r["neighbor_id"]
        for r in ann_topk_lsh(emb, [0], k=5, dim=DIM, probes=2).collect()
    }
    assert brute <= lsh | brute  # sanity
    assert len(brute & lsh) == len(brute), f"LSH missed {brute - lsh}"


def test_lsh_is_subset_ranked_consistently(spark):
    """On real (random) embeddings LSH returns a candidate subset; every
    returned cos_sim must equal the brute-force value for that pair."""
    from hdfs_mapreduce_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ann_topk_bruteforce(emb, [0, 1], k=500).collect()
    }
    for r in ann_topk_lsh(emb, [0, 1], k=10).collect():
        key = (r["query_id"], r["neighbor_id"])
        assert key in brute
        assert abs(brute[key] - r["cos_sim"]) < 1e-12
