"""Unit tests for text-analysis functions on crafted fixtures (the synthetic
documents table is all English-ish, so language ID needs real multilingual
rows to prove itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

FIXTURE = [
    ("the cat sat on the mat and it is warm", "en"),
    ("der hund ist nicht mit der katze und ich", "de"),
    ("le chat est dans la maison et il est pour les", "fr"),
    ("el perro no es un gato que se fue por los", "es"),
    ("这是一个中文句子没有空格但是很长", "zh"),
    ("", "und"),
    ("zzz qqq xxx", "und"),
]


def test_lang_id(spark):
    df = spark.createDataFrame(FIXTURE, "text string, expected string")
    rows = df.select("expected", lang_id(F.col("text")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"], f"{r['expected']} misdetected as {r['got']}"


def test_token_count_and_quality_bounds(spark):
    df = spark.createDataFrame([(t,) for t, _ in FIXTURE], "text string")
    rows = df.select(
        token_count(F.col("text")).alias("n"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    assert rows[0]["n"] == 10
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b c",)], "text string"
    )
    fps = [r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[2]  # identical text → identical fingerprint
    assert fps[0] != fps[1]  # reordered tokens → different fingerprint


def test_mixture_sample_tracks_solver_rates(spark):
    """The deterministic sample's achieved kept-token share per source must
    land near the solver's achieved_share (hash thresholding is the only
    noise), and rate-1.0 sources must keep every document."""
    import pytest

    from hdfs_mapreduce_spark.plans.text_plans import corpus_reweight, mixture_sample

    sf = "/root/testdata/sf0.001"
    rates = {r["source"]: r for r in corpus_reweight(spark, sf).collect()}
    sample = {r["source"]: r for r in mixture_sample(spark, sf).collect()}
    assert set(rates) == set(sample)
    exp_total = 0.0
    kept_total = 0
    for src, r in rates.items():
        s = sample[src]
        if r["sample_rate"] >= 1.0:
            # A capped (rate-1.0) source keeps every document exactly.
            assert s["n_kept"] == s["n_docs"]
        else:
            # ~25 docs per source flip the hash coin — per-source noise is
            # huge, so only sanity-check the bounds here and test the
            # expectation on the aggregate below.
            assert 0 <= s["n_kept"] < s["n_docs"]
            exp_total += r["sample_rate"] * r["tokens"]
            kept_total += s["kept_tokens"]
    assert kept_total == pytest.approx(exp_total, rel=0.35)


def test_dataset_shuffle_is_a_stable_permutation(spark):
    """The seeded shard shuffle must be a bijection docs <-> (shard, pos)
    with dense 1..n positions per shard, identical across runs (the whole
    point vs rand()), and actually shuffled (not id order)."""
    from hdfs_mapreduce_spark.plans.text_plans import (
        SHUFFLE_SHARDS,
        dataset_shuffle,
    )

    sf = "/root/testdata/sf0.001"
    rows1 = [tuple(r) for r in dataset_shuffle(spark, sf).collect()]
    rows2 = [tuple(r) for r in dataset_shuffle(spark, sf).collect()]
    assert rows1 == rows2  # deterministic, run to run
    shards = {}
    doc_ids = set()
    for shard, pos, doc_id in rows1:
        assert 0 <= shard < SHUFFLE_SHARDS
        shards.setdefault(shard, []).append(pos)
        doc_ids.add(doc_id)
    assert len(doc_ids) == len(rows1)  # bijection: every doc exactly once
    for shard, positions in shards.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # genuinely permuted: within some shard, doc_ids are not monotone
    by_pos = {}
    for shard, pos, doc_id in rows1:
        by_pos.setdefault(shard, []).append((pos, doc_id))
    monotone = all(
        [d for _, d in sorted(v)] == sorted(d for _, d in v)
        for v in by_pos.values()
    )
    assert not monotone


def test_token_entropy_matches_closed_forms(spark, tmp_path):
    """Uniform distribution over k distinct tokens → H = ln(k); a
    single repeated token → H = 0; mixed case folds via lower()."""
    import math

    from hdfs_mapreduce_spark.plans.text_plans import text_token_entropy

    docs = spark.createDataFrame(
        [
            (0, "a b c d"),          # uniform over 4 -> ln(4)
            (1, "x x X x"),          # one token (case-folded) -> 0
            (2, "a a b b b c"),      # mixed: 2/6,3/6,1/6
        ],
        "doc_id long, text string",
    )
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d)
    # load_table expects a single parquet FILE (pyarrow metadata probe)
    docs.toPandas().to_parquet(f"{d}/documents.parquet", index=False)
    out = {r["doc"]: r for r in text_token_entropy(spark, d).collect()}
    assert out[0]["n_tokens"] == 4 and out[0]["n_distinct"] == 4
    assert abs(out[0]["entropy"] - math.log(4)) < 5e-7  # 6dp declared rounding
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct"] == 1
    expect = -sum(p * math.log(p) for p in (2 / 6, 3 / 6, 1 / 6))
    assert abs(out[2]["entropy"] - expect) < 5e-7
