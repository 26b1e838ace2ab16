"""Multimodal plumbing tests: schema, batch shape, UDTF fan-out, stub gating."""

from __future__ import annotations

import pytest

from hdfs_mapreduce_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload,
    content_dedup,
    decode_payload,
    fake_decoder,
    frame_sample,
    payload_stats,
)


@pytest.fixture()
def payloads(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "x" * 200)],
        "doc_id long, text string",
    )
    return attach_payload(df, "doc_id", "text")


def test_payload_schema(payloads):
    assert payloads.schema.simpleString() == (
        "struct<id:bigint,payload:binary,"
        "meta:struct<mime:string,n_bytes:bigint,sha256:string>>"
    )


def test_payload_stats_and_dedup(payloads):
    stats = {r["id"]: r for r in payload_stats(payloads).collect()}
    assert stats[1]["n_bytes"] == 11
    assert stats[1]["sha256"] == stats[2]["sha256"]  # same content
    dedup = {r["keep_id"]: r["n_copies"] for r in content_dedup(payloads).collect()}
    assert dedup == {1: 2, 3: 1}


def test_decode_stub_raises_without_codec(payloads):
    with pytest.raises(Exception) as exc_info:
        decode_payload(payloads).collect()
    assert "NotImplementedError" in str(exc_info.value) or "no media codec" in str(
        exc_info.value
    )


def test_decode_with_fake_decoder(payloads):
    rows = decode_payload(payloads, decoder=fake_decoder).collect()
    feats = {r["id"]: r["features"] for r in rows}
    assert len(feats) == 3
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    assert feats[1] == feats[2]  # deterministic: same bytes → same features
    assert feats[1] != feats[3]


def test_frame_sample_udtf_shape(payloads):
    rows = frame_sample(payloads, every_n_bytes=64, max_frames=8).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[1]) == 1  # 11 bytes → 1 frame
    assert len(by_id[3]) == 3  # 200 bytes → 3 frames of 64
    assert by_id[3][0]["frame"] == b"x" * 64

def test_tile_grid_matches_python_reference(spark):
    """Every tile byte-equals the row-major slicing computed sequentially
    in Python, ragged edges short (never padded)."""
    from hdfs_mapreduce_spark.operators.multimodal import (
        attach_payload,
        tile_grid,
    )
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(30)
    mm = attach_payload(docs, "doc_id", "text")
    row_b, tw, th = 64, 16, 4
    got = {
        (r["id"], r["tile_x"], r["tile_y"]): bytes(r["tile"])
        for r in tile_grid(mm, row_b, tw, th).collect()
    }
    payloads = {r["id"]: bytes(r["payload"]) for r in mm.collect()}
    # INDEPENDENT oracle (structurally different from the implementation:
    # per-byte coordinate arithmetic, not slicing): byte i of the payload
    # lands in tile (tx, ty) at a position determined by consuming the
    # tile row-chunk by row-chunk — place every byte, then compare whole
    # tiles. A slicing off-by-one in the operator cannot be mirrored here.
    want: dict = {}
    for rid, p in payloads.items():
        placed: dict = {}
        for i, byte in enumerate(p):
            scan_row, col = divmod(i, row_b)
            tx, ty = col // tw, scan_row // th
            placed.setdefault((rid, tx, ty), []).append((scan_row, col, byte))
        for key, cells in placed.items():
            cells.sort()  # row-major within the tile
            want[key] = bytes(b for _, _, b in cells)
    assert got == want


def test_audio_windows_overlap_and_coverage(spark):
    """Window/hop framing: starts advance by hop, each chunk byte-equals
    the python slice, and with hop < win every byte is covered by at
    least one window."""
    from hdfs_mapreduce_spark.operators.multimodal import (
        attach_payload,
        audio_windows,
    )
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    mm = attach_payload(docs, "doc_id", "text")
    win, hop = 32, 16
    payloads = {r["id"]: bytes(r["payload"]) for r in mm.collect()}
    rows = audio_windows(mm, win, hop).collect()
    seen_bytes: dict = {rid: 0 for rid in payloads}
    for r in rows:
        p = payloads[r["id"]]
        assert r["start_byte"] == r["win_idx"] * hop
        assert bytes(r["chunk"]) == p[r["start_byte"] : r["start_byte"] + win]
    for rid, p in payloads.items():
        covered = set()
        for r in rows:
            if r["id"] == rid:
                covered.update(
                    range(r["start_byte"], r["start_byte"] + len(bytes(r["chunk"])))
                )
        assert covered == set(range(len(p)))
    del seen_bytes


def test_decoded_features_cluster_end_to_end(spark):
    """Cross-module composition: payload -> fake decode (Arrow batch) ->
    kmeans_fit over the feature vectors — the multimodal clustering
    pipeline with the codec stubbed and everything else real."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.operators.multimodal import (
        attach_payload,
        decode_payload,
        fake_decoder,
    )
    from hdfs_mapreduce_spark.operators.similarity import kmeans_fit
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    mm = attach_payload(docs, "doc_id", "text")
    feats = decode_payload(mm, decoder=fake_decoder).select(
        F.col("id").alias("vec_id"),
        F.col("features").cast("array<float>").alias("embedding"),
    )
    cents, assignment, _ = kmeans_fit(feats, k=4, max_iter=3, tol=0.0)
    assert 1 <= len(cents) <= 4
    assert assignment.count() == 100
    assert assignment.groupBy("cluster").count().count() == len(cents)
