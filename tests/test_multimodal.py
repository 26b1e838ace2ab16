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