"""Multimodal binary-column plumbing tests (decode is stubbed; the Spark
schema/batching/partitioning behavior is real)."""

from __future__ import annotations

import pytest

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.multimodal.binary import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    real_decode,
    resize_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG fake bytes 1"), "image/png", 640, 480, None),
        (2, "image", bytearray(b"\x89PNG fake bytes 2"), "image/png", 1024, 768, None),
        (3, "audio", bytearray(b"RIFF fake wav"), "audio/wav", None, None, 90_000),
        (4, "video", bytearray(b"ftyp fake mp4"), "video/mp4", 1920, 1080, 10_000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)


def test_extract_features_shapes_and_determinism(spark, media):
    out = extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows.values())
    assert all(0.0 <= v < 1.0 for r in rows.values() for v in r["feature"])
    # deterministic: same payload bytes -> same feature on a second run
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows[1]["feature"] == again[1]["feature"]
    assert rows[1]["content_digest"] != rows[2]["content_digest"]
    assert rows[3]["n_bytes"] == 13


def test_resize_stub_keeps_payload(spark, media):
    out = resize_stub(media, 256, 256)
    rows = {r["media_id"]: r for r in out.collect()}
    assert all(r["width"] == 256 and r["height"] == 256 for r in rows.values())
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert bytes(rows[1]["payload"]) == src[1]


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=2_000)
    rows = sorted(
        (r["media_id"], r["frame_idx"], r["frame_ts_ms"]) for r in frames.collect()
    )
    # only the video row (10s / 2s = 5 frames)
    assert rows == [(4, i, i * 2000) for i in range(5)]


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"bytes", "image/png")
