"""Multimodal plumbing: schemas, batch shapes, deterministic fake codec,
metadata extraction, resize, frame sampling, unimplemented-format gate."""

from __future__ import annotations

import numpy as np
import pytest

from vexor_spark.operators.multimodal import (
    decode_fake_image,
    encode_fake_image,
    encode_fake_video,
    extract_media_features,
    generate_media_df,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return generate_media_df(spark, 30, partitions=3).persist()


def test_fake_codec_roundtrip():
    blob = encode_fake_image(16, 12, seed=5)
    decoded = decode_fake_image(blob)
    assert decoded["pixels"].shape == (12, 16)
    assert decode_fake_image(encode_fake_image(16, 12, seed=5))["pixels"].tolist() == decoded[
        "pixels"
    ].tolist()  # deterministic


def test_feature_extraction_schema_and_meta(media):
    feats = extract_media_features(media).collect()
    assert len(feats) == 30
    by_fmt = {}
    for r in feats:
        by_fmt.setdefault(r["format"], r)
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-9
        assert r["meta"]["n_bytes"] > 0
    img = by_fmt["image/x-fake"]["meta"]
    assert img["width"] is not None and img["sample_rate"] is None
    aud = by_fmt["audio/x-fake"]["meta"]
    assert aud["sample_rate"] == 8000 and aud["n_samples"] >= 200
    vid = by_fmt["video/x-fake"]["meta"]
    assert vid["n_frames"] in (4, 5, 6) and vid["width"] == 8


def test_feature_determinism(media, spark):
    a = sorted(
        (r["media_id"], tuple(r["features"]))
        for r in extract_media_features(media).collect()
    )
    b = sorted(
        (r["media_id"], tuple(r["features"]))
        for r in extract_media_features(generate_media_df(spark, 30, partitions=5)).collect()
    )
    assert a == b  # independent of partitioning


def test_resize_images(media):
    rows = resize_images(media, 8, 8).collect()
    assert rows and all(len(r["pixels"]) == 64 for r in rows)
    # exact nearest-neighbor check for one item
    src = decode_fake_image(encode_fake_image(16, 12, seed=42 * 7919 + 0))["pixels"]
    got = next(np.frombuffer(r["pixels"], np.uint8).reshape(8, 8) for r in rows if r["media_id"] == 0)
    yi = (np.arange(8) * 12 // 8).clip(0, 11)
    xi = (np.arange(8) * 16 // 8).clip(0, 15)
    assert got.tolist() == src[np.ix_(yi, xi)].tolist()


def test_frame_sampling(media):
    frames = sample_video_frames(media, every_n=2).collect()
    assert frames
    for r in frames:
        assert r["frame_index"] % 2 == 0
        assert len(r["pixels"]) == r["width"] * r["height"]
    blob = encode_fake_video(8, 6, 4, seed=42 * 7919 + 2)
    # media_id 2 is a video with 4 + 2%3 = 6 frames → indices 0,2,4
    idx2 = sorted(r["frame_index"] for r in frames if r["media_id"] == 2)
    assert idx2 == [0, 2, 4]


def test_unimplemented_format_raises(spark):
    df = spark.createDataFrame(
        [(1, "image/jpeg", b"\xff\xd8\xff real jpeg bytes")],
        "media_id long, format string, data binary",
    )
    with pytest.raises(Exception) as exc:
        extract_media_features(df).collect()
    assert "NotImplementedError" in str(exc.value) or "media library" in str(exc.value)
