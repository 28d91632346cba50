"""Multimodal plumbing: binary columns through mapInPandas kernels."""

from __future__ import annotations

import hashlib

from megalista_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    media_dedup_exact,
    sample_video_frames,
)


def media_df(spark):
    rows = [
        (1, b"\x89PNG fake image 1", ("image/png", 64, 64, None)),
        (2, b"\x89PNG fake image 1", ("image/png", 64, 64, None)),  # dup of 1
        (3, b"RIFF fake video", ("video/mp4", 640, 480, 25_000)),
        (4, None, ("image/png", 0, 0, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_image_features(spark):
    out = {r["media_id"]: r for r in extract_image_features(media_df(spark)).collect()}
    assert len(out[1]["feature"]) == 8
    assert out[1]["feature"] == out[2]["feature"]  # deterministic on content
    assert out[1]["content_sha256"] == hashlib.sha256(b"\x89PNG fake image 1").hexdigest()
    assert out[4]["feature"] is None and out[4]["n_bytes"] == 0


def test_sample_video_frames(spark):
    rows = sample_video_frames(media_df(spark), every_n=10).collect()
    # only media 3 has duration: 25 fake frames → sampled at 0,10,20
    assert [(r["media_id"], r["frame_index"]) for r in rows] == [(3, 0), (3, 10), (3, 20)]
    assert len({r["frame_sha256"] for r in rows}) == 3


def test_media_dedup_exact(spark):
    out = media_dedup_exact(media_df(spark).where("content IS NOT NULL"))
    got = {r["media_id"]: r["dup_count"] for r in out.collect()}
    assert got == {1: 2, 3: 1}


def test_resize_images(spark):
    from megalista_spark.operators.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(media_df(spark), 32, 32).collect()}
    expected = hashlib.sha256(b"\x89PNG fake image 1" + b"|32x32").hexdigest()
    assert out[1]["resized_sha256"] == expected
    assert out[1]["resized_sha256"] == out[2]["resized_sha256"]  # content-determined
    assert out[1]["width"] == 32 and out[1]["height"] == 32
    assert out[4]["resized_sha256"] is None  # null content passes through


def test_extract_audio_features(spark):
    from megalista_spark.operators.multimodal import extract_audio_features

    rows = extract_audio_features(media_df(spark), n_windows=4).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert 4 not in by_media  # null content emits nothing
    for mid in (1, 2, 3):
        assert sorted(r["window_index"] for r in by_media[mid]) == [0, 1, 2, 3]
        assert all(0.0 <= r["energy"] <= 1.0 for r in by_media[mid])
    # identical content → identical energy profile
    e1 = [r["energy"] for r in sorted(by_media[1], key=lambda r: r["window_index"])]
    e2 = [r["energy"] for r in sorted(by_media[2], key=lambda r: r["window_index"])]
    assert e1 == e2
