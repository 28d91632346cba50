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


def test_wav_pcm16_codec_roundtrip():
    import pytest

    from megalista_spark.operators.multimodal import (
        wav_pcm16_decode,
        wav_pcm16_encode,
    )

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    rate, chans, back = wav_pcm16_decode(wav_pcm16_encode(samples, 8000))
    assert (rate, chans, back) == (8000, 1, samples)
    # odd-length data chunk padding: decoder walks word-aligned chunks
    rate2, _, back2 = wav_pcm16_decode(wav_pcm16_encode([7], 44100))
    assert rate2 == 44100 and back2 == [7]
    with pytest.raises(ValueError, match="RIFF"):
        wav_pcm16_decode(b"not audio at all")
    # a non-PCM format tag must fail honestly, not decode garbage
    blob = bytearray(wav_pcm16_encode([1, 2], 8000))
    blob[20] = 3  # format tag 3 = IEEE float
    with pytest.raises(ValueError, match="format tag 3"):
        wav_pcm16_decode(bytes(blob))


def test_ppm_p6_codec_roundtrip():
    import pytest

    from megalista_spark.operators.multimodal import ppm_p6_decode, ppm_p6_encode

    rgb = bytes(range(2 * 3 * 3))  # 2x3 image
    assert ppm_p6_decode(ppm_p6_encode(2, 3, rgb)) == (2, 3, rgb)
    # netpbm comments in the header are legal and must be skipped
    with_comment = b"P6\n# a comment\n2 3\n255\n" + rgb
    assert ppm_p6_decode(with_comment) == (2, 3, rgb)
    with pytest.raises(ValueError, match="P6"):
        ppm_p6_decode(b"P3\n1 1\n255\n0 0 0")
    with pytest.raises(ValueError, match="truncated"):
        ppm_p6_decode(b"P6\n2 3\n255\n" + rgb[:-1])


def test_real_decode_feature_paths(spark):
    # decode_stub=False on real container bytes: features come from the
    # ACTUAL samples/pixels, matching a direct computation on the inputs
    from megalista_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
        ppm_p6_encode,
        wav_pcm16_encode,
    )

    samples = [100] * 8 + [-200] * 8  # two distinct half-windows
    wav = wav_pcm16_encode(samples, 16000)
    adf = spark.createDataFrame([(1, wav)], "media_id long, content binary")
    import numpy as np

    f32 = lambda x: float(np.float32(x))  # noqa: E731 — schema emits float32
    e = {
        r["window_index"]: r["energy"]
        for r in extract_audio_features(adf, n_windows=2, decode_stub=False).collect()
    }
    assert e[0] == f32(((1_000_000 * 8 * 100 * 100) // (8 * (1 << 30))) / 1_000_000.0)
    assert e[1] == f32(((1_000_000 * 8 * 200 * 200) // (8 * (1 << 30))) / 1_000_000.0)

    rgb = bytes([10, 20, 30] * 4)  # 2x2 uniform image
    idf = spark.createDataFrame(
        [(1, ppm_p6_encode(2, 2, rgb))], "media_id long, content binary"
    )
    row = extract_image_features(idf, decode_stub=False).collect()[0]
    f = row["feature"]
    assert f[0] == f32(((1_000_000 * 40) // (4 * 255)) / 1_000_000.0)  # mean R
    assert (f[3], f[4], f[5]) == (f32(10 / 255.0), f32(20 / 255.0), f32(30 / 255.0))
    assert (f[6], f[7]) == (2.0, 2.0)
    assert row["n_bytes"] == len(ppm_p6_encode(2, 2, rgb))


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


def test_bmp24_codec_roundtrip():
    import struct

    import pytest

    from megalista_spark.operators.multimodal import bmp24_decode, bmp24_encode

    # 3x2: 9-byte rows padded to 12 — the padding path must be exercised
    rgb = bytes(range(3 * 2 * 3))
    blob = bmp24_encode(3, 2, rgb)
    assert len(blob) == 54 + 12 * 2  # headers + padded raster
    assert bmp24_decode(blob) == (3, 2, rgb)
    # 4x2: zero padding (row = 12 bytes already aligned)
    rgb2 = bytes((i * 7) % 256 for i in range(4 * 2 * 3))
    assert bmp24_decode(bmp24_encode(4, 2, rgb2)) == (4, 2, rgb2)
    # top-down storage (negative height) is legal BMP and must decode to
    # the same top-down RGB: flip the encoded raster rows + flip the sign
    blob3 = bytearray(bmp24_encode(3, 2, rgb))
    row = 12
    blob3[54 : 54 + row], blob3[54 + row : 54 + 2 * row] = (
        blob3[54 + row : 54 + 2 * row],
        blob3[54 : 54 + row],
    )
    blob3[22:26] = struct.pack("<i", -2)
    assert bmp24_decode(bytes(blob3)) == (3, 2, rgb)
    with pytest.raises(ValueError, match="BM"):
        bmp24_decode(b"P6\n1 1\n255\n" + bytes(3))
    with pytest.raises(ValueError, match="unsupported BMP encoding"):
        bad = bytearray(bmp24_encode(3, 2, rgb))
        bad[28:30] = struct.pack("<H", 8)  # 8bpp palette image
        bmp24_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        bmp24_decode(bmp24_encode(3, 2, rgb)[:-1])
    # pixel-array offset pointing INTO the headers must raise, not
    # silently decode header bytes as pixels
    with pytest.raises(ValueError, match="offset"):
        bad = bytearray(bmp24_encode(3, 2, rgb))
        bad[10:14] = struct.pack("<I", 40)  # inside BITMAPINFOHEADER
        bmp24_decode(bytes(bad))
    with pytest.raises(ValueError, match="offset"):
        bad = bytearray(bmp24_encode(3, 2, rgb))
        bad[10:14] = struct.pack("<I", len(bad) + 1)  # past EOF
        bmp24_decode(bytes(bad))


def test_image_features_decode_bmp(spark):
    # decode_stub=False sniffs BMP by magic and computes features from the
    # real raster — cross-checked against the PPM encoding of the SAME
    # pixels (the features must be container-independent)
    from megalista_spark.operators.multimodal import (
        bmp24_encode,
        extract_image_features,
        ppm_p6_encode,
    )

    rgb = bytes((5 * i + 3) % 256 for i in range(5 * 4 * 3))
    df = spark.createDataFrame(
        [(1, bmp24_encode(5, 4, rgb)), (2, ppm_p6_encode(5, 4, rgb))],
        "media_id long, content binary",
    )
    feats = {
        r["media_id"]: r["feature"]
        for r in extract_image_features(df, dim=8, decode_stub=False).collect()
    }
    assert feats[1] == feats[2]
