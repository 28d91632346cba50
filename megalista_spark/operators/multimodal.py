"""Multimodal (image/audio/video) column operators.

Design: media travel as opaque ``binary`` columns with a typed metadata
struct alongside (the lakehouse-standard layout for multimodal training
data). All heavy per-item work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` — one Python worker per
partition, zero JVM round-trips per row, linear scaling with partitions.

The image/audio codec libraries are NOT present in this environment, so
the decode kernels are stubbed: ``decode_stub=True`` (default) produces a
deterministic fake decode (so the Spark-side plumbing — schemas, batching,
partition flow — is fully testable); with ``decode_stub=False`` the
kernels raise NotImplementedError where the real library call belongs
(clearly marked below).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: derive ``dim``
    floats from the content digest. REPLACE with e.g. PIL/torchvision when
    the libraries are available."""
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_image_features(
    df: DataFrame, dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """binary content → fixed-dim feature vector, Arrow-batched.

    Plan shape at 100 TB: pure mapInPandas over the scan — no shuffle; the
    binary column is the read bottleneck, so partition sizing
    (spark.sql.files.maxPartitionBytes) is the tuning knob, not this
    operator.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                # Real implementation goes here:
                #   from PIL import Image; img = Image.open(io.BytesIO(b))
                raise NotImplementedError("image codec not available in this environment")
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha256": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": pdf["content"].map(
                        lambda b: _fake_decode_features(b, dim) if b is not None else None
                    ),
                }
            )
            yield out

    return df.select("media_id", "content").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_video_frames(
    df: DataFrame, every_n: int = 10, decode_stub: bool = True
) -> DataFrame:
    """video binary → sampled frame records (one row per sampled frame).

    Stubbed decode derives a deterministic per-frame digest from
    (content, frame_index); a real implementation would demux with e.g.
    PyAV and hash the decoded frame. The explode happens inside the Python
    kernel, so output row count is decoupled from input row count —
    exactly how a real frame sampler behaves.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("video codec not available in this environment")
            ids, idxs, hashes = [], [], []
            for media_id, content, duration in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if content is None or duration is None or pd.isna(duration) or duration <= 0:
                    continue  # not a timed medium → nothing to sample
                # fake: one frame per second of duration, sampled every_n.
                # digest = sha256(content || ":frame_index" ascii) — the
                # separator keeps it injective per frame and ASCII-safe so
                # a SQL oracle reproduces it (engines' sha256 functions are
                # commonly VARCHAR-only; raw BE32 bytes contain NULs)
                n_frames = max(int(duration // 1000), 1)
                for i in range(0, n_frames, every_n):
                    ids.append(media_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.sha256(content + f":{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_sha256": hashes}
            )

    return df.select(
        "media_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def media_dedup_exact(df: DataFrame) -> DataFrame:
    """Exact media dedup on the binary digest — JVM-side sha2 over the
    binary column (no Python), then the standard hash-groupBy."""
    return (
        df.select("media_id", F.sha2(F.col("content"), 256).alias("content_sha256"))
        .groupBy("content_sha256")
        .agg(F.min("media_id").alias("media_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("media_id", "content_sha256", "dup_count")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_sha256", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, decode_stub: bool = True
) -> DataFrame:
    """binary image → resized-image digest record. Stub derives the digest
    from (content, target size); a real kernel decodes, resizes with
    PIL/opencv, and re-encodes. Same plan shape as feature extraction:
    pure mapInPandas over the scan, no shuffle — at 100 TB the knob is
    partition byte size, not the operator."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"|{width}x{height}".encode()
        for pdf in batches:
            if not decode_stub:
                # Real implementation: PIL Image.open(...).resize((w, h))
                raise NotImplementedError("image codec not available in this environment")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized_sha256": pdf["content"].map(
                        lambda b: hashlib.sha256(b + tag).hexdigest()
                        if b is not None
                        else None
                    ),
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_index", T.IntegerType()),
        T.StructField("energy", T.FloatType()),
    ]
)


def extract_audio_features(
    df: DataFrame, n_windows: int = 4, decode_stub: bool = True
) -> DataFrame:
    """audio binary → per-window energy rows (one row per analysis
    window). Stub computes mean byte value over equal content slices — a
    real kernel would decode PCM and compute RMS/spectral features per
    hop. Output rows = input rows × n_windows, generated inside the
    kernel like the frame sampler."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("audio codec not available in this environment")
            ids, idxs, energies = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    continue
                step = max(len(content) // n_windows, 1)
                for i in range(n_windows):
                    chunk = content[i * step : (i + 1) * step] or content[-step:]
                    ids.append(media_id)
                    idxs.append(i)
                    energies.append(sum(chunk) / (255.0 * len(chunk)))
            yield pd.DataFrame(
                {"media_id": ids, "window_index": idxs, "energy": energies}
            )

    return df.select("media_id", "content").mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
