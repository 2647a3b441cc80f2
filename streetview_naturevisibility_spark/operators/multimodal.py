"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The image/audio codec libraries are not present in this container, so
the DECODE step is stubbed (deterministic fake derived from the bytes,
clearly marked) — but all the Spark-side plumbing is real and tested:
schemas, Arrow batch shapes, mapInPandas iteration, partition-size
control, and the downstream feature pipeline. Swapping the fake decoder
for PIL/ffmpeg is a one-function change on the executors.

Design rules for 100 TB of media:
- binary payloads never cross a shuffle: metadata is extracted first,
  payloads are processed in place with mapInPandas and dropped;
- Arrow batches stay small (maxRecordsPerBatch already bounded in
  session.py) so one batch of blobs fits executor memory;
- each decode UDF yields per-batch DataFrames — no row-at-a-time Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODER — deterministic fake: derives a (height, width)
    uint8 grid from the payload bytes. Replace with
    ``PIL.Image.open(io.BytesIO(payload))`` when PIL is available.
    Raises like a real decoder on empty payloads."""
    if not payload:
        raise NotImplementedError("empty payload; real decoder unavailable in this container")
    seed = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    reps = int(np.ceil(width * height / len(seed)))
    return np.tile(seed, reps)[: width * height].reshape(height, width)


def image_features(media: DataFrame, embed_dim: int = 16) -> DataFrame:
    """Decode -> feature-extract as a mapInPandas pipeline: per batch,
    one pass over the blobs producing a fixed-dim embedding (here:
    histogram moments of the fake-decoded grid — deterministic)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "n_bytes": [], "sha256": [], "embedding": []}
            for mid, payload, w, h in zip(
                b["media_id"], b["payload"], b["width"], b["height"]
            ):
                grid = _fake_decode_image(payload, int(w or 16), int(h or 16))
                hist = np.histogram(grid, bins=embed_dim, range=(0, 256))[0]
                emb = (hist / max(grid.size, 1)).astype(np.float32)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload))
                out["sha256"].append(hashlib.sha256(payload).hexdigest())
                out["embedding"].append(emb.tolist())
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(extract, IMAGE_FEATURES)


RESIZED = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixels", ArrayType(IntegerType(), False), False),
    ]
)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Decode -> nearest-neighbor resize (NumPy strided sampling)."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"media_id": [], "width": [], "height": [], "pixels": []}
            for mid, payload, w, h in zip(
                b["media_id"], b["payload"], b["width"], b["height"]
            ):
                grid = _fake_decode_image(payload, int(w or 16), int(h or 16))
                yi = (np.arange(out_h) * grid.shape[0] // out_h).clip(0, grid.shape[0] - 1)
                xi = (np.arange(out_w) * grid.shape[1] // out_w).clip(0, grid.shape[1] - 1)
                small = grid[np.ix_(yi, xi)]
                rows["media_id"].append(mid)
                rows["width"].append(out_w)
                rows["height"].append(out_h)
                rows["pixels"].append(small.reshape(-1).astype(np.int32).tolist())
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(rz, RESIZED)


FRAMES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_sha256", StringType(), False),
    ]
)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing (1 -> N expansion inside mapInPandas):
    the fake 'codec' derives frame digests from (payload, frame index);
    a real ffmpeg-based decoder drops in with the same batch shape."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_sha256": []}
            for mid, payload, dur in zip(b["media_id"], b["payload"], b["duration_ms"]):
                n = max(int((dur or 0) // every_ms), 1)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_sha256"].append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "little")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(frames, FRAMES)


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic media fixture (seed-free: pure function of i)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 4)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/ogg", "video": "video/mp4"}[kind],
                16 + (i % 8) * 4 if kind == "image" else None,
                16 + (i % 5) * 4 if kind == "image" else None,
                (i % 7 + 1) * 1500 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
