"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (no image/audio libs in this container — see
driver brief): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, which substitutes a
deterministic byte-statistics "decoder". Everything Spark-side is real
and tested: schemas, Arrow batch shapes, mapInPandas signatures,
partitioning of large binary payloads.

Scale notes: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` moderate and NEVER shuffle the
binary column (extract features first, then drop it; joins happen on the
metadata). All functions here follow that rule: output schemas carry
features + ids only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("byte_mean", DoubleType()),
    StructField("byte_entropy", DoubleType()),
    StructField("phash", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: fold the byte
    stream into a fixed 8x8 'pixel' grid. Replace with PIL/libvips at
    deploy time (same signature: bytes -> ndarray)."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    pad = (-len(arr)) % 64
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    return arr.reshape(-1, 64).mean(axis=0).reshape(8, 8)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real image decode requires PIL/opencv (not in this container); "
        "pass fake=True for the deterministic test decoder"
    )


def image_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Feature-extract pass over image rows: byte stats + 64-bit
    average-hash pHash + an 8-dim embedding from the (fake) decode.
    mapInPandas keeps Arrow batches small via the payload column size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(b or b"\x00", dtype=np.uint8)
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                p = counts / counts.sum()
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                img = decode_image(b, fake=fake_decode)
                mean = img.mean()
                bits = (img > mean).flatten()
                phash = 0
                for i, bit in enumerate(bits):
                    if bit:
                        phash |= (1 << i)
                emb = img.mean(axis=1).astype(np.float32)
                # two's-complement fold into signed int64 (LongType)
                rows.append((int(mid), len(b), float(arr.mean()), ent,
                             int(phash) - (1 << 64) if phash >= (1 << 63) else int(phash),
                             emb.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("offset_ms", LongType()),
])


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows — emits the (media_id,
    frame_idx, offset_ms) grid natively (sequence/explode); the actual
    frame decode plugs into the same stub seam as decode_image."""
    v = media.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    return v.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(
                (F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx", "_step"),
    ).select(
        "media_id", "frame_idx",
        (F.col("frame_idx").cast("long") * every_ms).alias("offset_ms"),
    )


def make_fake_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payloads)."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 512)))
        rows.append((i, kind, f"application/x-{kind}", payload,
                     64 if kind == "image" else None,
                     64 if kind == "image" else None,
                     5000 if kind == "video" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
