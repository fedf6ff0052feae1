"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (probe recorded 2026-08-17: PIL, cv2,
soundfile and librosa are all absent from this container):
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, which substitutes a deterministic byte-statistics
"decoder". Everything Spark-side is real
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


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("n_samples", LongType()),
    StructField("rms", DoubleType()),
    StructField("zcr", DoubleType()),           # zero-crossing rate
    StructField("peak", DoubleType()),
    StructField("embedding", ArrayType(FloatType())),  # frame-energy profile
])


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """bytes → float64 mono sample array in [-1, 1]. Real decode needs
    soundfile/librosa (absent here — probe recorded in the module
    docstring); ``fake=True`` interprets the byte stream as signed
    8-bit PCM — a deterministic stand-in with the same signature, so
    swapping in a real decoder changes ONE function."""
    if not fake:
        raise NotImplementedError(
            "real audio decode requires soundfile/librosa (not in this "
            "container); pass fake=True for the deterministic PCM8 decoder"
        )
    raw = np.frombuffer(payload or b"\x00", dtype=np.int8)
    return raw.astype(np.float64) / 128.0


def audio_features(media: DataFrame, frame: int = 64,
                   n_bands: int = 8,
                   fake_decode: bool = True) -> DataFrame:
    """Feature-extract pass over audio rows: sample stats (RMS,
    zero-crossing rate, peak) + an ``n_bands``-dim frame-energy profile
    embedding (RMS per frame of ``frame`` samples, folded to n_bands by
    averaging — the MFCC-shaped output slot without the DSP libs).

    Same plumbing contract as image_features: mapInPandas over
    (media_id, payload) only, payload never shuffled, features + ids
    out. The decoder is the :func:`decode_audio` seam."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                x = decode_audio(b, fake=fake_decode)
                n = len(x)
                rms = float(np.sqrt((x * x).mean())) if n else 0.0
                zc = (int((np.signbit(x[1:]) != np.signbit(x[:-1])).sum())
                      / (n - 1)) if n > 1 else 0.0
                peak = float(np.abs(x).max()) if n else 0.0
                pad = (-n) % frame
                fx = np.concatenate([x, np.zeros(pad)]) if pad else x
                fe = np.sqrt((fx.reshape(-1, frame) ** 2).mean(axis=1))
                bpad = (-len(fe)) % n_bands
                if bpad:
                    fe = np.concatenate([fe, np.zeros(bpad)])
                emb = fe.reshape(n_bands, -1).mean(axis=1).astype(np.float32)
                rows.append((int(mid), len(b), n, rms, float(zc), peak,
                             emb.tolist()))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


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
