"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is REAL for every format stdlib+numpy can express
(:mod:`..functions.codecs` — PNG / BMP / PPM / PGM images, PCM WAV
audio, YUV4MPEG2 video; pixel/sample-exact roundtrip tested).
Entropy-coded formats (JPEG/MP3/H.264) still need the imaging/DSP
wheels this container lacks (probe recorded 2026-08-17: PIL, cv2,
soundfile and librosa all absent): for those, ``decode_image`` /
``decode_audio`` raise NotImplementedError unless ``fake=True``, which
substitutes a deterministic byte-statistics "decoder" (kept as the
oracle-stable test path). Everything Spark-side is real
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
    """bytes → 2-D float64 grayscale array.

    ``fake=False`` (the real path) sniffs the container and decodes
    PNG / BMP / PPM / PGM with the stdlib-only codecs; RGB collapses to
    Rec.601 luma. Entropy-coded formats (JPEG, WebP, …) raise —
    honestly unsupported without the imaging wheels this container
    lacks. ``fake=True`` keeps the deterministic byte-statistics 8x8
    grid the golden oracle pins.
    """
    if fake:
        return _fake_decode(payload)
    a = _decode_raw(payload).astype(np.float64)
    if a.ndim == 3 and a.shape[2] >= 3:   # RGB(A) → Rec.601 luma
        a = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    elif a.ndim == 3:                     # gray+alpha: luma IS channel 0
        a = a[:, :, 0]
    return a


def _decode_raw(payload: bytes) -> np.ndarray:
    """Shared sniff/dispatch: bytes → raw pixel array (channels kept).
    The ONE place format support lives — decode_image and resize_images
    both route through here."""
    from ..functions import codecs
    fmt = codecs.sniff_media(payload or b"")
    if fmt == "png":
        return codecs.decode_png(payload)
    if fmt == "bmp":
        return codecs.decode_bmp(payload)
    if fmt in ("ppm", "pgm"):
        return codecs.decode_pnm(payload)
    raise NotImplementedError(
        f"unsupported image container {fmt!r} — needs PIL/opencv (not "
        "in this container); supported real formats: png/bmp/ppm/pgm, "
        "or pass fake=True for the deterministic test decoder")


def _resize_grid(img: np.ndarray, n: int = 8) -> np.ndarray:
    """Deterministic area-ish downsample of a 2-D array to (n, n):
    each output cell averages its index-sliced block (NEAREST-style
    edges — no interpolation libs needed). Identity on an (n, n)
    input, so the fake decoder's 8x8 grid passes through untouched."""
    h, w = img.shape
    if (h, w) == (n, n):
        return img
    return _area_resize(img, n, n, dtype=np.float64)


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
                # 8x8 grid: identity for the fake decoder's output,
                # classic average-hash downsample for real pixels
                img = _resize_grid(decode_image(b, fake=fake_decode))
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
    """bytes → float64 mono sample array in [-1, 1].

    ``fake=False`` (the real path) decodes PCM WAV (8/16-bit, stdlib
    ``wave``, channels folded to mono); compressed audio (MP3/AAC/OGG)
    raises — honestly unsupported without soundfile/librosa (absent
    from this container, probe in the module docstring). ``fake=True``
    interprets the byte stream as signed 8-bit PCM — the deterministic
    oracle-stable stand-in with the same signature."""
    if not fake:
        from ..functions import codecs
        if codecs.sniff_media(payload or b"") == "wav":
            x, _rate = codecs.decode_wav(payload)
            return x
        raise NotImplementedError(
            "compressed audio decode requires soundfile/librosa (not in "
            "this container); supported real format: PCM WAV, or pass "
            "fake=True for the deterministic PCM8 decoder")
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


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("payload", BinaryType()),   # PNG re-encoded
])


def _area_resize(img: np.ndarray, out_h: int, out_w: int,
                 dtype=np.uint8) -> np.ndarray:
    """Deterministic area-average resize of (h, w[, ch]) pixels —
    index-sliced block means, no interpolation libs. The ONE resampler
    (the 8x8 feature grid is the grayscale float special case)."""
    a = img if img.ndim == 3 else img[:, :, None]
    h, w, ch = a.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w, ch), dtype=dtype)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = a[y0:y1, x0:x1].reshape(-1, ch).mean(axis=0)
    return out[:, :, 0] if img.ndim == 2 else out


def resize_images(media: DataFrame, width: int = 64,
                  height: int = 64) -> DataFrame:
    """REAL thumbnailing pass: decode (PNG/BMP/PPM/PGM via the stdlib
    codecs), area-resize to (width, height) preserving channels, and
    re-encode as PNG — (media_id, width, height, payload). The last of
    the brief's four multimodal verbs (decode / feature-extract /
    resize / frame-sample), now real end-to-end.

    Plumbing contract unchanged: one mapInPandas over (media_id,
    payload), binary columns never shuffle (write the output straight
    to storage, join on media_id only). Unsupported containers (JPEG…)
    raise — no silent lossy fallback on a data-prep path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                small = _area_resize(_decode_raw(b), height, width)
                rows.append((int(mid), width, height,
                             codecs.encode_png(small)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, RESIZED_SCHEMA)


FRAME_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("offset_ms", LongType()),
    StructField("mean_luma", DoubleType()),
    StructField("phash", LongType()),
])


def frame_features(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame sampling + per-frame features over YUV4MPEG2
    payloads: decode the luma planes (``codecs.decode_y4m``), pick the
    frame nearest each ``every_ms`` grid point (the materialized form
    of :func:`sample_frames`' plan), and emit mean luma + 64-bit
    average-hash per sampled frame.

    Same plumbing contract as image_features: ONE mapInPandas over
    (media_id, payload), the binary column never shuffles, features +
    ids out. Non-y4m payloads raise — entropy-coded video needs ffmpeg
    (absent); `sample_frames` stays the decode-free planning twin."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                frames, fps = codecs.decode_y4m(b)
                n = frames.shape[0]
                if n == 0:
                    continue
                duration_ms = n / fps * 1000.0
                n_steps = max(int(duration_ms // every_ms), 1)
                for step in range(n_steps):
                    off = step * every_ms
                    fi = min(int(round(off / 1000.0 * fps)), n - 1)
                    img = _resize_grid(frames[fi].astype(np.float64))
                    bits = (img > img.mean()).flatten()
                    ph = 0
                    for i, bit in enumerate(bits):
                        if bit:
                            ph |= (1 << i)
                    ph = ph - (1 << 64) if ph >= (1 << 63) else ph
                    rows.append((int(mid), fi, int(off),
                                 float(frames[fi].mean()), int(ph)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(run, FRAME_FEATURES_SCHEMA)


def make_real_media(spark, n: int = 24, seed: int = 11) -> DataFrame:
    """Deterministic synthetic media table whose payloads are REAL
    containers (PNG / BMP / WAV / y4m), exercising the stdlib codecs
    end-to-end: gradient+checker images, sine-mix audio, moving-bar
    video. Seeded numpy only — byte-stable across runs."""
    from ..functions import codecs
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            yy, xx = np.mgrid[0:h, 0:w]
            img = ((xx * 255 // max(w - 1, 1)
                    + ((yy // 4 + xx // 4) % 2) * 60) % 256).astype(np.uint8)
            if i % 6 == 0:  # alternate containers
                rgb = np.stack([img, 255 - img, img // 2], axis=2)
                payload, mime = codecs.encode_bmp(rgb), "image/bmp"
            else:
                payload, mime = codecs.encode_png(img), "image/png"
            rows.append((i, kind, mime, payload, w, h, None))
        elif kind == "audio":
            dur_s = float(rng.integers(1, 3))
            rate = 8000
            t = np.arange(int(rate * dur_s)) / rate
            f0 = float(rng.integers(100, 800))
            x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
            payload = codecs.encode_wav(x, rate=rate)
            rows.append((i, kind, "audio/wav", payload, None, None,
                         int(dur_s * 1000)))
        else:
            h, w, nf = 16, 16, int(rng.integers(4, 9))
            frames = np.zeros((nf, h, w), dtype=np.uint8)
            for fidx in range(nf):
                frames[fidx, :, (fidx * 2) % w] = 255  # moving bar
                frames[fidx] += fidx * 3
            payload = codecs.encode_y4m(frames, fps_num=2, fps_den=1)
            rows.append((i, kind, "video/x-y4m", payload, w, h,
                         int(nf / 2.0 * 1000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
