"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual codec work is
stubbed behind ``decode_fn`` hooks because media libraries aren't in this
container — swap in PIL/torchaudio/decord on a real cluster without touching
the plumbing. Batch sizing matters at 100 TB: media rows are huge, so
``spark.sql.execution.arrow.maxRecordsPerBatch`` should be lowered (the
engine session leaves scan splits at 128 MB for the same reason).
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal row shape: opaque bytes + typed metadata.
MEDIA_DDL = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feat", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ]
)


def deterministic_fake_decode(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a feature vector derived
    from the payload's sha256 — stable across processes/partitions, so
    tests can assert exact values. Replace with a real codec in production."""
    h = hashlib.sha256(kind.encode() + payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def real_decode_stub(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """The production hook for EXTERNAL formats (JPEG/MP3/H.264 — no PIL/
    ffmpeg in this container); the Spark plumbing around it is fully
    exercised with :func:`deterministic_fake_decode` and, end-to-end on real
    decoded content, with :func:`numpy_decode` over the self-describing
    formats below."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; inject a decoder via "
        "extract_features(decode_fn=...)"
    )


# ---------------------------------------------------------------------------
# Pure-numpy codecs for self-describing formats (no external libs): binary
# PPM (P6) images, PCM16 WAV audio, and a length-prefixed PPM-frame container
# for video. These are REAL decoders over real pixel/sample arrays — the
# multimodal path (decode → feature-extract → resize / frame-sample) runs
# end-to-end in-container on them; swap numpy_decode for a PIL/ffmpeg-backed
# decode_fn for JPEG/MP3/H.264 without touching the Spark plumbing.
# ---------------------------------------------------------------------------


def encode_ppm(pix: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → binary PPM (P6)."""
    h, w = pix.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pix.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 (h, w, 3). Raises ValueError on bad magic."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6)")
    parts: list[int] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    n = w * h * 3
    return np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → minimal RIFF/WAVE (PCM16)."""
    import struct

    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE (PCM16 mono) → (rate, int16 samples).

    The fmt chunk is located by the SAME chunk walk as data — a file with
    LIST/JUNK/fact chunks ahead of fmt parses correctly (a fixed offset-24
    read would return garbage there) — and its codec/channel/width fields
    are validated: anything but PCM16 mono raises instead of silently
    decoding noise."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    rate: int | None = None
    pos = 12
    while pos + 8 <= len(payload):
        cid, clen = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            if clen < 16 or len(payload) < pos + 24:
                # clen may CLAIM 16+ bytes the payload doesn't contain —
                # validate the actual buffer, not the header's promise
                raise ValueError("truncated fmt chunk")
            fmt_code, channels, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={fmt_code} ch={channels} bits={bits} "
                    "(only PCM16 mono)"
                )
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            return rate, np.frombuffer(payload, dtype="<i2", count=clen // 2, offset=pos + 8)
        pos += 8 + clen + (clen & 1)
    raise ValueError("no data chunk")


def encode_video(frames: list[np.ndarray], frame_ms: int = 1000) -> bytes:
    """PPM-frame container: magic + frame_ms + per-frame length-prefixed
    PPMs. Frame timestamps are implicit (i * frame_ms)."""
    import struct

    blobs = [encode_ppm(f) for f in frames]
    out = [b"MJV1", struct.pack("<II", len(blobs), frame_ms)]
    for b in blobs:
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def extract_frame(payload: bytes, ts_ms: int) -> np.ndarray:
    """Decode the frame covering ``ts_ms`` from an MJV1 container — the
    per-frame decode step behind :func:`frame_sample_plan`'s explode."""
    import struct

    if payload[:4] != b"MJV1":
        raise ValueError("not an MJV1 container")
    n, frame_ms = struct.unpack("<II", payload[4:12])
    idx = min(max(ts_ms // max(frame_ms, 1), 0), n - 1)
    pos = 12
    for i in range(n):
        (ln,) = struct.unpack("<I", payload[pos : pos + 4])
        pos += 4
        if i == idx:
            return decode_ppm(payload[pos : pos + ln])
        pos += ln
    raise ValueError("frame index out of range")


def _image_features(pix: np.ndarray, dim: int) -> np.ndarray:
    """Grayscale block-mean resize to a g×g grid (g² = dim) — a real
    decode + resize + featurize over actual pixels, normalized to [0, 1]."""
    g = max(1, int(math.isqrt(dim)))
    gray = pix.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    hh, ww = (h // g) * g, (w // g) * g
    gray = gray[:hh, :ww].reshape(g, hh // g, g, ww // g).mean(axis=(1, 3))
    feat = (gray / 255.0).ravel()
    return np.pad(feat, (0, dim - feat.size)).astype(np.float32)


def _audio_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Log-energy in ``dim`` rfft bands over the real sample array."""
    x = samples.astype(np.float32) / 32768.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    bands = np.array_split(spec, dim)
    e = np.array([b.sum() for b in bands], dtype=np.float32)
    return np.log1p(e).astype(np.float32)


def numpy_decode(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """REAL in-container decoder: PPM pixels / WAV samples / MJV1 frames →
    ``dim`` features. Videos average their frames' image features."""
    if kind == "image":
        return _image_features(decode_ppm(payload), dim)
    if kind == "audio":
        return _audio_features(decode_wav(payload)[1], dim)
    if kind == "video":
        import struct

        n = struct.unpack("<I", payload[4:8])[0]
        frame_ms = struct.unpack("<I", payload[8:12])[0]
        feats = [
            _image_features(extract_frame(payload, i * frame_ms), dim)
            for i in range(n)
        ]
        return np.mean(feats, axis=0).astype(np.float32)
    raise ValueError(f"unknown kind {kind!r}")


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = deterministic_fake_decode,
    dim: int = 16,
) -> DataFrame:
    """(media_id, kind, feat: array<float>, n_bytes) via mapInPandas.

    The batch loop is per-row over *media blobs* (decoders are inherently
    per-object); everything around it — Arrow transfer, schema, output
    assembly — is vectorized."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_fn(bytes(p), k, dim).tolist() if p is not None else None
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video row into frame
    timestamps (JVM-side sequence — the expensive decode happens later,
    per frame, in extract_features). Demonstrates the explode-then-decode
    layout that keeps decode parallelism proportional to frames, not videos."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "payload")
    )


def synth_media_numpy(spark, n: int = 48, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads the numpy codecs decode:
    gradient PPM images, sine-wave WAVs, multi-frame MJV1 videos — media_id
    parameterizes the content so features differ row to row."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w = h = 16 + (i % 4) * 8
            yy, xx = np.mgrid[0:h, 0:w]
            pix = np.stack(
                [
                    (xx * (2 + i % 5)) % 256,
                    (yy * (3 + i % 7)) % 256,
                    ((xx + yy) * (1 + i % 3)) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            rows.append((i, kind, encode_ppm(pix), "image/x-portable-pixmap",
                         w, h, None))
        elif kind == "audio":
            rate = 8000
            t = np.arange(rate // 2, dtype=np.float32) / rate  # 0.5 s
            # two tones: a per-row fundamental spread across the 16 rfft
            # bands plus a common 310 Hz hum (so audio rows share SOME
            # spectral mass but no two rows' features coincide)
            f1 = 250.0 * (1 + (i % 14)) + 11.0 * (i % 5)
            samples = (
                (np.sin(2 * np.pi * f1 * t) + 0.4 * np.sin(2 * np.pi * 310.0 * t))
                * 10000
            ).astype(np.int16)
            rows.append((i, kind, encode_wav(samples, rate), "audio/wav",
                         None, None, 500))
        else:
            frames = []
            for f in range(3):
                yy, xx = np.mgrid[0:16, 0:16]
                frames.append(
                    (((xx + yy + f * 7 + i) * 9) % 256)
                    .astype(np.uint8)[..., None]
                    .repeat(3, axis=2)
                )
            rows.append((i, kind, encode_video(frames, frame_ms=1000),
                         "video/x-mjv1", 16, 16, 3000))
    return spark.createDataFrame(rows, MEDIA_DDL)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the plumbing."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 256)))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                rng.randint(16, 64) if kind == "image" else None,
                rng.randint(16, 64) if kind == "image" else None,
                rng.randint(1000, 10000) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_DDL)
