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
    """The production hook. Not implemented in this container (no PIL/
    ffmpeg); the Spark plumbing around it is fully exercised with
    :func:`deterministic_fake_decode`."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; inject a decoder via "
        "extract_features(decode_fn=...)"
    )


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
