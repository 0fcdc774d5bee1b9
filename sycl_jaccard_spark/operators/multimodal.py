"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via ``mapInPandas`` in Arrow batches.

The decode step is STUBBED (no image/audio libs in this container): the
default ``decoder`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces seeded fake features so the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and testable. Swap ``_fake_decode`` for a PIL/librosa call on a
cluster with the libs installed; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),    # opaque bytes
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature: seeded by payload content hash."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 32, deterministic_fake: bool = False, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches).

    Real decode is not available in this container; pass
    ``deterministic_fake=True`` for the seeded stand-in, otherwise the task
    raises NotImplementedError (clearly marked stub).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present in "
                    "this environment; use deterministic_fake=True for plumbing tests"
                )
            feats = [
                _fake_decode(p if p is not None else b"", dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    # repartition by media_id: payloads are large; even spread beats locality
    return media.repartition("media_id").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) — the
    explode is JVM-side; actual frame decode would flow through
    extract_features on the sliced payloads."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts"),
    )


def resize_plan(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Aspect-preserving fit-within-box resize targets, computed JVM-side
    (codegen'd): adds (target_w, target_h, scale). Never upscales."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    return media.withColumn("scale", scale).withColumn(
        "target_w", F.floor(F.col("width") * F.col("scale")).cast("int")
    ).withColumn("target_h", F.floor(F.col("height") * F.col("scale")).cast("int"))


def resize_images(
    media: DataFrame,
    max_w: int = 256,
    max_h: int = 256,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Image resize via mapInPandas over Arrow batches. Target geometry is
    real (resize_plan); the pixel resample is STUBBED like decode — the fake
    emits a payload-hash-seeded byte string of plausible size so schema,
    batching and partitioning are testable; swap in PIL on a real cluster."""
    planned = resize_plan(media.filter(F.col("kind") == "image"), max_w, max_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image resample requires an imaging library not present in "
                    "this environment; use deterministic_fake=True for plumbing tests"
                )
            out_payloads = []
            for p, tw, th in zip(pdf["payload"], pdf["target_w"], pdf["target_h"]):
                raw = p if p is not None else b""
                seed = int.from_bytes(raw[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
                n = max(int(tw) * int(th) // 8, 1)
                out_payloads.append(np.random.default_rng(seed).bytes(n))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "width": pdf["target_w"],
                    "height": pdf["target_h"],
                    "duration_ms": pdf["duration_ms"],
                    "payload": out_payloads,
                }
            )

    return planned.repartition("media_id").mapInPandas(run, MEDIA_SCHEMA)
