"""Multimodal column plumbing: opaque binary media + typed metadata.

A large-scale training-data pipeline carries image/audio/video as
binary columns with typed metadata, decoded and featurized inside
Arrow-batched kernels. The image/audio codec libraries are NOT in this
container, so the decode kernels are STUBBED behind a deterministic
fake (`fake_decode=True`, default) or `NotImplementedError` — but the
Spark-side plumbing is real and tested: schema, mapInPandas batch
shapes, partition-sized work units, and the feature-extraction output
contract.

Swap `_decode_image_real` for a Pillow/torchvision call in production;
nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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
        StructField("url", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("data", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feat_dim", IntegerType(), False),
        StructField("features", ArrayType(FloatType()), False),
        StructField("decode_ok", StringType(), False),
    ]
)


def _decode_image_real(data: bytes, width: int, height: int) -> np.ndarray:
    raise NotImplementedError(
        "image codec not available in this container; use fake_decode=True "
        "or install Pillow and wire it here"
    )


def _decode_fake(data: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in: bytes -> pseudo-pixels via a rolling byte
    histogram, so tests get stable, content-dependent vectors."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(out_dim, dtype=np.float32)
    hist = np.bincount(arr % out_dim, weights=arr.astype(np.float64), minlength=out_dim)
    norm = np.linalg.norm(hist)
    return (hist / norm if norm else hist).astype(np.float32)


def extract_media_features(
    media: DataFrame, feat_dim: int = 32, fake_decode: bool = True
) -> DataFrame:
    """media table -> per-item feature vectors via mapInPandas.

    Real plumbing (Arrow batches of binary cells, per-batch numpy), stub
    decode (see module docstring).
    """

    def run(batches):
        for pdf in batches:
            feats = []
            ok = []
            for data in pdf["data"]:
                try:
                    if fake_decode:
                        v = _decode_fake(bytes(data), feat_dim)
                    else:
                        v = _decode_image_real(bytes(data), 0, 0)
                    feats.append([float(x) for x in v])
                    ok.append("ok")
                except NotImplementedError:
                    feats.append([0.0] * feat_dim)
                    ok.append("stubbed")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": feat_dim,
                    "features": feats,
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel contract: passes binary through with updated metadata
    (real implementation swaps the payload bytes)."""
    from pyspark.sql import functions as F

    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def sample_frames_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling contract: one row per sampled frame timestamp,
    deterministic from duration metadata (decode stubbed)."""
    from pyspark.sql import functions as F

    frames = media.where(F.col("kind") == "video").withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ),
    )
    return frames.select("media_id", "url", "frame_ts_ms", "data")


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        data = rng.bytes(64 + (i % 17) * 13)
        rows.append(
            (
                i,
                f"https://example.org/media/{i}",
                kind,
                {"image": "image/png", "audio": "audio/ogg", "video": "video/mp4"}[kind],
                bytearray(data),
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                3000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
