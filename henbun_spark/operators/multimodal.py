"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata.

The Spark-side mechanics are real and tested — schema, partition-preserving
mapInPandas, Arrow batch shapes, metadata propagation. The codec layer
(PIL/ffmpeg/torchaudio) is NOT in this container, so the decode kernels are
stubbed: `deterministic_fake_decode` produces seeded-stable features (so
pipelines are testable end-to-end), and `strict` mode raises
NotImplementedError exactly where a codec would plug in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synthesize_media(spark, n: int = 64, kind: str = "image", seed: int = 0) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for
    exercising the plumbing without codecs."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = rng.bytes(256)
        meta = (64, 48, None, None, "fake") if kind == "image" else (
            None, None, 16000, 1500, "fake"
        )
        rows.append((i, kind, bytearray(payload), meta))
    # size partitions to the data: a 64-row demo table sliced into
    # local[32]'s default 32 partitions pays 32 Python-worker handshakes
    # for ~2 rows each in the downstream mapInPandas (real media tables
    # read from parquet carry fat partitions already)
    n_parts = max(1, min(8, n // 8))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(n_parts)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Seeded-stable feature vector from the payload digest — the
    deterministic stand-in for a real decode+embed kernel."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def decode_and_featurize(
    df: DataFrame, dim: int = 16, strict: bool = False
) -> DataFrame:
    """mapInPandas decode -> feature pipeline.

    Real pieces: Arrow batching, schema (media_id, kind, feature array,
    n_bytes), partition preservation. Stub piece: the decode itself —
    `strict=True` raises NotImplementedError where PIL/ffmpeg would go.
    """
    out_schema = (
        "media_id long, kind string, n_bytes int, feature array<float>"
    )

    def fn(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "codec layer (PIL/ffmpeg) not available in this runtime; "
                    "plug real decode here"
                )
            feats = [
                _fake_features(bytes(p) if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(fn, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 500, strict: bool = False) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (real explode over sampled offsets; fake frame payloads)."""
    if strict:
        raise NotImplementedError("video codec not available in this runtime")
    offsets = F.sequence(
        F.lit(0),
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
        F.lit(every_ms),
    )
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(offsets).alias("frame_ms"),
        F.sha2(F.concat(F.col("payload"), F.lit("|")), 256).alias("frame_digest"),
    )


def resize_meta(df: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-level resize (aspect bookkeeping is Column math; pixel
    resample is codec territory -> stub)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.format").alias("format"),
        ),
    )
