"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED (this container has no
image/audio libraries): `decode_image` raises NotImplementedError
unless a deterministic fake is requested. Everything Spark-side —
schema, partition sizing, UDF signatures, batch shapes — is real and
tested, so dropping in a real decoder (PIL/torchaudio/ffmpeg) on a
production image changes one function.

Scale notes: binary payloads make rows heavy. Keep
spark.sql.files.maxPartitionBytes low enough that a partition of
payloads fits executor memory; never collect; metadata-only pruning
(width/height/codec filters) happens BEFORE decode via the typed
metadata column.
"""

from __future__ import annotations

from typing import Iterator

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
        StructField("payload", BinaryType(), True),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def decode_image(payload: bytes, fmt: str):
    """Real decode is not available in this environment. On a cluster
    image with PIL: `Image.open(io.BytesIO(payload))`."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use fake=True for the deterministic test kernel"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for an embedding extractor: chunked byte
    sums, L2-normalized. Keeps the full pipeline testable."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.pad(arr, (0, pad))
    v = arr.reshape(dim, -1).sum(axis=1).astype(np.float64)
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def extract_features(
    df: DataFrame, dim: int = 8, batch_hint: int = 1024, fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow ships
    the bytes zero-copy; each pandas batch is processed vectorized."""
    if not fake:
        decode_image(b"", "")  # raises: real decoders not available here

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (text bytes as payload) — exercises the binary plumbing end-to-end
    without external data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("fake").alias("format"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes sample timestamps from
    typed metadata BEFORE any decode — so partition sizing and shuffle
    happen on light rows; the (stubbed) frame decode applies after."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
