"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The decode step itself is STUBBED (this container has no image/audio libs):
`decode_image_features` computes deterministic fake features from the bytes
(documented below) so the Spark-side plumbing — schema, batch iteration,
partition sizing — is real and testable. A production deployment swaps
`_fake_decode` for PIL/torchvision/ffmpeg inside the same UDF body.

Scale design:
- binary payloads ride in their own column; metadata (width/height/format)
  is typed columns so filters on metadata prune *before* bytes are read
  (Parquet column pruning: a metadata-only query never touches the blob
  column).
- `mapInPandas` yields per-batch DataFrames: memory is bounded by
  `spark.sql.execution.arrow.maxRecordsPerBatch`, not partition size.
- repartition by a size-aware key before heavy decode so a few giant files
  don't skew executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_std", DoubleType()),
        StructField("feat_dim", LongType()),
    ]
)


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns alongside an opaque binary column — computed
    JVM-side so metadata queries never deserialize payloads in Python."""
    return df.withColumn("byte_len", F.length(F.col(payload_col)).cast("long")).withColumn(
        "content_md5", F.md5(F.col(payload_col))
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded byte features.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload))
    → resize → np array; raising NotImplementedError here would hide the
    plumbing from tests, so we fake deterministically instead."""
    h = hashlib.md5(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def decode_image_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `mapInPandas` (not a scalar UDF) so one Python call handles a whole
    Arrow batch and the output schema can drop the payload column — the
    blob never crosses back to the JVM."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: _fake_decode(p, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(lambda p: len(p or b"")).astype("int64"),
                    "feat_mean": feats.map(lambda v: float(sum(v) / len(v))),
                    "feat_std": feats.map(
                        lambda v: float(
                            (sum((x - sum(v) / len(v)) ** 2 for x in v) / len(v)) ** 0.5
                        )
                    ),
                    "feat_dim": pd.Series([dim] * len(pdf), index=pdf.index, dtype="int64"),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) via
    sequence+explode on a duration metadata column — the expansion happens
    JVM-side; only sampled frames would reach the (stubbed) decoder."""
    return df.withColumn(
        "frame_ts",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_s").cast("long") - 1, F.lit(0)), F.lit(every_n_seconds)
            )
        ),
    )
