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


def uniform_frame_sample(
    df: DataFrame,
    m: int = 4,
    id_col: str = "media_id",
    duration_col: str = "duration_s",
    fps_col: str = "fps",
) -> DataFrame:
    """Fixed-budget uniform frame sampling: exactly ``m`` frames per clip,
    evenly spaced over [0, n_frames-1] — the standard video-pretraining
    sampling policy (every clip contributes the same token budget
    regardless of duration, unlike every-N-seconds sampling).

    frame_idx(pos) = floor(pos * (n_frames-1) / (m-1)); ts_s = idx / fps;
    frame_digest = md5(media_id:frame_idx) — the deterministic key a decode
    stage (mapInPandas over the payload, see decode_image_features) joins
    back on.

    All JVM-side: metadata-only sequence+explode, payloads untouched — the
    m× expansion happens on narrow rows, and only the sampled (media_id,
    frame_idx) keys reach a decoder."""
    if m < 2:
        raise ValueError(f"need m >= 2 sample positions, got {m}")
    # reject malformed metadata up front: fps <= 0 / NULL would divide to a
    # NULL/NaN ts_s that flows into downstream digest joins looking valid,
    # and a negative duration is corrupt by contract — drop both rather than
    # emit poisoned sample rows (the row-level twin of the m<2 ValueError).
    # NaN needs its own term: Spark orders NaN GREATER than any number, so
    # a double-typed fps=NaN passes `fps > 0` and still emits NaN ts_s
    def _finite_pos(c, allow_zero: bool):
        col = F.col(c).cast("double")
        bound = (col >= 0) if allow_zero else (col > 0)
        return F.col(c).isNotNull() & ~F.isnan(col) & bound

    df = df.filter(_finite_pos(fps_col, allow_zero=False) & _finite_pos(duration_col, allow_zero=True))
    # multiply BEFORE truncating: duration 0.9 s @ 30 fps is 27 frames, not
    # floor(0.9) * 30 = 0; fractional framerates (29.97) keep their product
    base = df.select(
        F.col(id_col),
        F.col(fps_col),
        F.floor(
            F.col(duration_col).cast("double") * F.col(fps_col).cast("double")
        )
        .cast("long")
        .alias("_nf"),
    )
    samples = base.select(
        F.col(id_col),
        F.col(fps_col),
        "_nf",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sample_pos"),
    )
    # greatest(nf - 1, 0): a zero-DURATION clip samples frame 0 m times
    # rather than producing negative indices (fps<=0 rows never reach here
    # — the metadata filter above drops them)
    frame_idx = F.floor(
        F.col("sample_pos").cast("double")
        * F.greatest(F.col("_nf") - 1, F.lit(0)).cast("double")
        / F.lit(float(m - 1))
    ).cast("long")
    # frame_idx is bound in its own projection so ts_s / digest reference
    # the computed column, not a re-evaluated floor subtree
    idxed = samples.select(
        F.col(id_col),
        F.col(fps_col),
        F.col("sample_pos").cast("long").alias("sample_pos"),
        frame_idx.alias("frame_idx"),
    )
    return idxed.select(
        F.col(id_col),
        "sample_pos",
        "frame_idx",
        F.round(F.col("frame_idx").cast("double") / F.col(fps_col).cast("double"), 6).alias(
            "ts_s"
        ),
        F.md5(
            F.concat_ws(
                ":", F.col(id_col).cast("string"), F.col("frame_idx").cast("string")
            )
        ).alias("frame_digest"),
    )


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
