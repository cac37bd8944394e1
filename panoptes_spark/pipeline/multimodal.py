"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio libs are not in this
container): ``decode_image_stub`` produces a deterministic fake feature
vector from the bytes so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and testable. Swap the stub for
PIL/torchvision/ffmpeg calls in production; nothing else changes.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; mapInPandas
streams Arrow batches so executor memory is bounded by batch size, not
partition size (set spark.sql.execution.arrow.maxRecordsPerBatch for
multi-MB blobs). Feature extraction is embarrassingly parallel — no
shuffle; repartition by size-bucket first if blob sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha1 string, "
    "features array<float>"
)


def decode_image_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + feature-extract'.

    Production implementation would be::

        raise NotImplementedError("requires PIL/torchvision in the image")

    Here: 8 floats derived from the sha1 digest so tests have stable
    values and the Arrow plumbing is exercised end-to-end.
    """
    dig = hashlib.sha1(payload or b"").digest()
    return [round(b / 255.0, 6) for b in dig[:FEATURE_DIM]]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Arrow batches in, Arrow batches out; one output row per input row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha1": payloads.map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "features": payloads.map(decode_image_stub),
                }
            )

    return df.mapInPandas(run, schema=_FEATURES_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: passes metadata through, marks the payload as
    processed. Real implementation swaps the identity payload transform
    for an actual resampler inside the same mapInPandas shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = target_w
            out["height"] = target_h
            yield out

    return df.mapInPandas(run, schema=df.schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (decode stubbed). Pure DataFrame expansion — the explode is narrow."""
    return (
        df.where(F.col("media_type") == "video")
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
        .select("media_id", "frame_ts_ms", "format")
    )


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = repeated
    id bytes; sizes vary to exercise batching)."""
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = bytes([i % 256]) * (16 + (i % 7) * 8)
        rows.append(
            (
                i,
                mt,
                payload,
                64 + i % 4 if mt == "image" else None,
                48 + i % 3 if mt == "image" else None,
                2500 + i * 10 if mt == "video" else None,
                {"image": "png", "audio": "wav", "video": "mp4"}[mt],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
