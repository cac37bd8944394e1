"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is import-gated: if PIL is available in the runtime image
the real decoder runs; otherwise a clearly-marked deterministic fake
(sha1-derived features) keeps the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — real and testable. Every
output row carries ``decoder`` ('pil' | 'fake') so a mixed fleet is
auditable. Swap/extend ``_decode_image`` for torchvision/ffmpeg in
production; nothing else changes.

Scale notes (100 TB of blobs):

- payloads ride in parquet as BYTE_ARRAY; ``mapInPandas`` streams Arrow
  batches, so executor memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` × blob size, not by
  partition size — set it with :func:`limit_arrow_batch_rows` before
  running multi-MB media through the extractors;
- partition sizing must follow BYTES, not row counts: a partition of 4 KB
  thumbnails and a partition of 40 MB videos differ by 10^4 in work.
  :func:`repartition_by_payload_size` rebalances on measured payload size;
- feature extraction is embarrassingly parallel (no shuffle); the only
  shuffles downstream are the dedup/similarity joins, which run on the
  small (id, sha1/feature) projection — never on the payload column.
  Project payloads away before any join.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
    "decoder string, features array<double>, batch_rows int"
)


def _try_pil():
    """Import-gated real image decoder (PIL not baked into this
    container; the path activates wherever it is)."""
    try:  # pragma: no cover - exercised only when PIL is installed
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


def decode_image_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + feature-extract': 8 floats from the
    md5 digest, so tests have stable values and the Arrow plumbing is
    exercised end-to-end. md5 (not sha1) so a DuckDB oracle can recompute
    the exact features for the correctness gate. The real path (PIL)
    produces the same shape."""
    dig = hashlib.md5(payload or b"").digest()
    return [round(b / 255.0, 6) for b in dig[:FEATURE_DIM]]


def _decode_image(payload: bytes, pil_mod) -> tuple[str, list[float]]:
    """(decoder_tag, FEATURE_DIM floats). PIL path: decode, grayscale,
    downsample to a fixed grid, normalized means — a real (if tiny)
    visual signature. Fake path: sha1-derived stub."""
    if pil_mod is not None:  # pragma: no cover - needs PIL in the image
        import io

        try:
            img = pil_mod.open(io.BytesIO(payload)).convert("L")
            img = img.resize((FEATURE_DIM, 1))
            pix = list(img.getdata())
            return "pil", [round(p / 255.0, 6) for p in pix[:FEATURE_DIM]]
        except Exception:
            pass  # undecodable blob -> deterministic fallback
    return "fake", decode_image_stub(payload)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Arrow batches in, Arrow batches out; one output row per input row.
    ``batch_rows`` records the Arrow batch each row arrived in — the
    hook tests use to assert batch-size limits actually bound memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil_mod = _try_pil()
        for pdf in batches:
            payloads = pdf["payload"]
            decoded = payloads.map(lambda p: _decode_image(p, pil_mod))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha1": payloads.map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "decoder": decoded.map(lambda d: d[0]),
                    "features": decoded.map(lambda d: d[1]),
                    "batch_rows": len(pdf),
                }
            )

    return df.mapInPandas(run, schema=_FEATURES_SCHEMA)


def limit_arrow_batch_rows(spark: SparkSession, max_rows: int) -> None:
    """Bound executor memory for blob processing: each Arrow batch holds
    at most ``max_rows`` payloads (memory ≈ max_rows × max blob size)."""
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(max_rows)
    )


def repartition_by_payload_size(
    df: DataFrame,
    target_bytes_per_partition: int = 128 * 1024 * 1024,
    payload_col: str = "payload",
) -> DataFrame:
    """Rebalance by BYTES, not rows: one aggregation measures total
    payload size, then a round-robin repartition to
    ceil(total / target) partitions evens the per-task byte load.
    (Row-count-based partitioning is wrong for media: blob sizes span
    4 KB thumbnails to 40 MB clips.)"""
    total = df.select(
        F.sum(F.coalesce(F.length(payload_col), F.lit(0))).alias("b")
    ).collect()[0].b or 0
    n = max(1, -(-int(total) // target_bytes_per_partition))
    return df.repartition(n)


def media_dedup_exact(df: DataFrame) -> DataFrame:
    """Binary exact dedup: one survivor (min media_id) per distinct
    payload sha1. The shuffle runs on (sha1, id) — payloads never move."""
    hashed = df.select(
        "media_id", F.sha1(F.coalesce("payload", F.lit(b""))).alias("sha1")
    )
    keep = hashed.groupBy("sha1").agg(F.min("media_id").alias("media_id"))
    return df.join(keep.select("media_id"), "media_id", "left_semi")


def media_neardup_pairs(
    df: DataFrame, threshold: float = 0.95, n_blocks: int = 8
) -> DataFrame:
    """Perceptual near-dup pairs: extract features, then run the
    embedding near-dup operator (block-grid exact cosine join) over the
    feature vectors — (a, b, cosine) on media_id. The payload column is
    projected away before the shuffle."""
    from .similarity import embedding_neardup_pairs

    feats = extract_features(df).select("media_id", "features")
    return embedding_neardup_pairs(
        feats,
        id_col="media_id",
        vec_col="features",
        threshold=threshold,
        n_blocks=n_blocks,
    )


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
