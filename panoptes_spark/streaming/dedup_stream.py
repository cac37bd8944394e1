"""Streaming twin of exact dedup (pipeline/dedup.py::exact_dedup).

An ingestion stream (crawl batches, log ships) wants "first copy wins,
drop later repeats". Spark-native: ``dropDuplicatesWithinWatermark`` keys
state by the normalized-text fingerprint and prunes it by the event-time
watermark, so state is bounded by the dedup horizon — not corpus size —
which is the property that survives an unbounded 100 TB/day stream.
(Plain streaming ``dropDuplicates`` would keep every fingerprint forever.)

The fingerprint is the SAME md5-of-normalized-text key the batch operator
uses, so a document deduped in the streaming tier hashes identically in
any later batch pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from panoptes_spark.pipeline.text import add_fingerprint


def dedup_exact_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts_ms",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming DataFrame -> first-seen rows per fingerprint.

    ``ts_col`` is epoch milliseconds; duplicates arriving within
    ``watermark`` of the first copy's event time are dropped, and the
    fingerprint's state entry is freed once the watermark passes it.
    """
    with_fp = add_fingerprint(docs, text_col)
    df = with_fp.withColumn(
        "__ts", F.timestamp_millis(F.col(ts_col).cast("long"))
    ).withWatermark("__ts", watermark)
    return df.dropDuplicatesWithinWatermark(["fingerprint"]).drop("__ts")
