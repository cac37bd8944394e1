"""Streaming twin of the multi-resolution rollup
(operators/timeseries.py:multires_rollup).

Spark-native: the FINEST tier is a plain watermarked tumbling-window
aggregate (``F.window``) — the streaming engine maintains it
incrementally, which is what a continuous aggregate IS. Coarser tiers
are NOT separate streaming aggregates over the raw stream (that would
re-shuffle the corpus once per tier and triple the state); they
re-aggregate the finest tier's emitted rows inside ``foreachBatch``,
mirroring the batch operator's tier-from-tier derivation and the
production pattern of upserting each tier's table from the tier below.

Append-mode emission: a 1m bucket row is final once the watermark
passes its window end; the foreachBatch sink then folds the CLOSED
buckets into the coarser tier tables idempotently (group-by bucket
over new rows + merge into the store). Mergeable statistics only —
same invariant as the batch twin.

Scale: streaming state = open finest-tier buckets per key (bounded by
watermark); coarser tiers touch only aggregate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minute_tier_stream(
    events: DataFrame,
    ts_col: str = "ts_ms",
    key_col: str = "event_type",
    value_col: str = "value",
    span_ms: int = 60_000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling aggregate of the finest tier. Emits (on
    window close, append mode) the same row shape as the batch
    operator's finest tier: (bucket_ms, key, n, sum_value [exact
    decimal->double], min_value, max_value)."""
    ts = F.timestamp_millis(F.col(ts_col).cast("long"))
    df = events.withColumn("__ts", ts).withWatermark("__ts", watermark)
    win = F.window("__ts", f"{span_ms // 1000} seconds")
    return (
        df.groupBy(win.alias("w"), F.col(key_col).alias("key"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(20,2)")).alias("__dsum"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.unix_millis("w.start").alias("bucket_ms"),
            "key",
            "n",
            F.col("__dsum").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )
    )


def coarsen_tier(closed_buckets: DataFrame, span_ms: int) -> DataFrame:
    """Fold closed finer-tier rows into ``span_ms`` buckets — the
    foreachBatch body for each coarser tier (batch DataFrame in, batch
    DataFrame out; caller merges into its tier store keyed on
    (bucket_ms, key) by summing n/sum and min/max-ing the extremes)."""
    return (
        closed_buckets.groupBy(
            (F.floor(F.col("bucket_ms") / span_ms) * span_ms).alias(
                "bucket_ms"
            ),
            "key",
        )
        .agg(
            F.sum("n").alias("n"),
            # back through decimal so the fold is exact like the batch
            # tier-from-tier derivation (each finer value is an exact
            # 2dp quantity; double summation order would leak ulps)
            F.sum(F.col("sum_value").cast("decimal(20,2)"))
            .cast("double")
            .alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
