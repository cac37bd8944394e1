"""Gap-based sessionization over event streams.

Not present in the reference (its windowing is rate/TTL only — SURVEY
§2.5), but a first-class need for the telemetry/training-data pipelines
this engine targets: group events per key into sessions split at
inactivity gaps.

Batch form: lag + cumulative-sum-of-gap-flags window (two passes over one
series-keyed shuffle). Streaming twin: ``session_window`` in Structured
Streaming shares the semantics.

Scale: one shuffle on the key; both window passes reuse the same
partitioning (no second exchange — verify via .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    gap_ms: int = 30 * 60 * 1000,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Assign ``session_id`` (0-based per key) by inactivity gap.

    ``tiebreak_cols`` (e.g. an event id) make the window order total so
    equal-timestamp rows can never flip session assignment between runs.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull() | (F.col(ts_col) - prev > gap_ms), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    gap_ms: int = 30 * 60 * 1000,
    value_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session aggregates: bounds, duration, event count, optional
    decimal-exact value sum (rounded to 6dp for stable comparison)."""
    s = sessionize(df, key_cols, ts_col, gap_ms, tiebreak_cols)
    aggs = [
        F.min(ts_col).alias("session_start_ms"),
        F.max(ts_col).alias("session_end_ms"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_ms"),
        F.count("*").alias("n_events"),
    ]
    if value_col:
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(20,2)")).cast("double"),
                6,
            ).alias("sum_value")
        )
    return s.groupBy(*key_cols, "session_id").agg(*aggs)
