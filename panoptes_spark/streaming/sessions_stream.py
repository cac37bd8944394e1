"""Streaming twin of gap-based sessionization (operators/sessions.py).

Spark-native: ``F.session_window`` merges per-event windows that overlap,
which is exactly the inactivity-gap rule — no custom state function needed
(contrast rate_stream.py, where the reference's GETSET semantics force
``applyInPandasWithState``).

Semantics alignment: the batch operator starts a NEW session only when
``ts - prev > gap_ms`` (strictly greater — an event exactly ``gap_ms``
after the previous one stays in the session). ``session_window`` merges on
overlap of ``[ts, ts + gap)``, which would split the exact-boundary case,
so the streaming gap is ``gap_ms + 1`` milliseconds: for ms-resolution
timestamps the two rules then agree on every input.

Aggregates mirror ``session_stats``: bounds/duration come from
min/max of the event timestamp (not the session_window struct, whose end
is ``last_ts + gap``), so batch and streaming emit identical rows; only
the 0-based per-key ``session_id`` ordinal is absent (a streaming job has
no total per-key history to number against — sessions are identified by
their start instead).

Scale: state per open session only, pruned by the watermark; the groupBy
shuffles once on (key, merged-window) like any streaming agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    gap_ms: int = 30 * 60 * 1000,
    value_col: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """events: streaming DataFrame with ``key_cols`` + epoch-ms ``ts_col``.

    Returns per-session aggregates matching ``session_stats`` (sans
    ``session_id``): key_cols, session_start_ms, session_end_ms,
    duration_ms, n_events[, sum_value].
    """
    ts = F.timestamp_millis(F.col(ts_col).cast("long"))
    df = events.withColumn("__ts", ts).withWatermark("__ts", watermark)
    aggs = [
        F.min(ts_col).alias("session_start_ms"),
        F.max(ts_col).alias("session_end_ms"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_ms"),
        F.count("*").alias("n_events"),
    ]
    if value_col:
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(20,2)")).cast("double"), 6
            ).alias("sum_value")
        )
    return (
        df.groupBy(
            F.session_window("__ts", f"{gap_ms + 1} milliseconds"), *key_cols
        )
        .agg(*aggs)
        .drop("session_window")
    )
