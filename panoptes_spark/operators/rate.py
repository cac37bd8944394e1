"""Counter→gauge rate transform (J6 / W1 / W2).

Reference semantics (``/root/reference/yahoo_panoptes/polling/
polling_plugin_agent.py:178-242``): for each time series (series key
``_make_key``, :157-171) the previous (value, timestamp) is fetched from a
TTL'ed KV store (GETSET) and the rate ``(v - v_prev) / (t - t_prev)`` is
emitted as a gauge next to the raw counter. Guards:

- Δt <= 0       → skip (out-of-order or duplicate sample)
- Δt > TTL_MULTIPLE × interval → skip (state expired; reference's Redis TTL,
  ``framework/const.py:109`` = 3)
- Δv < 0        → skip (counter wrap/reset)
- confidence = interval / Δt, warn-worthy below 0.33
  (``framework/const.py:107``)

The reference emits ``int(Δv/Δt)`` (floor toward zero for positives).

Spark-first design: in batch this is a ``lag`` window — one shuffle on the
series key, then whole-stage-codegen'd arithmetic; no state store, no UDF.
At 100 TB the shuffle partitions by series key, which is also the Kafka
partitioning key upstream (S9), so a pre-partitioned source makes this
shuffle-free. The streaming twin lives in ``streaming/rate_stream.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import METRICS_CONFIDENCE_THRESHOLD, METRICS_KV_STORE_TTL_MULTIPLE


def rate_transform(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "metric_value",
    interval_sec: int = 60,
    ttl_multiple: int = METRICS_KV_STORE_TTL_MULTIPLE,
    emit_int_rate: bool = True,
    keep_skipped: bool = False,
) -> DataFrame:
    """Compute per-series rates with the reference's guard semantics.

    ``ts_col`` is epoch **milliseconds** (BIGINT) — integer timestamps keep
    cross-engine hashes stable; Δt is converted to seconds for the rate.

    Returns input columns + ``rate`` (nullable when guarded out; rows with
    NULL rate dropped unless ``keep_skipped``) + ``confidence`` +
    ``low_confidence`` flag.
    """
    w = Window.partitionBy(*series_cols).orderBy(F.col(ts_col).asc())
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    dt_sec = (F.col(ts_col) - prev_t) / F.lit(1000.0)
    dv = F.col(value_col) - prev_v

    ok = (
        prev_t.isNotNull()
        & (dt_sec > 0)
        & (dt_sec <= F.lit(float(ttl_multiple * interval_sec)))
        & (dv >= 0)
    )
    rate_raw = dv / dt_sec
    rate = F.floor(rate_raw).cast("double") if emit_int_rate else rate_raw
    out = (
        df.withColumn("rate", F.when(ok, rate))
        .withColumn("confidence", F.when(ok, F.round(F.lit(interval_sec) / dt_sec, 6)))
        .withColumn(
            "low_confidence",
            F.when(ok, F.lit(interval_sec) / dt_sec < METRICS_CONFIDENCE_THRESHOLD),
        )
    )
    if not keep_skipped:
        out = out.where(F.col("rate").isNotNull())
    return out


def rate_oracle_sql(
    source_sql: str,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "metric_value",
    interval_sec: int = 60,
    ttl_multiple: int = METRICS_KV_STORE_TTL_MULTIPLE,
) -> str:
    """DuckDB SQL computing the identical relation (for the oracle gate)."""
    keys = ", ".join(series_cols)
    return f"""
    WITH src AS ({source_sql}),
    lagged AS (
      SELECT *,
        lag({value_col}) OVER (PARTITION BY {keys} ORDER BY {ts_col}) AS prev_v,
        lag({ts_col})   OVER (PARTITION BY {keys} ORDER BY {ts_col}) AS prev_t
      FROM src
    )
    SELECT * EXCLUDE (prev_v, prev_t),
      CAST(floor(({value_col} - prev_v) / (({ts_col} - prev_t) / 1000.0)) AS DOUBLE) AS rate,
      round({interval_sec} / (({ts_col} - prev_t) / 1000.0), 6) AS confidence,
      ({interval_sec} / (({ts_col} - prev_t) / 1000.0)) < {METRICS_CONFIDENCE_THRESHOLD} AS low_confidence
    FROM lagged
    WHERE prev_t IS NOT NULL
      AND ({ts_col} - prev_t) / 1000.0 > 0
      AND ({ts_col} - prev_t) / 1000.0 <= {float(ttl_multiple * interval_sec)}
      AND ({value_col} - prev_v) >= 0
    """


def agent_rate_gauges(
    samples: DataFrame,
    series_cols: list[str],
    seq_col: str = "seq",
    ts_col: str = "metric_ts",
    value_col: str = "metric_value",
    interval_col: str = "interval",
    ttl_multiple: int = METRICS_KV_STORE_TTL_MULTIPLE,
) -> DataFrame:
    """Polling-agent counter->gauge transform twin
    (``polling_plugin_agent.py:_transformation_rate`` :178-243): each
    arriving counter sample is getset against the KV store, so the
    comparison base is the IMMEDIATELY PRECEDING sample in arrival
    order — even when that sample's own conversion was skipped. A lag
    window over the arrival sequence reproduces the store exactly.

    Emits one row per sample with the computed ``gauge_value`` (NULL =
    the reference's skip: first sample, dt <= 0, dt beyond
    interval*TTL_MULTIPLE, or counter reset) plus ``confidence``
    (round(interval/dt, 2)). Confidence is computed AFTER the dt guards
    but BEFORE the counter-difference check (:206-229): a counter-reset
    sample carries confidence with no gauge; a TTL-overrun sample never
    reaches the confidence line, so it carries neither. A low value only
    LOGS (:221-225) — it never filters. rate = int(diff/dt) truncated
    (:229), diff >= 0 so floor == int.
    """
    w = Window.partitionBy(*series_cols).orderBy(seq_col)
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    dt = F.col(ts_col) - prev_t
    diff = F.col(value_col) - prev_v
    dt_ok = (
        prev_t.isNotNull()
        & (dt > 0)
        & (dt <= F.col(interval_col) * F.lit(ttl_multiple))
    )
    ok = dt_ok & (diff >= 0)
    return samples.select(
        "*",
        F.when(ok, F.floor(diff / dt)).cast("long").alias("gauge_value"),
        F.when(
            dt_ok, F.round(F.col(interval_col) / dt, 2)
        ).alias("confidence"),
    )
