"""Status/aggregation operators: A2 group-count, A4 status rollup, A5 ping
stats.

Reference cites:
- A2: ``plugin_enrichment_juniper_device_metrics.py:273-276`` —
  Counter over power-module types.
- A4: ``plugins/polling/utilities/polling_status.py:191-208`` — device
  status = SUCCESS iff all per-metric statuses succeed; PARTIAL if any
  succeeds; else the most-common failure state.
- A5: ``framework/utilities/ping.py:21-27,86-100`` — min/avg/max/stddev
  RTT + packet-loss%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# polling_status.DEVICE_METRICS_STATES (polling_status.py:24-44)
STATUS_SUCCESS = 0


def group_count_by_type(df: DataFrame, group_cols: list[str], type_col: str) -> DataFrame:
    """A2: counts per type within each group."""
    return df.groupBy(*group_cols, type_col).agg(F.count("*").alias("n"))


def status_rollup(
    df: DataFrame,
    device_col: str = "device_id",
    status_col: str = "status",
) -> DataFrame:
    """A4: per-device rollup of per-metric status codes (0 = success).

    SUCCESS if all zero; PARTIAL_METRIC_FAILURE if some zero; otherwise
    the most common failure code (ties -> smallest code, deterministic
    where Counter.most_common is insertion-order-dependent).
    """
    per_code = df.groupBy(device_col, status_col).agg(F.count("*").alias("n"))
    agg = per_code.groupBy(device_col).agg(
        F.sum(F.when(F.col(status_col) == STATUS_SUCCESS, F.col("n")).otherwise(0)).alias("n_ok"),
        F.sum("n").alias("n_total"),
        F.max_by(
            F.col(status_col),
            F.struct(
                F.when(F.col(status_col) == STATUS_SUCCESS, F.lit(-1)).otherwise(F.col("n")).alias("n"),
                (-F.col(status_col)).alias("tie"),
            ),
        ).alias("top_failure"),
    )
    return agg.select(
        device_col,
        F.when(F.col("n_ok") == F.col("n_total"), "SUCCESS")
        .when(F.col("n_ok") > 0, "PARTIAL_METRIC_FAILURE")
        .otherwise(F.concat(F.lit("FAILURE_"), F.col("top_failure").cast("string")))
        .alias("device_status"),
    )


def ping_stats(df: DataFrame, device_col: str = "device_id") -> DataFrame:
    """A5: per-device RTT stats over probe samples + loss percentage.

    Input: one row per probe (rtt_ms nullable = lost probe).

    RTTs are quantized at 6dp and scaled to exact micro-ms integers so
    every aggregate is order-independent AND the 3dp rounding of the
    average is a deterministic integer half-up — ``sum/n`` can land
    EXACTLY on a .0005 tie (observed at sf0.1: 3318.271/74 = 44.84150),
    where a float round is decided by which way the engine's ulp fell.
    The variance numerator ``n*Σx² − (Σx)²`` is likewise computed in
    exact integer arithmetic before the one unavoidable double sqrt.
    """
    rtt6 = (F.col("rtt_ms").cast("decimal(20,6)") * 1000000).cast("bigint")
    agg = df.groupBy(device_col).agg(
        F.count("*").alias("packets_transmitted"),
        F.count("rtt_ms").alias("packets_received"),
        F.round(
            (F.count("*") - F.count("rtt_ms")) * 100.0 / F.count("*"), 2
        ).alias("packet_loss_pct"),
        F.round(F.min("rtt_ms"), 3).alias("round_trip_min"),
        F.sum(rtt6).alias("__s6"),
        F.sum(rtt6.cast("decimal(38,0)") * rtt6).alias("__sq"),
        F.round(F.max("rtt_ms"), 3).alias("round_trip_max"),
    )
    n = F.col("packets_received")
    # half-up round of (s6 / (1000*n)) — the avg in 0.001-ms units —
    # done with integral `div` so both engines agree at exact ties
    avg_milli = F.expr(
        "(2 * __s6 + 1000 * packets_received) div (2000 * packets_received)"
    )
    num = (
        n.cast("decimal(38,0)") * F.col("__sq")
        - F.col("__s6").cast("decimal(38,0)") * F.col("__s6")
    )
    var = F.greatest(
        num.cast("double") / (n.cast("double") * n * F.lit(1e12)), F.lit(0.0)
    )
    return agg.select(
        device_col,
        "packets_transmitted",
        "packets_received",
        "packet_loss_pct",
        "round_trip_min",
        F.when(n > 0, avg_milli.cast("double") / 1000.0).alias("round_trip_avg"),
        "round_trip_max",
        F.when(n > 0, F.round(F.sqrt(var), 3)).alias("round_trip_stddev"),
    )
