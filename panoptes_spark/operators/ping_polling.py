"""Ping polling plugin twin.

Reference: ``yahoo_panoptes/plugins/polling/generic/plugin_polling_ping.py``
(:19-84) — ping a device, parse the ``/bin/ping`` statistics block
(``framework/utilities/ping.py:21-23,242-252``), and emit ONE 'ping'
metrics group per device carrying the five RTT/loss gauges plus a
``ping_status`` gauge:

- parse success, loss < 100%  -> SUCCESS(0), all six metrics
- parse success, loss == 100% -> PING_FAILURE(7), all six metrics
- parse failure (the plugin's ``except`` path :72-74) ->
  PING_FAILURE(7), ping_status ONLY

The probe itself is an external effect; this operator is the pure
data-plane twin over captured ping OUTPUT text (one row per device),
so the whole pipeline is a JVM-side regexp + projection — no UDFs, no
shuffle (map-only over however many devices the probe fan-out hits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from panoptes_spark.operators.vendor_polling import (
    _EMPTY_DIMS,
    _metric,
)

# DEVICE_METRICS_STATES (polling_status.py): SUCCESS / PING_FAILURE
PING_SUCCESS = 0
PING_FAILURE = 7

# framework/utilities/ping.py:21-23, verbatim semantics (Java regex)
_PING_STATS_RE = (
    r"ping statistics ---\n(\d*) packets transmitted, (\d*) received, "
    r"(\d*\.?\d*)% packet loss, time (\d*)ms\nrtt min/avg/max/mdev = "
    r"(\d*\.\d+)/(\d*\.\d+)/(\d*\.\d+)/(\d*\.\d+) ms"
)

# PING_METRICS (plugin :12-18): metric name -> parsed property
PING_METRICS = {
    "packet_loss_percent": "packet_loss_pct",
    "round_trip_minimum": "round_trip_min",
    "round_trip_maximum": "round_trip_max",
    "round_trip_average": "round_trip_avg",
    "round_trip_standard_deviation": "round_trip_stddev",
}


def parse_ping_output(
    df: DataFrame, out_col: str = "ping_output",
    device_col: str = "device_id",
) -> DataFrame:
    """Parse raw ping output text into the PanoptesPing response fields
    (``_get_ping_stats``, ping.py:242-252). Unparseable output (the
    plugin's exception path) leaves every field NULL."""
    def grp(i: int) -> F.Column:
        return F.regexp_extract(F.col(out_col), _PING_STATS_RE, i)

    ok = grp(1) != ""
    return df.select(
        device_col,
        F.when(ok, grp(1).cast("int")).alias("packets_transmitted"),
        F.when(ok, grp(2).cast("int")).alias("packets_received"),
        F.when(ok, grp(3).cast("double")).alias("packet_loss_pct"),
        # execution_time: ms -> seconds, rounded to 2 (ping.py:246)
        F.when(ok, F.round(grp(4).cast("double") / 1000, 2)).alias(
            "execution_time"
        ),
        F.when(ok, grp(5).cast("double")).alias("round_trip_min"),
        F.when(ok, grp(6).cast("double")).alias("round_trip_avg"),
        F.when(ok, grp(7).cast("double")).alias("round_trip_max"),
        F.when(ok, grp(8).cast("double")).alias("round_trip_stddev"),
    )


def ping_metrics_groups(
    parsed: DataFrame, interval: int, proc_failed_col: str | None = None
) -> DataFrame:
    """Assemble the plugin's MetricsGroupSet rows (plugin :52-78): one
    'ping' group per device; metrics per the three-way status table in
    the module docstring.

    ``proc_failed_col`` (optional boolean): the probe process exited
    non-zero. The REAL ``/bin/ping`` exits rc=1 on 100% loss, so
    ``subprocess.check_output`` raises and ``PanoptesPingDirect``
    re-raises (ping.py:234-238) BEFORE the plugin adds any RTT metrics
    — such rows emit ping_status ONLY, even when the captured output
    parses. The reference's own plugin test mocks ``check_output`` to
    RETURN the 100%-loss text (rc unchecked), which takes the
    parse-success branch and emits all six metrics
    (TEST_PLUGIN_RESULT_FAILURE) — both behaviors are reference-real;
    the column selects between them."""
    ok = F.col("packet_loss_pct").isNotNull()
    if proc_failed_col is not None:
        ok = ok & ~F.coalesce(F.col(proc_failed_col), F.lit(False))
    status = (
        F.when(~ok, F.lit(PING_FAILURE))
        .when(F.col("packet_loss_pct") == 100.0, F.lit(PING_FAILURE))
        .otherwise(F.lit(PING_SUCCESS))
    )
    stat_metric = _metric("ping_status", status)
    full = F.array(
        *[_metric(name, F.col(prop)) for name, prop in PING_METRICS.items()],
        stat_metric,
    )
    only_status = F.array(stat_metric)
    return parsed.select(
        "device_id",
        F.lit("ping").alias("metrics_group_type"),
        F.lit(interval).cast("long").alias("metrics_group_interval"),
        F.when(ok, full).otherwise(only_status).alias("metrics"),
        F.expr(_EMPTY_DIMS).alias("dimensions"),
    )
