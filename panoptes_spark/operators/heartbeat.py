"""Heartbeat subsystem twin (enrichment + polling pair).

Reference: ``plugins/enrichment/heartbeat/plugin_enrichment_heartbeat.py``
(emit {'heartbeat': {'timestamp': now}} under namespace ``heartbeat_ns``,
schema ``enrichment/schema/heartbeat.py``) and
``plugins/polling/heartbeat/plugin_polling_heartbeat.py`` (metrics group
``heartbeat`` with ``status`` = 1 and ``heartbeat_enrichment_timestamp``
= int(enrichment timestamp), -1 when the enrichment lookup fails).

Trivial per-device logic, but it is a whole subsystem type: the
enrichment is the freshness marker a fleet health dashboard joins
against. Both sides are map-only over the device dimension (a broadcast
join for the polling side) — nothing here shuffles the device universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEARTBEAT_NAMESPACE = "heartbeat_ns"  # enrichment/schema/heartbeat.py:13


def heartbeat_enrichment(devices: DataFrame, now_ts: float) -> DataFrame:
    """One enrichment row per device: (device_id, namespace, key,
    timestamp). ``now_ts`` is the agent's wall clock — an explicit input
    so replays are deterministic."""
    return devices.select("device_id").select(
        "device_id",
        F.lit(HEARTBEAT_NAMESPACE).alias("namespace"),
        F.lit("heartbeat").alias("key"),
        F.lit(float(now_ts)).alias("timestamp"),
    )


def heartbeat_metrics(
    devices: DataFrame,
    enrichment: DataFrame | None,
    interval_sec: int = 60,
) -> DataFrame:
    """Polling twin: nested metrics group per device.

    ``enrichment``: (device_id, timestamp) from the heartbeat namespace;
    a device missing there gets the reference's error sentinel -1
    (_get_enrichment_ts, plugin_polling_heartbeat.py:39-46).
    """
    base = devices.select("device_id")
    if enrichment is not None:
        e = enrichment.select(
            "device_id", F.col("timestamp").alias("__hb_ts")
        )
        base = base.join(F.broadcast(e), "device_id", "left")
    else:
        base = base.withColumn("__hb_ts", F.lit(None).cast("double"))
    hb = F.coalesce(
        F.floor("__hb_ts").cast("double"), F.lit(-1.0)
    )

    def metric(name: str, value: F.Column) -> F.Column:
        return F.struct(
            F.lit(name).alias("metric_name"),
            value.cast("double").alias("metric_value"),
            F.lit("gauge").alias("metric_type"),
            F.lit(0.0).alias("metric_creation_timestamp"),
        )

    return base.select(
        "device_id",
        F.lit("heartbeat").alias("metrics_group_type"),
        F.lit(interval_sec).cast("long").alias("metrics_group_interval"),
        F.array(
            metric("status", F.lit(1.0)),
            metric("heartbeat_enrichment_timestamp", hb),
        ).alias("metrics"),
        F.expr(
            "cast(array() as"
            " array<struct<dimension_name:string,dimension_value:string>>)"
        ).alias("dimensions"),
    )
