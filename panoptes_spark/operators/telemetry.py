"""Composed telemetry end-state: the plan tail shared by the batch gate
(`__spark_entry__._telemetry_e2e`) and the streaming-parity test
(`tests/test_e2e_composed.py::test_streaming_end_state_matches_batch_plan`).

The chain after discovery/rating — enrichment attach against the
reconciled store, per-site + global fan-out, per-(topic, group) rollup —
is ONE function so batch and streaming runs are compared through the
IDENTICAL plan, not a re-derivation (parity, not a second oracle).

Reference semantics: enrichment reads the RECONCILED resource set
(``resources/manager.py:46-142`` — a deleted device's samples still
rate but no longer enrich/emit) and fan-out routes each group to its
site topic plus the global topic
(``polling_plugin_agent.py:307-364``).

Scale shape: one broadcast join (the store is a dim), one narrow
explode, one partial-agg rollup; decimal-exact rate sums so the result
is partition-layout- and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def telemetry_end_state(store: DataFrame, rates: DataFrame) -> DataFrame:
    """(topic, metrics_group_type, n_points, n_series, sum_rate) over the
    enriched, fanned-out rate stream. ``store``: reconciled resources
    with (resource_id, site); ``rates``: rated points with
    (resource_id, metrics_group_type, rate)."""
    live = rates.join(
        F.broadcast(store.select("resource_id", "site")), "resource_id"
    )
    fan = live.select(
        "*",
        F.explode(
            F.array(
                F.concat(F.col("site"), F.lit("-processed")),
                F.lit("panoptes-metrics"),
            )
        ).alias("topic"),
    )
    return fan.groupBy("topic", "metrics_group_type").agg(
        F.count("*").alias("n_points"),
        F.countDistinct("resource_id").alias("n_series"),
        F.round(F.sum(F.col("rate").cast("decimal(20,2)")), 2)
        .cast("double")
        .alias("sum_rate"),
    )
