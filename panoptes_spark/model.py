"""Core model operations: identity, dedup, canonicalization, flattening.

Reference semantics preserved (file:line relative to /root/reference):

- Resource equality ignores endpoint/metadata/timestamp — identity is the
  5-tuple (site, class, subclass, type, id) (``framework/resources.py:284-292``).
- A metrics group may not contain two metrics with the same (name, type);
  the same name may exist as both counter and gauge
  (``framework/metrics.py:266-273``, ``polling_plugin_agent.py:233-237``).
- Dimensions upsert by name (``metrics.py:307-313``).
- Canonical serialization sorts metrics/dimensions so set-iteration order
  never leaks into hashes (``metrics.py:350-356``; tests pin
  PYTHONHASHSEED for the same reason, ``tox.ini:15``).
- Flatten projections (``metrics.py:315-344``): dims list->map; one row per
  metric point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .schemas import RESOURCE_IDENTITY_COLS


def dedup_resources(df: DataFrame, tiebreak_col: str = "resource_creation_timestamp") -> DataFrame:
    """Deduplicate a resource DataFrame on the 5-field identity.

    Deterministic: keeps the row with the greatest ``tiebreak_col`` (the
    reference's set semantics keep the first inserted; determinism matters
    more than which one under Spark's unordered shuffles).

    Scale note: a single hash-shuffle on the identity columns; with AQE the
    post-shuffle partition count adapts to data volume.
    """
    w = Window.partitionBy(*RESOURCE_IDENTITY_COLS).orderBy(
        F.col(tiebreak_col).desc_nulls_last()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def resource_serialization_key(df: DataFrame) -> DataFrame:
    """P10 — resource -> pipe-delimited store key.

    Mirrors ``framework/resources.py:234-246``:
    ``plugin|{plugin}|site|{site}|class|{class}|subclass|{subclass}|type|{type}|id|{id}|endpoint|{endpoint}``
    """
    return df.withColumn(
        "resource_key",
        F.concat_ws(
            "|",
            F.lit("plugin"),
            F.col("resource_plugin"),
            F.lit("site"),
            F.col("resource_site"),
            F.lit("class"),
            F.col("resource_class"),
            F.lit("subclass"),
            F.col("resource_subclass"),
            F.lit("type"),
            F.col("resource_type"),
            F.lit("id"),
            F.col("resource_id"),
            F.lit("endpoint"),
            F.col("resource_endpoint"),
        ),
    )


def canonicalize_metrics_groups(df: DataFrame) -> DataFrame:
    """Sort the metrics and dimensions arrays into canonical order.

    Metrics sort by (name, type); dimensions by name — the order the
    reference uses for content hashing (``metrics.py:350-356,388-398``).
    Pure array_sort on struct fields: stays in whole-stage codegen.
    """
    return df.withColumn(
        "metrics",
        F.expr(
            "array_sort(metrics, (a, b) -> CASE"
            " WHEN a.metric_name < b.metric_name THEN -1"
            " WHEN a.metric_name > b.metric_name THEN 1"
            " WHEN a.metric_type < b.metric_type THEN -1"
            " WHEN a.metric_type > b.metric_type THEN 1 ELSE 0 END)"
        ),
    ).withColumn(
        "dimensions",
        F.expr(
            "array_sort(dimensions, (a, b) -> CASE"
            " WHEN a.dimension_name < b.dimension_name THEN -1"
            " WHEN a.dimension_name > b.dimension_name THEN 1 ELSE 0 END)"
        ),
    )


def series_key_col(
    resource_id="resource_id", group_type="metrics_group_type", dimensions="dimensions"
):
    """The time-series identity key (reference ``_make_key``,
    ``polling/polling_plugin_agent.py:157-171``): resource id + group type +
    sorted dimension name/value pairs, pipe-delimited.

    Works on the flattened form where ``dimensions`` is a map column. Used
    as the Kafka partitioning key and the state key of the rate operator —
    Kafka's murmur2-on-key default partitioner then reproduces the
    reference's series-local placement (``message_queue.py:27,56-64``).
    """
    sorted_pairs = F.expr(
        f"array_join(transform(array_sort(map_keys({dimensions})),"
        f" k -> concat(k, '|', element_at({dimensions}, k))), '|')"
    )
    return F.concat_ws("|", F.col(resource_id), F.col(group_type), sorted_pairs)


def flatten_metrics_groups(df: DataFrame) -> DataFrame:
    """P9 — nested metrics groups -> flat points table.

    One output row per metric; dimensions become a map
    (``metrics.py:315-344``). explode is narrow (no shuffle).
    """
    return (
        df.select(
            F.col("resource.resource_id").alias("resource_id"),
            "metrics_group_type",
            "metrics_group_interval",
            F.map_from_entries(
                F.expr(
                    "transform(dimensions, d -> struct(d.dimension_name, d.dimension_value))"
                )
            ).alias("dimensions"),
            F.explode("metrics").alias("m"),
        )
        .select(
            "resource_id",
            "metrics_group_type",
            "metrics_group_interval",
            "dimensions",
            F.col("m.metric_name").alias("metric_name"),
            F.col("m.metric_value").alias("metric_value"),
            F.col("m.metric_type").alias("metric_type"),
            F.col("m.metric_creation_timestamp").alias("metric_creation_timestamp"),
        )
    )


def union_metrics_group_sets(a: DataFrame, b: DataFrame) -> DataFrame:
    """U1 — metrics-group-set union (``metrics.py:429-437``): set union with
    content dedup on canonical form.

    Spark set ops reject MapType, and ``resource.resource_metadata`` is a
    map — so the dedup key rebuilds the resource struct with the metadata
    as sorted entries (order-canonical, map-free) instead of deduping on
    the raw struct.
    """
    from pyspark.sql.types import MapType, StructType

    u = canonicalize_metrics_groups(
        a.unionByName(b, allowMissingColumns=True)
    )
    res_type = u.schema["resource"].dataType
    assert isinstance(res_type, StructType)
    parts = [
        F.expr(f"array_sort(map_entries(resource.{f.name}))").alias(f.name)
        if isinstance(f.dataType, MapType)
        else F.col(f"resource.{f.name}").alias(f.name)
        for f in res_type.fields
    ]
    key = F.struct(
        F.struct(*parts).alias("resource"),
        F.col("metrics_group_type"),
        F.col("dimensions"),
        F.col("metrics"),
    )
    return (
        u.withColumn("__set_key", key)
        .dropDuplicates(["__set_key"])
        .drop("__set_key")
    )


def validate_metrics_groups(df: DataFrame) -> DataFrame:
    """P5-adjacent integrity filter: drop groups violating the
    (metric_name, metric_type) uniqueness constraint (``metrics.py:266-273``)
    or the dimension-name identifier rule (``metrics.py:18``)."""
    return df.where(
        F.expr(
            "size(metrics) = size(array_distinct(transform(metrics,"
            " m -> struct(m.metric_name, m.metric_type))))"
        )
    ).where(
        F.expr(
            "forall(dimensions, d -> d.dimension_name rlike '^[^0-9\\\\W]\\\\w*$')"
        )
    )
