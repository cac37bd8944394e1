"""Enrichment namespace validation — the Cerberus-schema equivalent.

Reference: enrichment groups are schema-validated on insert
(``framework/enrichment.py:275-276``) against per-namespace Cerberus
schemas (``enrichment/schema/interface.py:14-37``, ``.../generic/
snmp.py:13-43``, ``neighbor_lookup.py:18-69``).

Spark-first: the namespace value rides as a JSON string column;
``from_json`` against the namespace StructType is the schema check, and
explicit constraint predicates cover what Cerberus `required`/bounds
expressed. Returns (valid, invalid) splits so bad records are counted and
quarantined, never dropped silently — the reference logs-and-skips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import (
    BRIDGE_LOOKUP_VALUE_SCHEMA,
    HEARTBEAT_VALUE_SCHEMA,
    INTERFACE_ENRICHMENT_VALUE_SCHEMA,
    INTERFACE_LOOKUP_VALUE_SCHEMA,
    L3_INTERFACE_LOOKUP_VALUE_SCHEMA,
    NEIGHBOR_VALUE_SCHEMA,
    OPERATIONAL_VALUE_SCHEMA,
    TOPOLOGY_VALUE_SCHEMA,
)

# required fields per namespace (Cerberus 'required': True equivalents)
_REQUIRED = {
    "interface": ["interface_name", "media_type", "configured_speed"],
    "bridge_lookup": ["resource_id", "port_id_map"],
    "interface_lookup": ["resource_id", "interface_description",
                         "interface_index"],
    "l3_interface_lookup": ["resource_id", "interface_description",
                            "interface_index", "ip_version"],
    "topology": ["interface", "neighbor", "map_type"],
    "heartbeat_ns": [],
    # operational.py:14-31 — only the status code is required
    "operational": ["device_polling_status"],
    # neighbor.py:13-40 — every declared field is required
    "neighbor": [f.name for f in NEIGHBOR_VALUE_SCHEMA.fields],
}

_SCHEMAS = {
    "interface": INTERFACE_ENRICHMENT_VALUE_SCHEMA,
    "bridge_lookup": BRIDGE_LOOKUP_VALUE_SCHEMA,
    "interface_lookup": INTERFACE_LOOKUP_VALUE_SCHEMA,
    "l3_interface_lookup": L3_INTERFACE_LOOKUP_VALUE_SCHEMA,
    "topology": TOPOLOGY_VALUE_SCHEMA,
    "heartbeat_ns": HEARTBEAT_VALUE_SCHEMA,
    "operational": OPERATIONAL_VALUE_SCHEMA,
    "neighbor": NEIGHBOR_VALUE_SCHEMA,
}


def validate_enrichment_json(
    df: DataFrame, namespace: str, json_col: str = "value_json"
) -> tuple[DataFrame, DataFrame]:
    """Parse + validate one namespace's enrichment rows.

    df: (resource_id, namespace, key, value_json, ...). Returns
    (valid-with-typed-value-struct, invalid-raw)."""
    schema = _SCHEMAS[namespace]
    parsed = df.where(F.col("namespace") == namespace).withColumn(
        "value", F.from_json(F.col(json_col), schema)
    )
    ok = F.col("value").isNotNull()
    for field in _REQUIRED.get(namespace, []):
        ok = ok & F.col(f"value.{field}").isNotNull()
    if namespace == "interface":
        # speeds must be non-negative when present
        for c in ("value.configured_speed", "value.port_speed"):
            ok = ok & (F.col(c).isNull() | (F.col(c) >= 0))
    with_flag = parsed.withColumn("__ok", ok)
    return (
        with_flag.where("__ok").drop("__ok", json_col),
        with_flag.where("NOT coalesce(__ok, false)").drop("__ok", "value"),
    )
