"""Wire-format schemas for the telemetry data model.

Reference semantics (yahoo/panoptes, cited file:line relative to the
reference repo):

- Resource envelope: ``yahoo_panoptes/framework/resources.py:105-118`` —
  fixed string fields + open string->string metadata map.
- Metrics-group wire JSON Schema (draft-04):
  ``yahoo_panoptes/framework/utilities/consumer.py:48-98``.
- Resource-set wire schema: ``consumer.py:100-134``.
- Enrichment group: ``yahoo_panoptes/framework/enrichment.py:178-350`` with
  per-namespace Cerberus schemas (e.g. ``enrichment/schema/interface.py``).

The reference is row-oriented JSON; here the same shapes are typed Spark
StructTypes so Catalyst/Tungsten get a columnar layout, and ``from_json`` /
``to_json`` reproduce the wire format exactly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Resource (reference resources.py:105-118; equality identity :284-292)
# ---------------------------------------------------------------------------

RESOURCE_IDENTITY_COLS = [
    "resource_site",
    "resource_class",
    "resource_subclass",
    "resource_type",
    "resource_id",
]

RESOURCE_SCHEMA = T.StructType(
    [
        T.StructField("resource_site", T.StringType(), False),
        T.StructField("resource_class", T.StringType(), False),
        T.StructField("resource_subclass", T.StringType(), False),
        T.StructField("resource_type", T.StringType(), False),
        T.StructField("resource_id", T.StringType(), False),
        T.StructField("resource_endpoint", T.StringType(), True),
        # epoch seconds, ms precision (reference metrics.py:21)
        T.StructField("resource_creation_timestamp", T.DoubleType(), True),
        T.StructField("resource_plugin", T.StringType(), True),
        T.StructField(
            "resource_metadata", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)

# ---------------------------------------------------------------------------
# Metrics group (wire shape per consumer.py:48-98)
# ---------------------------------------------------------------------------

DIMENSION_SCHEMA = T.StructType(
    [
        T.StructField("dimension_name", T.StringType(), False),
        T.StructField("dimension_value", T.StringType(), False),
    ]
)

METRIC_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_value", T.DoubleType(), False),
        # 'gauge' | 'counter' (reference metrics.py:33-37)
        T.StructField("metric_type", T.StringType(), False),
        T.StructField("metric_creation_timestamp", T.DoubleType(), False),
    ]
)

METRICS_GROUP_SCHEMA_VERSION = "0.2"  # reference metrics.py:22

METRICS_GROUP_SCHEMA = T.StructType(
    [
        T.StructField("metrics_group_type", T.StringType(), False),
        T.StructField("metrics_group_interval", T.LongType(), False),
        T.StructField("metrics_group_creation_timestamp", T.DoubleType(), False),
        T.StructField("metrics_group_schema_version", T.StringType(), False),
        T.StructField("resource", RESOURCE_SCHEMA, False),
        T.StructField("metrics", T.ArrayType(METRIC_SCHEMA), False),
        T.StructField("dimensions", T.ArrayType(DIMENSION_SCHEMA), False),
    ]
)

# Flattened analytic view: one row per metric point, dims as a map
# (mirrors flatten_dimensions/flatten_metrics, reference metrics.py:315-344).
METRIC_POINT_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType(), False),
        T.StructField("metrics_group_type", T.StringType(), False),
        T.StructField("metrics_group_interval", T.LongType(), False),
        T.StructField("dimensions", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_value", T.DoubleType(), False),
        T.StructField("metric_type", T.StringType(), False),
        T.StructField("metric_creation_timestamp", T.DoubleType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Enrichment (reference enrichment.py:89-350; storage key {resource}:{ns})
# ---------------------------------------------------------------------------

ENRICHMENT_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType(), False),
        T.StructField("namespace", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("enrichment_ttl", T.LongType(), True),
        T.StructField("enrichment_creation_timestamp", T.DoubleType(), True),
    ]
)

# interface namespace value struct (enrichment/schema/interface.py:14-37)
INTERFACE_ENRICHMENT_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("description", T.StringType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("interface_name", T.StringType(), True),
        T.StructField("alias", T.StringType(), True),
        T.StructField("configured_speed", T.LongType(), True),
        T.StructField("port_speed", T.LongType(), True),
        T.StructField("parent_interface_name", T.StringType(), True),
        T.StructField("parent_interface_media_type", T.StringType(), True),
        T.StructField("parent_interface_configured_speed", T.LongType(), True),
        T.StructField("parent_interface_port_speed", T.LongType(), True),
        T.StructField("physical_address", T.StringType(), True),
    ]
)

# Additional enrichment namespace value schemas (Cerberus twins):
# neighbor-lookup family (enrichment/schema/neighbor_lookup.py:18-69),
# topology (schema/topology.py), heartbeat (schema/heartbeat.py)
BRIDGE_LOOKUP_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType(), False),
        T.StructField("port_id_map", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

INTERFACE_LOOKUP_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType(), False),
        T.StructField("interface_description", T.StringType(), False),
        T.StructField("interface_index", T.StringType(), False),
        T.StructField("port_id_map", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

L3_INTERFACE_LOOKUP_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType(), False),
        T.StructField("interface_description", T.StringType(), False),
        T.StructField("interface_index", T.StringType(), False),
        T.StructField("ip_version", T.IntegerType(), False),
    ]
)

TOPOLOGY_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("interface", T.StringType(), False),
        T.StructField("neighbor", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("map_type", T.StringType(), False),
    ]
)

HEARTBEAT_VALUE_SCHEMA = T.StructType(
    [T.StructField("timestamp", T.DoubleType(), True)]
)

# operational namespace (enrichment/schema/operational.py:14-31):
# device health envelope; only device_polling_status is required
OPERATIONAL_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("snmpenginetime", T.LongType(), True),
        T.StructField("sysdescr", T.StringType(), True),
        T.StructField("device_vendor", T.StringType(), True),
        T.StructField("device_model", T.StringType(), True),
        T.StructField("device_os", T.StringType(), True),
        T.StructField("device_os_version", T.StringType(), True),
        # DEVICE_METRICS_STATES code (polling_status.py:26-39)
        T.StructField("device_polling_status", T.IntegerType(), False),
        T.StructField("last_updated", T.LongType(), True),
    ]
)

# neighbor namespace (enrichment/schema/neighbor.py:13-40): every field
# required; dict-typed fields ride as string->string maps, list-typed as
# string arrays (addresses)
NEIGHBOR_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("description", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("layer", T.IntegerType(), False),
        T.StructField("member_of_lag", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("member_of_svi", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("lag_members", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("ipv6_neighbor", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("ipv4_neighbor", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("l2_neighbor", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("ipv6_address", T.ArrayType(T.StringType()), False),
        T.StructField("ipv4_address", T.ArrayType(T.StringType()), False),
        T.StructField("vlans", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("spanning_tree", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("mac_address", T.StringType(), False),
        T.StructField("svi_physical_members", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("sub_interfaces", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("primary_interface", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("link_state", T.StringType(), False),
        T.StructField("admin_state", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Long-format OID tables for the metric-computation DSL
# (docs/Generic_SNMP_Polling_DSL.md:52-91 — tables are {index: value} maps)
# ---------------------------------------------------------------------------

OID_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("device_id", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("index", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

# Metric / metric-type enums (reference metrics.py:33-37)
METRIC_TYPE_GAUGE = "gauge"
METRIC_TYPE_COUNTER = "counter"

# Operational constants mirrored from the reference (BASELINE.md)
METRICS_KV_STORE_TTL_MULTIPLE = 3  # framework/const.py:109
METRICS_CONFIDENCE_THRESHOLD = 0.33  # framework/const.py:107
RESOURCE_TTL_DEFAULT = 604800  # framework/const.py:71
METRICS_TIMESTAMP_PRECISION = 3  # framework/metrics.py:21
