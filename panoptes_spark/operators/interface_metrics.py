"""Interface polling derivations (J1, J4, A3, F3, F11, F12).

Reference: ``/root/reference/yahoo_panoptes/plugins/polling/interface/
plugin_polling_device_interface_metrics.py`` and the interface enrichment
``plugins/enrichment/interface/plugin_enrichment_interface.py``.

Input shape (FIXTURES.md §5): a wide per-(device_id, interface_index) table
of IF-MIB counters in octets/packets, plus the interface enrichment
(description, media_type, speeds, parent name).

Semantics preserved:
- F3 octets -> bits (*8, :121-134)
- A3 total_packets = unicast+multicast+broadcast, with the -1 sentinel
  propagating if ANY component is missing (:151-169)
- F12 missing metric -> -1, missing dimension -> '<not set>'
  (:28-29, ``_smart_add_dimension`` :322-328)
- F11 state decode 1->up, 2->down, else unknown (:276-284); admin/oper
  mismatch flag 0/1 (:177-178)
- J1 enrichment attach: broadcast hash join on (device_id, interface_index)
  (reference preloads the whole namespace into a per-process cache —
  broadcast is the cluster equivalent)
- J4 parent attrs: enrichment self-join parent_interface_name ->
  interface_name
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MISSING_METRIC_VALUE = -1
DEFAULT_DIMENSION_VALUE = "<not set>"

_OCTET_COLS = ["octets_in", "octets_out"]
_PKT_COLS = [
    "unicast_packets_in", "unicast_packets_out",
    "multicast_packets_in", "multicast_packets_out",
    "broadcast_packets_in", "broadcast_packets_out",
]
_ERR_COLS = [
    "errors_in", "errors_out", "discards_in", "discards_out",
    "errors_frame", "errors_crc", "errors_giants",
]


def _m(col: str) -> F.Column:
    """F12: missing counter -> -1 sentinel."""
    return F.coalesce(F.col(col).cast("long"), F.lit(MISSING_METRIC_VALUE))


def state_decode(col: str) -> F.Column:
    """F11: 1 -> up, 2 -> down, else unknown."""
    c = F.col(col).cast("int")
    return (
        F.when(c == 1, "up").when(c == 2, "down").otherwise("unknown")
    )


def interface_metrics(raw: DataFrame) -> DataFrame:
    """Wide IF-MIB counters -> interface metric columns.

    Narrow projection only — no shuffle; runs at scan speed.
    """
    out = raw
    # F3: octets -> bits, sentinel-preserving
    for direction in ("in", "out"):
        out = out.withColumn(
            f"bits_{direction}",
            F.when(
                F.col(f"octets_{direction}").isNotNull(),
                F.col(f"octets_{direction}").cast("long") * 8,
            ).otherwise(F.lit(MISSING_METRIC_VALUE)),
        )
    for c in _PKT_COLS + _ERR_COLS:
        out = out.withColumn(c, _m(c))
    # A3: total packets with sentinel propagation
    for direction in ("in", "out"):
        u, m, b = (
            F.col(f"unicast_packets_{direction}"),
            F.col(f"multicast_packets_{direction}"),
            F.col(f"broadcast_packets_{direction}"),
        )
        out = out.withColumn(
            f"total_packets_{direction}",
            F.when(
                (u != MISSING_METRIC_VALUE)
                & (m != MISSING_METRIC_VALUE)
                & (b != MISSING_METRIC_VALUE),
                u + m + b,
            ).otherwise(F.lit(MISSING_METRIC_VALUE)),
        )
    # F11 state decodes + mismatch flag
    out = (
        out.withColumn("admin_state_raw", _m("admin_state"))
        .withColumn("oper_state_raw", _m("oper_state"))
        .withColumn("admin_state_name", state_decode("admin_state"))
        .withColumn("oper_state_name", state_decode("oper_state"))
        .withColumn(
            "oper_admin_state_mismatch",
            F.when(
                F.col("admin_state_raw") == F.col("oper_state_raw"), 0
            ).otherwise(1),
        )
    )
    return out


def attach_enrichment(
    metrics: DataFrame, enrichment: DataFrame, broadcast: bool = True
) -> DataFrame:
    """J1: left broadcast join to the interface enrichment on
    (device_id, interface_index); missing dimensions -> '<not set>'.

    enrichment columns: device_id, interface_index, interface_name,
    media_type, description, alias, configured_speed, port_speed,
    parent_interface_name [+ parent_* from resolve_parent_attrs].
    """
    e = F.broadcast(enrichment) if broadcast else enrichment
    out = metrics.join(e, ["device_id", "interface_index"], "left")
    for c in enrichment.columns:
        if c in ("device_id", "interface_index"):
            continue
        col = F.col(c)
        if dict(enrichment.dtypes).get(c) == "string":
            out = out.withColumn(
                c,
                F.when(
                    col.isNotNull() & (col != ""), col
                ).otherwise(F.lit(DEFAULT_DIMENSION_VALUE)),
            )
    return out


def resolve_parent_attrs(enrichment: DataFrame) -> DataFrame:
    """J4: derive parent interface attributes by self-joining
    parent_interface_name -> interface_name within each device
    (reference plugin_enrichment_interface.py:169-186)."""
    parent = enrichment.select(
        "device_id",
        F.col("interface_name").alias("parent_interface_name"),
        F.col("media_type").alias("parent_interface_media_type"),
        F.col("configured_speed").alias("parent_interface_configured_speed"),
        F.col("port_speed").alias("parent_interface_port_speed"),
    )
    # enrichment is dim-sized (interfaces per device) — broadcast the
    # parent side instead of a sort-merge self-join
    return enrichment.join(
        F.broadcast(parent), ["device_id", "parent_interface_name"], "left"
    )


# -- full plugin twin --------------------------------------------------------

_DIMENSION_NAMES = [
    "alias",
    "media_type",
    "description",
    "configured_speed",
    "port_speed",
    "interface_name",
    "parent_interface_name",
    "parent_interface_media_type",
    "parent_interface_configured_speed",
    "parent_interface_port_speed",
]

# reference _METRIC_TYPE_MAP (plugin_polling_device_interface_metrics.py:31-55)
_METRIC_TYPES = {
    "mtu": "gauge",
    "admin_state": "gauge",
    "oper_state": "gauge",
    "oper_admin_state_mismatch": "gauge",
    "configured_speed": "gauge",
    "errors_in": "counter",
    "errors_out": "counter",
    "discards_in": "counter",
    "discards_out": "counter",
    "bits_in": "counter",
    "bits_out": "counter",
    "unicast_packets_in": "counter",
    "unicast_packets_out": "counter",
    "multicast_packets_in": "counter",
    "multicast_packets_out": "counter",
    "broadcast_packets_in": "counter",
    "broadcast_packets_out": "counter",
    "total_packets_in": "counter",
    "total_packets_out": "counter",
    "errors_frame": "counter",
    "errors_crc": "counter",
    "errors_giants": "counter",
}


def interface_metrics_groups(
    raw: DataFrame,
    enrichment: DataFrame,
    interval_sec: int = 60,
    include_interface_index: bool = False,
) -> DataFrame:
    """The complete interface-plugin twin: wide counters + enrichment ->
    one nested metrics-group row per (device, interface), exactly the
    reference's ``get_results`` assembly
    (``plugin_polling_device_interface_metrics.py:322-416``):

    - the 10 enrichment dimensions via ``_smart_add_dimension``
      semantics (non-empty str() else '<not set>'), plus the opt-in
      ``interface_index`` dimension (`include_interface_index`,
      reference :355-364)
    - metric set = union of the if/ifx/dot3 derivations with the
      reference's gauge/counter typing; ``admin_state``/``oper_state``
      are the RAW integer states (the decode only feeds the mismatch
      flag), ``mtu`` sentinels to -1, ``configured_speed`` is both a
      gauge (numeric) and a dimension (string)

    Replayed bit-for-bit against the reference's own golden fixtures in
    ``tests/test_golden_interface.py``. Narrow after one broadcast
    enrichment join — no shuffle of the counter stream.
    """
    if "mtu" not in raw.columns:
        raw = raw.withColumn("mtu", F.lit(None).cast("long"))
    derived = interface_metrics(raw).withColumn("mtu", _m("mtu"))
    # an enrichment built by operators/interface_enrichment.py arrives
    # with parent attributes already resolved; only self-join raw
    # enrichment tables that still lack them
    if "parent_interface_media_type" not in enrichment.columns:
        enrichment = resolve_parent_attrs(enrichment)
    joined = attach_enrichment(derived, enrichment)

    def dim(name: str, value_col: str | None = None) -> F.Column:
        c = F.col(value_col or name).cast("string")
        return F.struct(
            F.lit(name).alias("dimension_name"),
            F.when(c.isNotNull() & (c != ""), c)
            .otherwise(F.lit(DEFAULT_DIMENSION_VALUE))
            .alias("dimension_value"),
        )

    dims = [dim(n) for n in _DIMENSION_NAMES]
    if include_interface_index:
        dims.append(dim("interface_index"))

    value_cols = {
        "admin_state": F.col("admin_state_raw"),
        "oper_state": F.col("oper_state_raw"),
        "configured_speed": F.coalesce(
            F.col("configured_speed").cast("long"),
            F.lit(MISSING_METRIC_VALUE),
        ),
    }
    mets = [
        F.struct(
            F.lit(name).alias("metric_name"),
            value_cols.get(name, F.col(name))
            .cast("double")
            .alias("metric_value"),
            F.lit(mtype).alias("metric_type"),
        )
        for name, mtype in _METRIC_TYPES.items()
    ]
    return joined.select(
        "device_id",
        F.lit("interface").alias("metrics_group_type"),
        F.lit(interval_sec).cast("long").alias("metrics_group_interval"),
        F.array(*dims).alias("dimensions"),
        F.array(*mets).alias("metrics"),
    )
