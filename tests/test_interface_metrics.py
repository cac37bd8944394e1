"""Interface polling derivation tests (J1/J4/A3/F3/F11/F12)."""

from pyspark.sql import functions as F

from panoptes_spark.operators.interface_metrics import (
    DEFAULT_DIMENSION_VALUE,
    MISSING_METRIC_VALUE,
    attach_enrichment,
    interface_metrics,
    resolve_parent_attrs,
)

RAW_SCHEMA = (
    "device_id string, interface_index string, octets_in long, octets_out long,"
    " unicast_packets_in long, unicast_packets_out long,"
    " multicast_packets_in long, multicast_packets_out long,"
    " broadcast_packets_in long, broadcast_packets_out long,"
    " errors_in long, errors_out long, discards_in long, discards_out long,"
    " errors_frame long, errors_crc long, errors_giants long,"
    " admin_state int, oper_state int"
)


def test_derivations(spark):
    rows = [
        ("d1", "1", 100, 200, 10, 20, 1, 2, 3, 4, 0, 0, 0, 0, 0, 0, 0, 1, 1),
        # missing multicast_in -> total_in sentinel; admin up oper down
        ("d1", "2", None, 50, 5, 5, None, 1, 1, 1, 0, 0, 0, 0, None, None, None, 1, 2),
    ]
    df = spark.createDataFrame(rows, RAW_SCHEMA)
    out = {r.interface_index: r for r in interface_metrics(df).collect()}

    i1 = out["1"]
    assert i1.bits_in == 800 and i1.bits_out == 1600  # F3
    assert i1.total_packets_in == 14 and i1.total_packets_out == 26  # A3
    assert i1.oper_admin_state_mismatch == 0
    assert i1.admin_state_name == "up" and i1.oper_state_name == "up"

    i2 = out["2"]
    assert i2.bits_in == MISSING_METRIC_VALUE  # F12 sentinel
    assert i2.total_packets_in == MISSING_METRIC_VALUE  # A3 propagation
    assert i2.total_packets_out == 7
    assert i2.errors_frame == MISSING_METRIC_VALUE
    assert i2.oper_state_name == "down" and i2.oper_admin_state_mismatch == 1


def test_enrichment_join_and_parent(spark):
    raw = spark.createDataFrame(
        [("d1", "1", 8, 8, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 1, 1),
         ("d1", "9", 8, 8, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 1, 1)],
        RAW_SCHEMA,
    )
    enr = spark.createDataFrame(
        [
            ("d1", "1", "xe-0/0/0", "ethernetCsmacd", 10000, 10000, "ae0"),
            ("d1", "2", "ae0", "ieee8023adLag", 20000, 20000, ""),
        ],
        "device_id string, interface_index string, interface_name string,"
        " media_type string, configured_speed long, port_speed long,"
        " parent_interface_name string",
    )
    enr2 = resolve_parent_attrs(enr)
    r1 = {r.interface_index: r for r in enr2.collect()}["1"]
    assert r1.parent_interface_media_type == "ieee8023adLag"  # J4
    assert r1.parent_interface_port_speed == 20000

    joined = attach_enrichment(interface_metrics(raw), enr2)
    rows = {r.interface_index: r for r in joined.collect()}
    assert rows["1"].interface_name == "xe-0/0/0"  # J1
    assert rows["9"].interface_name == DEFAULT_DIMENSION_VALUE  # F12 dim sentinel
