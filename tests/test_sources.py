"""S1 JSON resource scan, S5/S10/W3 store ops, A4/A5 status aggregates."""

import json

from pyspark.sql import functions as F

from panoptes_spark.operators.status import ping_stats, status_rollup
from panoptes_spark.sources.json_resources import read_resources_json
from panoptes_spark.sources.stores import expire, scan_namespace, upsert_with_ttl


def test_json_resource_scan_tolerates_corrupt(spark, tmp_path):
    good = {
        "resource_site": "dc1", "resource_class": "network",
        "resource_subclass": "switch", "resource_type": "cisco",
        "resource_id": "sw1", "resource_endpoint": "sw1.net",
        "resource_creation_timestamp": 1.0, "resource_plugin": "disc",
        "resource_metadata": {"make": "Cisco"},
    }
    dup = dict(good, resource_creation_timestamp=2.0)
    missing = {"resource_site": "dc1"}  # no identity fields
    p = tmp_path / "resources.json"
    with open(p, "w") as f:
        for rec in (good, dup, missing):
            f.write(json.dumps(rec) + "\n")
        f.write("{this is not json\n")

    valid, corrupt = read_resources_json(spark, str(p))
    rows = valid.collect()
    assert len(rows) == 1  # dedup kept one, missing dropped
    assert rows[0].resource_creation_timestamp == 2.0  # newest wins
    assert corrupt.count() == 1


def test_store_ops(spark):
    store = spark.createDataFrame(
        [("enrich:r1:interface", "v1", 100.0), ("enrich:r2:interface", "v2", 10.0),
         ("resource:r3", "v3", None)],
        "key string, value string, expires_at double",
    )
    updates = spark.createDataFrame(
        [("enrich:r2:interface", "v2-new", 300), ("enrich:r9:bgp", "v9", 300)],
        "key string, value string, ttl long",
    )
    merged = upsert_with_ttl(store, updates, ["key"], now=50.0)
    rows = {r.key: (r.value, r.expires_at) for r in merged.collect()}
    assert rows["enrich:r2:interface"] == ("v2-new", 350.0)  # replaced
    assert rows["enrich:r9:bgp"] == ("v9", 350.0)  # added
    assert rows["enrich:r1:interface"] == ("v1", 100.0)  # kept

    live = expire(merged, now=120.0)
    assert {r.key for r in live.collect()} == {
        "enrich:r2:interface", "enrich:r9:bgp", "resource:r3"}  # r1 expired

    ns = scan_namespace(merged, "enrich:")
    assert ns.count() == 3


def test_status_rollup_states(spark):
    df = spark.createDataFrame(
        [("d1", 0), ("d1", 0),                 # all ok
         ("d2", 0), ("d2", 3),                 # partial
         ("d3", 2), ("d3", 2), ("d3", 5),      # most-common failure 2
         ("d4", 5), ("d4", 2)],                # tie -> smaller code 2
        "device_id string, status int",
    )
    out = {r.device_id: r.device_status for r in status_rollup(df).collect()}
    assert out == {"d1": "SUCCESS", "d2": "PARTIAL_METRIC_FAILURE",
                   "d3": "FAILURE_2", "d4": "FAILURE_2"}


def test_ping_stats(spark):
    df = spark.createDataFrame(
        [("d1", 10.0), ("d1", 20.0), ("d1", None), ("d2", None), ("d2", None)],
        "device_id string, rtt_ms double",
    )
    out = {r.device_id: r for r in ping_stats(df).collect()}
    assert out["d1"].packet_loss_pct == 33.33
    assert out["d1"].round_trip_avg == 15.0
    assert out["d2"].packet_loss_pct == 100.0  # total-loss path
    assert out["d2"].round_trip_avg is None


def test_enrichment_validation(spark):
    import json as _json

    from panoptes_spark.operators.enrichment_validate import (
        validate_enrichment_json,
    )

    good = {"interface_name": "xe-0/0/0", "media_type": "ethernetCsmacd",
            "configured_speed": 10000, "port_speed": 10000}
    missing = {"media_type": "ethernetCsmacd"}  # no interface_name
    negative = dict(good, configured_speed=-5)
    rows = [
        ("r1", "interface", "1", _json.dumps(good)),
        ("r1", "interface", "2", _json.dumps(missing)),
        ("r1", "interface", "3", _json.dumps(negative)),
        ("r1", "interface", "4", "{broken"),
    ]
    df = spark.createDataFrame(
        rows, "resource_id string, namespace string, key string, value_json string"
    )
    valid, invalid = validate_enrichment_json(df, "interface")
    assert {r.key for r in valid.collect()} == {"1"}
    assert {r.key for r in invalid.collect()} == {"2", "3", "4"}
    assert valid.collect()[0].value.interface_name == "xe-0/0/0"


def test_enrichment_validation_other_namespaces(spark):
    import json as _json

    from panoptes_spark.operators.enrichment_validate import (
        validate_enrichment_json,
    )

    rows = [
        ("r1", "topology", "xe-0", _json.dumps(
            {"interface": "xe-0", "neighbor": {"device": "r2"},
             "map_type": "lldp"})),
        ("r1", "topology", "xe-1", _json.dumps({"interface": "xe-1"})),  # missing
    ]
    df = spark.createDataFrame(
        rows, "resource_id string, namespace string, key string, value_json string"
    )
    valid, invalid = validate_enrichment_json(df, "topology")
    assert {r.key for r in valid.collect()} == {"xe-0"}
    assert {r.key for r in invalid.collect()} == {"xe-1"}

    hb = spark.createDataFrame(
        [("r1", "heartbeat_ns", "hb", _json.dumps({"timestamp": 5.0}))],
        "resource_id string, namespace string, key string, value_json string",
    )
    v, i = validate_enrichment_json(hb, "heartbeat_ns")
    assert v.count() == 1 and i.count() == 0
