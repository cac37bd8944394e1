"""Heartbeat subsystem twin + discovery golden replay.

Discovery: the reference's own JSON-file discovery fixtures
(``tests/plugins/discovery/data/``) through the S1 source — the good
file must reproduce ``results.json`` value-exactly, the mixed files must
keep exactly the valid records (error tolerance), and the all-bad files
must yield zero valid rows (the reference raises in that case,
plugin_discovery_from_json_file.py:66-73).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

DISC = "/root/reference/tests/plugins/discovery/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DISC), reason="reference corpus not available"
)


def _read(spark, name):
    from panoptes_spark.sources.json_resources import read_resources_json

    # the reference fixtures are pretty-printed JSON arrays
    return read_resources_json(spark, f"{DISC}/{name}", multi_line=True)


def test_discovery_golden_results(spark):
    valid, corrupt = _read(spark, "test.json")
    rows = valid.collect()
    expected = json.load(open(f"{DISC}/results.json"))["resources"]
    assert corrupt.count() == 0
    assert len(rows) == len(expected)
    got = sorted(
        (
            r.resource_site, r.resource_class, r.resource_subclass,
            r.resource_type, r.resource_id, r.resource_endpoint,
            r.resource_plugin, round(r.resource_creation_timestamp, 5),
            tuple(sorted((r.resource_metadata or {}).items())),
        )
        for r in rows
    )
    want = sorted(
        (
            e["resource_site"], e["resource_class"], e["resource_subclass"],
            e["resource_type"], e["resource_id"], e["resource_endpoint"],
            e["resource_plugin"],
            round(float(e["resource_creation_timestamp"]), 5),
            tuple(sorted(e["resource_metadata"].items())),
        )
        for e in expected
    )
    assert got == want


@pytest.mark.parametrize(
    "name,expected",
    [("one_bad_resource.json", 2), ("one_bad_resource_in_middle.json", 3)],
)
def test_discovery_mixed_good_bad(spark, name, expected):
    # counts per the reference's test_mixed_good_bad_resources
    valid, _ = _read(spark, name)
    rows = valid.collect()
    assert len(rows) == expected
    assert all(isinstance(r.resource_id, str) for r in rows)


@pytest.mark.parametrize("name", ["bad.json", "bad_resource.json"])
def test_discovery_all_bad_yields_no_valid_rows(spark, name):
    valid, _ = _read(spark, name)
    # the reference raises PanoptesDiscoveryPluginError when zero
    # resources survive; the source reports it as an empty valid frame
    assert valid.count() == 0


def test_heartbeat_pair_roundtrip(spark):
    from panoptes_spark.operators.heartbeat import (
        HEARTBEAT_NAMESPACE,
        heartbeat_enrichment,
        heartbeat_metrics,
    )

    devices = spark.createDataFrame(
        [("d1",), ("d2",), ("d3",)], "device_id string"
    )
    now = 1512629517.03121
    enr = heartbeat_enrichment(devices, now)
    rows = {r.device_id: r for r in enr.collect()}
    assert set(rows) == {"d1", "d2", "d3"}
    assert all(
        r.namespace == HEARTBEAT_NAMESPACE
        and r.key == "heartbeat"
        and r.timestamp == now
        for r in rows.values()
    )

    # d3 lost its enrichment -> sentinel -1 (plugin :39-46)
    partial = enr.where(F.col("device_id") != "d3").select(
        "device_id", "timestamp"
    )
    mets = {
        r.device_id: {m.metric_name: m.metric_value for m in r.metrics}
        for r in heartbeat_metrics(devices, partial).collect()
    }
    assert mets["d1"] == {
        "status": 1.0,
        "heartbeat_enrichment_timestamp": float(int(now)),
    }
    assert mets["d3"]["heartbeat_enrichment_timestamp"] == -1.0
    assert mets["d3"]["status"] == 1.0


def test_heartbeat_metrics_without_enrichment_frame(spark):
    from panoptes_spark.operators.heartbeat import heartbeat_metrics

    devices = spark.createDataFrame([("d1",)], "device_id string")
    out = heartbeat_metrics(devices, None).collect()
    vals = {m.metric_name: m.metric_value for m in out[0].metrics}
    assert vals["heartbeat_enrichment_timestamp"] == -1.0
