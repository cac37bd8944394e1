"""Replay of the reference's juniper device-metrics ENRICHMENT goldens.

Inputs are the reference's own checked-in fixtures
(``tests/plugins/enrichment/generic/snmp/juniper/data/``): recorded SNMP
walks (``recording/*.snmprec``) and the expected enrichment group sets
(``*_results.json``). The builder under test is
``operators/device_enrichment.juniper_device_enrichment`` — the Spark
twin of ``plugin_enrichment_juniper_device_metrics.py``.

Comparison is value-level (order-insensitive) on the
{"oids", "metrics_groups"} enrichment payload for device 127.0.0.1,
plugin conf per the reference test classes
(test_plugin_enrichment_juniper_device_metrics.py:29-100):
polling_frequency=300, include_disk_metrics_group=1 (except QFX),
resource model 'model' (except EX4300 -> 'EX4300-48P').
"""

import json
import os

import pytest

from panoptes_spark.dsl import corpus
from panoptes_spark.operators.device_enrichment import (
    juniper_device_enrichment,
)

DATA = "/root/reference/tests/plugins/enrichment/generic/snmp/juniper/data"
DEVICE = "127.0.0.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference corpus not available"
)

CASES = [
    # (recording community, results file, model, include_disk)
    ("mx960", "mx960_results.json", "model", True),
    ("mx2020", "mx2020_results.json", "model", True),
    ("srx1400", "srx1400_results.json", "model", True),
    ("qfx", "qfx_results.json", "model", False),
    ("ex", "ex_results.json", "model", True),
    ("ex", "ex4300_results.json", "EX4300-48P", True),
]


def ordered(obj):
    """Reference helpers.ordered — order-insensitive canonical form."""
    if isinstance(obj, dict):
        return sorted((k, ordered(v)) for k, v in obj.items())
    if isinstance(obj, list):
        return sorted(ordered(x) for x in obj)
    return str(obj)


def _walk_df(spark, community: str):
    rec = corpus.parse_snmprec(f"{DATA}/recording/{community}.snmprec")
    rows = [(DEVICE, oid, value) for oid, _tag, value in rec]
    return spark.createDataFrame(
        rows, "device_id string, oid string, value string"
    )


@pytest.mark.parametrize(
    "community,results,model,disk", CASES, ids=[c[1] for c in CASES]
)
def test_juniper_enrichment_golden(spark, community, results, model, disk):
    expected = json.load(open(f"{DATA}/{results}"))
    exp_payload = expected["enrichment"][0]["data"][0][DEVICE]

    walk = _walk_df(spark, community)
    devices = spark.createDataFrame(
        [(DEVICE, model)], "device_id string, model string"
    )
    out = juniper_device_enrichment(
        spark, walk, devices, polling_frequency=300, include_disk=disk
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.namespace == expected["enrichment"][0]["namespace"]
    got = json.loads(row.enrichment)
    assert ordered(got["metrics_groups"]) == ordered(
        exp_payload["metrics_groups"]
    ), f"{results}: metrics_groups diverge"
    assert ordered(got["oids"]) == ordered(exp_payload["oids"]), (
        f"{results}: oids map diverges"
    )


CISCO_DATA = (
    "/root/reference/tests/plugins/enrichment/generic/snmp/cisco/ios/data"
)
CISCO_CASES = [
    # (recording/results stem == resource model per the reference test)
    "4948E",
    "6509-E",
    "3560G-48TS-S",
    "4900M",
]


def _cisco_walk_df(spark, stem: str):
    rec = corpus.parse_snmprec(f"{CISCO_DATA}/recording/{stem}.snmprec")
    rows = [(DEVICE, oid, value) for oid, _tag, value in rec]
    return spark.createDataFrame(
        rows, "device_id string, oid string, value string"
    )


@pytest.mark.parametrize("stem", CISCO_CASES)
def test_cisco_ios_enrichment_golden(spark, stem):
    from panoptes_spark.operators.device_enrichment import (
        cisco_ios_device_enrichment,
    )

    expected = json.load(open(f"{CISCO_DATA}/{stem}.results.json"))
    exp_payload = expected["enrichment"][0]["data"][0][DEVICE]

    walk = _cisco_walk_df(spark, stem)
    devices = spark.createDataFrame(
        [(DEVICE, stem)], "device_id string, model string"
    )
    out = cisco_ios_device_enrichment(
        spark, walk, devices, polling_frequency=300
    ).collect()
    assert len(out) == 1
    got = json.loads(out[0].enrichment)
    assert ordered(got["metrics_groups"]) == ordered(
        exp_payload["metrics_groups"]
    ), f"{stem}: metrics_groups diverge"
    assert ordered(got["oids"]) == ordered(exp_payload["oids"]), (
        f"{stem}: oids map diverges"
    )


BGP_DATA = (
    "/root/reference/tests/plugins/enrichment/generic/snmp/juniper/bgp/data"
)


def test_bgp_session_enrichment_golden(spark):
    """BGP session-metrics enrichment builder vs the reference's own
    golden (devicetype_location_results.json): peer-index-derived
    ipv4/ipv6 address tables, the remote-addr -> ipNetToPhysical ->
    ifXTable 2-hop interface join, and the prefix-counter
    index_transform maps."""
    from panoptes_spark.operators.device_enrichment import (
        bgp_session_enrichment,
    )

    expected = json.load(
        open(f"{BGP_DATA}/devicetype_location_results.json")
    )
    exp_payload = expected["enrichment"][0]["data"][0][DEVICE]

    rec = corpus.parse_snmprec_raw(
        f"{BGP_DATA}/recording/devicetype_location.snmprec"
    )
    rows = [(DEVICE, oid, value, hexval) for oid, _t, value, hexval in rec]
    walk = spark.createDataFrame(
        rows, "device_id string, oid string, value string, value_hex string"
    )
    devices = spark.createDataFrame([(DEVICE,)], "device_id string")
    out = bgp_session_enrichment(spark, walk, devices).collect()
    assert len(out) == 1
    got = json.loads(out[0].enrichment)
    assert ordered(got["metrics_groups"]) == ordered(
        exp_payload["metrics_groups"]
    ), "metrics_groups diverge"
    assert ordered(got["oids"]) == ordered(exp_payload["oids"]), (
        "oids map diverges"
    )


NXOS_DATA = (
    "/root/reference/tests/plugins/enrichment/generic/snmp/cisco/nxos/data"
)


@pytest.mark.parametrize(
    "stem,model", [("3048", "3048"), ("n3k_3048T", "3048T")]
)
def test_cisco_nxos_enrichment_golden(spark, stem, model):
    """NX-OS builder vs both reference goldens — the n3k case exercises
    the inverted-relpos index_transform path."""
    from panoptes_spark.operators.device_enrichment import (
        cisco_nxos_device_enrichment,
    )

    expected = json.load(open(f"{NXOS_DATA}/{stem}.results.json"))
    exp_payload = expected["enrichment"][0]["data"][0][DEVICE]

    rec = corpus.parse_snmprec(f"{NXOS_DATA}/recording/{stem}.snmprec")
    rows = [(DEVICE, oid, value) for oid, _t, value in rec]
    walk = spark.createDataFrame(
        rows, "device_id string, oid string, value string"
    )
    devices = spark.createDataFrame(
        [(DEVICE, model)], "device_id string, model string"
    )
    out = cisco_nxos_device_enrichment(
        spark, walk, devices, polling_frequency=300
    ).collect()
    assert len(out) == 1
    got = json.loads(out[0].enrichment)
    assert ordered(got["metrics_groups"]) == ordered(
        exp_payload["metrics_groups"]
    ), f"{stem}: metrics_groups diverge"
    assert ordered(got["oids"]) == ordered(exp_payload["oids"]), (
        f"{stem}: oids map diverges"
    )
