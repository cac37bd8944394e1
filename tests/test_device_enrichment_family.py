"""Hand-computed differentials for the small generic-SNMP enrichment
family members (aruba device/WAP, ciena waveserver device/light, cisco
ASA) — the reference ships no goldens for these plugins, so fixtures
and expectations derive line-by-line from the plugin sources."""

import json

import pytest

from panoptes_spark.operators import device_enrichment as de

DEV = "10.0.0.1"


def _walk(spark, rows):
    return spark.createDataFrame(
        [(DEV, oid.lstrip("."), v) for oid, v in rows],
        "device_id string, oid string, value string",
    )


def _devices(spark):
    return spark.createDataFrame([(DEV,)], "device_id string")


def _run(fn, spark, walk, **kw):
    out = fn(spark, walk, _devices(spark), **kw).collect()
    assert len(out) == 1
    return json.loads(out[0].enrichment)


def test_aruba_device_enrichment(spark):
    rows = [
        (de.ARUBA_CPU_DESCR + ".1", "Control Plane"),
        (de.ARUBA_CPU_DESCR + ".3", "Data Plane"),
        (de.ARUBA_CPU_LOAD + ".1", "12"),
        (de.ARUBA_CPU_LOAD + ".3", "40"),
        (de.ARUBA_MEM_TOTAL, "8388608"),
        (de.ARUBA_FAN_STATUS + ".1", "1"),
        (de.ARUBA_FAN_STATUS + ".2", "1"),
        (de.ARUBA_PSU_STATUS + ".1", "1"),
    ]
    got = _run(de.aruba_device_enrichment, spark, _walk(spark, rows))
    oids = got["oids"]
    assert oids["cpu_name"]["values"] == {
        "1": "Control Plane", "3": "Data Plane"
    }
    assert oids["cpu_no"]["values"] == {"1": "Module 1", "3": "Module 3"}
    assert oids["memory_used"] == {
        "method": "get", "oid": de.ARUBA_MEM_USED
    }
    groups = {
        (g["group_name"], tuple(sorted(g["metrics"]))): g
        for g in got["metrics_groups"]
    }
    mem = groups[("memory", ("memory_total", "memory_used"))]
    # literal int spliced into the program (plugin :158-161)
    assert mem["metrics"]["memory_total"] == {
        "metric_type": "gauge", "value": 8388608
    }
    fans = groups[("environment", ("fans_ok", "fans_total"))]
    assert fans["metrics"]["fans_total"] == 2
    power = groups[("environment", ("power_units_on", "power_units_total"))]
    assert power["metrics"]["power_units_total"] == 1
    # temp group present with the string-transform program
    assert ("environment", ("temperature_fahrenheit",)) in groups


def test_aruba_device_no_fans_no_power_groups(spark):
    rows = [
        (de.ARUBA_CPU_DESCR + ".1", "Control Plane"),
        (de.ARUBA_CPU_LOAD + ".1", "12"),
        (de.ARUBA_MEM_TOTAL, "1024"),
    ]
    got = _run(de.aruba_device_enrichment, spark, _walk(spark, rows))
    names = [g["group_name"] for g in got["metrics_groups"]]
    assert names.count("environment") == 1  # only the temp group


def test_aruba_wap_enrichment(spark):
    rows = [
        (de.ARUBA_WAP_AP_IP + ".1.2.3", "192.168.1.10"),
        (de.ARUBA_WAP_AP_NAME + ".1.2.3", "ap-lobby"),
        (de.ARUBA_WAP_NUM_APS + ".0", "7"),
    ]
    got = _run(de.aruba_wap_enrichment, spark, _walk(spark, rows))
    oids = got["oids"]
    assert oids["access_point_ip"]["values"] == {"1.2.3": "192.168.1.10"}
    assert oids["access_point_name"]["values"] == {"1.2.3": "ap-lobby"}
    # inverted radio table: '<ap_index>.<radio>' -> '<name>.radio<radio>'
    assert oids["radio_index"]["values"] == {
        "1.2.3.1": "ap-lobby.radio1",
        "1.2.3.2": "ap-lobby.radio2",
    }
    assert oids["number_of_access_point"]["values"] == "7"
    assert [g["group_name"] for g in got["metrics_groups"]] == [
        "user", "access_point", "radio"
    ]


def test_ciena_ws_device_enrichment(spark):
    rows = [
        (de.CIENA_FAN_STATE + ".1", "1"),
        (de.CIENA_FAN_STATE + ".2", "1"),
        (de.CIENA_FAN_STATE + ".3", "2"),
        (de.CIENA_PSU_STATE + ".1", "1"),
    ]
    got = _run(de.ciena_ws_device_enrichment, spark, _walk(spark, rows))
    fans, power = got["metrics_groups"]
    assert fans["metrics"]["fans_total"] == 3
    assert power["metrics"]["power_units_total"] == 1

    # no PSUs -> power group omitted entirely (conditional append)
    got2 = _run(
        de.ciena_ws_device_enrichment, spark,
        _walk(spark, rows[:3]),
    )
    assert len(got2["metrics_groups"]) == 1


def test_ciena_ws_light_enrichment(spark):
    rows = [
        (de.CIENA_XCVR_TYPE + ".1.0", "4"),   # transceiver
        (de.CIENA_XCVR_TYPE + ".2.0", "1"),   # not a transceiver
        (de.CIENA_PORT_NAME + ".1.0", "1-1"),
        (de.CIENA_PORT_NAME + ".2.0", "2-1"),
        # sub-walk under <rx>.<index.strip('.0')> = <rx>.1
        (de.CIENA_XCVR_RX + ".1.1", "-55"),
        (de.CIENA_XCVR_TX + ".1.1", "12"),
    ]
    got = _run(de.ciena_ws_light_enrichment, spark, _walk(spark, rows))
    oids = got["oids"]
    assert oids["xcvr_interfaces"]["values"] == {"1.0": "1-1"}
    assert oids["rx_light_level"]["values"] == {"1-1": -5.5}
    assert oids["tx_light_level"]["values"] == {"1-1": 1.2}
    assert oids["rx_light_level"]["oid"] == de.CIENA_XCVR_RX
    [group] = got["metrics_groups"]
    assert group["group_name"] == "light_levels"


def test_cisco_asa_enrichment(spark):
    ENT = "1.3.6.1.2.1.47.1.1.1.1"
    rows = [
        (f".{ENT}.7.11", "CPU module"),
        (f".{ENT}.5.11", "12"),
        (f".{ENT}.6.11", "1"),
        (f".{ENT}.7.12", "Not a CPU"),   # wrong class -> excluded
        (f".{ENT}.5.12", "9"),
        (f".{ENT}.6.12", "2"),
        # cpu walk at 5min (freq 300); last index element = entity id
        (".1.3.6.1.4.1.9.9.109.1.1.1.1.8.7.11", "33"),
        (".1.3.6.1.4.1.9.9.109.1.1.1.1.8.7.12", "44"),
        (de.ASA_MEM_POOL_NAME + ".6.1", "System memory"),
        (de.ASA_MEM_POOL_USED + ".6.1", "100"),
        (de.ASA_MEM_POOL_FREE + ".6.1", "300"),
    ]
    got = _run(
        de.cisco_asa_device_enrichment, spark, _walk(spark, rows),
        polling_frequency=300,
    )
    oids = got["oids"]
    assert oids["cpu_name"]["values"] == {"11": "CPU module"}
    assert oids["cpu_no"]["values"] == {"11": "Module 11"}
    assert oids["memory_name"]["values"] == {"1": "System memory"}
    assert oids["memory_total"]["values"] == {"1": 400}
    assert oids["cpu_util"]["oid"].endswith(".109.1.1.1.1.8")
    assert [g["group_name"] for g in got["metrics_groups"]] == [
        "cpu", "memory"
    ]


def test_juniper_srx_functional_enrichment(spark):
    """SRX functional metrics (NAT/session): statics from the pool-name
    and node-descr walks; the translated address is the LAST FOUR index
    octets (plugin :49-51); groups are unconditional constants
    (:130-166); MaxFlowSession is walked but never emitted (:63-67)."""
    POOL = de.SRX_NAT_POOL_NAME
    DESCR = de.SRX_SPU_NODE_DESCR
    rows = [
        # index = <pool id>.<4-octet address>
        (POOL + ".6.4.112.10.1.2.3", "src-pool-a"),
        (POOL + ".6.4.112.10.1.2.4", "src-pool-b"),
        (DESCR + ".0", "node0"),
        (DESCR + ".1", "node1"),
        # walked counters do NOT contribute statics
        (de.SRX_SPU_CUR_FLOW + ".0", "1234"),
        (de.SRX_NAT_NUM_SESSIONS + ".6.4.112.10.1.2.3", "7"),
    ]
    out = de.juniper_srx_functional_enrichment(
        spark, _walk(spark, rows), _devices(spark)
    ).collect()
    assert len(out) == 1
    assert out[0].namespace == "functional_metrics"
    got = json.loads(out[0].enrichment)
    oids = got["oids"]
    assert oids["source_pool_name"]["values"] == {
        "6.4.112.10.1.2.3": "src-pool-a",
        "6.4.112.10.1.2.4": "src-pool-b",
    }
    assert oids["nat_src_translated_address"]["values"] == {
        "6.4.112.10.1.2.3": "10.1.2.3",
        "6.4.112.10.1.2.4": "10.1.2.4",
    }
    assert oids["monitoring_node_descriptions"]["values"] == {
        "0": "node0", "1": "node1"
    }
    assert oids["current_session_flow"] == {
        "method": "bulk_walk", "oid": de.SRX_SPU_CUR_FLOW
    }
    assert oids["num_ports_in_use"] == {
        "method": "bulk_walk", "oid": de.SRX_NAT_PORT_INUSE
    }
    assert oids["num_sessions"] == {
        "method": "bulk_walk", "oid": de.SRX_NAT_NUM_SESSIONS
    }
    # MaxFlowSession must not appear anywhere in the program
    assert "max_flow" not in out[0].enrichment
    assert de.SRX_SPU_TABLE + ".1.7" not in out[0].enrichment
    groups = {g["group_name"]: g for g in got["metrics_groups"]}
    assert set(groups) == {"nat", "session"}
    nat = groups["nat"]
    assert nat["dimensions"] == {
        "source_pool_name": "source_pool_name.$index",
        "address": "nat_src_translated_address.$index",
    }
    assert nat["metrics"]["max_ports"] == {
        "metric_type": "gauge",
        "transform": "lambda x: 64512",
        "value": "num_ports_in_use.$index",
    }
    assert groups["session"]["metrics"]["current_session_flow"][
        "value"
    ] == "sum([int(x) for x in current_session_flow.values()])"


def test_juniper_srx_functional_no_pools(spark):
    """A device with no NAT pools still gets the full program shape —
    empty statics, same unconditional groups."""
    rows = [(de.SRX_SPU_CUR_FLOW + ".0", "99")]
    got = _run(
        de.juniper_srx_functional_enrichment, spark, _walk(spark, rows)
    )
    assert got["oids"]["source_pool_name"]["values"] == {}
    assert got["oids"]["nat_src_translated_address"]["values"] == {}
    assert got["oids"]["monitoring_node_descriptions"]["values"] == {}
    assert [g["group_name"] for g in got["metrics_groups"]] == [
        "nat", "session"
    ]
