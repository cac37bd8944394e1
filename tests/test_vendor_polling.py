"""Differential tests for the ASR / Arista polling twins against
hand-computed fixture walks (no reference goldens exist for these two
plugins — expectations derive line-by-line from
plugin_polling_asr_device_metrics.py / plugin_polling_arista_device_metrics.py).
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from panoptes_spark.operators import vendor_polling as vp

ENT = "1.3.6.1.2.1.47.1.1.1.1"


def _walk(spark, rows):
    return spark.createDataFrame(
        rows, "device_id string, oid string, value string"
    )


def _collect(df):
    out = {}
    for r in df.collect():
        dims = tuple(
            sorted((d.dimension_name, d.dimension_value) for d in r.dimensions)
        )
        mets = {
            m.metric_name: (m.metric_value, m.metric_type) for m in r.metrics
        }
        out.setdefault(r.device_id, []).append(
            (r.metrics_group_type, dims, mets)
        )
    return out


ASR_ROWS = [
    # entity walk: classes (col 5), names (col 7), descrs (col 2)
    ("asr1", f"{ENT}.5.9001", "12"),
    ("asr1", f"{ENT}.5.9002", "12"),
    ("asr1", f"{ENT}.5.9003", "12"),
    ("asr1", f"{ENT}.5.7001", "6"),
    ("asr1", f"{ENT}.5.8001", "8"),
    ("asr1", f"{ENT}.5.8003", "8"),
    ("asr1", f"{ENT}.7.9001", "CPU 0"),
    ("asr1", f"{ENT}.7.9002", "Crypto Asic 0"),
    ("asr1", f"{ENT}.7.9003", "QFP module"),
    ("asr1", f"{ENT}.7.7001", "Power Supply Module 0"),
    # descr ALSO matches 'Power Supply Module' -> row counted twice in
    # power_units_total (reference list-append quirk)
    ("asr1", f"{ENT}.2.7001", "Power Supply Module 0 rear"),
    ("asr1", f"{ENT}.7.8001", "Temp: inlet"),
    ("asr1", f"{ENT}.7.8003",
     "subslot 0/0 transceiver 0 Temperature Sensor"),
    # cpu ctrl: 1-min walk (freq 60) -> physical index -> name
    ("asr1", "1.3.6.1.4.1.9.9.109.1.1.1.1.7.7.9101", "42"),
    ("asr1", "1.3.6.1.4.1.9.9.109.1.1.1.1.2.9101", "9001"),
    # crypto entity perf gets (interval '2' at freq 60)
    ("asr1", "1.3.6.1.4.1.9.9.756.1.3.1.2.9002.2.1", "77"),
    ("asr1", "1.3.6.1.4.1.9.9.756.1.3.1.2.9002.2.5", "100"),
    ("asr1", "1.3.6.1.4.1.9.9.756.1.3.1.2.9002.2.6", "200"),
    # memory: enhanced mempool DRAM + QFP pool (index .1)
    ("asr1", "1.3.6.1.4.1.9.9.221.1.1.1.1.18.7000.1", "1000"),
    ("asr1", "1.3.6.1.4.1.9.9.221.1.1.1.1.20.7000.1", "3000"),
    ("asr1", "1.3.6.1.4.1.9.9.715.1.1.7.1.3.9003.1", "500"),
    ("asr1", "1.3.6.1.4.1.9.9.715.1.1.7.1.4.9003.1", "1500"),
    # QFP load (interval '2' at freq 60)
    ("asr1", "1.3.6.1.4.1.9.9.715.1.1.6.1.14.9003.2", "55"),
    # sensors: type 8 = celsius; scale 8 -> x0.1; milli entity /1000
    ("asr1", "1.3.6.1.4.1.9.9.91.1.1.1.1.1.8001", "8"),
    ("asr1", "1.3.6.1.4.1.9.9.91.1.1.1.1.2.8001", "8"),
    ("asr1", "1.3.6.1.4.1.9.9.91.1.1.1.1.4.8001", "250"),
    ("asr1", "1.3.6.1.4.1.9.9.91.1.1.1.1.1.8003", "8"),
    ("asr1", "1.3.6.1.4.1.9.9.91.1.1.1.1.2.8003", "9"),
    ("asr1", "1.3.6.1.4.1.9.9.91.1.1.1.1.4.8003", "30123"),
    # power module FRU status: 2 = on
    ("asr1", "1.3.6.1.4.1.9.9.117.1.1.2.1.2.7001", "2"),
    # asr2: DRAM only -> cpu family missing -> PARTIAL status
    ("asr2", "1.3.6.1.4.1.9.9.221.1.1.1.1.18.7000.1", "10"),
    ("asr2", "1.3.6.1.4.1.9.9.221.1.1.1.1.20.7000.1", "30"),
]


@pytest.mark.slow
def test_asr_device_metrics_full_device(spark):
    devices = spark.createDataFrame([("asr1",), ("asr2",)],
                                    "device_id string")
    got = _collect(
        vp.asr_device_metrics(spark, _walk(spark, ASR_ROWS), devices, 60)
    )
    g1 = got["asr1"]

    def find(gtype, dims_contains=None, metric=None):
        res = []
        for t, dims, mets in g1:
            if t != gtype:
                continue
            if dims_contains and dims_contains not in dict(dims).items():
                continue
            if metric and metric not in mets:
                continue
            res.append((dims, mets))
        return res

    # cpu ctrl: physical-index + entity-name resolution
    [(dims, mets)] = find("cpu", ("cpu_type", "ctrl"))
    assert dict(dims) == {
        "cpu_type": "ctrl", "cpu_no": "9001", "cpu_name": "CPU 0"
    }
    assert mets == {"cpu_utilization": (42.0, "gauge")}

    # cpu data (crypto asic) + crypto counters
    [(dims, mets)] = find("cpu", ("cpu_type", "data"))
    assert dict(dims)["cpu_name"] == "Crypto Asic 0"
    assert mets == {"cpu_utilization": (77.0, "gauge")}
    [(dims, mets)] = find("crypto")
    assert mets == {
        "packets_in": (100.0, "counter"),
        "packets_out": (200.0, "counter"),
    }

    # memory: dram 1000/4000, qfp 500/2000
    mem = {
        dict(dims)["memory_type"]: mets for dims, mets in find("memory")
    }
    assert mem["dram"]["memory_used"] == (1000.0, "gauge")
    assert mem["dram"]["memory_total"] == (4000.0, "gauge")
    assert mem["qfp"]["memory_used"] == (500.0, "gauge")
    assert mem["qfp"]["memory_total"] == (2000.0, "gauge")

    # temperatures: 250 x 10^(8-9) = 25C -> 77F; milli entity
    # 30123 div 1000 = 30C -> 86F (integer division!)
    temp = {
        dict(dims)["entity_name"]: mets["temperature_fahrenheit"][0]
        for dims, mets in find("environment", metric="temperature_fahrenheit")
    }
    assert temp == {
        "Temp: inlet": 77.0,
        "subslot 0/0 transceiver 0 Temperature Sensor": 86.0,
    }

    # power: the one PSU matched on BOTH name and descr rows -> total 2
    # (reference row-count quirk), on = 1 distinct module with FRU 2
    [(dims, mets)] = find("environment", metric="power_units_total")
    assert mets["power_units_total"][0] == 2.0
    assert mets["power_units_on"][0] == 1.0

    # QFP load
    [(dims, mets)] = find("load")
    assert mets == {"processing_load": (55.0, "gauge")}

    # status: every family green
    [(dims, mets)] = find("status")
    assert mets["polling_status"] == (0.0, "gauge")

    # asr2: memory succeeded, cpu missing -> PARTIAL(4)
    g2 = {t: mets for t, dims, mets in got["asr2"]}
    assert g2["status"]["polling_status"][0] == 4.0
    assert g2["memory"]["memory_total"][0] == 40.0


ARISTA_ROWS = [
    ("ar1", "1.3.6.1.2.1.25.3.2.1.3.1", "HostCPU"),
    ("ar1", "1.3.6.1.2.1.25.3.2.1.3.2", "Core0"),
    ("ar1", "1.3.6.1.2.1.25.3.3.1.2.1", "10"),  # aggregate core, skipped
    ("ar1", "1.3.6.1.2.1.25.3.3.1.2.2", "30"),
    # hrStorage: units, used(ram)/used(cached), size
    ("ar1", "1.3.6.1.2.1.25.2.3.1.4.1", "4096"),
    ("ar1", "1.3.6.1.2.1.25.2.3.1.6.1", "1000"),
    ("ar1", "1.3.6.1.2.1.25.2.3.1.6.3", "200"),
    ("ar1", "1.3.6.1.2.1.25.2.3.1.5.1", "2000"),
    # entity walk: temp sensor (name), PSU (name), fan sensor (name)
    ("ar1", f"{ENT}.5.100006", "8"),
    ("ar1", f"{ENT}.7.100006", "Cpu temp sensor"),
    ("ar1", f"{ENT}.2.100006", "Cpu temperature sensor descr"),
    ("ar1", f"{ENT}.5.200001", "6"),
    ("ar1", f"{ENT}.7.200001", "PowerSupply1"),
    ("ar1", f"{ENT}.5.100601", "8"),
    ("ar1", f"{ENT}.7.100601", "Fan 1 Sensor 1"),
    # RFC entity sensors: deci-degrees, scale 9 = units
    ("ar1", "1.3.6.1.2.1.99.1.1.1.4.100006", "455"),
    ("ar1", "1.3.6.1.2.1.99.1.1.1.2.100006", "9"),
    # PSU input-current sensor at +102 offset
    ("ar1", "1.3.6.1.2.1.99.1.1.1.4.200103", "5"),
    # fan speed sensor
    ("ar1", "1.3.6.1.2.1.99.1.1.1.4.100601", "12000"),
]


def test_arista_device_metrics(spark):
    devices = spark.createDataFrame([("ar1",)], "device_id string")
    got = _collect(
        vp.arista_device_metrics(spark, _walk(spark, ARISTA_ROWS),
                                 devices, 60)
    )["ar1"]
    by_type = {}
    for t, dims, mets in got:
        by_type.setdefault(t, []).append((dict(dims), mets))

    # cpu: only core 2 (core 1 = aggregate); name 'HostCPU/Core0'
    [(dims, mets)] = by_type["cpu"]
    assert dims == {
        "cpu_type": "ctrl", "cpu_no": "1.2", "cpu_name": "HostCPU/Core0"
    }
    assert mets["cpu_utilization"] == (30.0, "gauge")

    # memory: (1000-200)*4096 used, 2000*4096 total
    [(dims, mets)] = by_type["memory"]
    assert dims == {"memory_type": "dram"}
    assert mets["memory_used"][0] == 800 * 4096
    assert mets["memory_total"][0] == 2000 * 4096

    env = by_type["environment"]
    temp = [m for d, m in env if "temperature_fahrenheit" in m]
    power = [m for d, m in env if "power_units_total" in m]
    fans = [m for d, m in env if "fans_total" in m]
    # 455 deci-deg = 45.5C -> 113.9F; dimension is the DESCRIPTION
    assert temp[0]["temperature_fahrenheit"][0] == 113.9
    [(d, m)] = [(d, m) for d, m in env if "temperature_fahrenheit" in m]
    assert d == {"sensor": "Cpu temperature sensor descr"}
    assert power[0]["power_units_on"][0] == 1.0
    assert power[0]["power_units_total"][0] == 1.0
    assert fans[0] == {
        "fans_total": (1.0, "gauge"), "fans_ok": (1.0, "gauge")
    }

    [(dims, mets)] = by_type["status"]
    assert mets["polling_status"] == (0.0, "gauge")
