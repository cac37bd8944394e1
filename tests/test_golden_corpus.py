"""Replay of the reference's OWN golden DSL corpus through the compiler.

The reference's strongest compiler oracle: a production-shaped DSL
program + recorded SNMP device snapshots + checked-in expected
MetricsGroupSet JSON (``tests/plugins/polling/generic/snmp/data/``).
Three scenarios, exactly the reference's
``test_generic_snmp_polling_plugin.py``:

- ``results.json`` — healthy device (public.snmprec), status SUCCESS(0)
- ``missing_cpu_oids_results.json`` — one walked subtree absent: the
  poisoned group vanishes, polling status degrades to
  PARTIAL_METRIC_FAILURE(4) (per-OID poisoning,
  ``plugin_polling_generic_snmp.py:92-137``)
- ``from_file_no_service_active_results.json`` — no SNMP service: every
  walk times out, only statics survive, ping fails -> PING_FAILURE(7)

The reference tests run at enrichment_schema_version '0.1' (plugin_conf
has no such key; ``run()`` defaults '0.1'). Comparison is value-level on
(group_type, interval, dimensions, metrics) — the resource envelope is
constant passthrough input, attached by J7 outside the compiler.
"""

import json
import math
import os

import pytest

from panoptes_spark.dsl import corpus
from panoptes_spark.dsl.metric_compiler import MetricDSLCompiler

DATA = "/root/reference/tests/plugins/polling/generic/snmp/data"
DEVICE = "127.0.0.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference corpus not available"
)


def _canon_value(v):
    f = float(v)
    return round(f, 6)


# NOTE: canon rows use sorted TUPLES, not frozensets. Equal-content
# frozensets can repr() in different element orders (layout depends on
# insertion history), which made `sorted(out, key=repr)` order-unstable
# between the golden side and the replay side — the source of the r4
# bgp-session flake and deterministic mx2020/srx1400 mismatches.
def _canon_golden(path):
    with open(path) as f:
        data = json.load(f)
    out = []
    for g in data:
        dims = tuple(sorted(
            (d["dimension_name"], d["dimension_value"]) for d in g["dimensions"]
        ))
        mets = tuple(sorted(
            (m["metric_name"], m["metric_type"], _canon_value(m["metric_value"]))
            for m in g["metrics"]
        ))
        out.append(
            (g["metrics_group_type"], g["metrics_group_interval"], dims, mets)
        )
    return sorted(out)


def _canon_compiled(rows, status_code, interval=60):
    out = []
    for r in rows:
        dims = tuple(sorted(
            (d.dimension_name, d.dimension_value) for d in r.dimensions
        ))
        mets = tuple(sorted(
            (m.metric_name, m.metric_type, _canon_value(m.metric_value))
            for m in r.metrics
        ))
        out.append((r.metrics_group_type, r.metrics_group_interval, dims, mets))
    # the plugin always appends the polling-status group
    # (get_device_metrics, plugin_polling_generic_snmp.py:703)
    out.append(
        ("status", interval, (),
         (("polling_status", "gauge", float(status_code)),))
    )
    return sorted(out)


def _replay(spark, program, snmprec, service_active=True, ping_ok=True,
            schema_version="0.1"):
    oid_maps, events = corpus.build_oid_fixture(
        program, snmprec, service_active=service_active
    )
    status = corpus.polling_status_code(program, events, ping_ok=ping_ok)
    tables = corpus.oid_tables_df(spark, oid_maps, program, DEVICE)
    devices = spark.createDataFrame([(DEVICE,)], "device_id string")
    compiler = MetricDSLCompiler(
        spark,
        program,
        tables,
        interval_sec=60,
        schema_version=schema_version,
        static_devices=devices,
    )
    rows = compiler.compile().collect()
    assert all(r.device_id == DEVICE for r in rows)
    return _canon_compiled(rows, status)


def test_golden_results_healthy(spark):
    program = corpus.load_program(f"{DATA}/enrichment_data")
    snmprec = corpus.parse_snmprec(f"{DATA}/recording/public.snmprec")
    got = _replay(spark, program, snmprec)
    expected = _canon_golden(f"{DATA}/results.json")
    assert got == expected


def test_golden_results_missing_cpu_oids(spark):
    program = corpus.load_program(f"{DATA}/missing_cpu_oids_enrichment_data")
    snmprec = corpus.parse_snmprec(f"{DATA}/recording/missing_cpu_oids.snmprec")
    got = _replay(spark, program, snmprec)
    expected = _canon_golden(f"{DATA}/missing_cpu_oids_results.json")
    assert got == expected
    # the poisoning path: cpu_util subtree absent -> PARTIAL(4)
    assert ("status", 60, (),
            (("polling_status", "gauge", 4.0),)) in got


def test_golden_results_no_service_active(spark):
    program = corpus.load_program(f"{DATA}/enrichment.json.example")
    got = _replay(spark, program, None, service_active=False, ping_ok=False)
    expected = _canon_golden(f"{DATA}/from_file_no_service_active_results.json")
    assert got == expected
    # every walk timed out; ping also failed -> PING_FAILURE(7)
    assert ("status", 60, (),
            (("polling_status", "gauge", 7.0),)) in got


def test_golden_line_protocol_render(spark):
    """End-to-end: compile the healthy corpus, render to line protocol with
    the compiler's float-typed set, and byte-compare each line against the
    reference consumer's algorithm (consumer.py:84-169) applied in pure
    python to the checked-in golden JSON. Proves repr parity on reference
    data: temperature_fahrenheit is ``type: float`` so 0.0 must render
    '0.0', while integer metrics (fans_ok, memory_used, ...) render '5'."""
    import re

    from pyspark.sql import functions as F

    from panoptes_spark.operators.lineprotocol import to_line_protocol

    program = corpus.load_program(f"{DATA}/enrichment_data")
    snmprec = corpus.parse_snmprec(f"{DATA}/recording/public.snmprec")
    oid_maps, _ = corpus.build_oid_fixture(program, snmprec)
    tables = corpus.oid_tables_df(spark, oid_maps, program, DEVICE)
    compiler = MetricDSLCompiler(
        spark, program, tables, interval_sec=60, schema_version="0.1",
        static_devices=spark.createDataFrame([(DEVICE,)], "device_id string"),
    )
    res_tags = {
        "resource_site": "lab", "resource_class": "network",
        "resource_subclass": "switch", "resource_type": "juniper",
        "resource_endpoint": DEVICE,
    }
    ts = 1700000000
    groups = compiler.compile().select(
        F.struct(
            *[F.lit(v).alias(k) for k, v in res_tags.items()],
            F.lit("r1").alias("resource_id"),
        ).alias("resource"),
        "metrics_group_type",
        F.lit(float(ts)).alias("metrics_group_creation_timestamp"),
        "metrics",
        "dimensions",
    )
    got = sorted(
        r.line
        for r in to_line_protocol(
            groups, float_typed=compiler.float_typed_metrics()
        ).collect()
    )

    def esc(v):
        return re.sub(r"([,=\s])", r"\\\1", v)

    expected = []
    for g in json.load(open(f"{DATA}/results.json")):
        if g["metrics_group_type"] == "status":  # appended outside compiler
            continue
        tags = {
            d["dimension_name"]: d["dimension_value"] for d in g["dimensions"]
        }
        tags.update(res_tags)
        fields = {
            f'{m["metric_name"]}__{m["metric_type"]}': m["metric_value"]
            for m in g["metrics"]
            if m["metric_type"] in ("gauge", "counter")
        }
        expected.append(
            re.sub("[^0-9a-zA-Z_]+", "_", g["metrics_group_type"])
            + ","
            + ",".join(f"{k}={esc(v)}" for k, v in sorted(tags.items()))
            + " "
            + ",".join(f"{k}={v!r}" for k, v in sorted(fields.items()))
            + f" {ts}"
        )
    assert got == sorted(expected)
    assert any("temperature_fahrenheit__gauge=0.0" in l for l in got)


def test_snmprec_decode_hex_octet_strings():
    snmprec = corpus.parse_snmprec(f"{DATA}/recording/public.snmprec")
    walked = corpus.bulk_walk(snmprec, ".1.3.6.1.4.1.2636.3.1.13.1.7")
    assert walked["7.1.0.0"] == "34" and walked["9.1.0.0"] == "29"
    assert len(walked) == 9


def test_polling_status_state_machine():
    program = corpus.load_program(f"{DATA}/enrichment_data")
    # all walks succeed -> SUCCESS
    ok = [("operating_temp", None), ("memory_used", None), ("fan_status", None)]
    assert corpus.polling_status_code(program, ok) == corpus.SUCCESS
    # one group's oid fails, others succeed -> PARTIAL
    part = [("operating_temp", None), ("memory_used", corpus.MISSING_METRICS),
            ("fan_status", None)]
    assert corpus.polling_status_code(program, part) == \
        corpus.PARTIAL_METRIC_FAILURE
    # everything times out, ping ok -> TIMEOUT; ping dead -> PING_FAILURE
    dead = [("operating_temp", corpus.TIMEOUT),
            ("memory_used", corpus.TIMEOUT), ("fan_status", corpus.TIMEOUT)]
    assert corpus.polling_status_code(program, dead, ping_ok=True) == \
        corpus.TIMEOUT
    assert corpus.polling_status_code(program, dead, ping_ok=False) == \
        corpus.PING_FAILURE
    assert math.isclose(1.8 * 34 + 32, 93.2)


BGP_DATA = "/root/reference/tests/plugins/polling/generic/snmp/juniper/bgp/data"


def test_golden_results_bgp_session(spark):
    """Juniper BGP session metrics program
    (tests/plugins/polling/generic/snmp/juniper/bgp/): the production
    consumer of index_transform re-keying (prefix-counter indices ->
    full peer-table indices) and the F8 ipv6-derived static address
    tables, replayed through the compiler against the reference's own
    expected MetricsGroupSet."""
    program = corpus.load_program(f"{BGP_DATA}/enrichment_data")
    snmprec = corpus.parse_snmprec(f"{BGP_DATA}/recording/public.snmprec")
    got = _replay(spark, program, snmprec)
    expected = _canon_golden(f"{BGP_DATA}/results.json")
    assert got == expected


JNP_POLL = "/root/reference/tests/plugins/polling/generic/snmp/juniper/data"
_JNP_CASES = ["mx960", "mx2020", "srx1400", "qfx", "ex"]


@pytest.mark.parametrize("stem", _JNP_CASES)
def test_golden_results_juniper_device_metrics(spark, stem):
    """The five juniper device-metrics polling goldens: the A1
    conditional-count programs (power_units_on comprehensions over
    oper_status x power_module_types) that the juniper enrichment
    builder generates, replayed through the compiler against the
    reference's own expected MetricsGroupSets."""
    program = corpus.load_program(f"{JNP_POLL}/{stem}_enrichment")
    snmprec = corpus.parse_snmprec(f"{JNP_POLL}/recording/{stem}.snmprec")
    got = _replay(spark, program, snmprec)
    expected = _canon_golden(f"{JNP_POLL}/{stem}_results.json")
    assert got == expected


@pytest.mark.parametrize("stem", _JNP_CASES)
def test_juniper_builder_composes_into_polling_program(spark, stem):
    """Composition: the juniper device-metrics ENRICHMENT BUILDER run on
    the polling suite's recording reproduces the checked-in polling
    program exactly — builder output IS what polling consumes.

    mx2020/srx1400 were generated with include_disk_metrics_group=1
    (storage oids always present; disk GROUP only when the storage
    walk is non-empty — srx1400 has the oids but no group,
    plugin_enrichment_juniper_device_metrics.py:287,407-408); the other
    three fixtures were generated with the flag off."""
    import json as _json

    from panoptes_spark.operators.device_enrichment import (
        juniper_device_enrichment,
    )

    program = corpus.load_program(f"{JNP_POLL}/{stem}_enrichment")
    rec = corpus.parse_snmprec(f"{JNP_POLL}/recording/{stem}.snmprec")
    walk = spark.createDataFrame(
        [(DEVICE, oid, value) for oid, _t, value in rec],
        "device_id string, oid string, value string",
    )
    devices = spark.createDataFrame(
        [(DEVICE, "model")], "device_id string, model string"
    )
    out = juniper_device_enrichment(
        spark, walk, devices, polling_frequency=300,
        include_disk=stem in ("mx2020", "srx1400"),
    ).collect()
    built = _json.loads(out[0].enrichment)

    def ordered(obj):
        if isinstance(obj, dict):
            return sorted((k, ordered(v)) for k, v in obj.items())
        if isinstance(obj, list):
            return sorted(ordered(x) for x in obj)
        return str(obj)

    assert ordered(built["oids"]) == ordered(program["oids"])
    assert ordered(built["metrics_groups"]) == ordered(
        program["metrics_groups"]
    )


# -- cisco IOS / NXOS polling goldens (schema 0.2) ----------------------

IOS_POLL = (
    "/root/reference/tests/plugins/polling/generic/snmp/cisco/ios/data"
)
NXOS_POLL = (
    "/root/reference/tests/plugins/polling/generic/snmp/cisco/nxos/data"
)
_IOS_CASES = ["3560G-48TS-S", "4900M", "6509-E", "4948E"]
_NXOS_CASES = ["3048", "n3k_3048T"]


@pytest.mark.parametrize("stem", _IOS_CASES)
def test_golden_results_cisco_ios_polling(spark, stem):
    """The four cisco-IOS polling goldens at enrichment_schema_version
    0.2 (test_plugin_polling_cisco_ios.py plugin_conf): covers empty
    static tables (4900M), string*numeric arithmetic through
    temp_sensor_scales (6509-E/4948E — python TypeError parity via
    TRY_CAST hazards), and the MetricsGroupSet cross-type collapse of
    fully-empty groups (framework/metrics.py:405-409 __eq__ without
    group_type)."""
    program = corpus.load_program(f"{IOS_POLL}/{stem}.enrichment_data")
    snmprec = corpus.parse_snmprec(f"{IOS_POLL}/recording/{stem}.snmprec")
    got = _replay(spark, program, snmprec, schema_version="0.2")
    expected = _canon_golden(f"{IOS_POLL}/{stem}.results.json")
    assert got == expected


@pytest.mark.parametrize("stem", _NXOS_CASES)
def test_golden_results_cisco_nxos_polling(spark, stem):
    """The two cisco-NXOS polling goldens: EMPTY recordings — every walk
    comes back empty, polling status MISSING_METRICS(6), and the one
    surviving group is the collapsed empty group named after the FIRST
    program group ('environment') per python-set first-insert-wins."""
    program = corpus.load_program(f"{NXOS_POLL}/{stem}_enrichment_data")
    snmprec = corpus.parse_snmprec(f"{NXOS_POLL}/recording/{stem}.snmprec")
    got = _replay(spark, program, snmprec, schema_version="0.2")
    expected = _canon_golden(f"{NXOS_POLL}/{stem}_results.json")
    assert got == expected
    assert ("status", 60, (), (("polling_status", "gauge", 6.0),)) in got


def test_golden_enrichment_config_failures():
    """The two config-bootstrap failure goldens
    (TestPluginPollingCiscoIOSEnrichmentFromFileBad / ...Missing /
    ...BothPresent): a malformed enrichment file degrades to
    ENRICHMENT_FAILURE(8); a missing or doubly-specified enrichment
    source to INTERNAL_FAILURE(5); either way the plugin emits ONLY the
    status group."""
    bad_text = open(
        f"{IOS_POLL}/3560G-48TS-S.enrichment_bad.json"
    ).read()
    good_text = open(
        f"{IOS_POLL}/3560G-48TS-S.enrichment_data.json"
    ).read()

    # bad file -> 8, matching enrichment_failure.results.json
    code = corpus.enrichment_config_status(False, bad_text)
    exp = _canon_golden(f"{IOS_POLL}/enrichment_failure.results.json")
    assert [("status", 60, (), (("polling_status", "gauge", float(code)),))] \
        == exp

    # no enrichment source at all -> 5, internal_failure.results.json
    code = corpus.enrichment_config_status(False, None)
    exp = _canon_golden(f"{IOS_POLL}/internal_failure.results.json")
    assert [("status", 60, (), (("polling_status", "gauge", float(code)),))] \
        == exp

    # both file AND preload -> PanoptesEnrichmentCacheError path, also 5
    assert corpus.enrichment_config_status(True, good_text) == 5
    # a loadable single source proceeds to polling
    assert corpus.enrichment_config_status(False, good_text) == 0
    assert corpus.enrichment_config_status(True, None) == 0
