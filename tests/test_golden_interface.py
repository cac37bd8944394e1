"""Replay of the reference's OWN interface-plugin golden fixtures.

Inputs are the reference's checked-in test data
(``tests/plugins/polling/interface/data/``): a recorded SNMP walk
(``recording/public.snmprec``), the interface enrichment
(``enrichment_data``), and two expected MetricsGroupSet JSONs —
``results.json`` (default config) and ``results_enabled.json``
(``include_interface_index = 1``, reference
``plugin_polling_device_interface_metrics.py:355-364``).

The walk is mapped to the wide counter frame exactly the way the
reference builds its stats maps (``_build_*_stats_map`` :287-320): each
MIB column is a prefix scan of its OID, the interface universe is the
ifXTable index set (so ``ifSpeed.4``, present in the recording for an
index with no ifXTable rows, is dropped — :219-221), and dot3/ifTable
values for those indices sentinel to -1 when absent. Comparison is
value-level on (group_type, interval, dimensions, metrics); the plugin
appends an ``interface_polling_status`` status group on success
(SUCCESS = 0, ``polling_status.py``).
"""

import json
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling tests)

from panoptes_spark.dsl import corpus
from panoptes_spark.operators.interface_metrics import (
    interface_metrics_groups,
)

DATA = "/root/reference/tests/plugins/polling/interface/data"
DEVICE = "test_id"
INTERVAL = 60

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference corpus not available"
)

# MIB OID layout, from the reference's frozen tables
# (framework/utilities/snmp/mibs/{ifTable,ifXTable,dot3StatsTable}.py)
IFTABLE = ".1.3.6.1.2.1.2.2.1"
IFXTABLE = ".1.3.6.1.2.1.31.1.1.1"
DOT3 = ".1.3.6.1.2.1.10.7.2.1"

IFX_COLS = {  # ifx_table_oids -> wide column
    f"{IFXTABLE}.6": "octets_in",      # ifHCInOctets (bits = *8)
    f"{IFXTABLE}.10": "octets_out",    # ifHCOutOctets
    f"{IFXTABLE}.7": "unicast_packets_in",
    f"{IFXTABLE}.11": "unicast_packets_out",
    f"{IFXTABLE}.8": "multicast_packets_in",
    f"{IFXTABLE}.12": "multicast_packets_out",
    f"{IFXTABLE}.9": "broadcast_packets_in",
    f"{IFXTABLE}.13": "broadcast_packets_out",
}
IF_COLS = {  # if_table_oids -> wide column
    f"{IFTABLE}.4": "mtu",
    f"{IFTABLE}.7": "admin_state",
    f"{IFTABLE}.8": "oper_state",
    f"{IFTABLE}.13": "discards_in",
    f"{IFTABLE}.14": "errors_in",
    f"{IFTABLE}.19": "discards_out",
    f"{IFTABLE}.20": "errors_out",
}
DOT3_COLS = {  # dots3stats_table_oids -> wide column
    f"{DOT3}.2": "errors_frame",   # dot3StatsAlignmentErrors
    f"{DOT3}.3": "errors_crc",     # dot3StatsFCSErrors
    f"{DOT3}.13": "errors_giants",  # dot3StatsFrameTooLongs
}

RAW_SCHEMA = (
    "device_id string, interface_index string, octets_in long,"
    " octets_out long, unicast_packets_in long, unicast_packets_out long,"
    " multicast_packets_in long, multicast_packets_out long,"
    " broadcast_packets_in long, broadcast_packets_out long,"
    " errors_in long, errors_out long, discards_in long, discards_out long,"
    " errors_frame long, errors_crc long, errors_giants long,"
    " admin_state int, oper_state int, mtu long"
)


def _wide_frame(spark, snmprec):
    walks = {
        col: corpus.bulk_walk(snmprec, oid)
        for oid, col in {**IFX_COLS, **IF_COLS, **DOT3_COLS}.items()
    }
    # interface universe = ifXTable indices only (reference :219-221)
    indices = sorted(
        {i for oid, col in IFX_COLS.items() for i in walks[col]}
    )
    rows = []
    for i in indices:
        r = {"device_id": DEVICE, "interface_index": i}
        for col in list(IFX_COLS.values()) + list(IF_COLS.values()) + list(
            DOT3_COLS.values()
        ):
            v = walks[col].get(i)
            r[col] = int(v) if v is not None else None
        rows.append(r)
    names = [field.split()[0] for field in RAW_SCHEMA.split(", ")]
    return spark.createDataFrame(
        [tuple(r.get(n) for n in names) for r in rows], RAW_SCHEMA
    )


def _enrichment_frame(spark):
    with open(f"{DATA}/enrichment_data") as f:
        line = f.read().strip()
    payload = json.loads(line.split("=>", 1)[1])
    per_index = {
        k: v for k, v in payload["data"].items() if k != "resource_id"
    }
    rows = [
        (
            DEVICE,
            idx,
            e.get("interface_name"),
            e.get("media_type"),
            e.get("description"),
            e.get("alias"),
            e.get("configured_speed"),
            str(e["port_speed"]) if "port_speed" in e else None,
            e.get("parent_interface_name"),
        )
        for idx, e in per_index.items()
    ]
    return spark.createDataFrame(
        rows,
        "device_id string, interface_index string, interface_name string,"
        " media_type string, description string, alias string,"
        " configured_speed long, port_speed string,"
        " parent_interface_name string",
    )


def _canon_golden(path):
    with open(path) as f:
        data = json.load(f)
    out = []
    for g in data:
        dims = frozenset(
            (d["dimension_name"], d["dimension_value"])
            for d in g["dimensions"]
        )
        mets = frozenset(
            (m["metric_name"], m["metric_type"], float(m["metric_value"]))
            for m in g["metrics"]
        )
        out.append(
            (g["metrics_group_type"], g["metrics_group_interval"], dims, mets)
        )
    return sorted(out, key=repr)


def _canon_rows(rows, status_code=0):
    out = []
    for r in rows:
        dims = frozenset(
            (d.dimension_name, d.dimension_value) for d in r.dimensions
        )
        mets = frozenset(
            (m.metric_name, m.metric_type, float(m.metric_value))
            for m in r.metrics
        )
        out.append(
            (r.metrics_group_type, r.metrics_group_interval, dims, mets)
        )
    # success path appends the polling-status group (get_results :416)
    out.append(
        (
            "status",
            INTERVAL,
            frozenset(),
            frozenset(
                {("interface_polling_status", "gauge", float(status_code))}
            ),
        )
    )
    return sorted(out, key=repr)


def _replay(spark, include_interface_index):
    snmprec = corpus.parse_snmprec(f"{DATA}/recording/public.snmprec")
    raw = _wide_frame(spark, snmprec)
    enr = _enrichment_frame(spark)
    rows = interface_metrics_groups(
        raw,
        enr,
        interval_sec=INTERVAL,
        include_interface_index=include_interface_index,
    ).collect()
    assert all(r.device_id == DEVICE for r in rows)
    return _canon_rows(rows)


def test_golden_interface_results(spark):
    got = _replay(spark, include_interface_index=False)
    assert got == _canon_golden(f"{DATA}/results.json")


def test_golden_interface_results_with_index_dimension(spark):
    got = _replay(spark, include_interface_index=True)
    assert got == _canon_golden(f"{DATA}/results_enabled.json")


# ---------------------------------------------------------------------------
# Enrichment-builder replay: the reference's interface ENRICHMENT plugin
# family (base + arista/cisco/juniper vendor grammars), against the four
# vendor golden fixtures its own test suite checks
# (tests/plugins/enrichment/interface/{arista,cisco,juniper/mx,juniper/qfx}).
# ---------------------------------------------------------------------------

from panoptes_spark.operators.interface_enrichment import (  # noqa: E402
    interface_enrichment,
)

ENR_DATA = "/root/reference/tests/plugins/enrichment/interface"

_WALK_OIDS = {
    ".1.3.6.1.2.1.2.2.1.3": "if_type",
    ".1.3.6.1.2.1.2.2.1.2": "if_descr",
    ".1.3.6.1.2.1.31.1.1.1.1": "if_name",
    ".1.3.6.1.2.1.31.1.1.1.18": "if_alias",
    ".1.3.6.1.2.1.31.1.1.1.15": "if_high_speed",
    ".1.3.6.1.2.1.2.2.1.5": "if_speed",
    ".1.3.6.1.2.1.2.2.1.6": "if_phys_hex",
}

_ENR_FIELDS = [
    "interface_name",
    "description",
    "media_type",
    "alias",
    "configured_speed",
    "port_speed",
    "physical_address",
    "parent_interface_name",
    "parent_interface_media_type",
    "parent_interface_configured_speed",
    "parent_interface_port_speed",
]


def _walk_frame(spark, path, device="dev1"):
    """snmprec -> long (device_id, column, index, value) frame, keeping
    ifPhysAddress as its raw hex encoding (the MAC transform's input)
    and decoding other hex-tagged values to text."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            oid, tag, val = line.split("|", 2)
            o = oid if oid.startswith(".") else "." + oid
            for base, col in _WALK_OIDS.items():
                if o.startswith(base + "."):
                    idx = o[len(base) + 1:]
                    if col == "if_phys_hex":
                        v = val if tag.endswith("x") else val.encode().hex()
                    elif tag.endswith("x"):
                        v = bytes.fromhex(val).decode("utf-8", "replace")
                    else:
                        v = val
                    rows.append((device, col, idx, v))
    return spark.createDataFrame(
        rows, "device_id string, column string, index string, value string"
    )


@pytest.mark.parametrize(
    "subdir,vendor,model",
    [
        ("arista", "arista", None),
        ("cisco", "cisco", None),
        ("juniper/mx", "juniper", "QFX5200"),  # both juniper suites pin model QFX5200
        ("juniper/qfx", "juniper", "QFX5200"),
    ],
)
def test_golden_interface_enrichment(spark, subdir, vendor, model):
    base = f"{ENR_DATA}/{subdir}/data"
    walk = _walk_frame(spark, f"{base}/recording/public.snmprec")
    out = interface_enrichment(
        spark, walk, vendor=vendor, device_model=model
    ).collect()
    got = {
        r.interface_index: {
            k: (int(v) if isinstance(v, int) else v)
            for k, v in ((f, r[f]) for f in _ENR_FIELDS)
        }
        for r in out
    }
    golden = json.load(open(f"{base}/results.json"))
    expected = {
        idx: fields
        for entry in golden["enrichment"][0]["data"]
        for idx, fields in entry.items()
    }
    assert golden["enrichment"][0]["namespace"] == "interface"
    assert got == expected


def test_walk_to_enrichment_to_metrics_composition(spark):
    """The reference's full dataflow: enrichment plugin output feeds the
    polling plugin. Build the enrichment from the arista golden walk,
    synthesize counters for the same interfaces, and run the polling
    twin — dimensions must come from the BUILT enrichment (vendor
    grammar included), with no parent re-resolution clobbering the
    builder's already-resolved parent attributes."""
    walk = _walk_frame(spark, f"{ENR_DATA}/arista/data/recording/public.snmprec")
    enr = interface_enrichment(spark, walk, vendor="arista")
    idxs = [r.interface_index for r in enr.select("interface_index").collect()]
    counters = spark.createDataFrame(
        [
            ("dev1", i, 100, 200, 1, 2, 3, 4, 5, 6,
             0, 0, 0, 0, 0, 0, 0, 1, 1, 9000)
            for i in idxs
        ],
        RAW_SCHEMA,
    )
    rows = interface_metrics_groups(counters, enr).collect()
    by_dim = {}
    for r in rows:
        dims = {d.dimension_name: d.dimension_value for d in r.dimensions}
        by_dim[dims["interface_name"]] = (dims, {
            m.metric_name: m.metric_value for m in r.metrics})
    dims, mets = by_dim["Ethernet1/1"]
    assert dims["media_type"] == "ethernetCsmacd"
    assert dims["parent_interface_name"] == "Ethernet1"  # arista '/' rule
    assert dims["parent_interface_port_speed"] == "160000000000"
    assert dims["configured_speed"] == "40000000000"
    assert mets["configured_speed"] == 40000000000.0  # dual gauge+dim
    assert mets["bits_in"] == 800.0 and mets["mtu"] == 9000.0
    dims25, _ = by_dim["Ethernet25"]
    assert dims25["parent_interface_name"] == "<not set>"
