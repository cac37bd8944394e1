"""Golden-corpus replay utilities for the metric-computation DSL.

The reference ships a production-shaped DSL program with checked-in
expected wire output (its strongest compiler oracle):

- ``tests/plugins/polling/generic/snmp/data/enrichment_data`` /
  ``enrichment.json.example`` — the DSL program (key/value-store line and
  from-file forms),
- ``data/recording/*.snmprec`` — recorded SNMP device snapshots replayed
  by snmpsim in the reference tests,
- ``data/{results,missing_cpu_oids_results,from_file_no_service_active_
  results}.json`` — the expected PanoptesMetricsGroupSet, including the
  per-OID-failure poisoning path (``plugin_polling_generic_snmp.py:92-137``)
  and the polling-status rollup (``polling_status.py:26-39,144-211``).

This module replays those fixtures against :class:`MetricDSLCompiler`
without snmpsim: the ``.snmprec`` file itself is the device, a bulk_walk
is a prefix scan over it, and the polling-status state machine is
reproduced as a pure function.

NOTE: the reference golden tests run with ``enrichment_schema_version``
**'0.1'** — the plugin_conf in ``test_generic_snmp_polling_plugin.py``
has no ``enrichment_schema_version`` key and ``run()`` defaults to '0.1'
(``plugin_polling_generic_snmp.py:729-733``). v0.1 forces
``ignore_empty_dimensions`` and emits top-level metrics as a separate
dimension-less group.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

# DEVICE_METRICS_STATES, reference polling_status.py:26-39
SUCCESS = 0
AUTHENTICATION_FAILURE = 1
NETWORK_FAILURE = 2
TIMEOUT = 3
PARTIAL_METRIC_FAILURE = 4
INTERNAL_FAILURE = 5
MISSING_METRICS = 6
PING_FAILURE = 7
ENRICHMENT_FAILURE = 8

_PING_STATES = (TIMEOUT, NETWORK_FAILURE)  # polling_status.py:57


def load_program(path: str) -> dict:
    """Parse a DSL program from either fixture form: the KV-store line
    ``resource:namespace=>{"data": {host: program}}`` (enrichment_data)
    or a plain JSON file (enrichment.json.example, the from-file path,
    reference ``_read_enrichment`` :706-720)."""
    with open(path) as f:
        text = f.read().strip()
    if "=>" in text.split("\n", 1)[0] and not text.startswith("{"):
        _, payload = text.split("=>", 1)
        doc = json.loads(payload)
        data = doc["data"]
        # one host per fixture
        return next(iter(data.values()))
    return json.loads(text)


def parse_snmprec_raw(path: str) -> list[tuple[str, str, str, str | None]]:
    """Like :func:`parse_snmprec` but keeps the raw hex payload for
    hex-encoded (``x``-suffixed) rows: (oid, tag, decoded_value,
    hex_or_None). Binary octet strings (e.g. the BGP remote-address
    table) are only faithful in the hex form — a text decode corrupts
    non-UTF-8 bytes."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            oid, tag, value = line.split("|", 2)
            hexval = None
            if tag.endswith("x"):
                hexval = value
                value = bytes.fromhex(value).decode("utf-8", "replace")
            rows.append((oid, tag, value, hexval))
    return rows


def parse_snmprec(path: str) -> list[tuple[str, str, str]]:
    """``oid|type|value`` lines -> (oid, type_tag, decoded_value).

    snmpsim .snmprec value encoding: a ``x`` suffix on the type tag means
    the value is hex-encoded (e.g. ``4x`` = hex OCTET STRING). The SNMP
    layer hands values to the DSL as strings (easysnmp) — casts happen
    per-target via the DSL ``type`` (reference ``_TYPE_MAPPING`` :22-44).
    """
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            oid, tag, value = line.split("|", 2)
            if tag.endswith("x"):
                value = bytes.fromhex(value).decode("utf-8", "replace")
            rows.append((oid, tag, value))
    return rows


def bulk_walk(snmprec: list[tuple[str, str, str]], base_oid: str) -> dict:
    """Prefix scan: all rows under ``base_oid`` keyed by the index
    remainder (reference connection.bulk_walk + ``_build_map`` :180-215)."""
    base = base_oid.lstrip(".")
    prefix = base + "."
    return {
        oid[len(prefix):]: value
        for oid, _tag, value in snmprec
        if oid.startswith(prefix)
    }


def build_oid_fixture(
    program: dict,
    snmprec: list[tuple[str, str, str]] | None,
    service_active: bool = True,
) -> tuple[dict, list[tuple[str, int | None]]]:
    """Walk every configured OID against the recording.

    Returns ``(oid_maps, events)``:

    - ``oid_maps``: {table_name: {raw_index: str_value}} — raw indices
      (``index_transform`` is applied downstream by the compiler, like the
      reference applies it in ``_build_map`` :205-209). Failed walks are
      ABSENT (reference leaves ``_oid_maps[name]`` unset on failure).
    - ``events``: per non-static OID, (oid_name, None) on success or
      (oid_name, failure_state). An empty walk is
      ``PanoptesMetricsNullException`` -> MISSING_METRICS (:213-215);
      no service is an SNMP timeout -> TIMEOUT (exceptions_dict).
    """
    oid_maps: dict = {}
    events: list[tuple[str, int | None]] = []
    for name, spec in program["oids"].items():
        if spec["method"] == "static":
            oid_maps[name] = {str(k): v for k, v in spec["values"].items()}
            continue  # statics never touch polling status (_get_oids :280-282)
        if not service_active:
            events.append((name, TIMEOUT))
            continue
        walked = bulk_walk(snmprec or [], spec["oid"])
        if walked:
            oid_maps[name] = walked
            events.append((name, None))
        else:
            events.append((name, MISSING_METRICS))
    return oid_maps, events


def groups_with_oid(program: dict, oid_name: str) -> list[str]:
    """Group names whose metric/dimension VALUE strings contain the oid
    name as a substring (reference ``_get_metrics_groups_with_oid``
    :92-110 — substring match, deliberately)."""
    found = []
    for group in program["metrics_groups"]:
        hit = False
        for targets_type in ("metrics", "dimensions"):
            for raw in group.get(targets_type, {}).values():
                value = raw.get("value") if isinstance(raw, dict) else raw
                if isinstance(value, str) and oid_name in value:
                    hit = True
        if hit and group["group_name"] not in found:
            found.append(group["group_name"])
    return found


def polling_status_code(
    program: dict,
    events: list[tuple[str, int | None]],
    ping_ok: bool = True,
) -> int:
    """The PanoptesPollingStatus state machine as a pure function
    (reference polling_status.py:144-211 + the ping fallback :96-107).

    Per-group transitions: success keeps SUCCESS / degrades a non-SUCCESS
    to PARTIAL; an exception degrades SUCCESS/PARTIAL to PARTIAL, else
    records the mapped failure state. Device status: all-SUCCESS ->
    SUCCESS; any SUCCESS -> PARTIAL; else the most common failure state.
    TIMEOUT/NETWORK_FAILURE devices are pinged; a failed ping yields
    PING_FAILURE.
    """
    from collections import Counter

    statuses: dict[str, int] = {}

    def handle_success(k: str) -> None:
        if k in statuses:
            if statuses[k] != SUCCESS:
                statuses[k] = PARTIAL_METRIC_FAILURE
        else:
            statuses[k] = SUCCESS

    def handle_exception(k: str, state: int) -> None:
        if k in statuses and statuses[k] in (SUCCESS, PARTIAL_METRIC_FAILURE):
            statuses[k] = PARTIAL_METRIC_FAILURE
            return
        statuses[k] = state

    for oid_name, failure in events:
        for gname in groups_with_oid(program, oid_name):
            if failure is None:
                handle_success(gname)
            else:
                handle_exception(gname, failure)

    if not statuses:
        device = SUCCESS
    elif all(s == SUCCESS for s in statuses.values()):
        device = SUCCESS
    elif SUCCESS in statuses.values():
        device = PARTIAL_METRIC_FAILURE
    else:
        device = Counter(statuses.values()).most_common(1)[0][0]

    if device in _PING_STATES and not ping_ok:
        device = PING_FAILURE
    return device


def oid_tables_df(
    spark: SparkSession, oid_maps: dict, program: dict, device_id: str
) -> DataFrame:
    """Long-format (device_id, table_name, index, value) rows for the
    compiler — NON-static tables only (the compiler materializes statics
    from the program itself). Values stringified (SNMP hands back
    strings; DSL casts re-type them)."""
    static = {
        n for n, s in program["oids"].items() if s["method"] == "static"
    }
    rows = [
        (device_id, name, str(idx), str(val))
        for name, m in oid_maps.items()
        if name not in static
        for idx, val in m.items()
    ]
    schema = "device_id string, table_name string, index string, value string"
    return spark.createDataFrame(rows, schema) if rows else (
        spark.createDataFrame([], schema)
    )


def enrichment_config_status(
    has_preload: bool, file_text: str | None
) -> int:
    """Status code of the plugin's enrichment-config bootstrap as a pure
    function (``get_device_metrics``'s outer try,
    plugin_polling_generic_snmp.py:695-703 + ``_get_config``/
    ``_read_enrichment`` :364-372,706-719 and the exception->state map
    ``polling_status.py:42-56,178-188``):

    - preload AND file            -> PanoptesPluginConfigurationError
                                     (unmapped)      -> INTERNAL_FAILURE(5)
    - neither preload nor file    -> PanoptesPluginConfigurationError
                                                     -> INTERNAL_FAILURE(5)
    - file present but unparseable -> PanoptesEnrichmentFileEmptyError
      (subclass of PanoptesEnrichmentCacheError, found via MRO)
                                                     -> ENRICHMENT_FAILURE(8)
    - otherwise the config loads  -> SUCCESS(0), polling proceeds
    """
    if has_preload and file_text is not None:
        return INTERNAL_FAILURE
    if not has_preload and file_text is None:
        return INTERNAL_FAILURE
    if file_text is not None:
        try:
            json.loads(file_text)
        except Exception:
            return ENRICHMENT_FAILURE
    return SUCCESS
