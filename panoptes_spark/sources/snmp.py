"""SNMP source surface (S2 GET, S3 BULKWALK) — fixture-backed connector.

The reference's connector (``framework/utilities/snmp/connection.py:85-168``)
speaks UDP to devices; a Spark cluster doesn't poll devices inline —
collectors land varbinds on Kafka/object storage and Spark reads them as
long-format OID tables (``schemas.OID_TABLE_SCHEMA``). This module provides
that boundary:

- ``FixtureSNMPConnection``: the reference connection API (get / bulk_walk)
  served from a varbind DataFrame — the test-harness equivalent of the
  reference's snmpsim recordings (``tests/plugins/helpers.py``).
- ``varbinds_to_oid_tables``: raw (device, oid, index, value, type) rows ->
  the compiler's (device_id, table_name, index, value) shape given an
  oid -> table-name mapping (what ``_build_map`` does per plugin).

Real SNMP I/O would live in a collector process, never on executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_REPETITIONS = 25  # reference _MAX_REPETITIONS (plugin_polling_generic_snmp.py:18)


@dataclass
class SNMPVariable:
    """Varbind (framework/utilities/snmp/variable.py:11-60)."""

    oid: str
    index: str
    value: str
    snmp_type: str = "Octet String"


class FixtureSNMPConnection:
    """API-compatible stand-in for PanoptesSNMPConnection over a varbind
    DataFrame with columns (device_id, oid, index, value, snmp_type)."""

    def __init__(self, varbinds: DataFrame, device_id: str):
        self._df = varbinds.where(F.col("device_id") == device_id)

    def get(self, oid: str) -> SNMPVariable | None:
        """S2: point lookup of one OID."""
        rows = self._df.where(F.col("oid") == oid).limit(1).collect()
        if not rows:
            return None
        r = rows[0]
        return SNMPVariable(r.oid, r["index"], r.value, r.snmp_type)

    def bulk_walk(
        self, oid: str, non_repeaters: int = 0, max_repetitions: int = MAX_REPETITIONS
    ) -> list[SNMPVariable]:
        """S3: subtree walk -> ordered varbinds. ``max_repetitions`` is a
        fetch-batch knob in the reference; irrelevant for a DataFrame scan
        but kept for signature parity."""
        rows = (
            self._df.where(F.col("oid").startswith(oid))
            .orderBy("index")
            .collect()
        )
        return [SNMPVariable(r.oid, r["index"], r.value, r.snmp_type) for r in rows]


def varbinds_to_oid_tables(
    varbinds: DataFrame, oid_to_table: dict[str, str]
) -> DataFrame:
    """Map raw varbinds to the metric-DSL's long-format OID tables.

    ``oid_to_table``: OID prefix -> table name (the ``oids`` section of a
    DSL program). Prefix match mirrors the walk subtree semantics.
    """
    # longest-prefix wins: shorter prefixes first, longer overrides
    matched = F.lit(None).cast("string")
    for p in sorted(oid_to_table, key=len):
        matched = F.when(
            F.col("oid").startswith(p), F.lit(oid_to_table[p])
        ).otherwise(matched)
    return (
        varbinds.withColumn("table_name", matched)
        .where(F.col("table_name").isNotNull())
        .select("device_id", "table_name", "index", "value")
    )
