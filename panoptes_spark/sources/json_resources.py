"""S1: JSON resource file scan with per-record error tolerance.

Reference: ``/root/reference/yahoo_panoptes/plugins/discovery/
plugin_discovery_from_json_file.py:19-75`` — reads a JSON file of resource
dicts, skips malformed records while counting failures, returns the valid
set.

Spark: PERMISSIVE-mode JSON read with ``_corrupt_record`` capture; the
count of corrupt rows is the reference's failure counter. Identity dedup
applied as in PanoptesResourceSet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import dedup_resources
from ..schemas import RESOURCE_SCHEMA


def read_resources_json(
    spark: SparkSession, path: str, dedup: bool = True,
    multi_line: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Returns (valid_resources, corrupt_rows).

    Valid rows must carry the required identity fields; everything else is
    tolerated (open metadata map). ``multi_line`` reads pretty-printed
    JSON arrays (the reference's discovery config-file format) instead of
    JSON-lines.
    """
    # the creation timestamp arrives as either a JSON number or a quoted
    # string (the reference's discovery fixtures use strings; python
    # float()s it) — parse as string, cast after, so a quoted value
    # doesn't poison the whole record in PERMISSIVE mode
    parse_fields = [
        f if f.name != "resource_creation_timestamp"
        else T.StructField(f.name, T.StringType(), True)
        for f in RESOURCE_SCHEMA.fields
    ]
    schema = T.StructType(
        parse_fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", str(multi_line).lower())
        .json(path)
        .withColumn(
            "resource_creation_timestamp",
            F.expr("try_cast(resource_creation_timestamp as double)"),
        )
        # Spark forbids querying only _corrupt_record on an uncached scan
        .cache()
    )
    corrupt = raw.where(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    valid = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    required = [
        "resource_site",
        "resource_class",
        "resource_subclass",
        "resource_type",
        "resource_id",
        "resource_endpoint",
    ]
    for c in required:
        # PanoptesResource requires each identity field to BE a string
        # (resources.py:105-118); a JSON array/object lands here as its
        # serialized text, which the reference would have rejected with
        # an AssertionError -> drop it the same way. Only values that
        # actually PARSE as JSON arrays/objects are rejected — a genuine
        # string that merely starts with '[' (e.g. a bracketed IPv6
        # endpoint "[2001:db8::1]") is a valid identity string.
        looks_json = F.col(c).rlike(r"^\s*[\[{]")
        parses_json = (
            F.try_parse_json(F.col(c)).isNotNull()
            if hasattr(F, "try_parse_json")
            else F.from_json(
                F.col(c), "array<string>", {"mode": "PERMISSIVE"}
            ).isNotNull()
            | F.from_json(
                F.col(c), "map<string,string>", {"mode": "PERMISSIVE"}
            ).isNotNull()
        )
        valid = valid.where(
            F.col(c).isNotNull() & ~(looks_json & parses_json)
        )
    if dedup:
        valid = dedup_resources(valid)
    return valid, corrupt
