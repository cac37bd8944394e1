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
    spark: SparkSession, path: str, dedup: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Returns (valid_resources, corrupt_rows).

    Valid rows must carry the required identity fields; everything else is
    tolerated (open metadata map).
    """
    schema = T.StructType(
        RESOURCE_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
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
        valid = valid.where(F.col(c).isNotNull())
    if dedup:
        valid = dedup_resources(valid)
    return valid, corrupt
