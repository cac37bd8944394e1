"""Training-corpus ingestion: error-tolerant JSONL document reader and
the range-partitioned sorted export.

The document-side twin of the S1 resource scan
(``sources/json_resources.py``, reference
``plugins/discovery/plugin_discovery_from_json_file.py:19-75``): web-
crawl dumps arrive as JSONL with a long tail of malformed lines, and the
pipeline must ingest what parses, count what doesn't, and never die on a
bad record. Spark's PERMISSIVE JSON mode gives exactly that semantics
scan-side; compression (gz/zstd) is transparent to the reader.

``write_sorted_by`` is the export half: a globally-ordered corpus layout
(e.g. by quality score for curriculum schedules) WITHOUT a
single-partition global sort — ``repartitionByRange`` samples split
points and range-partitions the data, ``sortWithinPartitions`` orders
each range locally; file k is wholly <= file k+1, which is all a
sequential reader needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOCUMENT_SCHEMA", "read_documents_jsonl", "write_sorted_by"]

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    require: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """Returns (valid_docs, corrupt_rows).

    A row is valid iff it parsed AND carries every ``require`` field
    non-null (a parseable record missing its text is as useless as an
    unparseable one). ``corrupt_rows`` keeps the raw line for triage —
    the failure counter the reference keeps for S1, with the evidence
    attached.
    """
    full = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # Spark forbids querying only _corrupt_record on an uncached scan
        .cache()
    )
    ok = F.col("_corrupt_record").isNull()
    for r in require:
        ok = ok & F.col(r).isNotNull()
    valid = raw.where(ok).drop("_corrupt_record")
    corrupt = raw.where(~ok).select(
        F.coalesce("_corrupt_record", F.to_json(F.struct(*schema.names)))
        .alias("raw_line")
    )
    return valid, corrupt


def write_sorted_by(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int,
    ascending: bool = True,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``n_files`` parquet files globally ordered by
    ``sort_cols`` — range shuffle + local sorts, never one partition."""
    cols = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in sort_cols
    ]
    (
        df.repartitionByRange(int(n_files), *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
