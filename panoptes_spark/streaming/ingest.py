"""Streaming ingestion (S7 source, P4/P5 validation, S9 fan-out sink).

Reference consumer loop: ``/root/reference/yahoo_panoptes/framework/
utilities/consumer.py:187-448`` — subscribe {site}-{topic-suffix} for all
sites, poll, key-filter, JSON-parse, JSON-Schema-validate, commit offsets
only on success. Producer fan-out with series partitioning keys:
``polling/polling_plugin_agent.py:307-364`` + murmur2 partitioner
(``framework/utilities/message_queue.py:27``).

Spark mapping:
- source: ``readStream.format('kafka')`` when brokers are configured;
  offset management/redelivery -> checkpointing (exactly-once with an
  idempotent sink, strictly stronger than the reference's at-least-once).
- P4 key filter -> WHERE key IN (...)
- P5 validity filter -> from_json against the wire schema; nulls are
  counted via a side observation and dropped.
- S9 sink: key = the series key (``_make_key``) so Kafka's default
  murmur2-on-key partitioner reproduces the reference's series-local
  placement; topic column routes per-site fan-out.

Kafka needs the spark-sql-kafka package on the classpath; everything here
degrades to file/memory streams for tests (``file_points_stream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import series_key_col
from ..schemas import METRICS_GROUP_SCHEMA


def make_topic_names_for_all_sites(sites: list[str], suffix: str) -> list[str]:
    """{site}-{suffix} per site (consumer.py:34-36)."""
    return [f"{site}-{suffix}" for site in sites]


def kafka_metrics_source(
    spark: SparkSession,
    brokers: str,
    sites: list[str],
    suffix: str = "processed",
    keys: list[str] | None = None,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S7: subscribe to per-site topics; parse+validate the metrics-group
    wire JSON. Returns (topic, key, metrics_group struct, is_valid)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", ",".join(make_topic_names_for_all_sites(sites, suffix)))
        .option("startingOffsets", "latest")
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    return parse_and_validate(raw, keys)


def parse_and_validate(raw: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """P4 (key filter) + P5 (schema validation) on a Kafka-shaped frame
    with binary key/value columns."""
    df = raw.select(
        F.col("topic") if "topic" in raw.columns else F.lit("").alias("topic"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("json"),
    )
    if keys:
        df = df.where(F.col("key").isin(keys))  # P4 consumer.py:383-389
    df = df.withColumn(
        "metrics_group", F.from_json("json", METRICS_GROUP_SCHEMA)
    ).withColumn(
        # P5: from_json yields null on parse/validation failure; required
        # envelope fields null out on schema mismatch
        "is_valid",
        F.col("metrics_group").isNotNull()
        & F.col("metrics_group.metrics_group_type").isNotNull()
        & F.col("metrics_group.resource.resource_id").isNotNull(),
    )
    # the reference counts both parse and validation failures
    # (consumer.py:391-405); observe() surfaces the same counters per
    # batch via QueryProgress/listener without a second pass
    return df.observe(
        "validation",
        F.count(F.lit(1)).alias("records"),
        F.sum(F.when(~F.col("is_valid"), 1).otherwise(0)).alias("invalid"),
    )


def valid_and_invalid(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split streams; the invalid side mirrors the reference's
    counter-and-skip (consumer.py:391-405)."""
    return parsed.where("is_valid"), parsed.where("NOT is_valid")


def kafka_fanout_sink(
    groups: DataFrame,
    brokers: str,
    site_col: str = "resource.resource_site",
    suffix: str = "processed",
    checkpoint: str = "/tmp/panoptes_spark_ckpt",
    global_topic: str | None = None,
):
    """S9: write metrics groups back to per-site topics with the series
    partitioning key. ``groups`` must be the nested wire shape."""
    keyed = prepare_fanout(groups, site_col, suffix, global_topic)
    return (
        keyed.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def prepare_fanout(
    groups: DataFrame,
    site_col: str = "resource.resource_site",
    suffix: str = "processed",
    global_topic: str | None = None,
) -> DataFrame:
    """The testable projection behind the Kafka sink: (topic, key, value)
    rows, one per destination topic (per-site + optional global fan-out,
    polling_plugin_agent.py:307-364)."""
    flat_dims = F.map_from_entries(
        F.expr(
            "transform(dimensions, d -> struct(d.dimension_name, d.dimension_value))"
        )
    )
    base = groups.withColumn("__dims", flat_dims).withColumn(
        "key",
        series_key_col("resource.resource_id", "metrics_group_type", "__dims"),
    )
    topics = [F.concat(F.col(site_col), F.lit(f"-{suffix}"))]
    if global_topic:
        topics.append(F.lit(global_topic))
    return (
        base.withColumn("topic", F.explode(F.array(*topics)))
        .select("topic", "key", F.to_json(F.struct(
            "metrics_group_type",
            "metrics_group_interval",
            "metrics_group_creation_timestamp",
            "metrics_group_schema_version",
            "resource",
            "metrics",
            "dimensions",
        )).alias("value"))
    )


def file_points_stream(
    spark: SparkSession, path: str, schema, max_files: int = 1
) -> DataFrame:
    """Test/fallback source: parquet-directory stream (the snmpsim-replay
    equivalent of the reference's test harness)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )
