"""Streaming rollup twin: finest-tier parity with the batch operator,
coarsen_tier == the batch tier-from-tier fold."""

from pyspark.sql import functions as F

from panoptes_spark.streaming.rollup_stream import (
    coarsen_tier,
    minute_tier_stream,
)

ROWS = [
    (10_000, "a", 1.25),
    (50_000, "a", 2.50),
    (70_000, "a", 4.00),
    (70_000, "b", 8.00),
    (3_700_000, "a", 16.00),
]
SCHEMA = "ts_ms long, event_type string, value double"


def test_minute_tier_stream_matches_batch(spark, tmp_path):
    """Append mode emits a bucket only once the watermark passes its
    end — a flush sentinel far past the data closes every real bucket;
    the sentinel's own (still-open) bucket is the one row absent from
    the streaming output."""
    from panoptes_spark.operators.timeseries import multires_rollup

    flush = [(10_000_000, "zz", 0.0)]
    src = str(tmp_path / "ev")
    spark.createDataFrame(ROWS + flush, SCHEMA).coalesce(1).write.parquet(src)
    q = (
        minute_tier_stream(spark.readStream.schema(SCHEMA).parquet(src))
        .writeStream.format("memory")
        .queryName("roll_1m")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(90)
    finally:
        q.stop()
    got = {
        (r.bucket_ms, r.key): (r.n, r.sum_value, r.min_value, r.max_value)
        for r in spark.sql("SELECT * FROM roll_1m").collect()
    }
    batch = multires_rollup(spark.createDataFrame(ROWS, SCHEMA))
    want = {
        (r.bucket_ms, r.key): (r.n, r.sum_value, r.min_value, r.max_value)
        for r in batch.where("resolution = '1m'").collect()
    }
    assert got == want  # sentinel bucket still open -> not in got


def test_coarsen_tier_equals_batch_fold(spark):
    from panoptes_spark.operators.timeseries import multires_rollup

    batch = multires_rollup(spark.createDataFrame(ROWS, SCHEMA))
    fine = batch.where("resolution = '1m'").drop("resolution")
    got = {
        (r.bucket_ms, r.key): (r.n, r.sum_value, r.min_value, r.max_value)
        for r in coarsen_tier(fine, 600_000).collect()
    }
    want = {
        (r.bucket_ms, r.key): (r.n, r.sum_value, r.min_value, r.max_value)
        for r in batch.where("resolution = '10m'").collect()
    }
    assert got == want
