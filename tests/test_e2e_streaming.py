"""End-to-end streaming pipeline (§3.2/§3.3 composed): kafka-shaped
records -> validate -> flatten -> stateful rate -> line-protocol sink.
"""

import pytest

import json

from pyspark.sql import functions as F

from panoptes_spark.model import flatten_metrics_groups
from panoptes_spark.operators.lineprotocol import InfluxBatchWriter
from panoptes_spark.streaming.ingest import parse_and_validate, valid_and_invalid
from panoptes_spark.streaming.rate_stream import rate_stream


def _file_send(dirpath):
    """Executor-side send factory: each chunk lands as one file.
    (A closure cloudpickles by value; a test-module class would pickle by
    reference and fail to import on workers.)"""
    d = str(dirpath)

    def send(chunk):
        import os
        import uuid

        with open(os.path.join(d, uuid.uuid4().hex), "w") as f:
            f.write("\n".join(chunk))

    return send


def _wire_record(rid, ts, counter_value):
    return json.dumps(
        {
            "metrics_group_type": "interface",
            "metrics_group_interval": 60,
            "metrics_group_creation_timestamp": ts,
            "metrics_group_schema_version": "0.2",
            "resource": {
                "resource_site": "dc1", "resource_class": "network",
                "resource_subclass": "switch", "resource_type": "cisco",
                "resource_id": rid, "resource_endpoint": f"{rid}.net",
                "resource_creation_timestamp": 1.0, "resource_plugin": "p",
                "resource_metadata": {"make": "Cisco"},
            },
            "metrics": [
                {"metric_name": "bits_in", "metric_value": counter_value,
                 "metric_type": "counter", "metric_creation_timestamp": ts}
            ],
            "dimensions": [{"dimension_name": "iface", "dimension_value": "xe-0"}],
        }
    ).encode()


@pytest.mark.slow
def test_pipeline_end_to_end(spark, tmp_path):
    # 1) kafka-shaped batch: 3 in-order samples per series + 1 junk record
    records = [
        ("dc1-processed", b"k", _wire_record("sw1", 1.0, 1000.0)),
        ("dc1-processed", b"k", _wire_record("sw1", 61.0, 7000.0)),   # 100/s
        ("dc1-processed", b"k", _wire_record("sw1", 121.0, 13000.0)),  # 100/s
        ("dc1-processed", b"k", b"{garbage"),
    ]
    raw = spark.createDataFrame(records, "topic string, key binary, value binary")
    parsed = parse_and_validate(raw)
    valid, invalid = valid_and_invalid(parsed)
    assert invalid.count() == 1

    groups = valid.select("metrics_group.*")

    # 2) flatten to points, persist as the stream source
    points = flatten_metrics_groups(groups).select(
        "resource_id",
        "metrics_group_type",
        (F.col("metric_creation_timestamp") * 1000).cast("long").alias("ts_ms"),
        "metric_value",
    )
    src = str(tmp_path / "pts")
    points.coalesce(1).write.parquet(src)

    # 3) stateful streaming rate
    stream = spark.readStream.schema(points.schema).parquet(src)
    q = (
        rate_stream(stream, interval_sec=60)
        .writeStream.format("memory")
        .queryName("e2e_rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rates = spark.sql("SELECT * FROM e2e_rates").collect()
    assert sorted(r.rate for r in rates) == [100.0, 100.0]

    # 4) sink the enriched groups as line protocol (executor-side emission:
    # capture through files, not a driver list)
    sink_dir = tmp_path / "sink"
    sink_dir.mkdir()

    writer = InfluxBatchWriter(_file_send(str(sink_dir)))
    writer(groups, epoch_id=0)
    sent = sorted(
        l for f in sink_dir.iterdir() for l in f.read_text().splitlines()
    )
    assert len(sent) == 3
    assert all(l.startswith("interface,iface=xe-0,resource_class=network")
               for l in sent)
    # reference {!r}-style rendering: integral value prints without '.0'
    # (consumer.py:142), and resource_endpoint is a tag (consumer.py:115-121)
    assert any("bits_in__counter=7000 " in l for l in sent)
    assert all("resource_endpoint=sw1.net" in l for l in sent)
