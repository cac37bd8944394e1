"""Streaming tests: stateful rate twin vs batch, ingestion validation,
fan-out projection, line protocol."""

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from panoptes_spark.operators.lineprotocol import InfluxBatchWriter, to_line_protocol
from panoptes_spark.operators.rate import rate_transform
from panoptes_spark.streaming.ingest import parse_and_validate, prepare_fanout
from panoptes_spark.streaming.rate_stream import rate_stream

POINTS_SCHEMA = (
    "resource_id string, metrics_group_type string, ts_ms long, metric_value double"
)


@pytest.fixture()
def sample_points(spark):
    rows = [
        ("r1", "interface", 1000, 100.0),
        ("r1", "interface", 61000, 160.0),   # rate = 1/s
        ("r1", "interface", 121000, 40.0),   # counter reset -> skip
        ("r1", "interface", 181000, 100.0),  # rate = 1/s
        ("r1", "interface", 181000, 100.0),  # dup ts -> skip
        ("r1", "interface", 999000, 200.0),  # gap > 3x60s -> skip
        ("r2", "cpu", 1000, 10.0),
        ("r2", "cpu", 31000, 40.0),          # rate = 1/s
    ]
    return spark.createDataFrame(rows, POINTS_SCHEMA)


@pytest.mark.slow
def test_stream_matches_batch(spark, sample_points, tmp_path):
    src = str(tmp_path / "pts")
    sample_points.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(sample_points.schema).parquet(src)
    )
    out = rate_stream(stream, interval_sec=60)
    q = (
        out.writeStream.format("memory")
        .queryName("rates_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.resource_id, r.ts_ms): (r.rate, r.confidence)
        for r in spark.sql("SELECT * FROM rates_out").collect()
    }

    batch = rate_transform(
        sample_points.dropDuplicates(["resource_id", "metrics_group_type", "ts_ms"]),
        ["resource_id", "metrics_group_type"],
        interval_sec=60,
    )
    expected = {
        (r.resource_id, r.ts_ms): (r.rate, r.confidence) for r in batch.collect()
    }
    assert got == expected
    assert got[("r1", 61000)] == (1.0, 1.0)
    assert ("r1", 121000) not in got  # wrap guard
    assert ("r1", 999000) not in got  # TTL guard
    assert got[("r2", 31000)] == (1.0, 2.0)


def _kafka_like(spark, rows):
    return spark.createDataFrame(rows, "topic string, key binary, value binary")


def test_parse_and_validate(spark):
    good = {
        "metrics_group_type": "interface",
        "metrics_group_interval": 60,
        "metrics_group_creation_timestamp": 1.0,
        "metrics_group_schema_version": "0.2",
        "resource": {"resource_site": "dc1", "resource_class": "network",
                     "resource_subclass": "switch", "resource_type": "cisco",
                     "resource_id": "sw1"},
        "metrics": [{"metric_name": "bits_in", "metric_value": 1.0,
                     "metric_type": "counter", "metric_creation_timestamp": 1.0}],
        "dimensions": [{"dimension_name": "iface", "dimension_value": "xe-0"}],
    }
    rows = [
        ("dc1-processed", b"k1", json.dumps(good).encode()),
        ("dc1-processed", b"k2", b"{not json"),
        ("dc1-processed", b"k3", json.dumps({"foo": 1}).encode()),
    ]
    parsed = parse_and_validate(_kafka_like(spark, rows))
    by_key = {r.key: r.is_valid for r in parsed.collect()}
    assert by_key == {"k1": True, "k2": False, "k3": False}

    filtered = parse_and_validate(_kafka_like(spark, rows), keys=["k1", "k3"])
    assert {r.key for r in filtered.collect()} == {"k1", "k3"}  # P4


def _group_df(spark):
    rows = [
        (
            "interface", 60, 100.5, "0.2",
            ("dc1", "network", "switch", "cisco", "sw1", "sw1.net", 1.0, "p", {}),
            [("bits_in", 800.0, "counter", 1.0), ("bits_out", 1600.0, "gauge", 1.0)],
            [("iface", "xe-0/0/0"), ("alias", "up link")],
        )
    ]
    return spark.createDataFrame(
        rows,
        "metrics_group_type string, metrics_group_interval long,"
        " metrics_group_creation_timestamp double, metrics_group_schema_version string,"
        " resource struct<resource_site:string,resource_class:string,"
        "resource_subclass:string,resource_type:string,resource_id:string,"
        "resource_endpoint:string,resource_creation_timestamp:double,"
        "resource_plugin:string,resource_metadata:map<string,string>>,"
        " metrics array<struct<metric_name:string,metric_value:double,"
        "metric_type:string,metric_creation_timestamp:double>>,"
        " dimensions array<struct<dimension_name:string,dimension_value:string>>",
    )


def test_fanout_projection(spark):
    out = prepare_fanout(_group_df(spark), global_topic="panoptes-global").collect()
    topics = {r.topic for r in out}
    assert topics == {"dc1-processed", "panoptes-global"}
    # series key: resource_id|group_type|sorted dim pairs
    assert out[0].key == "sw1|interface|alias|up link|iface|xe-0/0/0"
    payload = json.loads(out[0].value)
    assert payload["metrics_group_type"] == "interface"
    assert len(payload["metrics"]) == 2


def test_line_protocol(spark):
    line = to_line_protocol(_group_df(spark)).select("line").collect()[0].line
    # reference tag set (consumer.py:113-125): dims + class/subclass/type/
    # endpoint/site sorted by key, values escaped; repr-style field values
    assert line == (
        "interface,alias=up\\ link,iface=xe-0/0/0,resource_class=network,"
        "resource_endpoint=sw1.net,resource_site=dc1,"
        "resource_subclass=switch,resource_type=cisco "
        "bits_in__counter=800,bits_out__gauge=1600 100"
    )


def test_line_protocol_filters_unsupported_metric_types(spark):
    df = _group_df(spark)
    extra = F.expr(
        "array_append(metrics, named_struct('metric_name', 'weird',"
        " 'metric_value', cast(1.5 as double), 'metric_type', 'histogram',"
        " 'metric_creation_timestamp', cast(1.0 as double)))"
    )
    line = (
        to_line_protocol(df.withColumn("metrics", extra))
        .select("line").collect()[0].line
    )
    assert "weird" not in line and "bits_in__counter=800" in line
    # non-integral values keep their float repr
    assert to_line_protocol(
        df.withColumn(
            "metrics",
            F.expr(
                "transform(metrics, m -> named_struct('metric_name',"
                " m.metric_name, 'metric_value', cast(0.4 as double),"
                " 'metric_type', m.metric_type,"
                " 'metric_creation_timestamp', m.metric_creation_timestamp))"
            ),
        )
    ).select("line").collect()[0].line.count("=0.4") == 2


def test_line_protocol_float_typed_repr(spark):
    # DSL `type: float` metrics keep the '.0' on integral values like
    # python repr(5.0) (consumer.py:142); integer-typed collapse to '5'.
    df = _group_df(spark)  # bits_in=800.0, bits_out=1600.0 (integral)
    line = (
        to_line_protocol(df, float_typed={"bits_out"})
        .select("line").collect()[0].line
    )
    assert "bits_in__counter=800," in line  # integer-typed unchanged
    assert "bits_out__gauge=1600.0 " in line  # float-typed keeps .0


def test_compiler_reports_float_typed_metrics(spark):
    from panoptes_spark.dsl.metric_compiler import MetricDSLCompiler

    program = {
        "oids": {},
        "metrics_groups": [
            {
                "group_name": "env",
                "metrics": {
                    "temp_f": {"metric_type": "gauge", "value": 1.0,
                               "type": "float"},
                    "fans": {"metric_type": "gauge", "value": 2},
                    "implicit_float": {"metric_type": "gauge", "value": 2.5},
                },
            }
        ],
    }
    comp = MetricDSLCompiler(
        spark, program,
        spark.createDataFrame(
            [("d1", "t", "0", "1")],
            "device_id string, table_name string, index string, value string",
        ),
    )
    assert comp.float_typed_metrics() == {"temp_f", "implicit_float"}


def _file_send(dirpath, reject_batches=False):
    """Test sink factory: each accepted chunk lands as one file.

    Emission is executor-side (foreachPartition) so capture goes through
    the filesystem, not a driver list. The returned closure is cloudpickled
    by value (a test-module class would pickle by reference and fail to
    import on workers). With reject_batches, multi-line chunks containing
    `bits_in` raise to force the per-line degrade path.
    """
    d = str(dirpath)

    def send(chunk):
        if reject_batches and len(chunk) > 1 and any("bits_in" in l for l in chunk):
            raise RuntimeError("batch rejected")
        import os
        import uuid

        with open(os.path.join(d, uuid.uuid4().hex), "w") as f:
            f.write("\n".join(chunk))

    return send


def _sent_chunks(dirpath):
    import os

    out = []
    for name in os.listdir(str(dirpath)):
        with open(os.path.join(str(dirpath), name)) as f:
            out.append(f.read().splitlines())
    return out


def test_influx_batch_writer_degrade(spark, tmp_path):
    df = _group_df(spark)
    writer = InfluxBatchWriter(
        _file_send(tmp_path, reject_batches=True), batch_size=10, retries=2
    )
    # two lines in one partition: whole-batch send fails, degrades per-line
    two = df.unionByName(df.withColumn("metrics_group_type", F.lit("cpu")))
    writer(two.coalesce(1), epoch_id=0)
    sent = _sent_chunks(tmp_path)
    flat = [l for c in sent for l in c]
    assert len(flat) == 2 and all(len(c) == 1 for c in sent)


@pytest.mark.slow
def test_influx_batch_writer_partition_batching(spark, tmp_path):
    """Happy path: each partition emits its lines in batch_size chunks,
    with no driver-side collect in the sink path."""
    df = _group_df(spark)
    many = df
    for i in range(4):
        many = many.unionByName(df.withColumn("metrics_group_type", F.lit(f"g{i}")))
    writer = InfluxBatchWriter(_file_send(tmp_path), batch_size=2, retries=1)
    writer(many.coalesce(1), epoch_id=0)
    sent = _sent_chunks(tmp_path)
    assert sorted(len(c) for c in sent) == [1, 2, 2]
    assert len([l for c in sent for l in c]) == 5


@pytest.mark.slow
def test_rate_stream_cross_batch_out_of_order(spark, tmp_path):
    """An older sample arriving in a LATER micro-batch must be skipped
    (state holds the newer timestamp; the reference's dt<0 guard)."""
    import os

    schema = POINTS_SCHEMA
    batch1 = spark.createDataFrame(
        [("r1", "iface", 1000, 10.0), ("r1", "iface", 61000, 70.0)], schema
    )
    batch2 = spark.createDataFrame(
        [("r1", "iface", 31000, 40.0),   # late, older than state -> skip
         ("r1", "iface", 121000, 130.0)],  # in order -> rate 1/s
        schema,
    )
    src = str(tmp_path / "ooo")
    os.makedirs(src)
    batch1.coalesce(1).write.parquet(src + "/b1")
    batch2.coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    from panoptes_spark.streaming.rate_stream import rate_stream

    q = (
        rate_stream(stream, interval_sec=60)
        .writeStream.format("memory")
        .queryName("ooo_rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.ts_ms: r.rate for r in spark.sql("SELECT * FROM ooo_rates").collect()}
    assert 31000 not in got  # late arrival skipped
    assert got[61000] == 1.0
    assert got[121000] == 1.0


def test_windowed_stream_with_watermark(spark, tmp_path):
    """Tumbling-window streaming agg with a watermark — the late-data
    handling path for the metric stream."""
    rows = [
        ("click", 0), ("click", 60_000), ("view", 120_000),
        ("click", 600_000),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long").select(
        "event_type", F.timestamp_millis(F.col("ts_ms")).alias("ts")
    )
    src = str(tmp_path / "win")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    # complete mode: append would hold windows open until the watermark
    # passes them, and availableNow ends before a later batch advances it
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = {
        (r.window.start.minute, r.event_type): r.n
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert out[(0, "click")] == 2
    assert out[(0, "view")] == 1  # 120s falls in [0,5) window
    assert out[(10, "click")] == 1


def test_stream_static_enrichment_join(spark, tmp_path):
    """Streaming twin of the J1 enrichment attach: a point stream joined
    against the static enrichment dim (broadcast; stream-static joins
    are stateless — the dim re-resolves every micro-batch, which is the
    Spark-native analogue of the reference's per-poll Redis lookup)."""
    points = spark.createDataFrame(
        [
            ("r1", 1000, 10.0),
            ("r2", 2000, 20.0),
            ("r3", 3000, 30.0),  # no enrichment row -> left join keeps it
        ],
        "resource_id string, ts_ms long, metric_value double",
    )
    src = str(tmp_path / "pts")
    points.coalesce(1).write.parquet(src)

    enrich = spark.createDataFrame(
        [("r1", "eth0", 1000), ("r2", "eth7", 10000)],
        "resource_id string, interface_name string, speed_mbps long",
    )

    stream = spark.readStream.schema(points.schema).parquet(src)
    joined = stream.join(F.broadcast(enrich), "resource_id", "left")
    q = (
        joined.writeStream.format("memory")
        .queryName("enriched_pts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.resource_id: (r.interface_name, r.speed_mbps)
        for r in spark.sql("SELECT * FROM enriched_pts").collect()
    }
    assert got == {
        "r1": ("eth0", 1000),
        "r2": ("eth7", 10000),
        "r3": (None, None),
    }


@pytest.mark.slow
def test_stream_stream_time_bounded_join(spark, tmp_path):
    """Stream-stream inner join with an event-time range constraint —
    the streaming interval join: each click matches purchases by the
    same user within the following hour. Watermarks on both sides bound
    the join state (Spark evicts rows older than watermark + range)."""
    clicks = spark.createDataFrame(
        [("u1", 1_000_000, 1), ("u1", 10_000_000, 2), ("u2", 1_000_000, 3)],
        "user string, ts_ms long, click_id long",
    )
    purchases = spark.createDataFrame(
        [
            ("u1", 1_500_000, 101),   # within 1h of click 1
            ("u1", 9_000_000, 102),   # before click 2 -> no match for it
            ("u2", 99_000_000, 103),  # far after u2's click -> no match
        ],
        "user string, ts_ms long, purchase_id long",
    )
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    clicks.coalesce(1).write.parquet(cdir)
    purchases.coalesce(1).write.parquet(pdir)

    cs = (
        spark.readStream.schema(clicks.schema).parquet(cdir)
        .withColumn("c_ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("c_ts", "1 hour")
        .drop("ts_ms")
    )
    ps = (
        spark.readStream.schema(purchases.schema).parquet(pdir)
        .withColumnRenamed("user", "p_user")
        .withColumn("p_ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("p_ts", "1 hour")
        .drop("ts_ms")
    )
    joined = cs.join(
        ps,
        F.expr(
            "user = p_user AND p_ts >= c_ts"
            " AND p_ts <= c_ts + interval 1 hour"
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT click_id, purchase_id FROM ss_join").collect()
    }
    assert got == {(1, 101)}


@pytest.mark.slow
def test_rate_stream_state_survives_restart(spark, tmp_path):
    """Kill the query, append new data, restart with the SAME
    checkpoint: the stateful rate must compute batch-2 rates against
    batch-1's last sample (state recovered from the checkpoint, not
    rebuilt), and must not re-emit batch-1 output (exactly-once over
    the file source + memory sink)."""
    import os

    from panoptes_spark.streaming.rate_stream import rate_stream

    schema = POINTS_SCHEMA
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    spark.createDataFrame(
        [("r1", "iface", 1000, 10.0), ("r1", "iface", 61000, 70.0)], schema
    ).coalesce(1).write.parquet(src + "/b1")

    def run_once(qname):
        stream = spark.readStream.schema(
            spark.read.parquet(src + "/b1").schema
        ).parquet(src + "/*")
        q = (
            # big interval -> processing-time state TTL (3x interval) of
            # 30 min, so slow local restarts cannot expire state mid-test
            rate_stream(stream, interval_sec=600)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .queryName(qname)
            .start()
        )
        q.awaitTermination(180)

    run_once("restart_a")
    first = {(r.ts_ms, r.rate) for r in spark.read.parquet(out).collect()}
    assert first == {(61000, 1.0)}

    # second incarnation: new file, same checkpoint
    spark.createDataFrame(
        [("r1", "iface", 121000, 190.0)], schema  # vs state 70@61000 -> 2/s
    ).coalesce(1).write.parquet(src + "/b2")
    run_once("restart_b")
    both = {(r.ts_ms, r.rate) for r in spark.read.parquet(out).collect()}
    # batch-1 rows not re-emitted; batch-2 rate used the RECOVERED state
    assert both == {(61000, 1.0), (121000, 2.0)}
