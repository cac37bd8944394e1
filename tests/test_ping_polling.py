"""Ping polling plugin twin differentials, mirroring the reference's
``tests/plugins/polling/generic/test_plugin_polling_ping.py``: the
SUCCESS / FAILURE / exception fixtures (the mocked ``/bin/ping`` output
strings) replayed through the parse + group-assembly operators."""

from panoptes_spark.operators.ping_polling import (
    PING_FAILURE,
    PING_SUCCESS,
    parse_ping_output,
    ping_metrics_groups,
)

DEV = "test_endpoint"

# test_plugin_polling_ping.py:16-22, verbatim fixture strings
PING_RESPONSE_SUCCESS = (
    "ping statistics ---\n"
    "10 packets transmitted, 10 received, 0% packet loss, time 1439ms\n"
    "rtt min/avg/max/mdev = 0.040/0.120/0.162/0.057 ms"
)
PING_RESPONSE_FAILURE = (
    "ping statistics ---\n"
    "10 packets transmitted, 0 received, 100% packet loss, time 10000ms\n"
    "rtt min/avg/max/mdev = 0.0/0.0/0.0/0.0 ms"
)


def _run(spark, text):
    df = spark.createDataFrame(
        [(DEV, text)], "device_id string, ping_output string"
    )
    parsed = parse_ping_output(df)
    rows = ping_metrics_groups(parsed, interval=60).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.metrics_group_type == "ping"
    assert r.metrics_group_interval == 60
    assert list(r.dimensions) == []
    return {m.metric_name: m.metric_value for m in r.metrics}, parsed


def test_ping_success(spark):
    """TEST_PLUGIN_RESULT_SUCCESS (:231-168): all six metrics, status 0."""
    mets, parsed = _run(spark, PING_RESPONSE_SUCCESS)
    assert mets == {
        "ping_status": float(PING_SUCCESS),
        "packet_loss_percent": 0.0,
        "round_trip_minimum": 0.040,
        "round_trip_average": 0.120,
        "round_trip_maximum": 0.162,
        "round_trip_standard_deviation": 0.057,
    }
    p = parsed.collect()[0]
    assert p.packets_transmitted == 10
    assert p.packets_received == 10
    assert p.execution_time == 1.44  # 1439ms -> round(1.439, 2)


def test_ping_all_lost(spark):
    """TEST_PLUGIN_RESULT_FAILURE: parseable output, 100% loss -> the
    full metric set with ping_status PING_FAILURE(7) (plugin :63-66)."""
    mets, _ = _run(spark, PING_RESPONSE_FAILURE)
    assert mets == {
        "ping_status": float(PING_FAILURE),
        "packet_loss_percent": 100.0,
        "round_trip_minimum": 0.0,
        "round_trip_average": 0.0,
        "round_trip_maximum": 0.0,
        "round_trip_standard_deviation": 0.0,
    }


def test_ping_exception_only_status(spark):
    """TEST_PLUGIN_RESULT_EXCEPTION: unparseable output (the plugin's
    except path :72-74) -> ping_status ONLY, value 7."""
    mets, parsed = _run(spark, "connect: Network is unreachable")
    assert mets == {"ping_status": float(PING_FAILURE)}
    assert parsed.collect()[0].packets_transmitted is None


def test_ping_multi_device_batch(spark):
    """The operator is a map-only projection — a mixed batch keeps each
    device independent."""
    df = spark.createDataFrame(
        [
            ("d-ok", PING_RESPONSE_SUCCESS),
            ("d-lost", PING_RESPONSE_FAILURE),
            ("d-err", "garbage"),
        ],
        "device_id string, ping_output string",
    )
    out = {
        r.device_id: {m.metric_name: m.metric_value for m in r.metrics}
        for r in ping_metrics_groups(parse_ping_output(df), 300).collect()
    }
    assert out["d-ok"]["ping_status"] == 0.0
    assert out["d-lost"]["ping_status"] == 7.0
    assert set(out["d-err"]) == {"ping_status"}
    assert len(out["d-ok"]) == 6


def test_ping_proc_failure_overrides_parse(spark):
    """The REAL /bin/ping exits rc=1 on 100% loss; subprocess raises and
    PanoptesPingDirect re-raises (ping.py:234-238) before the plugin
    adds RTT metrics — a failed process emits ping_status ONLY even when
    the captured output parses (the plugin test's all-six-metrics path
    exists only because its mock RETURNS the text instead of raising)."""
    df = spark.createDataFrame(
        [
            ("d-real-loss", PING_RESPONSE_FAILURE, True),   # rc=1
            ("d-mocked-loss", PING_RESPONSE_FAILURE, False),  # mock path
        ],
        "device_id string, ping_output string, proc_failed boolean",
    )
    parsed = parse_ping_output(df).join(
        df.select("device_id", "proc_failed"), "device_id"
    )
    out = {
        r.device_id: {m.metric_name: m.metric_value for m in r.metrics}
        for r in ping_metrics_groups(
            parsed, 60, proc_failed_col="proc_failed"
        ).collect()
    }
    assert out["d-real-loss"] == {"ping_status": float(PING_FAILURE)}
    assert len(out["d-mocked-loss"]) == 6
    assert out["d-mocked-loss"]["ping_status"] == float(PING_FAILURE)
