"""Replay of the reference's polling-agent counter-transform golden
(``tests/test_plugin_agent.py::test_polling_transform_converts_correct_
counters``): the eight checked-in ``metric_group_sets/
interface_plugin_counter_{1..8}.json`` messages processed in arrival
order through the agent's rate transform, values compared against the
test's inline expected table — plus presence assertions the reference's
loop (which only checks metrics present in the output) implies but
cannot express."""

import json
import os

import pytest

from pyspark.sql import functions as F

from panoptes_spark.operators.rate import agent_rate_gauges

MGS = "/root/reference/tests/metric_group_sets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MGS), reason="reference corpus not available"
)

# test_plugin_agent.py:261-313, verbatim values. Keys absent from a
# message are unchecked by the reference loop; rows 1/4/5/6/8 emit no
# gauges at all (first sample / dt<=0 / TTL overrun / counter reset).
EXPECTED = [
    {"counter|test_system_uptime": 0, "counter|extra_test_metric": 0},
    {"counter|test_system_uptime": 60, "gauge|test_system_uptime": 0,
     "counter|extra_test_metric": 120, "gauge|extra_test_metric": 1},
    {"counter|test_system_uptime": 120, "gauge|test_system_uptime": 0,
     "counter|extra_test_metric": 240, "gauge|extra_test_metric": 1},
    {"counter|test_system_uptime": 120, "counter|extra_test_metric": 240},
    {"counter|test_system_uptime": 120, "counter|extra_test_metric": 240},
    {"counter|test_system_uptime": 500, "counter|extra_test_metric": 1000},
    {"counter|test_system_uptime": 500, "gauge|test_system_uptime": 0,
     "counter|extra_test_metric": 1000, "gauge|extra_test_metric": 0},
    {"counter|test_system_uptime": 400, "counter|extra_test_metric": 900},
]
# messages whose output carries gauges (hand-derived from the transform
# rules; the reference's expected table lists unreachable gauge keys on
# skip rows 4/5/6/8 that its presence-blind loop never checks)
GAUGE_ROWS = {2, 3, 7}


def _load_samples():
    rows = []
    for i in range(1, 9):
        with open(f"{MGS}/interface_plugin_counter_{i}.json") as f:
            (g,) = json.load(f)
        for m in g["metrics"]:
            rows.append((
                i,
                g["resource"]["resource_id"],
                g["metrics_group_type"],
                g["metrics_group_interval"],
                m["metric_name"],
                float(m["metric_value"]),
                float(m["metric_creation_timestamp"]),
            ))
    return rows


def test_agent_counter_transform_golden(spark):
    samples = spark.createDataFrame(
        _load_samples(),
        "seq int, resource_id string, group_type string, interval long,"
        " metric_name string, metric_value double, metric_ts double",
    )
    out = agent_rate_gauges(
        samples,
        ["resource_id", "group_type", "metric_name"],
    ).collect()

    # rebuild each output message: copy of the group + computed gauges
    messages: dict[int, dict[str, float]] = {i: {} for i in range(1, 9)}
    for r in out:
        messages[r.seq][f"counter|{r.metric_name}"] = r.metric_value
        if r.gauge_value is not None:
            messages[r.seq][f"gauge|{r.metric_name}"] = float(r.gauge_value)

    for i in range(1, 9):
        for key, value in messages[i].items():
            assert EXPECTED[i - 1].get(key) == value, (i, key, value)
        has_gauges = any(k.startswith("gauge|") for k in messages[i])
        assert has_gauges == (i in GAUGE_ROWS), (i, messages[i])

    # spot-check the interesting rows end-to-end
    assert messages[2]["gauge|test_system_uptime"] == 0.0  # int(60/60.06)
    assert messages[2]["gauge|extra_test_metric"] == 1.0   # int(120/60.06)
    assert messages[7]["gauge|extra_test_metric"] == 0.0   # diff 0 over .3s


def test_agent_transform_confidence_rides_along(spark):
    """Confidence is logged, never filtered (:221-225): a conversion
    with interval/dt far below the 0.33 threshold still emits."""
    samples = spark.createDataFrame(
        [(1, "r", "g", 60, "m", 0.0, 1000.0),
         (2, "r", "g", 60, "m", 100.0, 1170.0)],  # dt=170 <= 180
        "seq int, resource_id string, group_type string, interval long,"
        " metric_name string, metric_value double, metric_ts double",
    )
    (row,) = [
        r for r in agent_rate_gauges(
            samples, ["resource_id", "group_type", "metric_name"]
        ).collect() if r.seq == 2
    ]
    assert row.gauge_value == 0  # int(100/170)
    assert row.confidence == 0.35
    # and the store keeps skipped samples as the comparison base:
    # a TTL-overrun sample still becomes the next sample's previous
    samples2 = spark.createDataFrame(
        [(1, "r", "g", 60, "m", 0.0, 1000.0),
         (2, "r", "g", 60, "m", 50.0, 9000.0),    # dt 8000 -> skip
         (3, "r", "g", 60, "m", 110.0, 9060.0)],  # vs seq 2, not seq 1
        "seq int, resource_id string, group_type string, interval long,"
        " metric_name string, metric_value double, metric_ts double",
    )
    got = {r.seq: r.gauge_value for r in agent_rate_gauges(
        samples2, ["resource_id", "group_type", "metric_name"]
    ).collect()}
    assert got == {1: None, 2: None, 3: 1}  # int(60/60)


def test_agent_topic_fanout_golden(spark):
    """Replay of test_plugin_agent.py::test_polling_kafka_produces_to_
    the_correct_topics: the checked-in interface_plugin_results.json
    group fanned out through the kafka-sink projection — site topic only
    under the default config, site + global under kafka_true."""
    from panoptes_spark.streaming.ingest import prepare_fanout

    with open(f"{MGS}/interface_plugin_results.json") as f:
        groups_json = json.load(f)
    df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(g) for g in groups_json])
    )

    # config 1: publish_to_global_topic = False
    out1 = prepare_fanout(df, suffix="processed").collect()
    counts1: dict[str, int] = {}
    for r in out1:
        counts1[r.topic] = counts1.get(r.topic, 0) + 1
    assert counts1 == {"test_site-processed": 1}

    # config 2: global topic on -> one message to each
    out2 = prepare_fanout(
        df, suffix="processed", global_topic="panoptes-metrics"
    ).collect()
    counts2: dict[str, int] = {}
    for r in out2:
        counts2[r.topic] = counts2.get(r.topic, 0) + 1
    assert counts2 == {"panoptes-metrics": 1, "test_site-processed": 1}

    # the partitioning key carries resource_id|group_type|dims
    assert all(r.key.startswith("test_id_2|interface|") for r in out2)
    payload = json.loads(out2[0].value)
    assert payload["metrics_group_type"] == "interface"
    assert {m["metric_name"] for m in payload["metrics"]} == {
        m["metric_name"] for m in groups_json[0]["metrics"]
    }


# ---------------------------------------------------------------------------
# property differential: lag-window twin vs a literal KV-store replay
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_scenario = st.lists(
    st.tuples(
        st.sampled_from(["r1", "r2"]),       # resource
        st.sampled_from(["m1", "m2"]),       # metric name
        st.integers(min_value=0, max_value=1000),   # counter value
        st.integers(min_value=0, max_value=500),    # ts step
    ),
    min_size=1,
    max_size=12,
)


def _py_agent_transform(samples, interval=60, ttl_multiple=3):
    """Literal replay of _transformation_rate's getset-then-compare loop
    (polling_plugin_agent.py:178-243)."""
    store = {}
    out = []
    for seq, (rid, name, value, ts) in enumerate(samples, start=1):
        key = (rid, name)
        prev = store.get(key)
        store[key] = (value, ts)
        gauge = None
        if prev is not None:
            pv, pt = prev
            dt = ts - pt
            if dt > 0 and dt <= interval * ttl_multiple and value - pv >= 0:
                gauge = int((value - pv) / dt)
        out.append((seq, gauge))
    return out


@settings(max_examples=15, deadline=None)
@given(_scenario)
def test_agent_rate_matches_kv_replay(spark, scenario):
    # monotone-ish timestamps with occasional regressions via raw steps
    samples = []
    t = 1000.0
    for rid, name, value, step in scenario:
        t = t + step - 100  # steps < 100 move time BACKWARD
        samples.append((rid, name, float(value), t))
    rows = [
        (i, rid, "g", 60, name, v, ts)
        for i, (rid, name, v, ts) in enumerate(samples, start=1)
    ]
    df = spark.createDataFrame(
        rows,
        "seq int, resource_id string, group_type string, interval long,"
        " metric_name string, metric_value double, metric_ts double",
    )
    got = {
        r.seq: r.gauge_value
        for r in agent_rate_gauges(
            df, ["resource_id", "group_type", "metric_name"]
        ).collect()
    }
    want = dict(
        _py_agent_transform(
            [(rid, name, v, ts) for rid, name, v, ts in samples]
        )
    )
    assert got == want, (samples,)
