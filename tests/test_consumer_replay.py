"""Kafka consumer-protocol replay (no broker): murmur2/DefaultPartitioner
byte-parity with Kafka's public test vectors, the reference consumer's
per-partition commit-on-success discipline (consumer.py:367-438), and
at-least-once redelivery converging to effectively-once through the
idempotent store sink."""

import json

from panoptes_spark.streaming.consumer_replay import (
    PolledRecord,
    murmur2,
    partition_for_key,
    process_polled_batch,
    redeliver,
)

# public vectors from Apache Kafka's own UtilsTest#testMurmur2 (also
# replicated in kafka-python's murmur2 compat tests)
MURMUR2_VECTORS = {
    b"21": -973932308,
    b"foobar": -790332482,
    b"a-little-bit-long-string": -985981536,
    b"a-little-bit-longer-string": -1486304829,
    b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8": -58897971,
    b"abc": 479470107,  # length % 4 == 3 path
}


def test_murmur2_matches_kafka_vectors():
    for key, want in MURMUR2_VECTORS.items():
        assert murmur2(key) == want, key


def test_default_partitioner_placement():
    # positive-mask then mod — byte-for-byte DefaultPartitioner
    for key, h in MURMUR2_VECTORS.items():
        assert partition_for_key(key, 12) == (h & 0x7FFFFFFF) % 12
    # the series keys prepare_fanout emits place deterministically: the
    # reference's _make_key shape is resource_id|group_type|dim pairs
    key = b"sw1|interface|iface|xe-0"
    assert partition_for_key(key, 8) == partition_for_key(key, 8)
    assert 0 <= partition_for_key(key, 8) < 8


def _rec(p, off, key, obj):
    val = obj if isinstance(obj, bytes) else json.dumps(obj).encode()
    return PolledRecord("t", p, off, key.encode(), val)


def test_commit_on_success_per_partition():
    """Partition 0 fully succeeds -> committed at position; partition 1's
    callback fails mid-batch -> NOT committed; skips and validation
    failures do not fail the batch and are committed past."""
    polled = {
        ("t", 0): [
            _rec(0, 5, "k1", {"v": 1}),
            _rec(0, 6, "zz", {"v": 2}),          # key-filtered: skip
            _rec(0, 7, "k1", b"{garbage"),        # bad JSON: skip
            _rec(0, 8, "k1", {"v": 3, "bad": 1}),  # validator: skip
            _rec(0, 9, "k1", {"v": 4}),
        ],
        ("t", 1): [
            _rec(1, 100, "k1", {"v": 10}),
            _rec(1, 101, "k1", {"v": -1}),        # callback returns False
            _rec(1, 102, "k1", {"v": 11}),        # never reached
        ],
    }
    seen = []

    def cb(key, obj):
        if obj["v"] < 0:
            return False
        seen.append(obj["v"])
        return True

    commits, stats = process_polled_batch(
        polled, cb, keys=["k1"], validator=lambda o: "bad" not in o
    )
    # partition 0 commits PAST its skipped records (reference commits
    # consumer.position, not last-processed+1)
    assert commits == {("t", 0): 10}
    assert seen == [1, 4, 10]
    assert stats[("t", 0)] == {
        "processed": 2, "skipped": 1, "validation_failed": 2,
        "excepted": False, "succeeded": True,
    }
    assert stats[("t", 1)]["succeeded"] is False
    assert stats[("t", 1)]["processed"] == 1
    # a returned False withholds the commit — partition 1 redelivers
    assert ("t", 1) not in commits


def test_callback_exception_commits_past_batch_like_reference():
    """Reference fidelity (r6 ADVICE #2): in consumer.py:415-425 an
    exception only logs and breaks — ``callback_succeeded`` keeps its
    prior True, so the partition COMMITS consumer.position (past the
    whole polled batch) and the unprocessed tail is lost (at-most-once
    on the exception path). The twin replicates that bug-for-bug;
    ``safe_exceptions=True`` opts into the withheld-commit discipline."""
    polled = {("t", 0): [
        _rec(0, 0, "k", {"v": 1}),
        _rec(0, 1, "k", {"v": 2}),
        _rec(0, 2, "k", {"v": 3}),  # never reached, still committed past
    ]}
    seen = []

    def boom(key, obj):
        if obj["v"] == 2:
            raise RuntimeError("down")
        seen.append(obj["v"])
        return True

    commits, stats = process_polled_batch(polled, boom)
    assert commits == {("t", 0): 3}  # past the WHOLE batch
    assert seen == [1]
    assert stats[("t", 0)]["excepted"] is True
    assert stats[("t", 0)]["succeeded"] is False
    assert stats[("t", 0)]["processed"] == 1

    # the safer (non-reference) discipline: exception withholds commit
    commits2, stats2 = process_polled_batch(
        polled, boom, safe_exceptions=True
    )
    assert commits2 == {}
    assert stats2[("t", 0)]["excepted"] is True


def test_redelivery_converges_with_idempotent_sink(spark, tmp_path):
    """At-least-once replay through the exactly-once store sink:
    partition 1 fails on the first poll and is redelivered whole; the
    records before the failure run TWICE through the callback, but the
    epoch-keyed idempotent MERGE makes the end state equal the
    single-delivery batch fold — the reference's at-least-once contract
    landed effectively-once."""
    from panoptes_spark.streaming.store_sink import ParquetStoreSink

    log = {
        ("t", 0): [
            _rec(0, 0, "a", {"key": "a", "value": "a1", "ts_ms": 1000}),
        ],
        ("t", 1): [
            _rec(1, 0, "b", {"key": "b", "value": "b1", "ts_ms": 1000}),
            _rec(1, 1, "c", {"key": "c", "value": "c1", "ts_ms": 2000}),
        ],
    }
    sink = ParquetStoreSink(
        spark, str(tmp_path / "store"), ["key"], ts_col="ts_ms"
    )
    schema = "key string, value string, ts_ms long"

    fail_once = {"armed": True}
    delivered: list[dict] = []

    def cb(key, obj):
        if fail_once["armed"] and obj["key"] == "c":
            fail_once["armed"] = False
            return False  # transient failure: partition 1 uncommitted
        delivered.append(obj)
        return True

    commits1, _ = process_polled_batch(log, cb)
    sink.foreach_batch(
        spark.createDataFrame([tuple(d.values()) for d in delivered], schema),
        epoch_id=0,
    )
    assert commits1 == {("t", 0): 1}

    # poll 2: the broker redelivers partition 1 from its uncommitted start
    polled2 = redeliver(log, commits1)
    assert set(polled2) == {("t", 1)}
    assert [r.offset for r in polled2[("t", 1)]] == [0, 1]
    delivered.clear()
    commits2, _ = process_polled_batch(polled2, cb)
    assert commits2 == {("t", 1): 2}
    sink.foreach_batch(
        spark.createDataFrame([tuple(d.values()) for d in delivered], schema),
        epoch_id=1,
    )
    # b was delivered twice (once per poll) but the store equals the
    # single-delivery fold
    got = {tuple(r) for r in sink.read().collect()}
    assert got == {("a", "a1", 1000), ("b", "b1", 1000), ("c", "c1", 2000)}
    # ...and a crash-replay of epoch 1 is a no-op
    sink.foreach_batch(
        spark.createDataFrame([("b", "EVIL", 9)], schema), epoch_id=1
    )
    assert {tuple(r) for r in sink.read().collect()} == got
