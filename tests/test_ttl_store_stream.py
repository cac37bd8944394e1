"""Streaming TTL store (S10/W3 twin): changelog parity with the batch
upsert fold, cross-batch last-write-wins, tombstone on expiry.

Note on trigger semantics: with ``availableNow`` Spark keeps scheduling
no-data micro-batches while stateful timeouts are pending, so the query
runs until every key's TTL fires — the memory sink then holds the FULL
changelog lifecycle (live row, then tombstone) per key. Tests use small
TTLs to keep that bounded.
"""

import pandas as pd

from panoptes_spark.streaming.ttl_store_stream import (
    _latest_update,
    ttl_store_stream,
)

UPDATES_SCHEMA = "key string, value string, ts_ms long, ttl_sec long"


def _run(spark, src, name, want_tombstones=0, timeout=90):
    """Run until the memory sink holds `want_tombstones` expired rows
    (the query itself idles on pending state timeouts, so poll the sink
    rather than waiting out awaitTermination)."""
    import time

    stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src)
    q = (
        ttl_store_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if q.awaitTermination(2):
                break
            n = spark.sql(
                f"SELECT count(*) FROM {name} WHERE expired"
            ).first()[0]
            if n >= want_tombstones:
                break
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_ttl_store_stream_changelog_lifecycle(spark, tmp_path):
    src = str(tmp_path / "upd")
    rows = [
        ("a", "a1", 1000, 3),
        ("a", "a2", 5000, 3),   # newer -> wins
        ("b", "b1", 2000, 2),
    ]
    spark.createDataFrame(rows, UPDATES_SCHEMA).coalesce(1).write.parquet(src)
    out = _run(spark, src, "ttl_out_1", want_tombstones=2)
    live = {r.key: r for r in out if not r.expired}
    dead = {r.key: r for r in out if r.expired}
    # live changelog rows match the batch upsert fold: LWW by event ts,
    # expires_at = winner ts + ttl
    assert live["a"].value == "a2" and live["a"].expires_at_ms == 8000
    assert live["b"].value == "b1" and live["b"].expires_at_ms == 4000
    # the stale a1 write never surfaces
    assert not any(r.value == "a1" for r in out)
    # active expiry emitted a tombstone per key once its TTL elapsed
    assert dead["a"].value == "a2" and dead["a"].expires_at_ms == 8000
    assert dead["b"].value == "b1"


def test_ttl_store_stream_stale_replay_suppressed(spark, tmp_path):
    src = str(tmp_path / "upd")
    spark.createDataFrame(
        [("a", "new", 9000, 2)], UPDATES_SCHEMA
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("a", "old", 1000, 2)], UPDATES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    # both files land in one availableNow run; LWW converges on the
    # newer event regardless of batch split (deterministic, unlike the
    # reference's blind wall-clock SET)
    out = _run(spark, src, "ttl_out_2", want_tombstones=1)
    assert not any(r.value == "old" for r in out)
    live = [r for r in out if not r.expired]
    assert [(r.value, r.expires_at_ms) for r in live] == [("new", 11000)]


def test_latest_update_total_order():
    a = pd.DataFrame(
        [{"ts_ms": 5, "value": "x", "ttl_sec": 1},
         {"ts_ms": 5, "value": "y", "ttl_sec": 2}]
    )
    b = pd.DataFrame([{"ts_ms": 3, "value": "z", "ttl_sec": 9}])
    # tie on ts -> larger value string wins, regardless of frame order
    assert _latest_update(iter([a, b])) == (5, "y", 2)
    assert _latest_update(iter([b, a])) == (5, "y", 2)


def test_stale_replay_does_not_cancel_expiry(spark, tmp_path):
    """A stale replay processed as its OWN micro-batch
    (maxFilesPerTrigger=1) must not cancel the pending expiry: the
    tombstone still arrives and the stale value never surfaces. Guards
    the no-leak guarantee against either timeout semantics (the Scala
    GroupState doc says per-invocation re-arm is required; the PySpark
    bridge currently preserves untouched timeouts — the store re-arms
    defensively either way)."""
    import time

    src = str(tmp_path / "upd")
    spark.createDataFrame(
        [("a", "new", 9000, 2)], UPDATES_SCHEMA
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("a", "old", 1000, 2)], UPDATES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(UPDATES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ttl_store_stream(stream)
        .writeStream.format("memory")
        .queryName("ttl_out_3")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.monotonic() + 90
        n = 0
        while time.monotonic() < deadline:
            if q.awaitTermination(2):
                break
            n = spark.sql(
                "SELECT count(*) FROM ttl_out_3 WHERE expired"
            ).first()[0]
            if n >= 1:
                break
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM ttl_out_3").collect()
    assert not any(r.value == "old" for r in rows)
    assert any(r.expired and r.value == "new" for r in rows), rows
