"""Exactly-once parquet store sink: idempotent epoch replay, atomic
manifest swap under a mid-epoch crash, tombstone deletes, dirty-bucket
write isolation, and the chaos test — kill the stream between the data
write and the commit, restart from the checkpoint, final store equals
the batch fold byte-for-byte."""

import os

import pytest

from panoptes_spark.streaming.store_sink import ParquetStoreSink

UPDATES_SCHEMA = "key string, value string, ts_ms long"


def _fold(spark, sink, *paths):
    """The batch fold the stream must converge on: latest row per key
    over all updates (same total order the sink uses)."""
    df = spark.read.parquet(*paths)
    return {
        tuple(r) for r in sink._reduce_batch(df).collect()
    }


def _store(sink):
    return {tuple(r) for r in sink.read().collect()}


def test_store_sink_chaos_kill_restart(spark, tmp_path):
    """b1 commits; during b2 the process 'crashes' AFTER the bucket
    snapshots are written but BEFORE the manifest swap (the worst
    instant). The store must still read as the b1 fold; the restarted
    query replays the same epoch and the final store equals the batch
    fold over b1+b2 byte-for-byte."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")
    sink = ParquetStoreSink(spark, store, ["key"], ts_col="ts_ms")

    b1 = [("a", "a1", 1000), ("b", "b1", 2000), ("a", "a2", 3000)]
    spark.createDataFrame(b1, UPDATES_SCHEMA).coalesce(1).write.parquet(
        src + "/b1"
    )

    def run():
        stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src + "/*")
        q = (
            stream.writeStream.foreachBatch(sink.foreach_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    run()
    assert _store(sink) == _fold(spark, sink, src + "/b1")
    assert _store(sink) == {("a", "a2", 3000), ("b", "b1", 2000)}
    epoch_after_b1 = sink.manifest()["last_epoch"]

    # --- chaos: crash between data write and manifest swap -------------
    b2 = [("a", "a3", 4000), ("c", "c1", 5000)]
    spark.createDataFrame(b2, UPDATES_SCHEMA).coalesce(1).write.parquet(
        src + "/b2"
    )
    real_swap = sink._swap_manifest

    def torn_swap(m):
        raise RuntimeError("simulated crash before manifest commit")

    sink._swap_manifest = torn_swap
    with pytest.raises(Exception):
        q = run()
    # the torn epoch left data files behind but the COMMITTED view is b1's
    sink._swap_manifest = real_swap
    assert _store(sink) == {("a", "a2", 3000), ("b", "b1", 2000)}
    assert sink.manifest()["last_epoch"] == epoch_after_b1

    # --- restart: same checkpoint replays the failed epoch -------------
    run()
    want = _fold(spark, sink, src + "/b1", src + "/b2")
    assert _store(sink) == want == {
        ("a", "a3", 4000), ("b", "b1", 2000), ("c", "c1", 5000)
    }
    assert sink.manifest()["last_epoch"] > epoch_after_b1


def test_store_sink_epoch_replay_is_noop(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = ParquetStoreSink(spark, store, ["key"], ts_col="ts_ms")
    df1 = spark.createDataFrame([("a", "a1", 1000)], UPDATES_SCHEMA)
    sink.foreach_batch(df1, 0)
    before = _store(sink)
    # Spark's contract: a replayed epoch id carries the same data — but
    # even a DIFFERENT frame must be ignored for an already-committed id
    sink.foreach_batch(
        spark.createDataFrame([("a", "EVIL", 9000)], UPDATES_SCHEMA), 0
    )
    assert _store(sink) == before == {("a", "a1", 1000)}


def test_store_sink_tombstone_deletes(spark, tmp_path):
    schema = UPDATES_SCHEMA + ", expired boolean"
    store = str(tmp_path / "store")
    sink = ParquetStoreSink(
        spark, store, ["key"], ts_col="ts_ms", tombstone_col="expired"
    )
    sink.foreach_batch(
        spark.createDataFrame(
            [("a", "a1", 1000, False), ("b", "b1", 1000, False)], schema
        ),
        0,
    )
    # delete a; within-batch the tombstone is covered by a NEWER upsert
    # for b -> b survives with the new value (latest-wins, then act)
    sink.foreach_batch(
        spark.createDataFrame(
            [("a", "a1", 2000, True),
             ("b", "b1", 2000, True), ("b", "b2", 3000, False)], schema
        ),
        1,
    )
    assert _store(sink) == {("b", "b2", 3000, False)}


def test_store_sink_rewrites_only_dirty_buckets(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = ParquetStoreSink(spark, store, ["key"], ts_col="ts_ms", n_buckets=8)
    keys = [(f"k{i}", "v0", 1000) for i in range(32)]
    sink.foreach_batch(spark.createDataFrame(keys, UPDATES_SCHEMA), 0)
    m0 = dict(sink.manifest()["buckets"])
    # one-key epoch: exactly one bucket pointer may change
    sink.foreach_batch(
        spark.createDataFrame([("k3", "v1", 2000)], UPDATES_SCHEMA), 1
    )
    m1 = sink.manifest()["buckets"]
    changed = {b for b in m1 if m0.get(b) != m1[b]}
    assert len(changed) == 1
    # untouched buckets still point at epoch-0 files on disk
    for b, f in m1.items():
        if b not in changed:
            assert f.endswith("-e0.parquet")
            assert os.path.exists(os.path.join(store, "data", f))
    got = {tuple(r) for r in sink.read().collect()}
    assert ("k3", "v1", 2000) in got and len(got) == 32
