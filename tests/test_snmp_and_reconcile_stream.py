"""S2/S3 fixture connector, varbind mapping, streaming reconciliation."""

from panoptes_spark.sources.snmp import (
    FixtureSNMPConnection,
    varbinds_to_oid_tables,
)
from panoptes_spark.streaming.reconcile_stream import reconcile_stream

VARBIND_SCHEMA = (
    "device_id string, oid string, index string, value string, snmp_type string"
)


def _varbinds(spark):
    rows = [
        ("d1", ".1.3.6.1.2.1.1.3.0", "0", "12345", "TimeTicks"),
        ("d1", ".1.3.6.1.4.1.9.9.109.1.1.1.1.8", "1", "55", "Gauge32"),
        ("d1", ".1.3.6.1.4.1.9.9.109.1.1.1.1.8", "2", "60", "Gauge32"),
        ("d2", ".1.3.6.1.4.1.9.9.109.1.1.1.1.8", "1", "10", "Gauge32"),
    ]
    return spark.createDataFrame(rows, VARBIND_SCHEMA)


def test_fixture_connection_get_and_walk(spark):
    conn = FixtureSNMPConnection(_varbinds(spark), "d1")
    got = conn.get(".1.3.6.1.2.1.1.3.0")
    assert got.value == "12345" and got.snmp_type == "TimeTicks"
    walked = conn.bulk_walk(".1.3.6.1.4.1.9.9.109")
    assert [(v.index, v.value) for v in walked] == [("1", "55"), ("2", "60")]
    assert conn.get(".9.9.9") is None


def test_varbinds_to_oid_tables(spark):
    out = varbinds_to_oid_tables(
        _varbinds(spark),
        {".1.3.6.1.4.1.9.9.109": "cpu_util", ".1.3.6.1.2.1.1.3": "uptime"},
    )
    rows = {(r.device_id, r.table_name, r["index"]): r.value for r in out.collect()}
    assert rows[("d1", "cpu_util", "1")] == "55"
    assert rows[("d1", "uptime", "0")] == "12345"
    assert rows[("d2", "cpu_util", "1")] == "10"


def test_reconcile_stream(spark, tmp_path):
    """Default path (exactly-once since r7): two discovery cycles through
    the same checkpoint; epoch 2 updates newer rows, skips older ones,
    deletes absentees (set_ts guard)."""
    from panoptes_spark.streaming.reconcile_stream import (
        ExactlyOnceResourceStoreWriter,
    )

    schema = "rid string, resource_creation_timestamp double, val string"
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "incoming")

    def run():
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        q = reconcile_stream(stream, spark, store, ckpt, identity_cols=["rid"])
        q.awaitTermination(120)

    # cycle 1 seeds the store
    spark.createDataFrame(
        [("a", 10.0, "cur-a"), ("b", 99.0, "cur-b"), ("c", 10.0, "cur-c")],
        schema,
    ).coalesce(1).write.parquet(src + "/b1")
    run()
    # cycle 2: updates a (newer), b (older -> skip); c absent ->
    # delete (set ts 50 > stored 10); d added
    spark.createDataFrame(
        [("a", 20.0, "inc-a"), ("b", 20.0, "inc-b"), ("d", 50.0, "inc-d")],
        schema,
    ).coalesce(1).write.parquet(src + "/b2")
    run()

    writer = ExactlyOnceResourceStoreWriter(spark, store, identity_cols=["rid"])
    rows = {r.rid: r.val for r in writer.read().collect()}
    assert rows == {"a": "inc-a", "b": "cur-b", "d": "inc-d"}


def test_legacy_writer_is_deprecated(spark, tmp_path):
    import pytest

    from panoptes_spark.streaming.reconcile_stream import ResourceStoreWriter

    with pytest.warns(DeprecationWarning, match="not crash-atomic"):
        ResourceStoreWriter(spark, str(tmp_path / "s"), identity_cols=["rid"])


def test_scoped_reconcile_rewrites_only_touched_scopes(spark, tmp_path):
    """r7 directive 2: with scope_cols=['site'], an epoch carrying only
    site A leaves site B's snapshot file UNTOUCHED (same manifest path,
    byte-identical on disk) — a scope absent from the batch is "no
    news", not a delete; absence WITHIN a carried scope still deletes.
    Superseded files are GC'd with a one-generation grace."""
    import hashlib
    import pathlib

    from panoptes_spark.streaming.reconcile_stream import (
        ExactlyOnceResourceStoreWriter,
    )

    schema = (
        "site string, rid string, resource_creation_timestamp double,"
        " val string"
    )
    store = str(tmp_path / "store")
    w = ExactlyOnceResourceStoreWriter(
        spark, store, identity_cols=["site", "rid"], scope_cols=["site"]
    )
    e0 = [
        ("A", "a", 10.0, "a0"),
        ("A", "b", 10.0, "b0"),
        ("B", "x", 10.0, "x0"),
    ]
    w(spark.createDataFrame(e0, schema), epoch_id=0)
    m0 = w.manifest()
    assert len(m0["scopes"]) == 2
    bkey = next(k for k in m0["scopes"] if k.startswith("B"))
    akey = next(k for k in m0["scopes"] if k.startswith("A"))
    bfile = m0["scopes"][bkey]

    def dirhash(fname):
        base = pathlib.Path(store, "data", fname)
        h = hashlib.md5()
        for p in sorted(base.rglob("*")):
            if p.is_file():
                h.update(p.name.encode())
                h.update(p.read_bytes())
        return h.hexdigest()

    b_bytes = dirhash(bfile)

    # epoch 1 carries ONLY site A: a updated, b absent within A -> delete
    w(
        spark.createDataFrame([("A", "a", 20.0, "a1")], schema),
        epoch_id=1,
    )
    m1 = w.manifest()
    assert m1["scopes"][bkey] == bfile
    assert dirhash(bfile) == b_bytes
    got = {(r.site, r.rid, r.val) for r in w.read().collect()}
    assert got == {("A", "a", "a1"), ("B", "x", "x0")}

    # GC grace: A's epoch-0 file retired but still on disk this commit...
    a_e0 = f"s{akey}-e0.parquet"
    assert m1["retired"] == [a_e0]
    assert pathlib.Path(store, "data", a_e0).exists()
    # ...and deleted at the NEXT commit
    w(
        spark.createDataFrame([("A", "a", 30.0, "a2")], schema),
        epoch_id=2,
    )
    assert not pathlib.Path(store, "data", a_e0).exists()
    assert pathlib.Path(store, "data", f"s{akey}-e1.parquet").exists()


def test_exactly_once_reconcile_store_chaos(spark, tmp_path):
    """Crash between the snapshot write and the manifest swap: the
    committed store still reads as the previous set; the restarted query
    replays the epoch and the final store equals the batch
    apply_reconciliation fold of both sets."""
    import pytest

    from panoptes_spark.operators.reconcile import apply_reconciliation
    from panoptes_spark.streaming.reconcile_stream import (
        ExactlyOnceResourceStoreWriter,
        reconcile_stream,
    )

    schema = "rid string, resource_creation_timestamp double, val string"
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "incoming")
    set1 = [("a", 10.0, "a1"), ("b", 10.0, "b1")]
    set2 = [("a", 20.0, "a2"), ("c", 20.0, "c1")]  # b absent -> delete

    def run():
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        q = reconcile_stream(
            stream, spark, store, ckpt, exactly_once=True,
            identity_cols=["rid"],
        )
        q.awaitTermination(180)

    spark.createDataFrame(set1, schema).coalesce(1).write.parquet(src + "/b1")
    run()
    writer = ExactlyOnceResourceStoreWriter(spark, store, identity_cols=["rid"])
    assert {(r.rid, r.val) for r in writer.read().collect()} == {
        ("a", "a1"), ("b", "b1")
    }
    epoch1 = writer.manifest()["last_epoch"]

    # chaos: epoch 2's snapshot lands but the commit never happens
    spark.createDataFrame(set2, schema).coalesce(1).write.parquet(src + "/b2")
    real_swap = ExactlyOnceResourceStoreWriter._swap_manifest
    ExactlyOnceResourceStoreWriter._swap_manifest = (
        lambda self, m: (_ for _ in ()).throw(RuntimeError("crash"))
    )
    try:
        with pytest.raises(Exception):
            run()
    finally:
        ExactlyOnceResourceStoreWriter._swap_manifest = real_swap
    # committed view untouched by the torn epoch
    assert {(r.rid, r.val) for r in writer.read().collect()} == {
        ("a", "a1"), ("b", "b1")
    }
    assert writer.manifest()["last_epoch"] == epoch1

    # restart: same checkpoint replays the failed epoch; a replay of an
    # ALREADY-committed epoch is a no-op (idempotence)
    run()
    got = {(r.rid, r.val) for r in writer.read().collect()}
    empty = spark.createDataFrame([], schema)
    m1 = apply_reconciliation(
        empty, spark.createDataFrame(set1, schema), 10.0, ["rid"],
        "resource_creation_timestamp",
    )
    m2 = apply_reconciliation(
        m1, spark.createDataFrame(set2, schema), 20.0, ["rid"],
        "resource_creation_timestamp",
    )
    assert got == {(r.rid, r.val) for r in m2.collect()} == {
        ("a", "a2"), ("c", "c1")
    }
    writer(spark.createDataFrame([("z", 99.0, "evil")], schema), epoch_id=0)
    assert {(r.rid, r.val) for r in writer.read().collect()} == got


def test_legacy_manifest_migration_scoped(spark, tmp_path):
    """ADVICE r7 (medium): a pre-r7 single-snapshot store must migrate on
    the first SCOPED commit — per-scope history/timestamp guards intact
    (an older incoming row is rejected), no resurrection of deleted
    resources via read(), legacy file retired with the usual grace."""
    import json
    import os
    import pathlib

    from panoptes_spark.streaming.reconcile_stream import (
        ExactlyOnceResourceStoreWriter,
    )

    schema = (
        "site string, rid string, resource_creation_timestamp double,"
        " val string"
    )
    store = str(tmp_path / "store")
    os.makedirs(os.path.join(store, "data"))
    # hand-write the pre-r7 layout: one global snapshot + old manifest
    spark.createDataFrame(
        [
            ("A", "a", 30.0, "a-old"),
            ("A", "b", 10.0, "b-old"),
            ("B", "x", 10.0, "x-old"),
        ],
        schema,
    ).write.parquet(os.path.join(store, "data", "legacy.parquet"))
    with open(os.path.join(store, "MANIFEST"), "w") as f:
        json.dump({"last_epoch": 0, "snapshot": "legacy.parquet"}, f)

    w = ExactlyOnceResourceStoreWriter(
        spark, store, identity_cols=["site", "rid"], scope_cols=["site"]
    )
    # pre-migration read: exactly the legacy content, no duplication
    pre = {(r.site, r.rid, r.val) for r in w.read().collect()}
    assert pre == {("A", "a", "a-old"), ("A", "b", "b-old"),
                   ("B", "x", "x-old")}

    # epoch 1, site A only: 'a' arrives OLDER (ts 20 < stored 30) -> the
    # stored row must survive (guards only work if the merge saw the
    # migrated content, not an empty store); 'b' absent within A ->
    # deleted; site B untouched.
    w(
        spark.createDataFrame([("A", "a", 20.0, "a-new")], schema),
        epoch_id=1,
    )
    got = {(r.site, r.rid, r.val) for r in w.read().collect()}
    assert got == {("A", "a", "a-old"), ("B", "x", "x-old")}

    m = w.manifest()
    assert "__legacy__" not in m["scopes"] and "" not in m["scopes"]
    # legacy file retired (grace: still on disk until the next commit)
    assert "legacy.parquet" in m["retired"]
    assert pathlib.Path(store, "data", "legacy.parquet").exists()
    w(
        spark.createDataFrame([("A", "a", 40.0, "a-40")], schema),
        epoch_id=2,
    )
    assert not pathlib.Path(store, "data", "legacy.parquet").exists()
    # no orphans: every file under data/ is manifest-referenced
    m2 = w.manifest()
    referenced = set(m2["scopes"].values()) | set(m2["retired"])
    on_disk = {p.name for p in pathlib.Path(store, "data").iterdir()}
    assert on_disk <= referenced


def test_legacy_manifest_migration_unscoped(spark, tmp_path):
    """Unscoped upgrade: the legacy snapshot is adopted as the global
    scope (pure manifest rename, no rewrite) and the first merge applies
    its guards against it."""
    import json
    import os

    from panoptes_spark.streaming.reconcile_stream import (
        ExactlyOnceResourceStoreWriter,
    )

    schema = "rid string, resource_creation_timestamp double, val string"
    store = str(tmp_path / "store")
    os.makedirs(os.path.join(store, "data"))
    spark.createDataFrame(
        [("a", 30.0, "a-old"), ("b", 10.0, "b-old")], schema
    ).write.parquet(os.path.join(store, "data", "legacy.parquet"))
    with open(os.path.join(store, "MANIFEST"), "w") as f:
        json.dump({"last_epoch": 0, "snapshot": "legacy.parquet"}, f)

    w = ExactlyOnceResourceStoreWriter(spark, store, identity_cols=["rid"])
    # incoming: 'a' older -> stored survives; 'b' absent -> deleted;
    # 'c' added
    w(
        spark.createDataFrame(
            [("a", 20.0, "a-new"), ("c", 20.0, "c-new")], schema
        ),
        epoch_id=1,
    )
    got = {(r.rid, r.val) for r in w.read().collect()}
    assert got == {("a", "a-old"), ("c", "c-new")}
    m = w.manifest()
    assert "__legacy__" not in m["scopes"] and "" not in m["scopes"]


def test_retired_files_never_orphaned(spark, tmp_path):
    """ADVICE r7 (low): GC runs BEFORE the manifest swap and survivors
    carry forward — at every commit boundary, every file under data/ is
    referenced by the manifest (scopes or retired); nothing can leak."""
    import pathlib

    from panoptes_spark.streaming.reconcile_stream import (
        ExactlyOnceResourceStoreWriter,
    )

    schema = "rid string, resource_creation_timestamp double, val string"
    store = str(tmp_path / "store")
    w = ExactlyOnceResourceStoreWriter(spark, store, identity_cols=["rid"])
    for e in range(4):
        w(
            spark.createDataFrame([("a", float(10 + e), f"v{e}")], schema),
            epoch_id=e,
        )
        m = w.manifest()
        referenced = set(m["scopes"].values()) | set(m["retired"])
        on_disk = {p.name for p in pathlib.Path(store, "data").iterdir()}
        assert on_disk <= referenced, (e, on_disk - referenced)
    assert {r.val for r in w.read().collect()} == {"v3"}
