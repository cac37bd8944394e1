"""Reconciliation tests mirroring the reference's
tests/test_resources/input/resource_{one,one_updated,two}.json scenarios."""

from panoptes_spark.operators.reconcile import apply_reconciliation, reconcile


def df_from(spark, rows):
    return spark.createDataFrame(rows, "rid string, ts double, val string")


def test_reconcile_actions(spark):
    cur = df_from(spark, [
        ("a", 10.0, "cur-a"),   # in both, older -> update
        ("b", 99.0, "cur-b"),   # in both, newer -> skip_update
        ("c", 10.0, "cur-c"),   # only current, old -> delete
        ("d", 99.0, "cur-d"),   # only current, newer than set ts -> keep_newer
    ])
    inc = df_from(spark, [
        ("a", 20.0, "inc-a"),
        ("b", 20.0, "inc-b"),
        ("e", 20.0, "inc-e"),   # only incoming -> add
    ])
    plan = reconcile(cur, inc, incoming_set_ts=50.0,
                     identity_cols=["rid"], ts_col="ts")
    actions = {r.rid: r.action for r in plan.collect()}
    assert actions == {"a": "update", "b": "skip_update", "c": "delete",
                       "d": "keep_newer", "e": "add"}

    state = apply_reconciliation(cur, inc, 50.0, ["rid"], "ts")
    rows = {r.rid: (r.ts, r.val) for r in state.collect()}
    assert rows == {
        "a": (20.0, "inc-a"),   # updated
        "b": (99.0, "cur-b"),   # kept (stored newer)
        "d": (99.0, "cur-d"),   # delete suppressed
        "e": (20.0, "inc-e"),   # added
    }


# ---------------------------------------------------------------------------
# Replay of the reference's OWN reconciliation fixtures
# (/root/reference/tests/test_resources/input/resource_*.json) through the
# same consume-reconcile-store loop as resources/manager.py:46-142, asserting
# the store mutations the reference's test_resource_manager.py asserts.
# ---------------------------------------------------------------------------

import json
import os

import pytest

_INPUT = "/root/reference/tests/test_resources/input"

_needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(_INPUT), reason="reference fixtures not available"
)


def _load_set(spark, name):
    """One fixture file -> (resources DataFrame, set timestamp)."""
    with open(f"{_INPUT}/{name}") as f:
        doc = json.load(f)
    rows = [
        (
            r["resource_site"], r["resource_class"], r["resource_subclass"],
            r["resource_type"], r["resource_id"], r["resource_endpoint"],
            r["resource_creation_timestamp"], r["resource_plugin"],
            r["resource_metadata"],
        )
        for r in doc["resources"]
    ]
    schema = (
        "resource_site string, resource_class string, resource_subclass string,"
        " resource_type string, resource_id string, resource_endpoint string,"
        " resource_creation_timestamp double, resource_plugin string,"
        " resource_metadata map<string,string>"
    )
    return spark.createDataFrame(rows, schema), doc["resource_set_creation_timestamp"]


def _replay_sets(spark, names):
    """Feed fixture sets through reconciliation in order, like the
    manager's consumer loop; return the final store state rows."""
    store, _ = _load_set(spark, names[0])
    store = store.limit(0)  # empty store, same schema
    for name in names:
        incoming, set_ts = _load_set(spark, name)
        store = apply_reconciliation(store, incoming, set_ts)
    return store.collect()


@_needs_fixtures
def test_reference_fixture_initial_addition(spark):
    rows = _replay_sets(spark, ["resource_one.json"])
    assert len(rows) == 1
    r = rows[0]
    assert r.resource_id == "test_id_1"
    assert r.resource_creation_timestamp == 1526331404.49
    assert r.resource_metadata["test_metadata_key"] == "test_metadata_value"


@_needs_fixtures
def test_reference_fixture_updation(spark):
    rows = _replay_sets(spark, ["resource_one.json", "resource_one_updated.json"])
    assert len(rows) == 1
    assert rows[0].resource_creation_timestamp == 1526331464.49


@_needs_fixtures
def test_reference_fixture_stale_update_skipped(spark):
    # newer set first, then the stale one: stored ts must survive
    rows = _replay_sets(spark, ["resource_one_updated.json", "resource_one.json"])
    assert len(rows) == 1
    assert rows[0].resource_creation_timestamp == 1526331464.49


@_needs_fixtures
def test_reference_fixture_deletion(spark):
    # second set lacks test_id_1 and its set ts >= stored ts -> deleted
    rows = _replay_sets(spark, ["resource_one.json", "resource_two.json"])
    assert len(rows) == 1
    assert rows[0].resource_id == "test_id_2"
    assert rows[0].resource_endpoint == "test_endpoint_2"


def test_scd2_history_intervals(spark):
    """Intervals chain per identity (valid_to = next change, open tail),
    unchanged snapshots collapse, null attrs compare null-safely, and
    the plan shuffles once."""
    from panoptes_spark.operators.reconcile import scd2_history

    rows = [
        ("r1", 1, 100, "up"),
        ("r1", 2, 200, "up"),      # unchanged -> collapses into row 1
        ("r1", 3, 300, "down"),    # change
        ("r1", 4, 400, None),      # change to NULL
        ("r1", 5, 500, None),      # NULL == NULL -> collapses
        ("r2", 6, 100, "up"),
    ]
    df = spark.createDataFrame(rows, "rid string, eid long, ts_ms long, status string")
    out = scd2_history(df, ["rid"], ["status"], "ts_ms", ["eid"])
    # plan BEFORE any action: post-collect AQE toString() echoes the
    # initial plan a second time, double-counting Exchange lines
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    got = sorted(
        (r.rid, r.valid_from, r.valid_to, r.status, r.is_current)
        for r in out.collect()
    )
    assert got == [
        ("r1", 100, 300, "up", False),
        ("r1", 300, 400, "down", False),
        ("r1", 400, None, None, True),
        ("r2", 100, None, "up", True),
    ]
