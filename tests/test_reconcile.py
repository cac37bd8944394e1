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
