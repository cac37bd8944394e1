"""asof_join / interval_join (operators/temporal.py) — semantics, plan
shape (single shuffle, no pair-exploding join), and direction/tolerance
edges. The cross-engine check against DuckDB's native ASOF JOIN runs in
the gate (`j8_asof_align`, `j9_interval_join`)."""

from pyspark.sql import functions as F

from panoptes_spark.operators.temporal import asof_join, interval_join


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [("u1", 100, "a"), ("u1", 200, "b"), ("u1", 50, "c"), ("u2", 100, "d")],
        "k string, ts_ms long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 100, 1.0), ("u1", 150, 2.0), ("u3", 10, 9.0)],
        "k string, ts_ms long, v double",
    )
    return left, right


def test_asof_backward_with_ties(spark):
    left, right = _asof_fixture(spark)
    out = {
        (r.k, r.ts_ms): (r.matched_ts_ms, r.matched_v, r.staleness_ms)
        for r in asof_join(left, right, by=["k"]).collect()
    }
    assert out[("u1", 100)] == (100, 1.0, 0)      # tie: >= includes equal ts
    assert out[("u1", 200)] == (150, 2.0, 50)     # most recent, not first
    assert out[("u1", 50)] == (None, None, None)  # nothing at-or-before
    assert out[("u2", 100)] == (None, None, None)  # key never on right


def test_asof_forward(spark):
    left, right = _asof_fixture(spark)
    out = {
        (r.k, r.ts_ms): (r.matched_ts_ms, r.staleness_ms)
        for r in asof_join(left, right, by=["k"], direction="forward").collect()
    }
    assert out[("u1", 100)] == (100, 0)   # tie eligible forward too
    assert out[("u1", 50)] == (100, 50)   # earliest at-or-after
    assert out[("u1", 200)] == (None, None)


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _asof_fixture(spark)
    out = {
        (r.k, r.ts_ms): r.matched_ts_ms
        for r in asof_join(left, right, by=["k"], tolerance_ms=20).collect()
    }
    assert out[("u1", 100)] == 100
    assert out[("u1", 200)] is None  # staleness 50 > 20


def test_asof_plan_single_shuffle_no_join(spark):
    left, right = _asof_fixture(spark)
    plan = (
        asof_join(left, right, by=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 1  # one shuffle on the key


def test_interval_join_containment(spark):
    pts = spark.createDataFrame(
        [("u1", 0, 1), ("u1", 999, 2), ("u1", 1000, 3), ("u1", 5000, 4)],
        "k string, ts_ms long, pid long",
    )
    iv = spark.createDataFrame(
        [("u1", 10, 0, 1000), ("u1", 11, 500, 6000), ("u2", 12, 0, 10000)],
        "k string, iid long, start_ms long, end_ms long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(pts, iv, by=["k"], bin_ms=100).collect()
    )
    # [start, end): ts=1000 excluded from iid=10, included in iid=11
    assert got == [(1, 10), (2, 10), (2, 11), (3, 11), (4, 11)]


def test_interval_join_no_dup_across_bins(spark):
    # interval spans many bins; each point still matches exactly once
    pts = spark.createDataFrame([("k", 250, 1)], "k string, ts_ms long, pid long")
    iv = spark.createDataFrame(
        [("k", 7, 0, 1000)], "k string, iid long, start_ms long, end_ms long"
    )
    rows = interval_join(pts, iv, by=["k"], bin_ms=10).collect()
    assert len(rows) == 1


def test_interval_join_max_bins_guard(spark):
    pts = spark.createDataFrame([("k", 5, 1)], "k string, ts_ms long, pid long")
    iv = spark.createDataFrame(
        [("k", 7, 0, 10_000_000)], "k string, iid long, start_ms long, end_ms long"
    )
    # degenerate month-long interval dropped by the fan-out guard
    assert interval_join(pts, iv, by=["k"], bin_ms=10, max_bins=100).count() == 0


def test_pit_features_matches_chained_asof(spark):
    """The single-shuffle multi-feature PIT join returns exactly what
    two chained asof_joins return, including tolerance nulls and
    equal-ts inclusion — and its plan carries ONE hash Exchange of the
    long relation (a chained as-of pays one per feature)."""
    from panoptes_spark.operators.temporal import asof_join, pit_features

    labels = spark.createDataFrame(
        [(1, 100, 5000), (1, 101, 10_000), (2, 102, 7000), (3, 103, 1000)],
        "user_id long, event_id long, ts_ms long",
    )
    clicks = spark.createDataFrame(
        [(1, 4000, 1.5), (1, 10_000, 2.5), (2, 1000, 3.0)],
        "user_id long, ts_ms long, value double",
    )
    views = spark.createDataFrame(
        [(1, 9000, 7.0), (2, 6999, 8.0)],
        "user_id long, ts_ms long, value double",
    )
    tol = 5000
    out = pit_features(
        labels,
        {"click_value": clicks, "view_value": views},
        by=["user_id"],
        tolerance_ms=tol,
    )
    got = {r.event_id: r for r in out.collect()}
    assert len(got) == 4

    ref = labels
    for name, feat in (("click_value", clicks), ("view_value", views)):
        ref = asof_join(
            ref, feat.withColumnRenamed("value", name),
            by=["user_id"], right_cols=[name], tolerance_ms=tol,
            prefix=f"m_{name}_",
        ).drop(f"m_{name}_ts_ms").withColumnRenamed(
            f"m_{name}_{name}", name
        ).withColumnRenamed("staleness_ms", f"{name}_staleness_ms")
    want = {r.event_id: r for r in ref.collect()}
    for eid, r in got.items():
        wr = want[eid]
        for c in ("click_value", "click_value_staleness_ms",
                  "view_value", "view_value_staleness_ms"):
            assert getattr(r, c) == getattr(wr, c), (eid, c, r, wr)
    # spot-check semantics: equal-ts click (user 1 @10000) IS seen;
    # user 2's view at 6999 is 1ms before the 7000 label; user 3 has
    # nothing at-or-before
    assert got[101].click_value == 2.5
    assert got[101].click_value_staleness_ms == 0
    assert got[102].view_value == 8.0 and got[102].view_value_staleness_ms == 1
    assert got[103].click_value is None and got[103].view_value is None

    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # AdaptiveSparkPlan prints final THEN initial plan: count only the
    # final section (the initial copy would double-count every node)
    final = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", final)) == 1, plan
