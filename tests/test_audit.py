"""Data-quality audit (pipeline/audit.py) — constraint semantics on
hand-built violations, FK orphan counting, profile metrics, and the
one-scan plan shape. Cross-engine value checks run in the gates
(`dq_checks`, `dq_profile`)."""

import pytest

from panoptes_spark.pipeline.audit import (
    accepted_values,
    in_range,
    matches_regex,
    not_null,
    profile_columns,
    referential,
    run_checks,
    unique,
)


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "ok-1"),
            (2, "b", 250.0, "ok-2"),   # out of range
            (2, None, 50.0, "bad"),    # dup id, null cat, bad shape
            (4, "z", None, "ok-3"),    # cat not accepted; NULL val not a violation
        ],
        "id long, cat string, val double, tag string",
    )
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    return df, dim


def test_check_semantics(spark, frames):
    df, dim = frames
    out = {
        r.check: (r.n_violations, r.passed)
        for r in run_checks(
            df,
            [
                unique("id"),
                not_null("cat"),
                in_range("val", 0, 100),
                accepted_values("cat", ["a", "b"]),
                matches_regex("tag", "^ok-"),
                referential("cat", dim, "k"),
            ],
        ).collect()
    }
    assert out["unique"] == (1, False)
    assert out["not_null"] == (1, False)
    assert out["in_range"] == (1, False)        # NULL val is NOT a violation
    assert out["accepted_values"] == (1, False)  # NULL cat is NOT a violation
    assert out["matches_regex"] == (1, False)
    assert out["referential"] == (1, False)      # 'z' orphan; NULL ignored


def test_checks_preserve_order_and_pass_flag(spark, frames):
    df, dim = frames
    rows = (
        run_checks(df, [not_null("id"), referential("cat", dim, "k")])
        .orderBy("ord")
        .collect()
    )
    assert [(r.ord, r.check) for r in rows] == [(0, "not_null"), (1, "referential")]
    assert rows[0].passed and not rows[1].passed
    assert rows[1].target == "cat->k"


def test_profile_metrics_and_non_numeric(spark, frames):
    df, _ = frames
    prof = {r.col_name: r for r in profile_columns(df, ["val", "cat"]).collect()}
    v = prof["val"]
    assert (v.n_rows, v.n_null, v.n_distinct) == (4.0, 1.0, 3.0)
    assert (v.min_value, v.max_value) == (10.0, 250.0)
    c = prof["cat"]
    # non-numeric strings: NULL min/max, distinct still counted
    assert (c.n_null, c.n_distinct, c.min_value, c.max_value) == (1.0, 3.0, None, None)


def test_scan_checks_compile_to_single_aggregate(spark, frames):
    df, _ = frames
    plan = (
        run_checks(df, [not_null("id"), unique("id"), in_range("val", 0, 1)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all scan checks share one aggregate over one scan: a single scan
    # node, no join, no window
    assert plan.count("ExistingRDD") + plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_empty_inputs_rejected(spark, frames):
    df, _ = frames
    with pytest.raises(ValueError):
        run_checks(df, [])
    with pytest.raises(ValueError):
        profile_columns(df, [])
    with pytest.raises(ValueError):
        unique()
