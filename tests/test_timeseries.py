"""resample_ffill / gap_report / zscore_anomalies
(operators/timeseries.py) — fill semantics, staleness cap, gap counting,
self-excluding z baseline, and plan shape (keyed windows only — no
unpartitioned window, no join explosion). Cross-engine value checks run
in the gates (`w9_resample_ffill`, `w10_gap_report`,
`w11_zscore_anomaly`)."""

import math

from panoptes_spark.operators.timeseries import (
    gap_report,
    resample_ffill,
    zscore_anomalies,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "k string, ts_ms long, value double")


def test_resample_grid_fill_and_staleness_cap(spark):
    pts = _pts(
        spark,
        [
            ("a", 0, 1.0),
            ("a", 5, 2.0),     # same bucket as ts=0 at step 10 -> max = 2.0
            ("a", 40, 7.0),    # buckets 10,20,30 are gaps
            ("b", 100, 5.0),   # single-sample series -> single-bucket grid
        ],
    )
    out = {
        (r.k, r.bucket_ms): r
        for r in resample_ffill(
            pts, by=["k"], step_ms=10, max_fill_steps=2
        ).collect()
    }
    assert len(out) == 6  # a: buckets 0..40, b: bucket 100
    a0 = out[("a", 0)]
    assert (a0.value, a0.n_obs, a0.filled, a0.fill_age_ms) == (2.0, 2, False, 0)
    # fill carries for up to 2 steps...
    assert (out[("a", 10)].value, out[("a", 10)].filled) == (2.0, True)
    assert out[("a", 20)].fill_age_ms == 20
    # ...and goes stale (NULL) beyond the cap
    a30 = out[("a", 30)]
    assert a30.value is None and a30.fill_age_ms is None and a30.filled
    assert out[("a", 40)].value == 7.0
    assert out[("b", 100)].value == 5.0


def test_gap_report_counts_and_stale_flag(spark):
    pts = _pts(
        spark,
        [
            ("a", 0, 0.0), ("a", 10, 0.0), ("a", 200, 0.0),  # one gap of 190
            ("b", 0, 0.0),                                    # single sample
            ("c", 990, 0.0), ("c", 1000, 0.0),                # corpus "now"=1000
        ],
    )
    out = {r.k: r for r in gap_report(pts, by=["k"], threshold_ms=100).collect()}
    assert (out["a"].n_obs, out["a"].n_gaps, out["a"].max_gap_ms) == (3, 1, 190)
    assert out["a"].stale  # last seen 200, now 1000
    assert (out["b"].n_gaps, out["b"].max_gap_ms, out["b"].stale) == (0, None, True)
    assert (out["c"].n_gaps, out["c"].stale) == (0, False)


def test_zscore_excludes_self_and_flags_spike(spark):
    # 10 calm samples then a spike: the spike's own value must not inflate
    # its baseline (frame is N PRECEDING .. 1 PRECEDING)
    rows = [("a", i * 10, 100.0 + (i % 2)) for i in range(10)]
    rows.append(("a", 100, 500.0))
    out = sorted(
        zscore_anomalies(
            _pts(spark, rows), by=["k"], window_n=20, z_threshold=3.0
        ).collect(),
        key=lambda r: r.ts_ms,
    )
    assert [r.anomaly for r in out[:10]] == [False] * 10
    spike = out[-1]
    assert spike.anomaly and spike.n_baseline == 10 and spike.z > 3.0
    # first row has no baseline; second has n=1 -> both NULL z, not flagged
    assert out[0].z is None and out[1].z is None
    # hand-check z on the spike: baseline = 5x100.0 + 5x101.0
    mean = 100.5
    var = sum((v - mean) ** 2 for v in [100.0, 101.0] * 5) / 9
    assert math.isclose(spike.z, (500.0 - mean) / math.sqrt(var), rel_tol=1e-6)


def test_zscore_zero_variance_baseline_never_flags(spark):
    rows = [("a", i * 10, 7.0) for i in range(5)] + [("a", 50, 7.5)]
    out = sorted(
        zscore_anomalies(_pts(spark, rows), by=["k"], window_n=20).collect(),
        key=lambda r: r.ts_ms,
    )
    assert out[-1].z is None and not out[-1].anomaly


def test_plans_use_keyed_windows_only(spark):
    # (the gate-level audit in test_plan_audit.py re-checks these three as
    # queries() entries; this pins the operator API directly)
    import re

    pts = _pts(spark, [("a", 0, 1.0)])
    for df in (
        resample_ffill(pts, by=["k"], step_ms=10),
        gap_report(pts, by=["k"]),
        zscore_anomalies(pts, by=["k"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # a keyed Window line prints [exprs], [partition], [order]; an
        # unpartitioned one only [exprs], [order] — none of those allowed
        for line in plan.splitlines():
            if re.search(r"\bWindow\b \[", line) and "windowspecdefinition" in line:
                depth, groups = 0, 0
                for ch in line:
                    if ch == "[":
                        groups += depth == 0
                        depth += 1
                    elif ch == "]":
                        depth = max(0, depth - 1)
                assert groups >= 3, f"unpartitioned window: {line.strip()}"


def test_multires_rollup_tiers_merge_exactly(spark):
    """Coarse tiers computed from the finer tier equal the same tier
    computed directly from raw rows (mergeable-statistic invariant),
    and non-nesting spans are rejected."""
    import pytest as _pytest

    from panoptes_spark.operators.timeseries import multires_rollup

    rows = [
        # two 1m buckets inside one 10m bucket, plus a far-away bucket
        (10_000, "a", 1.25),
        (50_000, "a", 2.50),
        (70_000, "a", 4.00),
        (70_000, "b", 8.00),
        (3_700_000, "a", 16.00),
    ]
    e = spark.createDataFrame(rows, "ts_ms long, event_type string, value double")
    out = multires_rollup(e).collect()
    by = {(r.resolution, r.bucket_ms, r.key): r for r in out}

    fine_a = [by[("1m", 0, "a")], by[("1m", 60_000, "a")]]
    assert [r.n for r in fine_a] == [2, 1]
    mid_a = by[("10m", 0, "a")]
    assert mid_a.n == sum(r.n for r in fine_a) == 3
    assert mid_a.sum_value == sum(r.sum_value for r in fine_a) == 7.75
    assert mid_a.min_value == 1.25 and mid_a.max_value == 4.0
    hour_a0 = by[("1h", 0, "a")]
    assert (hour_a0.n, hour_a0.sum_value) == (3, 7.75)
    assert by[("1h", 3_600_000, "a")].sum_value == 16.0
    assert by[("10m", 0, "b")].n == 1
    # every tier present exactly once per (bucket, key)
    assert len(out) == len(by)

    with _pytest.raises(ValueError):
        multires_rollup(e, tiers_ms=(("1m", 60_000), ("7m", 420_001)))
