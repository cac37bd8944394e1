"""First-touch funnel (operators/funnel.py) — anchor/ordering semantics,
conversion window, chain-break NULLs. Cross-engine parity runs in the
`w12_funnel` gate."""

import pytest

from panoptes_spark.operators.funnel import funnel


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k string, event_type string, ts_ms long")


def test_funnel_anchors_and_strict_order(spark):
    rows = [
        # u1: clean conversion; click BEFORE first view must not count
        ("u1", "click", 5),
        ("u1", "view", 10),
        ("u1", "click", 20),
        ("u1", "buy", 30),
        # u2: view only -> NULLs downstream
        ("u2", "view", 10),
        # u3: buy before click -> step2 NULL (strictly after step1)
        ("u3", "view", 10),
        ("u3", "buy", 15),
        ("u3", "click", 20),
        # u4: never viewed -> not in output at all
        ("u4", "click", 10),
    ]
    out = {
        r.k: (r.step0_ts, r.step1_ts, r.step2_ts)
        for r in funnel(
            _ev(spark, rows), by=["k"], steps=["view", "click", "buy"]
        ).collect()
    }
    assert out["u1"] == (10, 20, 30)
    assert out["u2"] == (10, None, None)
    assert out["u3"] == (10, 20, None)
    assert "u4" not in out and len(out) == 3


def test_funnel_window_bounds_each_step(spark):
    rows = [
        ("u1", "view", 0),
        ("u1", "click", 100),   # outside 50ms window of view
        ("u2", "view", 0),
        ("u2", "click", 40),
        ("u2", "buy", 85),      # within 50ms of click though 85ms after view
    ]
    out = {
        r.k: (r.step1_ts, r.step2_ts)
        for r in funnel(
            _ev(spark, rows),
            by=["k"],
            steps=["view", "click", "buy"],
            within_ms=50,
        ).collect()
    }
    assert out["u1"] == (None, None)
    assert out["u2"] == (40, 85)  # window is per-step, not from step 0


def test_funnel_api_errors(spark):
    df = _ev(spark, [("u1", "view", 0)])
    with pytest.raises(ValueError):
        funnel(df, by=[], steps=["a", "b"])
    with pytest.raises(ValueError):
        funnel(df, by=["k"], steps=["a"])
