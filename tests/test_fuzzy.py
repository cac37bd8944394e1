"""Two-table fuzzy join (pipeline/fuzzy.py) — match semantics, best-match
tie-break, combined bucket cap, API errors. Cross-engine value parity
runs in the `fuzzy_join` gate."""

import pytest

from panoptes_spark.pipeline.fuzzy import fuzzy_join

_BASE = "the quick brown fox jumps over the lazy dog near the old river bank"


def _docs(spark, rows, idc):
    return spark.createDataFrame(rows, f"{idc} long, text string")


def test_matches_near_duplicates_across_tables(spark):
    left = _docs(
        spark,
        [(1, _BASE), (2, "completely unrelated words about spark plans")],
        "lid",
    )
    right = _docs(
        spark,
        [
            (10, _BASE + " today"),   # near-dup of 1
            (11, "another disjoint document entirely different topic"),
        ],
        "rid",
    )
    out = fuzzy_join(left, right, "lid", "rid", threshold=0.5).collect()
    assert [(r.lid, r.rid) for r in out] == [(1, 10)]
    assert out[0].jaccard >= 0.5


def test_best_keeps_single_deterministic_match(spark):
    left = _docs(spark, [(1, _BASE)], "lid")
    right = _docs(
        spark,
        [(20, _BASE), (10, _BASE)],  # two identical candidates -> tie
        "rid",
    )
    out = fuzzy_join(left, right, "lid", "rid", threshold=0.5, keep="best").collect()
    # tie on jaccard=1.0 resolves to the LOWEST right id
    assert [(r.lid, r.rid, r.jaccard) for r in out] == [(1, 10, 1.0)]


def test_combined_bucket_cap_blocks_boilerplate(spark):
    # 30 identical docs on each side share every band bucket: 900 pairs
    # uncapped; the combined cap (l+r=60 > 40) drops the bucket entirely
    left = _docs(spark, [(i, _BASE) for i in range(30)], "lid")
    right = _docs(spark, [(100 + i, _BASE) for i in range(30)], "rid")
    capped = fuzzy_join(
        left, right, "lid", "rid", threshold=0.5, max_bucket_size=40
    )
    assert capped.count() == 0
    uncapped = fuzzy_join(
        left, right, "lid", "rid", threshold=0.5, max_bucket_size=None
    )
    assert uncapped.count() == 900


def test_api_errors(spark):
    df = _docs(spark, [(1, _BASE)], "doc_id")
    with pytest.raises(ValueError):
        fuzzy_join(df, df, "doc_id", "doc_id")
    with pytest.raises(ValueError):
        fuzzy_join(df, df, "a", "b", keep="top")
