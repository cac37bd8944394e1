"""Property-based differentials for the temporal joins and chunking.

Each compares the distributed implementation against an independent
sequential reference on random inputs: asof_join vs pandas.merge_asof
(an entirely separate engine's implementation of as-of semantics),
interval_join vs a brute-force double loop, chunk_documents vs the
textbook stride loop.
"""

import pytest

from hypothesis import given, settings, strategies as st

from panoptes_spark.operators.temporal import asof_join, interval_join

_TS = st.integers(min_value=0, max_value=500)
_KEY = st.sampled_from(["a", "b"])


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=12, unique=True)
    )
    right = draw(
        st.lists(st.tuples(_KEY, _TS), min_size=0, max_size=12, unique=True)
    )
    return left, right


@settings(max_examples=12, deadline=None)
@given(asof_case())
def test_asof_matches_pandas_merge_asof(spark, case):
    import pandas as pd

    left, right = case
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k string, ts_ms long, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, t, float(t) / 2) for (k, t) in right] or [("zz", -1, 0.0)],
        "k string, ts_ms long, v double",
    )
    got = {
        (r.k, r.ts_ms): (r.matched_ts_ms, r.matched_v)
        for r in asof_join(ldf, rdf, by=["k"], right_cols=["v"]).collect()
    }

    lp = pd.DataFrame(left, columns=["k", "ts_ms"]).sort_values("ts_ms")
    rp = pd.DataFrame(
        [(k, t, float(t) / 2) for (k, t) in right] or [("zz", -1, 0.0)],
        columns=["k", "ts_ms", "v"],
    ).sort_values("ts_ms")
    merged = pd.merge_asof(
        lp, rp, on="ts_ms", by="k", direction="backward", suffixes=("", "_r")
    )
    for _, row in merged.iterrows():
        want_v = None if pd.isna(row["v"]) else row["v"]
        assert got[(row["k"], row["ts_ms"])][1] == want_v


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=10, unique=True),
    st.lists(
        st.tuples(_KEY, _TS, st.integers(min_value=1, max_value=150)),
        min_size=1,
        max_size=8,
    ),
)
@pytest.mark.slow
def test_interval_join_matches_bruteforce(spark, pts, ivs):
    pdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(pts)],
        "k string, ts_ms long, pid long",
    )
    idf = spark.createDataFrame(
        [(k, s, s + d, i) for i, (k, s, d) in enumerate(ivs)],
        "k string, start_ms long, end_ms long, iid long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(pdf, idf, by=["k"], bin_ms=37).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, (pk, pt) in enumerate(pts)
        for ii, (ik, s, d) in enumerate(ivs)
        if pk == ik and s <= pt < s + d
    )
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=0, max_value=60),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=10),
)
def test_chunking_matches_stride_loop(spark, n_words, max_tokens, overlap):
    from panoptes_spark.pipeline.text import chunk_documents

    if overlap >= max_tokens:
        overlap = max_tokens - 1
    words = [f"w{i}" for i in range(n_words)]
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {
        r.chunk_id: r.chunk_text.split(" ")
        for r in chunk_documents(
            df, max_tokens=max_tokens, overlap=overlap
        ).collect()
    }

    # textbook stride loop over the same whitespace token list (split of
    # the empty string yields [''], matching Spark)
    toks = text.split(" ") if text else [""]
    stride = max_tokens - overlap
    n_chunks = max(1, -(-(len(toks) - overlap) // stride))
    want = {
        i: toks[i * stride : i * stride + max_tokens] for i in range(n_chunks)
    }
    assert got == want
    # coverage: every token index appears in at least one chunk
    covered = {i * stride + j for i in want for j in range(len(want[i]))}
    assert covered >= set(range(len(toks)))
