"""Unit tests for BPE tokenizer training and duplicated n-gram spans."""

import pytest

from pyspark.sql import functions as F

from panoptes_spark.pipeline.substrings import duplicated_ngram_spans
from panoptes_spark.pipeline.tokenizer import bpe_train


def _reference_bpe(word_freqs, n_merges):
    """Independent plain-python BPE (the textbook algorithm) for the
    differential check."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@pytest.mark.slow
def test_bpe_train_matches_reference_algorithm(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "the the the lower newer",
        "widest wide wide low new",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = bpe_train(spark, df, "text", n_merges=8).collect()

    freqs = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _reference_bpe(freqs, 8)

    assert [(r.left_sym, r.right_sym, r.pair_count) for r in got] == want
    assert [r.merge_round for r in got] == list(range(len(want)))


def test_bpe_merged_symbols_compose(spark):
    """Later rounds must merge already-merged symbols (multi-char units),
    not just single chars."""
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa aaaa")], "doc_id long, text string"
    )
    got = bpe_train(spark, df, "text", n_merges=3).collect()
    # round 0: (a, a) -> aa; round 1 over [aa, aa, </w>] ties (aa, aa)
    # with (aa, </w>) at count 4 and '</w>' sorts first; round 2 merges
    # the two-round-old symbol 'aa' with the merged 'aa</w>'
    assert (got[0].left_sym, got[0].right_sym) == ("a", "a")
    assert (got[1].left_sym, got[1].right_sym) == ("aa", "</w>")
    assert (got[2].left_sym, got[2].right_sym) == ("aa", "aa</w>")


def test_dup_spans_exact_coverage(spark):
    """Hand-checked interval union: doc 1 and doc 2 share one 3-gram in
    the middle; doc 3 is fully duplicated by doc 4."""
    d1 = "a b c SHARED1 SHARED2 SHARED3 x y z"
    d2 = "p q SHARED1 SHARED2 SHARED3 r s"
    d3 = "one two three four five"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d3)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in duplicated_ngram_spans(df, k=3).collect()
    }
    # d1: 9 tokens, 7 grams, 1 dup gram covering 3 tokens
    assert (out[1].n_grams, out[1].n_dup_grams, out[1].covered_tokens) == (
        7, 1, 3)
    # d3/d4: every gram duplicated; coverage = all 5 tokens
    for d in (3, 4):
        assert out[d].n_dup_grams == 3
        assert out[d].covered_tokens == 5
        assert out[d].dup_token_fraction == 1.0


def test_dup_spans_overlap_merging(spark):
    """Adjacent dup grams overlap; covered tokens must be the union, not
    k * n_dup_grams."""
    shared = "s1 s2 s3 s4"  # two overlapping 3-grams when duplicated
    df = spark.createDataFrame(
        [(1, f"a {shared} b"), (2, f"c {shared} d")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicated_ngram_spans(df, k=3).collect()}
    for d in (1, 2):
        assert out[d].n_dup_grams == 2
        assert out[d].covered_tokens == 4  # union of [1,4) and [2,5)


def test_dup_spans_short_docs_zero_grams(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, "x")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in duplicated_ngram_spans(df, k=3).collect()}
    assert out[1].n_grams == 0 and out[1].dup_token_fraction == 0.0
    assert out[2].n_grams == 0


def test_dup_spans_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string"
    )
    plan = duplicated_ngram_spans(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantize_roundtrip_and_recall(spark):
    """int8 codes must reconstruct within half a quantization step, and
    cosine top-1 on reconstructed vectors must agree with exact top-1 on
    well-separated clusters."""
    import random

    from panoptes_spark.pipeline.quantize import (
        dequantize_col, dim_stats_row, quantize_embeddings)

    rng = random.Random(7)
    centers = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0],
               [0.0, 0.0, 10.0, 0.0]]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    codes = quantize_embeddings(df, "vec_id", "embedding")
    stats = dim_stats_row(df, "embedding").collect()[0]
    recon = {
        r.vec_id: r.recon
        for r in codes.crossJoin(
            dim_stats_row(df, "embedding")
        ).select("vec_id", dequantize_col("codes").alias("recon")).collect()
    }
    orig = {r.vec_id: r.embedding for r in df.collect()}
    for d in range(4):
        step = (stats.maxs[d] - stats.mins[d]) / 255.0
        for vid, v in orig.items():
            assert abs(recon[vid][d] - v[d]) <= step / 2 + 1e-9

    # cluster membership survives quantization: nearest center of the
    # reconstruction equals nearest center of the original
    def nearest(v):
        return max(range(3), key=lambda j: sum(a * b for a, b in
                                               zip(v, centers[j])))
    for vid, v in orig.items():
        assert nearest(recon[vid]) == nearest(v)


def test_compaction_plan_invariants(spark):
    from panoptes_spark.pipeline.layout import plan_compaction

    rows = [("p1", f"f{i:02d}", b) for i, b in
            enumerate([900, 800, 300, 250, 200, 150, 100, 50])]
    rows += [("p2", "g1", 5000), ("p2", "g2", 10)]
    df = spark.createDataFrame(rows, "part string, path string, bytes long")
    plan = plan_compaction(df, target_bytes=1000)
    got = {(r.part, r.path): r.group_id for r in plan.collect()}

    # every file assigned; first group starts at 0 in each partition
    assert len(got) == len(rows)
    for part in ("p1", "p2"):
        assert min(g for (p, _), g in got.items() if p == part) == 0

    # cumulative rule: group bytes stay under target + one file
    import collections
    sizes = collections.defaultdict(int)
    by = dict(((p, f), b) for p, f, b in rows)
    for (p, f), g in got.items():
        sizes[(p, g)] += by[(p, f)]
    maxfile = max(b for _, _, b in rows)
    assert all(s <= 1000 + maxfile for s in sizes.values())

    # oversized single file isolates; the tiny file lands with it only
    # if the cumulative boundary allows (5000 fills groups 0-4, so g2
    # starts group 5)
    assert got[("p2", "g1")] == 0 and got[("p2", "g2")] == 5


def test_pagerank_matches_reference_power_iteration(spark):
    """Differential vs a plain-python integer power iteration on a small
    hand graph, plus sanity: the hub-pointed node outranks leaves."""
    from panoptes_spark.pipeline.graph import SCALE, pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank_scaled
           for r in pagerank(df, n_iter=3).collect()}

    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: SCALE // n for v in nodes}
    for _ in range(3):
        in_mass = {v: 0 for v in nodes}
        for s, d in edges:
            in_mass[d] += rank[s] // outdeg[s]
        rank = {v: ((15 * SCALE) // 100) // n + (85 * in_mass[v]) // 100
                for v in nodes}
    assert got == rank
    assert got["c"] > got["b"] > got["a"] == got["d"]


def test_pagerank_dangling_and_isolated_sources(spark):
    """Sources with no inbound edges keep the base rank; the sink gets
    everything (its outbound mass is dropped, documented)."""
    from panoptes_spark.pipeline.graph import pagerank

    df = spark.createDataFrame(
        [("x", "sink"), ("y", "sink")], "src string, dst string"
    )
    got = {r.node: r.rank_scaled for r in pagerank(df, n_iter=2).collect()}
    assert got["x"] == got["y"] < got["sink"]
    assert len(got) == 3


@pytest.mark.slow
def test_bpe_encode_applies_merges_in_order(spark):
    """Encoding with the learned table must reproduce the textbook
    apply-BPE result (greedy left-to-right per merge, training order)."""
    from panoptes_spark.pipeline.tokenizer import bpe_encode, bpe_train

    texts = ["low low lower lowest", "new newer newest low"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(spark, df, "text", n_merges=6)
    got = {r.doc_id: r.tokens for r in bpe_encode(df, merges).collect()}

    mlist = [(r.left_sym, r.right_sym)
             for r in merges.orderBy("merge_round").collect()]

    def apply_word(w):
        syms = list(w) + ["</w>"]
        for a, b in mlist:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for i, t in enumerate(texts):
        want = [s for w in t.split() for s in apply_word(w)]
        assert got[i] == want


def test_bpe_encode_survives_1000_merge_vocab(spark):
    """Scale gate for the Arrow-batched apply path: a realistic merge
    table (>=1000 chained merges, trained by a textbook driver-side BPE
    trainer) must encode in bounded time and byte-match the textbook
    in-order replace-chain application — the semantics the compiled
    expression (and the DuckDB oracle) implement. The old replace-chain
    plan could not build a 1000-deep Catalyst expression at all."""
    import random
    import time
    from collections import Counter

    from pyspark.sql import Row

    from panoptes_spark.pipeline.tokenizer import bpe_encode

    rng = random.Random(7)
    distinct = sorted(
        {
            "".join(rng.choice("abcdef") for _ in range(rng.randint(3, 12)))
            for _ in range(900)
        }
    )
    word_freqs = {w: rng.randint(1, 50) for w in distinct}

    # textbook trainer: max-count pair (lexicographic tie-break), each
    # merge applied to the vocab as one left-to-right sweep
    def sweep(syms, a, b):
        out, i, n = [], 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    vocab = {w: list(w) + ["</w>"] for w in word_freqs}
    mlist = []
    for _ in range(1200):
        counts = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        vocab = {w: sweep(s, *best) for w, s in vocab.items()}
        mlist.append(best)
    assert len(mlist) >= 1000

    docs = [
        (i, " ".join(rng.choice(distinct) for _ in range(40)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = spark.createDataFrame(
        [
            Row(merge_round=i, left_sym=a, right_sym=b, pair_count=1)
            for i, (a, b) in enumerate(mlist)
        ]
    )

    t0 = time.time()
    got = {r.doc_id: r.tokens for r in bpe_encode(df, merges).collect()}
    elapsed = time.time() - t0
    assert elapsed < 120, f"1000-merge encode took {elapsed:.0f}s"

    def chain_apply(w):
        syms = list(w) + ["</w>"]
        for a, b in mlist:
            syms = sweep(syms, a, b)
        return syms

    word_expected = {w: chain_apply(w) for w in distinct}
    for i, t in docs:
        want = [s for w in t.split() for s in word_expected[w]]
        assert got[i] == want, f"doc {i} diverged"
