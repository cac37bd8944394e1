"""Distributed BPE tokenizer training (pair-merge learning).

Learns byte-pair-encoding merges (Sennrich et al., 2016 — the GPT/Llama
tokenizer-training algorithm) over a Spark corpus.  The scale shape is
the one real BPE trainers use:

1. ONE corpus-proportional pass: whitespace-word counts
   (``groupBy(word).count()`` — map-side partial agg, one shuffle).
   100 TB of text collapses to a vocabulary-sized (word, freq) table.
2. Every merge round then runs over that dim-sized vocab table only:
   adjacent-symbol pair counts weighted by word freq (vocab-sized
   shuffle), a global argmax (``orderBy().limit(1)`` =
   TakeOrderedAndProject — k rows move, not the table), and a literal
   string replace to apply the merge.  No corpus re-scan, no Python.

Symbol sequences are encoded as a single string with each symbol wrapped
in \\x1c...\\x1d marker chars, so "apply merge (a, b)" is a *literal*
``replace(enc, enc(a)||enc(b), enc(ab))`` — left-to-right non-overlapping
replacement, which is exactly BPE's merge rule, and identical in Spark
and any SQL oracle engine (no regex, no lookarounds).  Input words are
pre-filtered to tokens without the marker chars (real trainers operate
on bytes; the marker pair is simply reserved).

Tie-break: highest pair count, then lexicographic (left, right) — fixed
so training is deterministic across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "word_counts",
    "encode_words",
    "bpe_train",
    "bpe_encode",
    "apply_merges_to_word",
    "SYM_L",
    "SYM_R",
]

SYM_L = "\x1c"
SYM_R = "\x1d"
END_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized pass: lowercased whitespace-word frequencies.
    Words containing the reserved marker chars are dropped."""
    w = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
        "word"
    )
    return (
        df.select(w)
        .where((F.col("word") != "") & ~F.col("word").rlike("[\x1c\x1d]"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def encode_words(words: DataFrame) -> DataFrame:
    """(word, freq) -> (enc, freq): each character becomes a bracketed
    symbol, plus the ``</w>`` end-of-word terminal."""
    enc = F.concat(
        F.regexp_replace(F.col("word"), "(.)", SYM_L + "$1" + SYM_R),
        F.lit(SYM_L + END_WORD + SYM_R),
    )
    return words.select(enc.alias("enc"), "freq")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    # zip_with over the two slices degrades to an empty pair list when a
    # word has fully merged into one symbol (slice length 0) — a
    # sequence(1, size-1) formulation would go DESCENDING there and
    # index out of bounds
    syms = vocab.withColumn(
        "syms",
        F.expr(f"regexp_extract_all(enc, '{SYM_L}[^{SYM_R}]*{SYM_R}', 0)"),
    )
    pairs = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1),"
        " slice(syms, 2, size(syms) - 1),"
        " (a, b) -> struct(a AS pa, b AS pb))"
    )
    return (
        syms.select(F.explode(pairs).alias("p"), "freq")
        .select("p.pa", "p.pb", "freq")
        .groupBy("pa", "pb")
        .agg(F.sum("freq").alias("cnt"))
    )


def _strip(sym: str) -> str:
    return sym.replace(SYM_L, "").replace(SYM_R, "")


def bpe_train(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (merge_round, left_sym, right_sym, pair_count), merge_round from 0.

    The driver loop runs one vocab-sized argmax per round (the standard
    trainer structure — merges are inherently sequential); each action is
    a TakeOrderedAndProject over the cached vocab, never a corpus scan.
    """
    vocab = encode_words(word_counts(df, text_col)).cache()
    merges: list[Row] = []
    pending = None  # parent cache awaiting the child's first fill
    try:
        for r in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("cnt"), F.asc("pa"), F.asc("pb"))
                .limit(1)
                .collect()
            )
            # that argmax was the first action over ``vocab`` and
            # filled its cache; the previous round's parent (kept
            # cached so the fill never recomputed) can go now. LAZY
            # handoff (r11): the previous eager count() per round
            # existed only to order this same fill — n_merges extra
            # jobs for nothing.
            if pending is not None:
                pending.unpersist()
                pending = None
            if not top:
                break
            pa, pb, cnt = top[0]["pa"], top[0]["pb"], top[0]["cnt"]
            merged = SYM_L + _strip(pa) + _strip(pb) + SYM_R
            # Equivalence guard: the rank-priority encoder and the
            # in-order replace chain (the DuckDB oracle) agree only if
            # no two rounds yield the same surface symbol — (a,bc) and
            # (ab,c) both produce 'abc', after which a later merge CAN
            # recreate an earlier merge's pair and the two applications
            # diverge. Never fires on natural corpora (the earlier
            # merge's symbol has strictly higher count), so fail loudly
            # rather than silently drift.
            if any(
                SYM_L + m.left_sym + m.right_sym + SYM_R == merged
                for m in merges
            ):
                raise ValueError(
                    f"duplicate merged symbol {merged!r} at round {r}: "
                    "rank-priority apply would diverge from in-order "
                    "replace semantics"
                )
            nxt = vocab.select(
                F.call_function(
                    "replace", F.col("enc"), F.lit(pa + pb), F.lit(merged)
                ).alias("enc"),
                "freq",
            ).cache()
            pending, vocab = vocab, nxt
            merges.append(
                Row(
                    merge_round=r,
                    left_sym=_strip(pa),
                    right_sym=_strip(pb),
                    pair_count=int(cnt),
                )
            )
    finally:
        vocab.unpersist()
        if pending is not None:
            pending.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string, pair_count bigint",
    )


def apply_merges_to_word(word: str, ranks: dict, cache: dict) -> list:
    """Textbook BPE apply (rank-priority loop) for one word: start from
    characters + ``</w>``, repeatedly merge the lowest-training-rank
    adjacent pair present, each application one left-to-right
    non-overlapping sweep. Equivalent to applying the merge table
    in-order as literal replaces (the engine's previous compiled form
    and the DuckDB oracle's chain): a single sweep of merge k is
    already its fixpoint (the one-symbol replacement can never recreate
    its own two-symbol pattern), and a later merge can never create an
    earlier merge's pair (round j only introduces adjacencies involving
    its new symbol, which did not exist at round k < j)."""
    res = cache.get(word)
    if res is not None:
        return res
    syms = list(word)
    syms.append(END_WORD)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        prev = syms[0]
        for s in syms[1:]:
            rk = ranks.get((prev, s))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_pair = rk, (prev, s)
            prev = s
        if best_pair is None:
            break
        a, b = best_pair
        merged_sym = a + b
        out, i, n = [], 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(merged_sym)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    cache[word] = syms
    return syms


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: (id, tokens array<string>, n_tokens).

    The merge list is a model parameter (vocab-sized, like k-means
    centroids): it collects to the driver once and ships to executors
    in the task closure; application runs in an Arrow-batched
    ``mapInPandas`` stage with the rank-priority loop of
    :func:`apply_merges_to_word` plus a per-task distinct-word cache.
    Map-only — no shuffle, scan-speed regardless of corpus size — and,
    unlike the previous compiled replace-chain (an ``n_merges``-deep
    Catalyst expression), it survives a real 32k–50k-merge vocabulary:
    per-word cost is bounded by merges that actually FIRE
    (O(word_len²) pair lookups), independent of vocabulary size, and
    the plan stays constant-sized.
    """
    import re

    from pyspark.sql import types as T

    rows = merges.orderBy("merge_round").collect()
    ranks = {(r.left_sym, r.right_sym): i for i, r in enumerate(rows)}
    # same equivalence guard as bpe_train, for externally-supplied
    # merge tables: two rounds producing one surface symbol would make
    # rank-priority apply diverge from in-order replace semantics
    surfaces = [r.left_sym + r.right_sym for r in rows]
    if len(set(surfaces)) != len(surfaces):
        dup = next(s for s in surfaces if surfaces.count(s) > 1)
        raise ValueError(
            f"merge table contains duplicate merged symbol {dup!r}"
        )
    # Java-regex \s (ASCII class) to match the trainer's word_counts
    # split; empty + marker-char words dropped identically
    ws_re = re.compile(r"\s+", re.ASCII)
    bad_re = re.compile("[\x1c\x1d]")

    def run(batches):
        import pandas as pd

        cache: dict = {}  # distinct-word memo, lives for the whole task
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                words = ws_re.split((text or "").strip().lower())
                doc: list = []
                for w in words:
                    if w and not bad_re.search(w):
                        doc.extend(apply_merges_to_word(w, ranks, cache))
                toks.append(doc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("tokens", T.ArrayType(T.StringType()), False),
            T.StructField("n_tokens", T.LongType(), False),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
