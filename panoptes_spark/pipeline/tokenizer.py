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

__all__ = ["word_counts", "encode_words", "bpe_train", "SYM_L", "SYM_R"]

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
    try:
        for r in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("cnt"), F.asc("pa"), F.asc("pb"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            pa, pb, cnt = top[0]["pa"], top[0]["pb"], top[0]["cnt"]
            merged = SYM_L + _strip(pa) + _strip(pb) + SYM_R
            nxt = vocab.select(
                F.call_function(
                    "replace", F.col("enc"), F.lit(pa + pb), F.lit(merged)
                ).alias("enc"),
                "freq",
            ).cache()
            nxt.count()  # materialize before dropping the parent cache
            vocab.unpersist()
            vocab = nxt
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
    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: (id, tokens array<string>, n_tokens).

    The merge list is a model parameter (vocab-sized, like k-means
    centroids), so it collects to the driver and compiles into ONE
    map-only expression: per word, bracket-encode characters, apply
    every merge as a literal replace in training order, then unwrap the
    surviving symbols. No shuffle, no Python — encoding runs at scan
    speed regardless of corpus size; cost per word is
    O(n_merges × word_len), inherent to replace-based BPE application.
    """
    rows = merges.orderBy("merge_round").collect()
    # per-word encoding chain, built inside the lambda over `w` only —
    # never over corpus-derived expressions (see SCALE.md on lambda
    # bodies)
    expr = (
        f"regexp_replace(w, '(.)', '{SYM_L}$1{SYM_R}')"
        f" || '{SYM_L}{END_WORD}{SYM_R}'"
    )
    def _q(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    for r in rows:
        find = SYM_L + r.left_sym + SYM_R + SYM_L + r.right_sym + SYM_R
        repl = SYM_L + r.left_sym + r.right_sym + SYM_R
        expr = f"replace({expr}, '{_q(find)}', '{_q(repl)}')"
    unwrap = (
        f"transform(regexp_extract_all({expr}, '{SYM_L}[^{SYM_R}]*{SYM_R}', 0),"
        " s -> substring(s, 2, length(s) - 2))"
    )
    words = (
        f"filter(split(lower(trim({text_col})), '\\\\s+'),"
        f" w -> w <> '' AND w NOT RLIKE '[{SYM_L}{SYM_R}]')"
    )
    tokens = f"flatten(transform({words}, w -> {unwrap}))"
    return df.select(
        F.col(id_col),
        F.expr(tokens).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens").cast("long"))
