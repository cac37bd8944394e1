"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

Standard training-data hygiene (the GPT-3/PaLM-style 8-to-13-gram overlap
rule): any document containing an n-gram that also appears in a held-out
benchmark is contaminated and must be dropped or scrubbed before training.

Scale shape: the benchmark side is tiny (benchmarks are MBs; the corpus is
100 TB), so its distinct n-gram hash set broadcasts and the membership
probe costs the corpus **zero shuffles** — n-gram explosion is map-side,
the broadcast semi-join filters in place, and per-document dedup of shared
grams happens AFTER the broadcast filter (count_distinct over hits), so
the only shuffle carries the (rare) contaminated grams, never the corpus
gram set. N-grams are md5-hashed before the join so shuffle/broadcast
width is 32 bytes per gram regardless of n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngram_hashes(df: DataFrame, text_col: str, id_col: str | None, n: int) -> DataFrame:
    from .dedup import spread_for_compute

    # the md5-per-gram explosion is the expensive per-row compute —
    # spread a single-row-group scan so it parallelizes (no-op on
    # well-split input)
    df = spread_for_compute(df)
    # let-bind the tokenization via a one-element transform so the regex
    # split runs ONCE per row (referencing it inline would re-evaluate it
    # in the guard, the sequence bound, and every slice — see the
    # expression-duplication note on schedule.mmh3_sql_expr)
    words = f"filter(split(lower({text_col}), '[^a-z]+'), w -> w <> '')"
    guarded = (
        f"transform(array({words}), ws ->"
        f" CASE WHEN size(ws) >= {n} THEN"
        f"  transform(sequence(1, size(ws) - {n - 1}),"
        f"   i -> md5(concat_ws(' ', slice(ws, i, {n}))))"
        f" ELSE array() END)[0]"
    )
    cols = [F.col(id_col)] if id_col else []
    return df.select(*cols, F.explode(F.expr(guarded)).alias("gram_hash"))


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_shared) for corpus documents sharing >= 1 word ``n``-gram
    with the benchmark. ``n_shared`` counts distinct shared n-grams.

    Corpus grams are NOT pre-deduped — that would shuffle every gram in
    the corpus; instead the broadcast join filters first and the distinct
    count collapses repeats among the surviving (rare) hits."""
    bench_grams = _ngram_hashes(
        benchmark, benchmark_text_col or text_col, None, n
    ).dropDuplicates(["gram_hash"])
    corpus_grams = _ngram_hashes(corpus, text_col, id_col, n)
    hits = corpus_grams.join(F.broadcast(bench_grams), "gram_hash", "inner")
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram_hash").alias("n_shared")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus minus contaminated documents (broadcast anti-join; the
    whole operation adds no shuffle to the corpus scan)."""
    bench_grams = _ngram_hashes(benchmark, text_col, None, n).dropDuplicates(
        ["gram_hash"]
    )
    corpus_grams = _ngram_hashes(corpus, text_col, id_col, n)
    contaminated = (
        corpus_grams.join(F.broadcast(bench_grams), "gram_hash", "inner")
        .select(id_col)
        .dropDuplicates([id_col])
    )
    return corpus.join(contaminated, id_col, "left_anti")
