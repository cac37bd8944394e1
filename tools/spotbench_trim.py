"""Spotbench for the r9 trim_duplicated_spans linearization.

Worst case for the old kept-token filter: boilerplate-heavy documents
where (nearly) EVERY k-gram window is corpus-duplicated — the per-token
``exists`` scan over all duplicated windows then costs
O(n_tokens × n_windows) per document, quadratic in document length.
The r9 interval-merge + gap-flatten formulation is O(n + intervals).

This script builds that synthetic (docs that are one boilerplate
sentence repeated, so every window repeats corpus-wide), runs the
CURRENT operator, and an inline replica of the OLD quadratic filter,
printing both wall times. Usage:

    python tools/spotbench_trim.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from panoptes_spark.pipeline.substrings import (  # noqa: E402
    _toks,
    trim_duplicated_spans,
)
from panoptes_spark.session import get_spark  # noqa: E402

_K = 8


def old_trim(df, id_col="doc_id", text_col="text", k=_K, min_count=2):
    """The pre-r9 formulation: per-token exists() over every dup window."""
    toks = df.select(F.col(id_col).alias("id"), _toks(text_col).alias("t"))
    grams = toks.where(F.size("t") >= k).select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) - {k}),"
                f" i -> substring(md5(concat_ws(' ', slice(t, i + 1, {k}))), 1, 16))"
            )
        ).alias("pos", "gh"),
    )
    counts = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
    starts = (
        grams.join(counts.where(F.col("cnt") >= min_count).select("gh"), "gh")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
    )
    kept = (
        f"filter(sequence(0, size(t) - 1),"
        f" i -> ps IS NULL OR NOT exists(ps, p -> i >= p AND i < p + {k}))"
    )
    return (
        toks.join(starts, "id", "left")
        .withColumn("__kept", F.expr(kept))
        .select(
            F.col("id").alias(id_col),
            F.expr(
                "concat_ws(' ', transform(__kept, i -> element_at(t, i + 1)))"
            ).alias("clean_text"),
            F.size("t").alias("n_tokens"),
            (F.size("t") - F.size("__kept")).alias("n_removed"),
        )
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_tok = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="spotbench_trim")
    # every doc = the same 10-token sentence repeated -> every k-gram
    # window is duplicated corpus-wide (ps covers the whole doc)
    sentence = "the quick brown fox jumps over the lazy sleeping dog"
    reps = n_tok // 10
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.array_repeat(F.lit(sentence), reps),
        ).alias("text"),
    )
    docs = docs.localCheckpoint(eager=True)  # exclude synthesis cost

    results = {}
    for label, fn in (("new_linear", trim_duplicated_spans), ("old_quadratic", old_trim)):
        t0 = time.time()
        out = fn(docs)
        agg = out.agg(
            F.sum("n_removed").alias("rm"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        dt = time.time() - t0
        results[label] = dt
        print(
            f"{label}: {dt:.2f}s  docs={agg['n']} removed_tokens={agg['rm']}"
        )
    print(
        f"speedup (old/new): {results['old_quadratic'] / results['new_linear']:.1f}x"
        f"  at {n_docs} docs x {reps * 10} tokens, every window duplicated"
    )


if __name__ == "__main__":
    main()
