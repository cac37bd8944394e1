"""Skewed-source spotbench for the r10 de-skewed rank operators.

Remaps ~90% of the corpus's documents into ONE dominant source (the
realistic 100 TB shape: tens of sources, one giant crawl) and times

- ``perplexity_buckets`` over a synthetic scored frame (the operator
  under test is the bucket cut, not the LM), and
- ``frequent_ngrams`` (per-source top-n over the gram vocabulary),

printing wall seconds per operator. Under the pre-r10 implementations
both ran a ``row_number`` window partitioned by source — one task sorts
the dominant source's docs / gram vocabulary; post-r10 the cut is a
windowless grouped-quantile fold and the top-n is salted two-phase, so
no task's input scales with the dominant source.

Usage: python tools/spotbench_skew.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from panoptes_spark.pipeline import dedup  # noqa: E402
from panoptes_spark.pipeline.lm import perplexity_buckets  # noqa: E402
from panoptes_spark.pipeline.substrings import frequent_ngrams  # noqa: E402
from panoptes_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="spotbench_skew")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "text",
            F.when(F.col("doc_id") % 10 == 0, F.col("source"))
            .otherwise(F.lit("dominant"))
            .alias("source"),
        )
    )
    n = docs.count()
    n_dom = docs.where("source = 'dominant'").count()
    print(f"# {sf_dir}: {n} docs, dominant source holds {n_dom} ({n_dom/n:.0%})")
    scored = docs.select(
        "doc_id",
        F.round(F.pmod(F.xxhash64("doc_id"), F.lit(100000)) / 1e5, 6).alias(
            "avg_neg_logp"
        ),
    )

    def best(label, fn):
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn().count()
            times.append(time.time() - t0)
            dedup.release_materialized()
            spark.catalog.clearCache()
        print(f"{label}: best {min(times):.2f}s of {['%.2f' % t for t in times]}")

    best("perplexity_buckets", lambda: perplexity_buckets(scored, docs))
    best("frequent_ngrams", lambda: frequent_ngrams(docs))


if __name__ == "__main__":
    main()
