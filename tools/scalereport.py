"""Scale-factor sweep: run a representative gate subset at sf0.001 /
0.01 / 0.1 and record wall-time ratios into SCALE.md.

The point is the SHAPE of the curve, not the absolute numbers: a gate
whose runtime is flat across 100x data is fixed-overhead-bound (JVM,
plan, model-parameter collect); one that grows ~linearly with rows is
scan/shuffle-bound and extrapolates to cluster scale by partition
count. Anything super-linear is a red flag the plan audit missed.

Usage: python tools/scalereport.py [--write]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from panoptes_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

# one representative per plan family (see SCALE.md's inventory)
GATES = [
    "p1_dsl_metadata_like",   # map-only filter, pushdown
    "f_scalar_functions",     # pure projection
    "a_pricing_summary",      # keyed aggregation
    "j1_enrichment_join",     # broadcast join
    "j6_rate_batch",          # keyed window
    "j5_reconcile_plan",      # full-outer reconcile
    "w5_scd2_history",        # SCD2 window
    "j8_asof_align",          # as-of union+window
    "dedup_exact",            # hash groupBy
    "dedup_minhash_pairs",    # banded equi-join
    "dedup_components",       # iterative label propagation
    "ann_ivf_topk",           # broadcast matmul + cell join
    "text_features",          # regex scan
    "line_dedup",             # line-hash groupBy + join
    "bpe_encode",             # Arrow map stage, model in closure
    "token_frequencies",      # corpus token count
    "dq_checks",              # single-scan constraint fold
    "w_sessionize_events",    # gap sessionization
    "pack_sequences",         # sharded running sum
    "dsl_metric_program",     # DSL compiler pivot
    "hybrid_search",          # two-leg retrieval + RRF fusion
    "leakage_safe_splits",    # components + murmur split
    "hybrid_search_ivf",      # dual fused pipelines + recall join (r6)
    "pq_encode",              # narrow Arrow PQ coding (r6)
    "ann_ivfpq_topk",         # cogrouped cell-pruned integer ADC (r6)
]


def main():
    write = "--write" in sys.argv
    spark = get_spark(app_name="scalereport")
    qs = entrymod.queries()
    # warmup
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").count()

    table: dict[str, dict[str, float]] = {}
    for name in GATES:
        fn = qs[name]
        table[name] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            table[name][sf] = round(best, 3)
            print(f"# {name} sf{sf}: {best:.2f}s", file=sys.stderr)

    lines = [
        "| Gate | sf0.001 | sf0.01 | sf0.1 | t(0.1)/t(0.001) | read |",
        "|---|---|---|---|---|---|",
    ]
    for name in GATES:
        t = table[name]
        a, c = t["0.001"], t["0.1"]
        ratio = round(c / a, 1) if a > 0 else float("inf")
        if ratio <= 2.0:
            verdict = "fixed-overhead-bound (plan/JVM/model dominates)"
        elif ratio <= 40.0:
            verdict = "sub-linear vs 100x rows — scan/shuffle amortized"
        elif ratio <= 150.0:
            verdict = "~linear in rows — partition-scalable"
        else:
            verdict = "SUPER-LINEAR — investigate"
        lines.append(
            f"| `{name}` | {a:.2f}s | {t['0.01']:.2f}s | {c:.2f}s "
            f"| {ratio}x | {verdict} |"
        )
    md = "\n".join(lines)
    print(md)
    print(json.dumps(table))

    if write:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE.md",
        )
        with open(path) as f:
            doc = f.read()
        marker = "## Scale-factor sweep (generated)"
        block = (
            f"{marker}\n\n100x data (sf0.001 -> sf0.1), local[32], "
            "best-of-2 per cell. Flat = fixed overhead; ~100x = "
            "row-linear (partition-scalable).\n\n" + md + "\n"
        )
        if marker in doc:
            head = doc.split(marker)[0]
            doc = head + block
        else:
            doc = doc.rstrip() + "\n\n" + block
        with open(path, "w") as f:
            f.write(doc)
        print(f"wrote sweep to {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
