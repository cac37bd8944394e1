"""Per-gate profiling harness for the optimization rounds.

Usage: python tools/profile_gate.py <sf_dir> <gate> [<gate> ...]
       python tools/profile_gate.py <sf_dir> --plans-dir plans/r11 --suffix before <gate>...

For each gate: runs it twice (best-of-2, mirroring bench.py), reports
seconds AND the number of Spark jobs the run issued (the fixed-overhead
signal at small SF: a gate whose time is job-count-bound, not
data-bound, needs fewer actions/passes, not faster kernels), and
optionally writes ``<plans_dir>/<gate>_<suffix>.txt`` with the
``explain("formatted")`` physical plan.

Timing methodology matches bench.py (df.count() as the action) so the
numbers are comparable with BENCH_DETAIL.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from panoptes_spark.session import get_spark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("gates", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="panoptes_profile")
    sc = spark.sparkContext
    spark.read.parquet(os.path.join(args.sf_dir, "nation.parquet")).count()

    qs = entrymod.queries()
    from panoptes_spark.pipeline import dedup

    out = {}
    for name in args.gates:
        if name not in qs:
            print(f"# unknown gate {name}", file=sys.stderr)
            continue
        fn = qs[name]
        best, best_jobs, n = None, None, 0
        for _ in range(args.runs):
            sc.setJobDescription(f"profile:{name}")
            tracker = sc.statusTracker()
            jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            n = df.count()
            dt = time.time() - t0
            jobs_after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            njobs = jobs_after - jobs_before
            if best is None or dt < best:
                best, best_jobs = dt, njobs
            dedup.release_materialized()
            spark.catalog.clearCache()
            import gc

            gc.collect()
        sc.setJobDescription(None)
        out[name] = {"sec": round(best, 3), "jobs": best_jobs, "rows": n}
        print(
            f"# {name}: {n} rows in {best:.2f}s, {best_jobs} jobs",
            file=sys.stderr,
        )
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            dedup.release_materialized()
            spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
