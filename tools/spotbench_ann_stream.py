"""Per-commit seconds AND Spark-job count for the AnnIndexSink (r11 —
the `spotbench_dedup_stream` audit applied to the ANN side, r10 verdict
"What's wrong" #1).

Builds the IVF-PQ index over 3/4 of the embeddings corpus
(train_iters=0), then folds the remaining quarter through
``AnnIndexSink.__call__`` in N equal micro-batches, reporting per
commit: wall seconds, Spark jobs (job-group attribution), bytes of new
segment files, and total index bytes. The sink's per-commit work is the
batch's assignment+encoding (two broadcast joins and an Arrow pass) +
one cell-partitioned segment write + the atomic manifest swap — a
handful of jobs, batch-proportional by construction.

Usage: python tools/spotbench_ann_stream.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from panoptes_spark.pipeline.ann_index import build_ivfpq_index  # noqa: E402
from panoptes_spark.session import get_spark  # noqa: E402
from panoptes_spark.streaming.ann_stream import AnnIndexSink  # noqa: E402


def tree_bytes(base):
    total = 0
    for root, _dirs, files in os.walk(base):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="spotbench_ann_stream")
    sc = spark.sparkContext
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = tempfile.mkdtemp(prefix="ann_stream_vol_")
    t0 = time.time()
    build_ivfpq_index(
        emb.where("vec_id % 4 > 0"), base, m=8, n_codes=16,
        train_iters=0,
    )
    print(f"# build(3/4) {time.time() - t0:.2f}s @ {sf_dir}, base={base}")
    sink = AnnIndexSink(base)
    new = emb.where("vec_id % 4 = 0")
    prev_bytes = tree_bytes(base)
    print("batch     sec  jobs  new_bytes  index_bytes")
    for i in range(n):
        part = F.pmod(F.floor(F.col("vec_id") / 4).cast("bigint"), F.lit(n))
        group = f"ann-commit-{i}"
        sc.setJobGroup(group, f"ann sink commit {i}")
        t0 = time.time()
        sink(new.where(part == i), i)
        sec = time.time() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup("", "")
        cur = tree_bytes(base)
        print(
            f"{i:>5}  {sec:>6.2f}  {jobs:>4}  {cur - prev_bytes:>9}"
            f"  {cur:>11}"
        )
        prev_bytes = cur
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
