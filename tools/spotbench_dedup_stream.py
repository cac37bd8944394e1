"""Write-volume AND per-commit-time measurement for the
NearDedupIndexSink (r9: O(batch) writes; r10: O(batch) compute).

Drives the sink over N equal micro-batches and reports, per commit:

- ``sec``         — wall seconds for THIS commit (the r10 property:
  flat as the index grows, because only the new batch bands and stored
  membership/counts join batch-proportionally — the r9 sink re-banded
  the whole signature corpus per commit, so its per-commit time grew
  with the index);
- ``new_bytes``   — bytes in files created by THIS commit (the
  append-only log's actual write volume);
- ``index_bytes`` — total index size after the commit;
- ``old_design``  — what the pre-r9 sink would have written for the
  same commit: a full new generation (signatures + pairs + components
  rewritten in full ≈ the index size), per micro-batch.

The O(batch) properties show as ``sec`` and ``new_bytes`` staying ~flat
while ``index_bytes`` grows linearly with the number of committed
batches. (First commit pays JVM/codegen warmup — compare from commit 1.)

Usage: python tools/spotbench_dedup_stream.py [sf_dir] [n_batches] [seeded]

``seeded`` mode is the measurement that actually exposes corpus-sized
per-commit work: batch 0 commits ~90% of the corpus in one build, then
the remaining docs arrive in n-1 SMALL equal batches — any O(index)
term in the commit path shows up directly as small-batch seconds
tracking the (large, fixed) index size instead of the batch size.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from panoptes_spark.session import get_spark  # noqa: E402
from panoptes_spark.streaming.dedup_stream import (  # noqa: E402
    NearDedupIndexSink,
)


def tree_sizes(base):
    out = {}
    for root, _dirs, files in os.walk(base):
        for f in files:
            if f.startswith("STATE.json") or f.endswith(".crc"):
                continue
            p = os.path.join(root, f)
            out[os.path.relpath(p, base)] = os.path.getsize(p)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    seeded = len(sys.argv) > 3 and sys.argv[3] == "seeded"
    spark = get_spark(app_name="spotbench_dedup_stream")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = tempfile.mkdtemp(prefix="dedup_stream_vol_")
    sink = NearDedupIndexSink(base)
    sink.profile = True  # per-section job-group accounting (r11)
    prev = {}
    mode = "seeded (batch0=90%, rest small)" if seeded else "equal"
    print(f"# {n} batches ({mode}) of documents @ {sf_dir}, base={base}")
    print("batch     sec  jobs  new_bytes  index_bytes  old_design_bytes")
    m = max(1, 10 * (n - 1))  # tail batches ~= corpus/10/(n-1) docs each
    sc = spark.sparkContext
    for i in range(n):
        if seeded:
            part = (
                F.col("doc_id") % 10 != 0 if i == 0
                else (F.col("doc_id") % 10 == 0)
                & (F.pmod(F.floor(F.col("doc_id") / 10), F.lit(n - 1)) == i - 1)
            )
        else:
            part = F.col("doc_id") % n == i
        # job COUNT per commit (r10 verdict: the sinks' fixed latency is
        # job-count, not data — dozens of small Spark jobs per commit);
        # counted by the sink's own per-section job groups
        t0 = time.time()
        sink(docs.where(part), i)
        sec = time.time() - t0
        jobs = sum(j for _s, j in sink.last_profile.values())
        cur = tree_sizes(base)
        new_bytes = sum(s for p, s in cur.items() if p not in prev)
        rewritten = [p for p in prev if cur.get(p) != prev[p]]
        assert not rewritten, f"files rewritten: {rewritten[:5]}"
        total = sum(cur.values())
        # the pre-r9 sink wrote a full generation per commit: all
        # signatures + all pairs + all components = ~the index minus the
        # retained docs (docs were per-batch in both designs)
        docs_bytes = sum(
            s for p, s in cur.items() if p.startswith("docs" + os.sep)
        )
        print(
            f"{i:>5}  {sec:>6.2f}  {jobs:>4}  {new_bytes:>9}  {total:>11}"
            f"  {total - docs_bytes:>16}"
        )
        breakdown = "  ".join(
            f"{name}={s:.2f}s/{j}j"
            for name, (s, j) in sink.last_profile.items()
        )
        print(f"       sections: {breakdown}")
        prev = cur
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
