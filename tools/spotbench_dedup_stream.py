"""Write-volume measurement for the r9 NearDedupIndexSink redesign.

Drives the sink over N equal micro-batches and reports, per commit:

- ``new_bytes``   — bytes in files created by THIS commit (the
  append-only log's actual write volume);
- ``index_bytes`` — total index size after the commit;
- ``old_design``  — what the pre-r9 sink would have written for the
  same commit: a full new generation (signatures + pairs + components
  rewritten in full ≈ the index size), per micro-batch.

The O(batch) property shows as ``new_bytes`` staying ~flat while
``index_bytes`` (and the old design's per-commit write) grows linearly
with the number of committed batches.

Usage: python tools/spotbench_dedup_stream.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

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
    spark = get_spark(app_name="spotbench_dedup_stream")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = tempfile.mkdtemp(prefix="dedup_stream_vol_")
    sink = NearDedupIndexSink(base)
    prev = {}
    print(f"# {n} batches of documents @ {sf_dir}, base={base}")
    print("batch  new_bytes  index_bytes  old_design_bytes")
    for i in range(n):
        sink(docs.where(F.col("doc_id") % n == i), i)
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
            f"{i:>5}  {new_bytes:>9}  {total:>11}  {total - docs_bytes:>16}"
        )
        prev = cur
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
