"""Spot-bench a subset of gates at any SF dir — the scale-exponent probe.

bench.py times the whole 131-query battery; this times just the named
gates (best-of-2, same discipline) so the worst-ratio tail can be
re-measured at sf3 without paying for the full battery:

    python tools/spotbench.py /root/repo/testdata_sf3 \
        dedup_simhash_pairs ann_lsh_topk decontaminate \
        curation_e2e media_audio_decode fuzzy_join

Prints one JSON line {"sf_dir": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from panoptes_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: spotbench.py <sf_dir> <gate> [gate ...]")
    spark = get_spark(app_name="spotbench")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {best:.2f}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
