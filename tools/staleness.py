"""Recompute per-gate driver-sample staleness FROM THE ARTIFACTS.

For every gate in the current ``__spark_entry__.queries()`` registry,
report the highest round whose committed ``CORRECTNESS_r*.json`` holds a
row for it, the staleness in rounds, and — by running the same registry
ordering the driver will see — which gates the NEXT round's 50-entry
prefix sample covers. This is the committed recomputation SOAK's
staleness claim must match (r9 verdict: the claimed "~3-round period"
did not match the artifacts).

Usage: python tools/staleness.py [sample_size]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def main():
    sample = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = list(entry.queries())
    last = entry._last_sampled_rounds()
    rounds = sorted({r for r in last.values()})
    current = max(rounds) if rounds else 0
    print(f"# registry: {len(names)} gates; artifacts through round {current}")
    hist: dict[int, int] = {}
    for g in names:
        hist[last.get(g, 0)] = hist.get(last.get(g, 0), 0) + 1
    for r in sorted(hist):
        label = "never" if r == 0 else f"r{r}"
        print(f"last sampled {label:>5}: {hist[r]:>3} gates")
    stale = sorted(
        (g for g in names if current - last.get(g, 0) > 3),
        key=lambda g: last.get(g, 0),
    )
    print(f"\n>3 rounds without a CORRECTNESS row: {len(stale)}")
    for g in stale:
        print(f"  {g} (last r{last.get(g, 0)})")
    prefix = set(names[:sample])
    nxt = current + 1
    post = {g: (nxt if g in prefix else last.get(g, 0)) for g in names}
    still = sorted(
        (g for g in names if nxt - post[g] > 3), key=lambda g: post[g]
    )
    print(
        f"\nnext round's {sample}-entry prefix covers the head + stalest;"
        f" after it, >3 rounds stale: {len(still)}"
    )
    for g in still:
        print(f"  {g} (last r{post[g]})")


if __name__ == "__main__":
    main()
