"""Ordered-sequence funnel analysis over an event stream.

Classic product/ops analytic the telemetry warehouse runs next to
sessionization: of the keys that performed step 1, how many went on to
step 2 within the conversion window, then step 3, ... — each step
strictly AFTER the previous step's first occurrence.

Semantics (the standard "first-touch" funnel): per key, step 0 anchors
at the key's EARLIEST step-0 event; step i anchors at the earliest
step-i event strictly after step i-1's anchor and (optionally) within
``within_ms`` of it. A key that skips a step is NULL from that step on.

Spark-first design notes (100 TB):

- One keyed aggregate per step (min-timestamp with a conditional), each
  joined back on the same key — shuffle count is bounded by the number
  of steps, never by data order, and every shuffle reuses the key's
  hash partitioning. No window over the full event stream, no
  ``collect_list`` of per-key event arrays (which would buffer a hot
  key's whole history in one task).
- The step frames shrink monotonically (only keys that reached step
  i-1 are scanned for step i via the join), so later steps cost less,
  not more.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel"]


def funnel(
    events: DataFrame,
    by: list[str],
    steps: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    within_ms: int | None = None,
) -> DataFrame:
    """Per-key funnel timestamps: one row per key that performed step 0,
    with a ``step{i}_ts`` column per step (NULL once the chain breaks).

    ``within_ms`` bounds each step relative to the PREVIOUS step's
    anchor timestamp; None = unbounded.
    """
    if not by:
        raise ValueError("funnel requires non-empty `by` keys")
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")

    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(*by)
        .agg(F.min(ts_col).alias("step0_ts"))
    )
    for i, step in enumerate(steps[1:], start=1):
        prev = f"step{i - 1}_ts"
        cond = F.col(ts_col) > F.col(prev)
        if within_ms is not None:
            cond = cond & (F.col(ts_col) <= F.col(prev) + int(within_ms))
        nxt = (
            events.where(F.col(type_col) == step)
            .join(cur.select(*by, prev), by)
            .where(cond)
            .groupBy(*by)
            .agg(F.min(ts_col).alias(f"step{i}_ts"))
        )
        cur = cur.join(nxt, by, "left")
    return cur
