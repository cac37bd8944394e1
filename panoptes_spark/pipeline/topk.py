"""Exact two-phase per-group top-k — the scalable form of
``row_number().over(partitionBy(group)) <= k``.

A single window keyed only by the group column serializes every group
into ONE task: a 5-language corpus caps/samples on 5 cores no matter how
many executors the cluster has — the r7 sf1 soak surfaced exactly this
(``cap_per_group``/``sample_per_group`` were the only gates whose
parallelism was group-cardinality-bounded). The fix is the standard
two-phase selection:

1. phase 1 ranks within (group, salt) — ``salt_buckets``-way parallel,
   salt = murmur3 of the row id so membership stays a pure function of
   row values (layout-independent);
2. phase 2 ranks the ≤ ``salt_buckets``·k survivors per group — a
   window over a bounded set, not the corpus.

EXACT because top-k under a total order is a selection: every row of the
global top-k is necessarily in its salt bucket's local top-k, and both
phases order by the same keys. Ties must be broken by a unique column
(include the id in ``order_cols``) or phase boundaries could differ —
same requirement the single-window form already had for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["topk_per_group"]

DEFAULT_SALT_BUCKETS = 64


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    id_col: str,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Keep the top ``k`` rows per group under ``order_cols`` (a TOTAL
    order — include ``id_col`` as the final tie-break)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    salted = df.withColumn(
        "__tpk_salt", F.pmod(F.hash(F.col(id_col)), F.lit(int(salt_buckets)))
    )
    w1 = Window.partitionBy(*group_cols, "__tpk_salt").orderBy(*order_cols)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        salted.withColumn("__tpk_r1", F.row_number().over(w1))
        .where(F.col("__tpk_r1") <= k)
        .withColumn("__tpk_r2", F.row_number().over(w2))
        .where(F.col("__tpk_r2") <= k)
        .drop("__tpk_salt", "__tpk_r1", "__tpk_r2")
    )
