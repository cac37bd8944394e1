"""Skew-aware join helper: salting for hot keys.

At 100 TB a handful of hot series/device keys can stall a shuffle join
(one reducer gets the hot key's entire partition). AQE's skew-join
splitting handles sort-merge joins automatically; salting is the explicit
tool for aggregations and for joins AQE can't split (e.g. bucketed or
storage-partitioned sides).

``salted_join``: the skewed (large) side gets a random salt 0..N-1 per
row; the small side is exploded N ways so every salted key finds its
match. Equivalent rows, N-way better balance on the hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` ⋈ ``small`` on ``on`` with per-row salting of the
    large side. ``small`` is replicated ``salt_buckets``× — keep it
    dim-sized."""
    lg = large.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    sm = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = lg.join(sm, on + ["__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 8
) -> DataFrame:
    """Two-phase count for skewed group keys: partial count per
    (key, salt), then final sum per key — the map-side-combine shape made
    explicit (useful when the agg is not algebraic for Catalyst)."""
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
        .groupBy(*key_cols, "__salt")
        .agg(F.count("*").alias("__n"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__n").alias("n"))
