"""Data-layout helpers: Z-order (Morton) interleaving for multi-column
locality.

``write_sorted_by`` (sources/text_corpus.py) gives single-key file
locality; when scans filter on TWO columns (device × time, user ×
day), sorting by either one alone leaves the other scattered. The
Z-order curve interleaves the bits of both keys so files cover compact
rectangles of the (x, y) space — the data-skipping layout technique
lakehouse engines expose as ``ZORDER BY``/liquid clustering — and a
plain range-sort by the Morton code then produces the clustered files.

The 16-bit interleave uses the classic magic-number spread (4 shift/mask
rounds per coordinate) — pure integer expressions, bit-exact on any
engine, so the oracle twin reproduces codes identically. Inputs mask to
their low 16 bits; scale/offset columns into that range first (e.g.
``(ts_ms div 3600000) % 65536`` for hourly buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "morton_code_sql",
    "add_morton_code",
    "zorder_export",
    "plan_compaction",
]

_SPREAD_ROUNDS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(expr: str, dialect: str) -> str:
    """Spread the low 16 bits of ``expr`` into even bit positions."""
    e = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_ROUNDS:
        if dialect == "spark":
            e = f"((({e} | shiftleft({e}, {shift})) & {mask}))"
        else:
            e = f"((({e} | ({e} << {shift})) & {mask}))"
    return e


def morton_code_sql(x_expr: str, y_expr: str, dialect: str) -> str:
    """SQL for the 32-bit Morton code of two 16-bit values; ``x`` takes
    the even bits, ``y`` the odd bits."""
    sx = _spread16(x_expr, dialect)
    sy = _spread16(y_expr, dialect)
    if dialect == "spark":
        return f"({sx} | shiftleft({sy}, 1))"
    return f"({sx} | ({sy} << 1))"


def add_morton_code(
    df: DataFrame, x_col: str, y_col: str, out_col: str = "zorder"
) -> DataFrame:
    return df.withColumn(
        out_col,
        F.expr(
            morton_code_sql(
                f"cast({x_col} as bigint)", f"cast({y_col} as bigint)", "spark"
            )
        ).cast("bigint"),
    )


def zorder_export(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    mode: str = "error",
) -> None:
    """Write ``df`` clustered on the Z-order curve of (x, y): range
    shuffle on the Morton code + local sorts — every file covers a
    compact rectangle of the key space, so a filter on EITHER column
    prunes most files via min/max stats."""
    out = add_morton_code(df, x_col, y_col, "__z")
    (
        out.repartitionByRange(int(n_files), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def plan_compaction(
    files: DataFrame,
    part_col: str = "part",
    path_col: str = "path",
    bytes_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction plan: assign every file to a rewrite group
    of ~``target_bytes`` within its table partition.

    Streaming ingestion and fine-grained partitioning leave 100 TB
    tables with millions of KiB-sized files; scans then pay per-file
    open/footer costs and lose row-group locality. The planner is the
    cheap half of compaction (the rewrite is a plain
    ``read.group.write``): files sort largest-first within their
    partition (first-fit-decreasing flavor) and a running byte total
    bins them at each ``target_bytes`` boundary — one window over the
    file *inventory* (metadata-sized, never the data), deterministic
    under re-partitioning via the (bytes desc, path) tie-break.

    Returns one row per file: (part, path, bytes, group_id). Groups may
    overrun ``target_bytes`` by at most one file (the standard
    cumulative rule); ``group_id`` starts at 0 per partition and skips
    values where a single file spans multiple target widths.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(F.desc(bytes_col), F.asc(path_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
    return files.select(
        F.col(part_col).alias("part"),
        F.col(path_col).alias("path"),
        F.col(bytes_col).cast("long").alias("bytes"),
        F.floor(cum_before / F.lit(int(target_bytes)))
        .cast("long")
        .alias("group_id"),
    )
