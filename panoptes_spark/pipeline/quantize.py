"""Scalar (int8-style) embedding quantization for ANN at scale.

Full-precision float32 embeddings dominate storage and shuffle volume in
100 TB similarity pipelines (a 1024-dim float vector is 4 KiB/row).
Per-dimension affine quantization to 8-bit codes cuts that 4× with a
bounded recall loss — the compression used by FAISS's scalar quantizer
and most vector stores' "SQ8" mode.

Scale shape:

- per-dimension min/max is a (dim)-keyed partial aggregate over the
  exploded corpus (one shuffle whose output is *dim* rows), folded into
  a single stats row — which then broadcasts back onto the corpus, so
  quantization itself is a map-only ``transform`` expression. No driver
  collect anywhere; the stats row never exceeds the vector width.
- codes are computed as ``floor(t + 0.5)`` (not ``round``) so the
  half-way rule is explicit and identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dim_stats_row", "quantize_embeddings", "dequantize_col"]

_LEVELS = 255  # 8-bit codes 0..255


def dim_stats_row(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Single-row frame ``(mins array<double>, maxs array<double>)`` with
    per-dimension corpus min/max (position-ordered)."""
    d = df.select(
        F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).select("pos", F.col("x").cast("double").alias("x"))
    per_dim = d.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    return per_dim.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)"
        ).alias("mins"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)"
        ).alias("maxs"),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per-dim affine codes in 0..255.

    Constant dimensions (mx == mn) map to code 0. The stats row joins in
    via a broadcast nested-loop of exactly one row — Catalyst plans it
    as ``BroadcastNestedLoopJoin`` over a single-row build side, i.e.
    a glorified literal, with no shuffle of the corpus."""
    stats = dim_stats_row(df, vec_col)
    code = F.expr(
        f"transform({vec_col}, (x, i) -> CAST(CASE"
        " WHEN element_at(maxs, i + 1) > element_at(mins, i + 1) THEN"
        f"  least(CAST({_LEVELS} AS DOUBLE), greatest(CAST(0 AS DOUBLE),"
        "   floor((CAST(x AS DOUBLE) - element_at(mins, i + 1))"
        f"    * {_LEVELS}.0"
        "    / (element_at(maxs, i + 1) - element_at(mins, i + 1))"
        "    + 0.5d)))"
        " ELSE 0.0d END AS INT))"
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .select(F.col(id_col), code.alias("codes"))
    )


def dequantize_col(
    codes_col: str, mins_col: str = "mins", maxs_col: str = "maxs"
) -> F.Column:
    """Reconstruction expression: x̂_i = mn_i + c_i * (mx_i - mn_i)/255."""
    return F.expr(
        f"transform({codes_col}, (c, i) ->"
        f" element_at({mins_col}, i + 1) + CAST(c AS DOUBLE)"
        f" * (element_at({maxs_col}, i + 1) - element_at({mins_col}, i + 1))"
        f" / {_LEVELS}.0)"
    )
