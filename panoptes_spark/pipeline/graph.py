"""Link-graph centrality scoring (PageRank power iteration).

Web-scale corpus curation uses link-graph centrality as a document
quality prior (Common Crawl filtering, OpenWebText-style source
selection): pages many reputable pages point at are likelier to be
worth training on. This is the classic damped PageRank, run for a fixed
number of power-iteration rounds as a sequence of DataFrame joins.

Determinism: ranks are kept as *integers* scaled by ``SCALE`` and every
update uses integer division — floating-point summation order (which
differs across partitionings AND engines) never enters, so results are
bit-exact under any layout and reproducible in a SQL oracle with the
same arithmetic. Dangling-node mass (nodes with no outgoing edges) is
dropped rather than redistributed — the standard simplification; ranks
then sum to slightly under ``SCALE`` but the ORDERING (what curation
consumes) is unaffected.

Scale shape per iteration: one broadcast of the (single-row) node-count
frame, one edge⋈rank equi-join keyed on src (edge-sized shuffle), one
dst-keyed partial-agg sum — the same join pattern every distributed
PageRank uses; iterations are fixed and small (quality priors converge
to ranking-stable in a handful of rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "SCALE"]

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round integer PageRank over ``edges``.

    Returns (node, rank_scaled) for every node that appears as a source
    or destination; ``rank_scaled ≈ rank * SCALE``. ``damping_pct`` is
    the damping factor in percent (85 = the canonical 0.85) so the
    update stays in integers end-to-end.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst")))
        .distinct()
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("n"))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    # rank_0 = SCALE / N for every node
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", F.expr(f"{SCALE} div n").alias("rank_scaled")
    )

    base_pct = 100 - damping_pct
    for _ in range(n_iter):
        contrib = (
            e.join(outdeg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                F.expr(
                    f"(({base_pct} * {SCALE}) div 100) div n"
                    f" + ({damping_pct} * coalesce(in_mass, 0)) div 100"
                ).alias("rank_scaled"),
            )
        )
    return ranks
