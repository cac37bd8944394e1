"""Connected components over near-duplicate pair graphs.

``dedup_keep_representatives`` is a single-pass approximation (drops the
larger id of each pair); exact cluster collapse needs connected
components: doc A~B and B~C must land in one cluster even though (A,C)
never formed a pair.

Implementation: iterative min-label propagation (the standard
large-graph approach without GraphX/GraphFrames): every node starts as
its own label; each round, labels flow across edges both ways and every
node takes the min; converges in O(diameter) rounds — near-dup clusters
are shallow, so a handful. Each round is two shuffles; ``max_iter``
bounds runaway graphs and localCheckpoint truncates the lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_col_a: str = "a",
    id_col_b: str = "b",
    max_iter: int = 10,
    strict: bool = False,
) -> DataFrame:
    """(node, component) for every node; component = min node id in its
    cluster. ``pairs``: undirected edges (a, b). ``nodes``: optional
    universe (isolated nodes get their own component).

    Convergence is DETECTED (the label-sum signature stabilizing), not
    assumed: if ``max_iter`` rounds exhaust without it, the labels are
    not exact component ids. ``strict=True`` raises in that case —
    required by callers whose correctness depends on exact labels
    (``NearDedupIndexSink``'s touched-component closure builds every
    later commit's subgraph selection on previously committed labels,
    so one silently non-converged commit corrupts the log forever);
    ``strict=False`` warns and returns the partial labels."""
    edges = (
        pairs.select(F.col(id_col_a).alias("src"), F.col(id_col_b).alias("dst"))
        .union(
            pairs.select(F.col(id_col_b).alias("src"), F.col(id_col_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    if nodes is None:
        labels = edges.select(F.col("src").alias("node")).distinct()
    else:
        labels = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    labels = labels.withColumn("component", F.col("node"))

    # per-node labels only ever decrease, so the label sum is strictly
    # monotone until convergence: an unchanged sum means NO node changed —
    # a single aggregate instead of a change-detection join per round
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        # neighbor labels flow along edges; every node takes the min of
        # its own and its neighbors' labels
        nbr = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "component")
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        sig = labels.agg(
            # decimal sum: exact and overflow-proof for 2^60-scale ids
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        if prev_sig == (sig.s, sig.n):
            converged = True
            break
        prev_sig = (sig.s, sig.n)
    edges.unpersist()
    if not converged:
        msg = (
            f"connected_components did not converge in max_iter="
            f"{max_iter} rounds (label-sum signature still changing); "
            "labels are NOT exact component ids — raise max_iter "
            "(rounds needed = graph diameter)"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def dedup_exact_components(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 10
) -> DataFrame:
    """Keep exactly one doc (min id) per connected near-dup cluster."""
    comp = connected_components(
        pairs, nodes=df.select(id_col), max_iter=max_iter
    )
    keep = comp.where(F.col("node") == F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def cluster_size_stats(components: DataFrame) -> DataFrame:
    """Cluster-size histogram + survivorship over a (node, component)
    labeling: how much of the corpus near-duplicate mass sits in pairs
    vs deep clusters, and how many docs dedup would remove at one
    representative per cluster. The report read before choosing
    representative policy or LSH thresholds.

    Two partial-agg groupBys (component -> size, size -> histogram);
    nothing bigger than the label relation ever shuffles. Returns
    (cluster_size, n_clusters, n_docs, n_removed) ordered by size."""
    sizes = components.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            (
                (F.col("cluster_size") - F.lit(1)) * F.col("n_clusters")
            ).alias("n_removed"),
        )
        .orderBy("cluster_size")
    )


def keep_best_representatives(
    docs: DataFrame,
    components: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """One document per near-dup cluster chosen by QUALITY (ties break
    to the lowest id) — the curation policy real pipelines use instead
    of min-id: among near-duplicates, keep the longest / highest-scored
    copy and drop the truncated or boilerplate-padded ones (the
    keep-one-representative step of Lee et al. 2022, generalized to an
    arbitrary quality column).

    One id equi-join against the label relation + a cluster-partitioned
    window (clusters are bounded by construction, so no unpartitioned
    sort at any corpus size). Returns the surviving docs' rows plus
    their ``component`` label."""
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    joined = docs.join(
        components.withColumnRenamed("node", id_col), id_col
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
