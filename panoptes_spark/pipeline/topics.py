"""Cluster topic labeling via class-based TF-IDF (c-TF-IDF).

The BERTopic topic-representation formula (Grootendorst 2022, public):
treat each embedding cluster as one "class document", then

    W(t, c) = (tf_{t,c} / w_c) · ln(1 + A / f_t)

where ``tf_{t,c}`` is term t's count inside cluster c, ``w_c`` the total
term count of cluster c, ``A`` the average w_c across clusters, and
``f_t`` the corpus-wide count of t. The top-scored terms per cluster are
the cluster's topic label — the curation primitive for "what IS in this
corpus slice" after any clustering (IVF cells here; any (id, cell_id)
relation works).

Scale shape: the only corpus-sized stages are the narrow broadcast-
matmul cell assignment (``similarity.ivf_assign`` — no shuffle), the
doc⋈cell equi-join on id, and ONE partial-aggregated groupBy to
(cell, term). Everything after operates on a relation bounded by
n_cells × vocab — independent of corpus row count; the top-k window
partitions by cell over that bounded relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import ivf_assign, seed_centroids

TOPIC_TOP_TERMS = 5


def cluster_topic_terms(
    docs: DataFrame,
    embeddings: DataFrame,
    n_cells: int = 8,
    top_terms: int = TOPIC_TOP_TERMS,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell_id, term, ctfidf, rank) — the ``top_terms`` highest c-TF-IDF
    terms per IVF cell (ties: term asc). ``ctfidf`` rounds to 6 dp at
    the end (the cross-engine float pattern)."""
    cents = seed_centroids(embeddings, n_cells, vec_id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, vec_id_col, vec_col, nprobe=1)
    assigned = assigned.select(F.col(vec_id_col).alias("__vid"), "cell_id")
    terms = (
        docs.join(assigned, docs[doc_id_col] == F.col("__vid"))
        .select("cell_id", F.explode(F.split(F.col(text_col), " ")).alias("term"))
    )
    tfc = terms.groupBy("cell_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    wc = tfc.groupBy("cell_id").agg(F.sum("tf").alias("w_c"))
    ft = tfc.groupBy("term").agg(F.sum("tf").alias("f_t"))
    avg_wc = wc.agg(F.avg("w_c").alias("a_bar"))
    scored = (
        tfc.join(F.broadcast(wc), "cell_id")
        .join(ft, "term")
        .crossJoin(F.broadcast(avg_wc))
        .withColumn(
            "ctfidf",
            F.round(
                (F.col("tf") / F.col("w_c"))
                * F.log(F.lit(1.0) + F.col("a_bar") / F.col("f_t")),
                6,
            ),
        )
    )
    w = Window.partitionBy("cell_id").orderBy(
        F.col("ctfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(top_terms))
        .select("cell_id", "term", "ctfidf", "rank")
    )
