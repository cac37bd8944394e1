"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Query set × corpus
  cross join restricted by a block hint; all arithmetic via higher-order
  array functions (JVM-side, no Python).
- IVF (inverted-file) top-k: coarse quantization to deterministic seed
  centroids, probe only the nearest ``nprobe`` cells — the 100 TB path:
  the corpus is partitioned by cell, each query touches a few cells
  instead of every row.
- random-hyperplane LSH bucketing for cosine near-dup blocking.

Engine-parity notes: cosine is computed as a left-to-right fold and
rounded to 6dp so Spark/DuckDB float sums compare equal; top-k ties break
on (rounded cosine desc, id asc) making row_number deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate({a}, cast(0.0 as double),"
    " (acc, x) -> acc + cast(x as double) * cast(x as double)))"
)


def cosine_expr(a: str, b: str) -> str:
    return (
        f"round({DOT.format(a=a, b=b)} / "
        f"({NORM.format(a=a)} * {NORM.format(a=b)}), 6)"
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query (self excluded).

    Scale: |Q| × |C| comparisons — use for oracles/small query sets; the
    IVF variant is the production path.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cosine", F.expr(cosine_expr("qv", "cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroid cells
    (by cosine). centroids: (cell_id, centroid array<float>) — dim-table
    sized, broadcast."""
    c = centroids.select("cell_id", F.col("centroid").alias("cv"))
    scored = df.crossJoin(F.broadcast(c)).withColumn(
        "cell_cos", F.expr(cosine_expr(vec_col, "cv"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cell_cos").desc(), F.col("cell_id").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= nprobe)
        .drop("__r", "cv")
    )


def seed_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: the first ``n_cells`` vectors by id
    (a fixed, reproducible choice — k-means would drift between engines)."""
    w = Window.orderBy(F.col(id_col).asc())
    return (
        corpus.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= n_cells)
        .select(
            (F.col("__r") - 1).alias("cell_id"), F.col(vec_col).alias("centroid")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: corpus assigned to 1 cell, queries probe
    ``nprobe`` cells, join on cell — per-query work drops from |C| to
    |C| * nprobe / n_cells.
    """
    c_assigned = ivf_assign(corpus, centroids, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cv"), "cell_id"
    )
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell_id"
    )
    scored = (
        q_assigned.join(c_assigned, "cell_id")
        .where(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cosine", F.expr(cosine_expr("qv", "cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
        .distinct()
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Brute within-corpus; for the 100 TB path block by LSH/IVF cell first
    and run this within blocks.
    """
    a = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("cosine", F.expr(cosine_expr("va", "vb")))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
