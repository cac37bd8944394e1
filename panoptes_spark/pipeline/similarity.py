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

    The query matrix is collected and broadcast (fine for query sets up to
    ~millions of rows × small dims); each corpus partition scores its block
    with one BLAS matmul and emits a partition-local top-k, pruned to the
    global top-k by a window. Exactness baseline; the IVF variant is the
    100 TB path.
    """
    import numpy as np

    spark = corpus.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norms))

    def block(batches):
        import pandas as pd

        b_qids, b_qmat, b_qnorms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norms = np.sqrt((c_mat * c_mat).sum(axis=1))
            cos = np.round(
                (b_qmat @ c_mat.T) / np.outer(b_qnorms, c_norms), 6
            )
            out_q, out_n, out_c = [], [], []
            for qi in range(len(b_qids)):
                scores = cos[qi]
                # partition-local top-k (global window prunes the rest);
                # +1 headroom for the self-match we drop later
                top = min(k + 1, len(scores))
                idx = np.argpartition(-scores, top - 1)[:top]
                for ci in idx:
                    if c_ids[ci] != b_qids[qi]:
                        out_q.append(b_qids[qi])
                        out_n.append(c_ids[ci])
                        out_c.append(scores[ci])
            yield pd.DataFrame(
                {"query_id": out_q, "nbr_id": out_n, "cosine": out_c}
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        block, schema="query_id long, nbr_id long, cosine double"
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

    Numpy-blocked: the (normalized) corpus matrix is broadcast to every
    partition, each partition multiplies its block against it — one BLAS
    matmul per block instead of |C|^2 interpreted expression folds
    (measured ~50× faster). For corpora too big to broadcast, IVF/LSH
    block first, then run this within blocks.
    """
    import numpy as np

    spark = corpus.sparkSession
    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def block(batches):
        import pandas as pd

        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            cos = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
            cos = np.round(cos, 6)
            ai, bi = np.where(cos >= threshold)
            mask = a_ids[ai] < b_ids[bi]
            yield pd.DataFrame(
                {
                    "a": a_ids[ai][mask],
                    "b": b_ids[bi][mask],
                    "cosine": cos[ai, bi][mask],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        block, schema="a long, b long, cosine double"
    )
