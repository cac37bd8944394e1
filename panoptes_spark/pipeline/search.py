"""Lexical corpus search — BM25 ranking over the documents table.

Beyond-reference training-pipeline operator: curation workflows mine a
100 TB corpus for documents relevant to a topic (targeted upsampling,
eval-set construction, contamination triage). BM25 (Robertson/Sparck
Jones; the +1 idf variant Lucene uses, which keeps idf positive for
terms in more than half the corpus) is the standard lexical ranker.

Scale shape: the corpus is touched by exactly two scan-shaped passes —
one partial-agg for (N, avgdl), one tokenize+filter that keeps only
postings of the query terms (the term list is a literal IN filter, so
the explode output is hits-only, not the full posting list; the doc
length rides along each posting, so no corpus-wide join reattaches it).
Everything downstream — tf, per-term document frequency, idf — operates
on the hits relation; the final score is one keyed aggregation over
hits and a ``TakeOrderedAndProject`` top-k. No global windows, no
driver loops, no shuffle proportional to the corpus.

Determinism: identical expression text runs on both engines (``ln`` is
within 1 ulp each side), scores round to 6dp with id tiebreak, so the
DuckDB oracle selects the identical top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_search", "bm25_multi_query", "hybrid_search_rrf"]

#: same letters-only lowercase tokenization as text.token_frequencies
_TOKENIZE = "filter(split(lower({col}), '[^a-z]+'), x -> x != '')"


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for ``query_terms``.

    Returns (id, score) — callers needing ranks enumerate the k rows;
    a global row_number window would single-partition the result.
    """
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("query_terms must contain at least one term")
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)

    toks = docs.select(
        F.col(id_col), F.expr(_TOKENIZE.format(col=text_col)).alias("__tk")
    )
    stats = toks.select(F.size("__tk").alias("__dl")).agg(
        (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n"),
    )
    # dl rides along the exploded postings (constant per doc), so the
    # per-doc length never needs a corpus-wide join back in
    hits = (
        toks.select(
            id_col,
            F.size("__tk").alias("__dl"),
            F.explode("__tk").alias("term"),
        )
        .where(F.expr(f"term IN ({in_list})"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("__dl").alias("dl"))
    )
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        f"ln((n - df + 0.5) / (df + 0.5) + 1)"
        f" * tf * ({k1!r} + 1)"
        f" / (tf + {k1!r} * (1 - {b!r} + {b!r} * dl / avgdl))"
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(F.expr(contrib)), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(
        int(k)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin — same tokenization, same expression text."""
    terms = sorted({t.lower() for t in query_terms if t})
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')
      AS tk
  FROM documents
),
dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
stats AS (
  SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, count(*) AS n FROM dl
),
hits AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(tk) AS term FROM toks
  ) WHERE term IN ({in_list}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM hits GROUP BY term)
SELECT doc_id,
  round(sum(ln((n - df + 0.5) / (df + 0.5) + 1)
            * tf * ({k1!r} + 1)
            / (tf + {k1!r} * (1 - {b!r} + {b!r} * dl / avgdl))), 6) AS score
FROM hits JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {int(k)}
"""


def bm25_multi_query(
    docs: DataFrame,
    query_terms: dict[int, list[str]],
    leg_k: int = 25,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-query BM25 top-``leg_k``: (query_id, doc_id, score, rank).

    Multi-query generalization of :func:`bm25_search` — the query sets
    become a broadcast (query_id, term) dim joined onto the SAME
    hits-only posting relation (one term may serve several queries
    without re-scanning the corpus). Document frequency stays GLOBAL
    per term (a property of the corpus, not of the query), so each
    query's scores equal its single-query run. The rank window is
    partitioned by query_id — never global.
    """
    all_terms = sorted({t.lower() for ts in query_terms.values() for t in ts})
    if not all_terms:
        raise ValueError("query_terms must contain at least one term")
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in all_terms)
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        [(int(q), t.lower()) for q, ts in query_terms.items() for t in ts],
        "query_id long, term string",
    )

    toks = docs.select(
        F.col(id_col), F.expr(_TOKENIZE.format(col=text_col)).alias("__tk")
    )
    stats = toks.select(F.size("__tk").alias("__dl")).agg(
        (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n"),
    )
    hits = (
        toks.select(
            id_col,
            F.size("__tk").alias("__dl"),
            F.explode("__tk").alias("term"),
        )
        .where(F.expr(f"term IN ({in_list})"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("__dl").alias("dl"))
    )
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        f"ln((n - df + 0.5) / (df + 0.5) + 1)"
        f" * tf * ({k1!r} + 1)"
        f" / (tf + {k1!r} * (1 - {b!r} + {b!r} * dl / avgdl))"
    )
    scored = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(F.expr(contrib)), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(leg_k))
        .select("query_id", F.col(id_col).alias("doc_id"), "score", "rank")
    )


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: dict[int, list[str]],
    k: int = 10,
    leg_k: int = 25,
    c: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    dense_leg: str = "brute",
    n_cells: int = 16,
    nprobe: int = 4,
    lex_leg: DataFrame | None = None,
) -> DataFrame:
    """Hybrid retrieval: BM25 keyword leg + query-by-example dense leg,
    fused by reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09:
    score(d) = Σ_legs 1/(c + rank_leg(d)), c=60).

    ``query_terms`` keys double as probe vec_ids: each query supplies
    keywords for the lexical leg and its own embedding as the dense
    query vector (the dense leg excludes the probe itself, the lexical
    leg may retrieve it — standard query-by-example asymmetry, kept
    identical in the oracle).

    Scale shape: both legs are already top-``leg_k``-per-query (the
    corpus never reaches fusion), so the full-outer rank join and the
    final window touch at most ``2·|queries|·leg_k`` rows. A doc absent
    from a leg carries rank 0 (contributes nothing) — integer, never a
    nullable column, so driver-side canon dtypes stay int64.

    Determinism: ranks are exact ints; the fused score is the same
    two-addend double expression on both engines, rounded at 9dp —
    distinct rank-pairs differ by ≥ 1/(c+leg_k)⁴ ≫ 1e-9, so rounding
    never merges them; ties (identical rank pairs) break on doc_id.

    ``dense_leg`` picks the dense retrieval plan (r5 verdict: the leg must
    be pluggable — the exact plan is not what you'd run at 100 TB):

    - ``"brute"`` (default): exact corpus×probe matmul
      (:func:`~panoptes_spark.pipeline.similarity.cosine_topk_bruteforce`)
      — the exactness baseline; a full corpus scan per probe batch.
    - ``"ivf"``: inverted-file ANN
      (:func:`~panoptes_spark.pipeline.similarity.ivf_topk` over
      :func:`~panoptes_spark.pipeline.similarity.seed_centroids`) — each
      probe touches ~``nprobe/n_cells`` of the corpus instead of all of
      it; the 100 TB path. Fused-output recall vs the brute twin is
      gate-measured (``hybrid_search_ivf``).
    """
    from panoptes_spark.pipeline.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
        seed_centroids,
    )

    if dense_leg not in ("brute", "ivf"):
        raise ValueError(f"dense_leg must be 'brute' or 'ivf', got {dense_leg!r}")
    probe_ids = sorted(int(q) for q in query_terms)
    if lex_leg is None:
        # callers fusing the SAME query set against several dense legs
        # (e.g. the hybrid_search_ivf recall gate) pass a precomputed —
        # ideally persisted — bm25_multi_query result as ``lex_leg`` so
        # the corpus-scan BM25 passes run once, not once per leg
        lex_leg = bm25_multi_query(
            docs, query_terms, leg_k=leg_k, text_col=text_col, id_col=id_col
        )
    lex = lex_leg.select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    probes = embeddings.where(
        F.col("vec_id").isin(probe_ids)
    )
    if dense_leg == "ivf":
        cents = seed_centroids(embeddings, n_cells=n_cells)
        dense_topk = ivf_topk(embeddings, probes, cents, k=leg_k, nprobe=nprobe)
    else:
        dense_topk = cosine_topk_bruteforce(embeddings, probes, k=leg_k)
    dense = dense_topk.select(
        "query_id",
        F.col("nbr_id").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )
    fused = (
        lex.join(dense, ["query_id", "doc_id"], "full_outer")
        .fillna(0, ["lex_rank", "dense_rank"])
    )
    rrf = F.round(
        F.when(F.col("lex_rank") > 0, F.lit(1.0) / (F.lit(c) + F.col("lex_rank")))
        .otherwise(F.lit(0.0))
        + F.when(
            F.col("dense_rank") > 0, F.lit(1.0) / (F.lit(c) + F.col("dense_rank"))
        ).otherwise(F.lit(0.0)),
        9,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .where(F.col("fused_rank") <= int(k))
        .select(
            "query_id", "doc_id", "lex_rank", "dense_rank",
            "rrf_score", "fused_rank",
        )
    )
