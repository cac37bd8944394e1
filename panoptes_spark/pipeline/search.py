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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_search"]

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
