"""Substring-level (n-gram span) duplication statistics.

Document-level dedup (exact / minhash / simhash in ``dedup.py``) misses
the common failure mode of web corpora: long verbatim spans (license
headers, boilerplate footers, quoted passages) repeated inside otherwise
distinct documents.  "Deduplicating Training Data Makes Language Models
Better" (Lee et al., 2022) removes exact repeated substrings; a full
distributed suffix array is not expressible as a sane Spark plan, so
this module implements the standard fixed-length approximation: hash
every k-token window, find windows whose hash occurs in more than one
position corpus-wide, and report per-document how much of the text those
duplicated windows cover.  Downstream policies (drop doc, trim span,
down-weight) hang off the returned stats.

Scale shape (the part that matters at 100 TB):

- gram hashing is a narrow per-row expression (``transform`` over a
  ``sequence`` of window starts + one md5 per window) — no Python, no
  shuffle, scan-speed;
- the only corpus-proportional shuffles are the gram-hash count (map-side
  partial agg halves it) and the dup-hash join back to positions (AQE
  skew-split absorbs hot boilerplate hashes);
- span coverage is a per-document window over the (already doc-keyed)
  dup positions — one keyed shuffle of the *duplicated* positions only,
  not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "duplicated_ngram_spans",
    "trim_duplicated_spans",
    "ngram_novelty",
    "frequent_ngrams",
]


def _toks(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def duplicated_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicated-span statistics at gram length ``k``.

    Returns one row per input document:

    - ``n_tokens``      — whitespace token count
    - ``n_grams``       — number of k-token windows (0 when too short)
    - ``n_dup_grams``   — windows whose hash occurs ``>= min_count``
      times corpus-wide (the document's own repeats count)
    - ``covered_tokens``— tokens covered by the union of duplicated
      windows (overlapping windows merged exactly)
    - ``dup_token_fraction`` — covered_tokens / n_tokens, 6dp

    Coverage uses the sorted dup positions p_0 < p_1 < ...: window i
    contributes ``min(k, p_{i+1} - p_i)`` tokens (the last contributes
    ``k``) — the exact size of the interval union, no per-token explode.
    """
    toks = df.select(F.col(id_col).alias("id"), _toks(text_col).alias("t"))
    toks = toks.withColumn("n_tokens", F.size("t"))
    stats = toks.select(
        "id", "n_tokens",
        F.greatest(F.col("n_tokens") - F.lit(k - 1), F.lit(0)).alias("n_grams"),
    )

    grams = (
        toks.where(F.col("n_tokens") >= k)
        .select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(t) - {k}),"
                    f" i -> substring(md5(concat_ws(' ', slice(t, i + 1, {k}))), 1, 16))"
                )
            ).alias("pos", "gh"),
        )
    )

    counts = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
    dup_pos = grams.join(
        counts.where(F.col("cnt") >= min_count).select("gh"), "gh"
    ).select("id", "pos")

    w = Window.partitionBy("id").orderBy("pos")
    covered = (
        dup_pos.withColumn(
            "cov",
            F.least(
                F.lit(k),
                F.coalesce(F.lead("pos").over(w), F.col("pos") + k) - F.col("pos"),
            ),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.sum("cov").alias("covered_tokens"),
        )
    )

    return (
        stats.join(covered, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long")
            .alias("covered_tokens"),
            F.round(
                F.coalesce("covered_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_token_fraction"),
        )
    )


def trim_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Remove every token covered by a corpus-duplicated k-gram window
    (the removal policy over :func:`duplicated_ngram_spans`' stats —
    the Lee et al. 2022 exact-substring cleanup at fixed gram length,
    with the C4-style "all occurrences go" policy: boilerplate is
    removed from every copy, including the first. Text is rebuilt from
    the NORMALIZED token stream — lowercased, whitespace-collapsed —
    the same canon the gram hashes use).

    Returns (id, clean_text, n_tokens, n_removed).

    Scale shape: gram hashing and counting as in the stats operator
    (narrow + one partial-agg shuffle + hits-only join back); the
    removal itself ships each affected document ONE array of duplicated
    window starts (collect_list over the doc's dup positions — dup-
    sized, not corpus-sized) and rebuilds the text in a single array
    expression; unaffected documents pass through a left join with no
    per-token explode anywhere. The kept-token set is built LINEARLY
    (r9): the sorted window starts merge into disjoint intervals in one
    ``aggregate`` pass, and kept indices are the flattened gaps between
    them — O(n_tokens + n_intervals) per document, where the previous
    per-token ``exists`` scan over every duplicated window went
    quadratic on boilerplate-heavy docs (most windows duplicated)."""
    toks = df.select(F.col(id_col).alias("id"), _toks(text_col).alias("t"))
    grams = (
        toks.where(F.size("t") >= k)
        .select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(t) - {k}),"
                    f" i -> substring(md5(concat_ws(' ', slice(t, i + 1, {k}))), 1, 16))"
                )
            ).alias("pos", "gh"),
        )
    )
    counts = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
    starts = (
        grams.join(counts.where(F.col("cnt") >= min_count).select("gh"), "gh")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
    )
    # merge the sorted starts into disjoint covered intervals [s, e):
    # consecutive windows overlap iff next start <= current end, and the
    # merged end is always next_start + k (starts ascend, so next end
    # >= current end) — one linear fold over the dup-window starts
    iv = (
        f"aggregate(ps, cast(array() as array<struct<s:int,e:int>>),"
        f" (acc, p) -> if(size(acc) > 0 AND p <= element_at(acc, -1).e,"
        f" concat(slice(acc, 1, size(acc) - 1),"
        f" array(named_struct('s', element_at(acc, -1).s, 'e', p + {k}))),"
        f" concat(acc, array(named_struct('s', p, 'e', p + {k})))))"
    )
    # kept tokens = the GAPS between merged intervals (gap starts are
    # 0 + each interval end; gap ends are each interval start + n) —
    # no per-token membership scan
    kept = (
        "CASE WHEN ps IS NULL THEN sequence(0, size(t) - 1)"
        " ELSE flatten(zip_with("
        "concat(array(0), transform(__iv, v -> v.e)),"
        " concat(transform(__iv, v -> v.s), array(size(t))),"
        " (gs, ge) -> if(gs < ge, sequence(gs, ge - 1), array()))) END"
    )
    return (
        toks.join(starts, "id", "left")
        .withColumn("__iv", F.expr(iv))
        .withColumn("__kept", F.expr(kept))
        .select(
            F.col("id").alias(id_col),
            F.expr(
                "concat_ws(' ', transform(__kept, i -> element_at(t, i + 1)))"
            ).alias("clean_text"),
            F.size("t").alias("n_tokens"),
            (F.size("t") - F.size("__kept")).alias("n_removed"),
        )
    )


def ngram_novelty(
    eval_df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, n_grams, n_seen, novelty) — per eval-document fraction of
    distinct word k-grams NOT present anywhere in the reference corpus:
    the "how much new information does this shard add" curation metric
    (the scoring complement to the bloom incremental-dedup FILTER).

    Scale shape: both sides hash grams to 64-bit (16-byte keys ship,
    never text); the reference collapses to its DISTINCT gram-hash set
    via a partial-agg groupBy; membership is one equi-join of eval gram
    hashes against it (hits only survive), then one per-doc partial-agg
    count. The eval side explodes ONCE (r9): per-doc totals are the
    shingle-array size, a narrow pre-explode expression — no second
    evaluation of the gram subtree. Nothing quadratic, no broadcast of
    corpus-sized state."""
    from .dedup import shingles_col, spark_hash64

    h = spark_hash64("s")

    def grams(df):
        return df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform({shingles_col(text_col, k)}, s -> {h})"
                )
            ).alias("gh"),
        )

    ref_set = grams(ref_df).select("gh").distinct()
    ev = grams(eval_df)
    # shingles_col is array_distinct'd and never empty (short docs get
    # the whole-text shingle), so size(...) == the exploded per-doc
    # count the previous two-pass formulation aggregated
    totals = eval_df.select(
        F.col(id_col),
        F.expr(f"size({shingles_col(text_col, k)})")
        .cast("long")
        .alias("n_grams"),
    )
    seen = (
        ev.join(ref_set, "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_seen"))
    )
    return (
        totals.join(seen, id_col, "left")
        .na.fill({"n_seen": 0})
        .withColumn(
            "novelty",
            F.round(1.0 - F.col("n_seen") / F.col("n_grams"), 6),
        )
    )


def frequent_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
    top_n: int = 5,
    n_salt: int = 64,
) -> DataFrame:
    """Top-``top_n`` word k-grams per source by DOCUMENT frequency — the
    boilerplate diagnostic read before tuning dedup caps (`max_df`,
    winnowing) or trimming policies: headers/footers/templates surface
    as grams present in a large share of a source's documents.

    Scale shape: per-doc DISTINCT grams (the shingle expression — narrow,
    no Python), one (source, gram) partial-agg count (map-side combine
    collapses repeats), then a TWO-PHASE top-n (r10): a partial top-n
    per (source, gram-hash salt) — each of the ``n_salt`` salt slices
    ranks ~1/n_salt of the source's gram vocabulary, so no task ever
    sorts a whole source's vocabulary — followed by the final top-n
    over the <= n_salt * top_n survivors per source (a bounded-input
    window, like the per-cluster representative windows). EXACT: a
    gram lives in exactly one salt slice, so every global top-n gram
    is inside its slice's top-n by the same (df desc, gram asc) order.
    Gram strings ship only after the count collapse.
    Returns (source, gram, df, rank)."""
    from pyspark.sql import Window

    from .dedup import shingles_col

    grams = df.select(
        F.col(source_col),
        F.explode(F.expr(shingles_col(text_col, k))).alias("gram"),
    )
    counts = grams.groupBy(source_col, "gram").agg(
        F.count(F.lit(1)).alias("df")
    )
    salted = counts.withColumn(
        "__salt", F.pmod(F.xxhash64("gram"), F.lit(n_salt))
    )
    w1 = Window.partitionBy(source_col, "__salt").orderBy(
        F.col("df").desc(), F.col("gram").asc()
    )
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= top_n)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(source_col).orderBy(
        F.col("df").desc(), F.col("gram").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= top_n)
        .select(source_col, "gram", "df", "rank")
    )
