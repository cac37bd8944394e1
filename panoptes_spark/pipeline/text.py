"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All built-in-function expressions (codegen'd,
shuffle-free) so they run at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists (n-gram heuristic language ID). The
# choice of words is arbitrary but FIXED — the correctness oracle mirrors it.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ich", "ein", "zu", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
}

# GPT2-ish pre-tokenizer approximation: letter runs, single digits,
# punctuation runs. Works identically in Java regex and RE2 (DuckDB).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def tokens_col(text_col: str = "text") -> F.Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``n_tokens_ws`` (whitespace) and ``n_tokens_bpe`` (regex BPE-ish)."""
    return df.withColumns(
        {
            "n_tokens_ws": F.size(F.split(F.trim(F.col(text_col)), r"\s+")),
            "n_tokens_bpe": F.regexp_count(
                F.col(text_col), F.lit(BPE_TOKEN_PATTERN)
            ),
        }
    )


def lang_score_col(text_col: str, words: list[str]) -> F.Column:
    """#tokens that are members of the stopword list (multiset count —
    deterministic across engines, unlike distinct-intersect)."""
    arr = ", ".join("'" + w + "'" for w in words)
    return F.expr(
        f"size(filter(split(lower({text_col}), '\\\\s+'),"
        f" t -> t IN ({arr})))"
    )


def add_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``lang_pred`` = argmax stopword-hit count (ties -> language name
    order; 'und' when no stopwords hit at all)."""
    out = df.withColumns(
        {
            f"__sc_{lang}": lang_score_col(text_col, words)
            for lang, words in LANG_STOPWORDS.items()
        }
    )
    best = None
    best_score = None
    for lang in sorted(LANG_STOPWORDS):
        sc = F.col(f"__sc_{lang}")
        if best is None:
            best, best_score = F.lit(lang), sc
        else:
            cond = sc > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, sc).otherwise(best_score)
    out = out.withColumn(
        "lang_pred", F.when(best_score > 0, best).otherwise(F.lit("und"))
    )
    return out.drop(*[f"__sc_{lang}" for lang in LANG_STOPWORDS])


def add_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features + composite score:

    - n_chars, n_tokens_ws
    - mean_word_len (6dp)
    - punct_ratio: non-alnum-non-space chars / chars (6dp)
    - stopword_ratio: english stopword tokens / tokens (6dp)
    - quality_score: in [0,1]; penalizes extreme length, high punctuation,
      zero stopwords (the usual C4-style heuristics, deterministic form)
    """
    n_chars = F.length(F.col(text_col))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(toks)
    mean_wl = F.round(
        (F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))) / n_tok, 6
    )
    punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9\s]", "")
    )
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    sw = lang_score_col(text_col, LANG_STOPWORDS["en"])
    stop_ratio = F.round(sw / F.greatest(n_tok, F.lit(1)), 6)
    score = (
        F.when(n_tok < 5, 0.1)
        .when(punct_ratio > 0.3, 0.2)
        .otherwise(
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(0.4)
                    + F.least(stop_ratio * 2, F.lit(0.3))
                    + F.least(n_tok / F.lit(200.0), F.lit(0.3)),
                ),
                6,
            )
        )
    )
    # one withColumns call, not a chain: every withColumn copies and
    # re-analyzes the whole logical plan, and these feature stacks are
    # the deepest plans in the engine (r11 — plan-construction time was
    # a measurable slice of the composed curation gate)
    return df.withColumns(
        {
            "n_chars_calc": n_chars.cast("long"),
            "n_tokens_ws": n_tok.cast("long"),
            "mean_word_len": mean_wl,
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "quality_score": score.cast("double"),
        }
    )


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``fingerprint``: md5 of the normalized text (lowercase, punctuation
    stripped, whitespace collapsed) — the canonical exact-dedup key."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    return df.withColumn("fingerprint", F.md5(norm))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into whitespace-token chunks of at most
    ``max_tokens`` with ``overlap`` tokens repeated between neighbors
    (stride = max_tokens - overlap) — the standard long-document →
    context-window preprocessing step. Every token lands in at least one
    chunk; the last chunk may be short; a doc shorter than one window is
    a single chunk.

    Output: (id, chunk_id, chunk_text, n_chunk_tokens). Narrow plan:
    tokenize → integer chunk-count arithmetic → ``posexplode(sequence)``
    over chunk starts → array slice/join; fan-out ≈ n_tokens/stride per
    doc, no shuffle, no Python. Chunk count uses integer ceil-div so the
    DuckDB oracle reproduces boundaries exactly.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens: {overlap}, {max_tokens}")
    stride = max_tokens - overlap
    out = df.withColumn(
        "__toks", F.split(F.trim(F.col(text_col)), r"\s+")
    ).withColumn(
        "__nc",
        F.expr(
            f"greatest(1, (size(__toks) - {overlap} + {stride - 1})"
            f" div {stride})"
        ),
    )
    sl = f"slice(__toks, __start + 1, {max_tokens})"
    return out.select(
        id_col,
        "__toks",
        F.posexplode(
            F.expr(f"sequence(0, (__nc - 1) * {stride}, {stride})")
        ).alias("chunk_id", "__start"),
    ).select(
        id_col,
        "chunk_id",
        F.array_join(F.expr(sl), " ").alias("chunk_text"),
        F.size(F.expr(sl)).alias("n_chunk_tokens"),
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", k: int | None = None
) -> DataFrame:
    """Corpus token frequency table (vocabulary building): lowercase
    alpha tokens -> (token, n), optionally top-k with a deterministic
    tie-break (count desc, token asc).

    Shape at scale: explode -> two-phase aggregate (Catalyst inserts the
    map-side partial, so the shuffle carries one row per distinct token
    per task, not one per occurrence); top-k is TakeOrderedAndProject,
    never a global sort of the vocabulary.
    """
    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z]+")).alias("token")
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    if k is None:
        return counts
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(k)


def add_nfc_normalized(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Unicode NFC normalization — unify composed/decomposed forms BEFORE
    any hashing/dedup so 'Café' (e+combining accent) and 'Café' (precomposed)
    fingerprint identically.

    Spark SQL has no NFC builtin, so this is the declared Arrow-batched
    python fallback (`pandas_udf` over `unicodedata.normalize`) — map-only
    and vectorized per batch, the accepted shape when a builtin genuinely
    doesn't exist. DuckDB's ``nfc_normalize`` gives the oracle twin.
    """
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    udf = pandas_udf(_nfc, "string")
    return df.withColumn(out_col or f"{text_col}_nfc", udf(F.col(text_col)))


def add_compression_ratio(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """``compression_ratio`` = zlib-compressed bytes / raw utf-8 bytes
    (6dp; 1.0 for empty). Low ratios flag boilerplate/repetitive documents
    (the CCNet/Gopher signal that pure token statistics miss). Arrow-batched
    python fallback — zlib has no SQL twin, so correctness is pinned by a
    direct python differential test instead of a DuckDB oracle.
    """
    from pyspark.sql.functions import pandas_udf

    def _ratio(s):
        import zlib

        def one(x):
            if x is None:
                return None
            raw = x.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(one)

    udf = pandas_udf(_ratio, "double")
    return df.withColumn("compression_ratio", udf(F.col(text_col)))


# URL syntax shared by Java regex and RE2 (no lookaround). The domain is
# captured by group 1 of URL_DOMAIN_PATTERN.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\s]*)?"
URL_DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def add_url_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``n_urls`` (count of http(s) URLs) and ``first_domain`` (host of
    the first URL, NULL when none). Map-only regex expressions — feeds
    domain blocklist filtering and URL-keyed routing at scan speed."""
    first = F.regexp_extract(F.col(text_col), URL_DOMAIN_PATTERN, 1)
    return df.withColumns(
        {
            "n_urls": F.regexp_count(F.col(text_col), F.lit(URL_PATTERN)),
            "first_domain": F.when(first != "", first),
        }
    )


def domain_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level (domain, n) over every URL occurrence — the input to
    a blocklist/allowlist decision. explode -> two-phase count like
    ``token_frequencies``: the shuffle carries one row per distinct
    domain per task."""
    doms = df.select(
        F.explode(
            F.expr(f"regexp_extract_all({text_col}, '{URL_DOMAIN_PATTERN}', 1)")
        ).alias("domain")
    )
    return doms.groupBy("domain").agg(F.count("*").alias("n"))


def filter_by_domain_blocklist(
    df: DataFrame, blocklist: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop documents whose first URL domain is on the blocklist
    (``blocklist``: one ``domain`` column — tiny, so broadcast anti-join;
    the corpus never shuffles)."""
    feat = add_url_features(df, text_col)
    return (
        feat.join(
            F.broadcast(blocklist.select("domain")),
            feat["first_domain"] == F.col("domain"),
            "left_anti",
        )
        .drop("n_urls", "first_domain")
    )


# Quality-filter thresholds (C4/Gopher-flavored, deterministic). Order is
# the reject precedence; each row gets the FIRST failing reason.
QUALITY_FILTER_RULES = [
    ("too_short", "n_tokens_ws < 5"),
    ("high_punct", "punct_ratio > 0.3"),
    ("repetitive", "dup_2gram_frac > 0.5"),
    ("low_quality", "quality_score < 0.5"),
]


def filter_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document curation decision: computes quality + repetition features,
    then adds ``keep`` (boolean) and ``reject_reason`` (first failing rule
    name, NULL when kept). All map-only column expressions — the filter
    itself costs nothing beyond the feature scan at 100 TB; callers route
    with ``.where("keep")`` / quarantine with ``.where("NOT keep")``.
    (Pushdown inlines the whole cascade into the scan filter; that stays
    linear-per-row because the feature expressions keep arrays out of
    lambda bodies — see ``add_repetition_features``.)
    """
    out = add_quality_features(df, text_col)
    out = add_repetition_features(out, text_col)
    reason = F.lit(None).cast("string")
    for name, cond in reversed(QUALITY_FILTER_RULES):
        reason = F.when(F.expr(cond), F.lit(name)).otherwise(reason)
    # keep's expression references reject_reason, so it cannot share one
    # withColumns with it; inline the same expression instead
    return out.withColumns(
        {"reject_reason": reason, "keep": reason.isNull()}
    )


# PII patterns restricted to syntax shared by Java regex (Spark) and RE2
# (DuckDB/engines with linear-time regex): no lookaround, no backrefs.
# Replacement order is part of the contract: emails first (their host part
# would otherwise be half-eaten by the IP rule), then IPv4, then long digit
# runs. Counts are measured on the input of each stage.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("idnum", r"[0-9]{9,}", "<ID>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 literals / ≥9-digit identifier runs.

    Adds ``{text_col}_scrubbed`` plus ``n_email``/``n_ipv4``/``n_idnum``
    redaction counts. Pure regexp_replace/regexp_count chain — codegen'd,
    map-only, no Python, so it runs at scan speed over 100 TB. The count
    columns let a pipeline route high-PII documents to quarantine without
    a second pass.
    """
    cur = F.col(text_col)
    cols = {}
    for name, pat, repl in PII_RULES:
        cols[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    cols[f"{text_col}_scrubbed"] = cur
    return df.withColumns(cols)


def corpus_stats(
    df: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group corpus report: doc count, token mass, and exact p50/p90/p99
    whitespace-token-count percentiles (linear interpolation — Spark
    ``percentile``; groups are few, so the exact sort-based percentile is
    a per-group aggregate, not a global sort). The first look any curation
    run takes at a new crawl."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(F.col(group_col), toks.alias("__t"))
    return base.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("__t").cast("bigint")).alias("n_tokens"),
        F.round(F.expr("percentile(__t, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(__t, 0.9)"), 6).alias("p90_tokens"),
        F.round(F.expr("percentile(__t, 0.99)"), 6).alias("p99_tokens"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    quality_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Diversity cap: keep at most ``k`` documents per group (domain,
    source, ...), preferring higher ``quality_col``; ties break on id asc
    for determinism — the standard guard against a single domain
    dominating a crawl-scale corpus.

    r7: two-phase exact selection (``pipeline/topk.py``) instead of one
    window keyed only by the group — a low-cardinality group column
    (5 languages) would otherwise bound parallelism by group count at
    any cluster size."""
    from .topk import topk_per_group

    return topk_per_group(
        df,
        [group_col],
        [F.col(quality_col).desc(), F.col(id_col).asc()],
        k,
        id_col,
    )


def add_repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition signals (Gopher/C4-style quality rules):

    - ``dup_word_frac``   — 1 - distinct/total words
    - ``dup_2gram_frac``  — 1 - distinct/total word bigrams
    - ``top_word_frac``   — occurrences of the most common word / total

    All higher-order array expressions over one tokenization — per-row
    compute, no shuffle, no Python. ``top_word_frac`` is O(distinct ×
    total) per document, bounded by document length (not corpus size), so
    it stays scan-shaped at any corpus scale.
    """
    # CRITICAL EXPRESSION SHAPE: the token array may only appear in
    # ARGUMENT position of higher-order functions, never inside a lambda
    # body. Predicate pushdown inlines these columns into scan-level
    # filters verbatim; a lambda body re-evaluates per array element, so
    # an inlined tokenizer there turns O(n) documents into O(n²)
    # re-tokenizations (measured 40× on the curation-pipeline gate).
    # Hence bigrams via zip_with over two slices (elements arrive as
    # lambda args) and top-word count via a run-length fold over the
    # sorted array instead of a nested filter() per distinct word.
    words = "filter(split(lower({c}), '[^a-z]+'), w -> w <> '')".format(c=text_col)
    n = f"size({words})"
    grams = (
        f"zip_with(slice({words}, 1, {n} - 1), slice({words}, 2, {n} - 1),"
        f" (a, b) -> concat(a, ' ', b))"
    )
    top = (
        f"aggregate(array_sort({words}),"
        " named_struct('prev', cast(null as string), 'run', 0, 'best', 0),"
        " (acc, x) -> CASE WHEN acc.prev <=> x THEN"
        "  named_struct('prev', x, 'run', acc.run + 1,"
        "   'best', greatest(acc.best, acc.run + 1))"
        " ELSE named_struct('prev', x, 'run', 1,"
        "   'best', greatest(acc.best, 1)) END,"
        " acc -> acc.best)"
    )
    return df.withColumns(
        {
            "dup_word_frac": F.expr(
                f"CASE WHEN {n} = 0 THEN 0.0D ELSE"
                f" 1.0D - cast(size(array_distinct({words})) as double) / {n} END"
            ),
            "dup_2gram_frac": F.expr(
                f"CASE WHEN {n} < 2 THEN 0.0D ELSE"
                f" 1.0D - cast(size(array_distinct({grams})) as double)"
                f" / ({n} - 1) END"
            ),
            "top_word_frac": F.expr(
                f"CASE WHEN {n} = 0 THEN 0.0D ELSE"
                f" cast({top} as double) / {n} END"
            ),
        }
    )


def add_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Readability + lexical-richness quality signals, all from exact
    integer counts so both engines agree bit-for-bit before the single
    rounded division:

    - ``n_sentences``: runs of ``.!?`` (min 1, so ratios are total)
    - ``n_syllables``: vowel-group approximation (runs of ``[aeiouy]``
      in the lowercased text — groups never span whitespace, so the
      per-document count equals the per-word sum)
    - ``flesch``: 206.835 - 1.015*(words/sentences) -
      84.6*(syllables/words), rounded 4dp (the classic reading-ease
      formula on the approximate counts)
    - ``ttr``: type-token ratio (distinct words / words, 6dp) — the
      standard lexical-diversity signal for template/boilerplate text

    Map-only column expressions; scan-speed.
    """
    lower = F.lower(F.col(text_col))
    words = F.filter(
        F.split(F.trim(lower), r"\s+"), lambda w: w != F.lit("")
    )
    n_words = F.greatest(F.size(words), F.lit(1)).cast("long")
    n_sent = F.greatest(
        F.size(F.split(F.col(text_col), r"[.!?]+")) - 1, F.lit(1)
    ).cast("long")
    n_syll = F.size(F.split(lower, r"[aeiouy]+")) - 1
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double")),
        4,
    )
    ttr = F.round(
        F.size(F.array_distinct(words)).cast("double") / n_words.cast("double"),
        6,
    )
    return df.withColumns(
        {
            "n_sentences": n_sent,
            "n_syllables": n_syll.cast("long"),
            "flesch": flesch,
            "ttr": ttr,
        }
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword
    extractor / sparse featurizer. ``idf = ln((N+1)/(df+1)) + 1``
    (smoothed, sklearn's variant), ``score = tf * idf`` rounded 6dp,
    ties broken by term text so the result is layout-independent.

    Shape at scale: explode -> (doc, term) partial-agg count (the only
    corpus-sized shuffle); document frequency is a term-keyed aggregate
    of that same frame (vocabulary-sized) joined back; N is a 1-row
    broadcast; top-k is one window over the (doc, term) frame keyed by
    doc. ln/division are IEEE on exact integer inputs.
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z]+")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n") + 1).cast("double")
                        / (F.col("df") + 1).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .select(id_col, "term", "tf", "df", "score", "rnk")
    )
