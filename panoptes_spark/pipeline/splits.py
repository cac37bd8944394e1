"""Deterministic dataset splitting / sampling for training-data pipelines.

Beyond-reference operators (SURVEY "training-data pipeline" section): a
100 TB corpus needs train/val/test assignment and downsampling that are

- **deterministic** — re-running the pipeline (or adding shards) never
  moves a document between splits, because membership depends only on
  (salt, id), never on partitioning, row order, or cluster size;
- **map-only** — a pure column expression over the scan, no shuffle, no
  state, trivially parallel at any scale.

Both properties come from bucketing an unsigned murmur3 of ``salt:id``
(the same exact hash family the reference uses for its scheduling splay,
``celery_manager.py:252`` — implementation shared via
``operators/schedule.mmh3_sql_steps``, which also gives every operator
here a byte-exact DuckDB oracle twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from panoptes_spark.operators.schedule import mmh3_sql_expr

#: bucket granularity for fraction -> threshold conversion (1 bp = 0.01%)
N_BUCKETS = 10_000

DEFAULT_FRACTIONS = (("train", 0.98), ("val", 0.01), ("test", 0.01))


def _with_bucket(
    df: DataFrame, id_col: str, salt: str, out_col: str = "split_bucket"
) -> DataFrame:
    """Attach ``murmur3('{salt}:' || id) % N_BUCKETS`` as a column."""
    key = f"concat('{salt}', ':', cast({id_col} as string))"
    return df.withColumn(
        out_col, F.expr(f"({mmh3_sql_expr(key, 'spark')}) % {N_BUCKETS}")
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "v1",
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
) -> DataFrame:
    """Add ``split_bucket`` (0..9999) and ``split`` label columns.

    Fractions are cumulative bucket ranges in declaration order; they must
    sum to <= 1 (any remainder is labelled NULL, i.e. held out entirely).
    """
    total = sum(f for _, f in fractions)
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    out = _with_bucket(df, id_col, salt)
    expr: Column = F.lit(None).cast("string")
    hi = 0.0
    cases = []
    for name, frac in fractions:
        hi += frac
        cases.append((int(round(hi * N_BUCKETS)), name))
    for threshold, name in reversed(cases):
        expr = F.when(F.col("split_bucket") < threshold, F.lit(name)).otherwise(expr)
    return out.withColumn("split", expr)


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic ``fraction`` subsample: keep iff bucket < fraction*1e4.

    Unlike ``df.sample()``, membership is a pure function of the id — re-runs
    and incremental appends see a consistent subset, and changing the salt
    draws an independent subset.
    """
    out = _with_bucket(df, id_col, salt, out_col="__sample_bucket")
    keep = F.col("__sample_bucket") < int(round(fraction * N_BUCKETS))
    return out.where(keep).drop("__sample_bucket")


def temperature_sample(
    df: DataFrame,
    source_col: str,
    target_rows: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mix",
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled source mixing (the GPT-3/mBERT resampling rule):
    source ``i`` is sampled with probability ∝ ``n_i^alpha``, flattening
    the source distribution (alpha<1 upweights low-resource sources), and
    per-source keep fractions are solved so the expected output is
    ``target_rows``. Membership is the same murmur3(salt:id) bucket as
    every other sampler here — deterministic, map-only after a dim-sized
    count aggregate that broadcasts back.

    ``weight_col`` (e.g. a token count) switches the source masses from
    row counts to column sums — the usual production setting where the
    mixture targets token budgets rather than document counts; the keep
    decision stays per-document.

    Cross-engine note: ``alpha=0.5`` computes weights via ``sqrt``
    (correctly-rounded IEEE — bit-identical across engines, so the gate
    oracle reproduces thresholds exactly); other alphas use ``power``,
    whose last-ulp behavior is libm-specific — fine in production, not
    oracle-exact.
    """
    w_sql = (
        "sqrt(cast(__n as double))"
        if alpha == 0.5
        else f"power(cast(__n as double), {alpha!r})"
    )
    mass = (
        F.sum(F.col(weight_col).cast("bigint")) if weight_col else F.count("*")
    )
    counts = df.groupBy(source_col).agg(mass.alias("__n"))
    # decimal sum: order-independent across partitions/engines
    tot = counts.agg(
        F.expr(f"sum(cast({w_sql} as decimal(30,10)))").alias("__wsum")
    )
    dim = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.expr(
            f"cast(floor(least(cast(1.0 as double),"
            f" {target_rows} * {w_sql}"
            f" / (cast(__wsum as double) * cast(__n as double)))"
            f" * {N_BUCKETS}) as int)"
        ).alias("__thr"),
    )
    out = _with_bucket(df, id_col, salt, out_col="__mix_bucket")
    return (
        out.join(F.broadcast(dim), source_col)
        .where(F.col("__mix_bucket") < F.col("__thr"))
        .drop("__mix_bucket", "__thr")
    )


def split_leakage(
    pairs: DataFrame,
    splits: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Near-duplicate pairs whose members landed in DIFFERENT splits —
    the leakage audit run after dedup + splitting (a test doc with a
    train near-twin silently inflates eval scores). ``pairs`` is any
    (a, b, ...) near-dup relation (minhash/simhash/embedding);
    ``splits`` maps id → split label.

    Two equi-joins of the (small) pair set against the split dim; the
    corpus never re-shuffles. NULL splits (held-out remainder) count as
    distinct from every label.
    """
    sa = splits.select(
        F.col(id_col).alias(a_col), F.col(split_col).alias("split_a")
    )
    sb = splits.select(
        F.col(id_col).alias(b_col), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(sa, a_col)
        .join(sb, b_col)
        .where(~F.col("split_a").eqNullSafe(F.col("split_b")))
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    Efraimidis–Spirakis A-Res rule): each row draws a reproducible
    uniform ``u`` from its murmur3(salt:id) hash and ranks by
    ``ln(u) / w`` (order-equivalent to the classic ``u^(1/w)`` key —
    log-domain avoids underflow for large weights); the global top-``k``
    keys win. Rows with ``w <= 0`` are excluded, as the rule requires.

    Map-only + ``orderBy().limit()`` = TakeOrderedAndProject: each
    partition keeps a local top-``k`` and only ``k`` rows ever move —
    no global sort, no full shuffle, any corpus size. Re-runs and
    appends keep previous picks unless a heavier newcomer displaces
    them. Keys round to 9dp (ties break on id) so the DuckDB oracle —
    same hash CTE, same formula — selects the identical set; ``ln`` is
    within 1 ulp on both engines, far inside the 9dp quantization.
    """
    key_sql = mmh3_sql_expr(
        f"concat('{salt}', ':', cast({id_col} as string))", "spark"
    )
    wkey = (
        f"round(ln(({key_sql} + 0.5) / 4294967296.0)"
        f" / cast({weight_col} as double), 9)"
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__wkey", F.expr(wkey))
        .orderBy(F.col("__wkey").desc(), F.col(id_col).asc())
        .limit(int(k))
        .drop("__wkey")
    )


def assign_shard(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", salt: str = "shard"
) -> DataFrame:
    """Add ``shard`` (0..n_shards-1) — same deterministic murmur3 bucket
    family as splits, so shard membership survives re-runs, appends, and
    cluster-size changes."""
    out = _with_bucket(df, id_col, salt, out_col="__shard_bucket")
    return out.withColumn(
        "shard", F.col("__shard_bucket") % n_shards
    ).drop("__shard_bucket")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    mode: str = "error",
) -> None:
    """Materialize a curated corpus as ``shard=K/`` parquet directories.

    The sink half of the training pipeline: downstream loaders read one
    shard per worker, and determinism of the shard hash means incremental
    re-runs append the same documents to the same shards. One shuffle
    (repartition on shard) so each shard directory is written by a single
    task as one file at this scale; on a cluster raise n_shards until
    shard size ~ a few hundred MB and the same code holds.
    """
    sharded = assign_shard(df, n_shards, id_col, salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    default_fraction: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. rebalance languages:
    ``{'en': 0.3}`` keeps 30% of English docs, everything else intact).

    The keep decision is a when-chain on the stratum column over the same
    id-hash bucket — still map-only; no join, no shuffle.
    """
    out = _with_bucket(df, id_col, salt, out_col="__sample_bucket")
    thr: Column = F.lit(int(round(default_fraction * N_BUCKETS)))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * N_BUCKETS)))
        ).otherwise(thr)
    return out.where(F.col("__sample_bucket") < thr).drop("__sample_bucket")


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    salt: str = "gsample",
) -> DataFrame:
    """Deterministic uniform ``k``-sample per group (per domain, per
    source, per language): rows rank within their group by
    murmur3(salt:id) — a reproducible uniform draw — with the id as
    tie-break, and the first ``k`` survive.

    Two-phase salted selection on ``group_cols`` (``pipeline/topk.py``;
    the same shape as ``text.cap_per_group``, which ranks by *quality*
    where this ranks by an unbiased hash — parallelism is never bounded
    by the group cardinality). Membership is a pure function of row values:
    stable across re-runs, partitionings, and cluster sizes; appends
    only evict a previous pick when a lower-hash newcomer arrives in its
    group.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if not group_cols:
        raise ValueError("sample_per_group requires non-empty group_cols")
    from .topk import topk_per_group

    # r7: two-phase exact selection (pipeline/topk.py) — a window keyed
    # only by low-cardinality group_cols would bound parallelism by the
    # group count at any cluster size
    key = f"concat('{salt}', ':', cast({id_col} as string))"
    return (
        topk_per_group(
            df.withColumn("__gs_hash", F.expr(mmh3_sql_expr(key, "spark"))),
            list(group_cols),
            [F.col("__gs_hash").asc(), F.col(id_col).asc()],
            int(k),
            id_col,
        )
        .drop("__gs_hash")
    )


def leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    salt: str = "v1",
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
    components: DataFrame | None = None,
) -> DataFrame:
    """Split assignment that can never leak near-duplicates across the
    train/val/test boundary: documents are first clustered into
    near-dup connected components (``pairs`` = undirected near-dup
    edges, e.g. MinHash-verified Jaccard pairs), then the WHOLE
    component is hashed into a split by its min-id label. Any two docs
    `split_leakage` would flag as a cross-split pair are by construction
    in the same component, hence the same split.

    Returns (doc_id, component, split_bucket, split) — the same bucket
    grammar as :func:`assign_split`, keyed on the component instead of
    the document, so singleton docs (their own component) keep exactly
    the assignment ``assign_split`` would give them.

    Scale: component labels come from the bounded min-label propagation
    of ``connected_components`` (edge-sized shuffles, iteration capped);
    the split itself is one murmur3 column expression — no extra
    shuffle beyond the (doc_id, component) join.

    ``components`` (r8): a precomputed (node, component) labeling — e.g.
    from a persisted :mod:`dedup_index` artifact — skips the propagation
    loop entirely; several consumers of one pair graph should compute
    components ONCE and pass them here.
    """
    if components is None:
        if pairs is None:
            raise ValueError(
                "leakage_safe_splits needs either near-dup `pairs` or a "
                "precomputed `components` labeling"
            )
        from .components import connected_components

        comps = connected_components(
            pairs, nodes=docs.select(id_col), id_col_a="a", id_col_b="b"
        ).select(F.col("node").alias(id_col), "component")
    else:
        comps = components.select(
            F.col(components.columns[0]).alias(id_col),
            F.col("component"),
        )
    labeled = docs.select(id_col).join(comps, id_col)
    return assign_split(
        labeled, id_col="component", salt=salt, fractions=fractions
    ).select(id_col, "component", "split_bucket", "split")
