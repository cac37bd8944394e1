"""Declarative data-quality auditing: column profiles and constraint
checks over arbitrary tables (the Deequ/Great-Expectations shape,
Spark-first).

A 100 TB ingest pipeline gates every batch on invariants — keys unique,
foreign keys resolvable, values in range, enums closed — and records a
per-column profile next to the data. The reference validates individual
records with Cerberus schemas (``operators/enrichment_validate.py``
re-expresses those); this module is the corpus-level complement: one
relational report per table, not one verdict per row.

Spark-first design notes (100 TB):

- ``profile_columns`` is ONE aggregate pass producing a single wide row
  that unpivots to long form via ``stack`` — the table is scanned once.
  Exact distinct counts use ``count_distinct`` (Spark expands the scan
  |cols|+1 ways through one Expand node — still one shuffle); pass
  ``exact_distinct=False`` to switch to ``approx_count_distinct`` (HLL,
  no expansion) for wide tables at full scale.
- Every check compiles to a conditional aggregate over the same single
  scan; only ``referential`` adds a join, and it ships just the key
  column into a left-anti lookup (dim side broadcast when small).
- Output is data, not exceptions: (check, target, n_violations, passed)
  rows compose into gating logic downstream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "matches_regex",
    "referential",
    "run_checks",
    "profile_columns",
    "label_balance",
]


@dataclass(frozen=True)
class Check:
    """One declarative constraint; ``kind`` and ``target`` name it in the
    report, the payload fields drive compilation in ``run_checks``."""

    kind: str
    target: str
    cols: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    values: tuple[str, ...] = ()
    pattern: str | None = None
    other: DataFrame | None = field(default=None, compare=False)
    other_col: str | None = None


def not_null(col: str) -> Check:
    return Check("not_null", col, cols=(col,))


def unique(*cols: str) -> Check:
    if not cols:
        raise ValueError("unique() needs at least one column")
    return Check("unique", ",".join(cols), cols=tuple(cols))


def in_range(col: str, lo: float, hi: float) -> Check:
    """Violated by values outside [lo, hi]; NULLs are not violations
    (pair with ``not_null`` to forbid them)."""
    return Check("in_range", col, cols=(col,), lo=float(lo), hi=float(hi))


def accepted_values(col: str, values: list[str]) -> Check:
    if not values:
        raise ValueError("accepted_values() needs a non-empty value list")
    return Check("accepted_values", col, cols=(col,), values=tuple(values))


def matches_regex(col: str, pattern: str) -> Check:
    return Check("matches_regex", col, cols=(col,), pattern=pattern)


def referential(col: str, other: DataFrame, other_col: str) -> Check:
    """Every non-null ``col`` value must exist in ``other.other_col``
    (foreign-key integrity). Violations = orphan ROWS (not distinct
    values)."""
    return Check("referential", col, cols=(col,), other=other, other_col=other_col)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks; returns one row per check:
    (check, target, n_violations bigint, passed boolean), in the input
    check order (an ``ord`` column keeps it joinable/sortable).

    All scan-expressible checks fold into ONE aggregate over one scan;
    each ``referential`` check contributes one anti-join count unioned
    in. Deterministic by construction (counts only).
    """
    if not checks:
        raise ValueError("run_checks() needs at least one check")
    agg_exprs: list = []
    rows: list[tuple[int, str, str] | None] = []  # (ord, kind, target) per agg col
    joins: list[tuple[int, Check]] = []
    for i, c in enumerate(checks):
        if c.kind == "not_null":
            e = F.count_if(F.col(c.cols[0]).isNull())
        elif c.kind == "unique":
            e = F.count(F.lit(1)) - F.count_distinct(*[F.col(x) for x in c.cols])
        elif c.kind == "in_range":
            e = F.count_if(
                F.col(c.cols[0]).isNotNull()
                & ((F.col(c.cols[0]) < c.lo) | (F.col(c.cols[0]) > c.hi))
            )
        elif c.kind == "accepted_values":
            e = F.count_if(
                F.col(c.cols[0]).isNotNull()
                & ~F.col(c.cols[0]).isin(*c.values)
            )
        elif c.kind == "matches_regex":
            e = F.count_if(
                F.col(c.cols[0]).isNotNull()
                & ~F.col(c.cols[0]).rlike(c.pattern)
            )
        elif c.kind == "referential":
            joins.append((i, c))
            continue
        else:
            raise ValueError(f"unknown check kind: {c.kind}")
        rows.append((i, c.kind, c.target))
        agg_exprs.append(e.cast("bigint").alias(f"__c{i}"))

    parts: list[DataFrame] = []
    if agg_exprs:
        wide = df.agg(*agg_exprs)
        stack = ", ".join(
            f"{i}L, '{kind}', '{tgt}', __c{i}" for i, kind, tgt in rows
        )
        parts.append(
            wide.selectExpr(
                f"stack({len(rows)}, {stack}) AS (ord, check, target, n_violations)"
            )
        )
    for idx, chk in joins:
        keys = (
            chk.other.select(F.col(chk.other_col).alias("__k"))
            .where(F.col("__k").isNotNull())
            .distinct()
        )
        orphans = (
            df.select(F.col(chk.cols[0]).alias("__k"))
            .where(F.col("__k").isNotNull())
            .join(keys, "__k", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(idx).cast("bigint").alias("ord"),
                F.lit("referential").alias("check"),
                F.lit(f"{chk.target}->{chk.other_col}").alias("target"),
                "n_violations",
            )
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "ord", "check", "target", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def profile_columns(
    df: DataFrame,
    columns: list[str],
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile in long form: one ``col_name`` row with metrics
    ``n_rows``, ``n_null``, ``n_distinct`` (NULL excluded), and for
    numerically-castable columns ``min_value`` / ``max_value`` (as
    double). Non-numeric columns report NULL min/max rather than
    erroring.

    One scan, one aggregate row, unpivoted via ``stack``.

    The scan is spread before the aggregate (``spread_for_compute``,
    skipped on well-split input): each exact ``count_distinct`` adds an
    Expand projection — ``len(columns)+1`` copies of every row feed the
    partial aggregate — and on a one-row-group parquet input that
    multi-million-row expansion ran in a SINGLE task (r11: the sf0.1
    gate spent 2.2s in a 3-task stage on a 32-core box). The
    round-robin exchange moves raw rows once; the expanded rows then
    partial-aggregate in parallel and only per-partition partials
    shuffle.
    """
    from .dedup import spread_for_compute

    if not columns:
        raise ValueError("profile_columns() needs at least one column")
    df = spread_for_compute(df.select(*columns))
    dcount = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        col = F.col(c)
        num = col.try_cast("double")  # ANSI mode: plain cast throws on 'A'
        aggs += [
            F.count_if(col.isNull()).cast("bigint").alias(f"__null_{c}"),
            dcount(col).cast("bigint").alias(f"__dist_{c}"),
            F.min(num).alias(f"__min_{c}"),
            F.max(num).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', CAST(__n AS DOUBLE), CAST(__null_{c} AS DOUBLE), "
        f"CAST(__dist_{c} AS DOUBLE), __min_{c}, __max_{c}"
        for c in columns
    )
    return wide.selectExpr(
        f"stack({len(columns)}, {stacked}) AS "
        "(col_name, n_rows, n_null, n_distinct, min_value, max_value)"
    )


#: the Wilson score interval, written ONCE as expression text shared by
#: the Spark operator and the DuckDB oracle so every floating-point op
#: evaluates in the same order on both engines (identical doubles in,
#: identical doubles out; z = 1.96 for the 95% interval)
WILSON_CENTER = (
    "(({x} / {n}) + {z} * {z} / (2 * {n})) / (1 + {z} * {z} / {n})"
)
WILSON_HALF = (
    "({z} * sqrt(({x} / {n}) * (1 - ({x} / {n})) / {n}"
    " + {z} * {z} / (4 * {n} * {n}))) / (1 + {z} * {z} / {n})"
)

#: 6 dp quantization as floor(x*1e6 + 0.5), NOT round(x, 6): round()
#: resolves exact .5 ties differently across engines (Spark HALF_UP vs
#: DuckDB binary) — n_class/n_total is a small-integer rational that CAN
#: land exactly on a tie (e.g. n_total = 128), and sqrt makes ties in
#: the bounds unlikely but not impossible. floor on the identical IEEE
#: double is engine-exact (the length_outliers recipe, stats.py).
WILSON_Q6 = "floor(({v}) * 1e6 + 0.5) / 1e6"


def label_balance(
    df: DataFrame,
    group_col: str,
    label_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per-group class balance with Wilson score intervals (Wilson 1927)
    — the label-audit a training set publishes before anyone trusts its
    class priors: the observed share of each label within each group
    plus a CI that stays inside [0, 1] and behaves at small n (where
    the normal approximation does not).

    One (group, label) partial-agg count + a broadcast of the
    group-count dim — nothing data-sized after the first shuffle.
    Returns (group, label, n_class, n_total, share, ci_lo, ci_hi),
    shares and bounds at 6 dp."""
    counts = df.groupBy(group_col, label_col).agg(
        F.count(F.lit(1)).alias("n_class")
    )
    totals = counts.groupBy(group_col).agg(
        F.sum("n_class").alias("n_total")
    )
    args = dict(
        x="cast(n_class as double)", n="cast(n_total as double)", z=repr(z)
    )
    center = WILSON_CENTER.format(**args)
    half = WILSON_HALF.format(**args)
    share = WILSON_Q6.format(v="cast(n_class as double) / n_total")
    lo = WILSON_Q6.format(v=f"greatest(0.0, {center} - {half})")
    hi = WILSON_Q6.format(v=f"least(1.0, {center} + {half})")
    return (
        counts.join(F.broadcast(totals), group_col)
        .select(
            group_col,
            label_col,
            "n_class",
            "n_total",
            F.expr(share).alias("share"),
            F.expr(lo).alias("ci_lo"),
            F.expr(hi).alias("ci_hi"),
        )
    )
