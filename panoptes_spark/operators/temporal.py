"""Temporal joins: as-of alignment and point-in-interval containment.

Beyond-reference operators for the telemetry/training pipelines. The
reference's only temporal join is the rate transform's implicit
"previous sample of the same series" lookup
(``/root/reference/yahoo_panoptes/polling/polling_plugin_agent.py:178-242``,
re-expressed in ``operators/rate.py``); a production pipeline also needs
the general forms:

- **as-of join** — attach, to every left row, the most recent right row
  at or before it (per key): align metric points to the enrichment
  snapshot that was current when the point was produced, join quotes to
  trades, etc.
- **interval join** — match points to containing ``[start, end)``
  intervals: events to maintenance windows, samples to incident spans.

Spark-first design notes (100 TB):

``asof_join`` does NOT use an inequality join (which Spark plans as a
broadcast-nested-loop or cartesian — quadratic blowup). It unions both
sides, shuffles ONCE on the key columns, and resolves the match with a
running ``last(..., ignorenulls=True)`` window — the same single-shuffle
shape as sessionize. Wall-clock scales as one sort of |L|+|R| per key;
no pair explosion, no driver state. At equal timestamps the right row
sorts first, so ``l.ts >= r.ts`` semantics (backward) include ties —
identical to DuckDB's ``ASOF JOIN`` operator, which the oracle gate uses
as an independent implementation.

``interval_join`` avoids the range-join explosion by bucketing time into
fixed ``bin_ms`` bins: each interval explodes to the bins it overlaps
(bounded by ``max_bins`` against degenerate month-long intervals), each
point lands in exactly ONE bin, and the join becomes an equi-join on
(key, bin) + a residual containment filter. A point is joined through
its single bin only, so no post-join dedup is needed. Bin size trades
interval fan-out against bucket selectivity; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "pit_features"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts_ms",
    right_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
    direction: str = "backward",
    prefix: str = "matched_",
) -> DataFrame:
    """For every left row, attach the most recent right row at-or-before
    it (``direction='backward'``) or the earliest at-or-after it
    (``'forward'``), matching on the ``by`` key columns.

    ``right`` must be unique per (by, ts) — pre-aggregate it otherwise
    (the gate does ``max(value) GROUP BY key, ts``); with duplicates the
    surviving row would depend on shuffle order.

    Output: all left columns, plus for each of ``right_cols`` a
    ``{prefix}{col}`` column (NULL when no match / out of tolerance),
    plus ``{prefix}{ts_col}`` and ``staleness_ms`` (always >= 0; for
    forward joins it is the wait until the matched row).

    Single shuffle on ``by``; never builds L×R pairs.
    """
    if not by:
        raise ValueError("asof_join requires non-empty `by` keys")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in by and c != ts_col
        ]

    # Union layout: key cols + ts + side + left payload + right payload.
    # Backward: right sorts BEFORE left at equal ts (>= includes ties).
    # Forward: scan runs in descending ts, right still first at ties.
    left_payload = [c for c in left.columns if c not in by and c != ts_col]
    lhs = left.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left_payload],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    rhs = right.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    both = lhs.unionByName(rhs)

    order = (
        [F.col("__ts").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m_ts = F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w)
    matched = both.withColumn("__m_ts", m_ts)
    for c in right_cols:
        matched = matched.withColumn(
            f"__m_{c}",
            F.last(
                F.when(F.col("__side") == 0, F.col(f"__r_{c}")), ignorenulls=True
            ).over(w),
        )

    out = matched.where(F.col("__side") == 1)
    staleness = (
        F.col("__ts") - F.col("__m_ts")
        if direction == "backward"
        else F.col("__m_ts") - F.col("__ts")
    )
    ok = F.col("__m_ts").isNotNull()
    if tolerance_ms is not None:
        ok = ok & (staleness <= F.lit(int(tolerance_ms)))
    return out.select(
        *by,
        F.col("__ts").alias(ts_col),
        *[F.col(f"__l_{c}").alias(c) for c in left_payload],
        F.when(ok, F.col("__m_ts")).alias(f"{prefix}{ts_col}"),
        *[F.when(ok, F.col(f"__m_{c}")).alias(f"{prefix}{c}") for c in right_cols],
        F.when(ok, staleness).alias("staleness_ms"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: list[str],
    ts_col: str = "ts_ms",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
    bin_ms: int = 86_400_000,
    max_bins: int = 4096,
) -> DataFrame:
    """Inner-join points to the ``[start, end)`` intervals containing
    them (same ``by`` key). Returns points columns + intervals columns.

    Equi-join on (by, time-bin): intervals explode to the bins they
    overlap; each point is in exactly one bin, so matches are exact and
    never duplicated. ``max_bins`` guards the fan-out against degenerate
    intervals — choose ``bin_ms`` near the typical interval length.
    """
    binned_pts = points.withColumn("__bin", (F.col(ts_col) / bin_ms).cast("long"))
    span_bins = (
        F.col(end_col) / bin_ms
    ).cast("long") - (F.col(start_col) / bin_ms).cast("long")
    binned_iv = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .withColumn("__nbins", span_bins)
        .where(F.col("__nbins") < F.lit(int(max_bins)))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    (F.col(start_col) / bin_ms).cast("long"),
                    # end is exclusive: a bin containing only ts == end
                    # can't match, but (end-1) div bin still can
                    ((F.col(end_col) - 1) / bin_ms).cast("long"),
                )
            ),
        )
        .drop("__nbins")
    )
    joined = binned_pts.join(binned_iv, on=by + ["__bin"], how="inner")
    return joined.where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("__bin")


def pit_features(
    labels: DataFrame,
    features: dict[str, DataFrame],
    by: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Point-in-time multi-feature join (the feature-store primitive):
    for every label row, attach the latest at-or-before value of EVERY
    feature stream — leakage-free by construction (a feature written
    after the label's timestamp can never be seen).

    ``features`` maps feature name -> (by, ts, value) DataFrame, each
    unique per (by, ts) like :func:`asof_join`'s right side; values are
    cast to double. Output: label columns + per feature ``{name}`` and
    ``{name}_staleness_ms`` (NULL when absent or staler than
    ``tolerance_ms``).

    Scale: K separate as-of joins would shuffle the label stream K
    times. Here all streams melt into ONE long relation (by, ts, side,
    feature, value) and a single keyed shuffle + sort resolves every
    feature with K conditional ``last(ignorenulls)`` expressions over
    the same window — shuffle volume is labels + Σ features, once,
    independent of K. Ties (feature at the label's exact ts) sort
    feature-first, so at-or-before includes them; conditional lasts
    make inter-feature tie order irrelevant.
    """
    if not by:
        raise ValueError("pit_features requires non-empty `by` keys")
    if not features:
        raise ValueError("pit_features requires at least one feature")
    names = sorted(features)
    taken = set(labels.columns)
    for name in names:
        if name in taken or f"{name}_staleness_ms" in taken:
            raise ValueError(
                f"feature name {name!r} collides with a label column"
            )
    payload = [c for c in labels.columns if c not in by and c != ts_col]
    ltypes = dict(labels.dtypes)

    lhs = labels.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("string").alias("__fname"),
        F.lit(None).cast("double").alias("__fval"),
        *[F.col(c).alias(f"__l_{c}") for c in payload],
    )
    long_rel = lhs
    for name in names:
        f = features[name]
        long_rel = long_rel.unionByName(
            f.select(
                *by,
                F.col(ts_col).alias("__ts"),
                F.lit(0).alias("__side"),
                F.lit(name).alias("__fname"),
                F.col(value_col).cast("double").alias("__fval"),
                *[
                    F.lit(None).cast(ltypes[c]).alias(f"__l_{c}")
                    for c in payload
                ],
            )
        )

    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # all 2K lasts in ONE select so they collapse into a single Window
    # node (withColumn would interleave projections that block Spark's
    # CollapseWindow rule, stacking K window operators)
    wexprs = []
    for name in names:
        is_f = F.col("__fname") == name
        wexprs.append(
            F.last(F.when(is_f, F.col("__fval")), ignorenulls=True)
            .over(w)
            .alias(f"__v_{name}")
        )
        wexprs.append(
            F.last(F.when(is_f, F.col("__ts")), ignorenulls=True)
            .over(w)
            .alias(f"__t_{name}")
        )
    long_rel = long_rel.select("*", *wexprs)

    out_cols = [*by, F.col("__ts").alias(ts_col)]
    out_cols += [F.col(f"__l_{c}").alias(c) for c in payload]
    for name in names:
        age = F.col("__ts") - F.col(f"__t_{name}")
        fresh = (
            age <= F.lit(int(tolerance_ms))
            if tolerance_ms is not None
            else F.col(f"__t_{name}").isNotNull()
        )
        out_cols.append(F.when(fresh, F.col(f"__v_{name}")).alias(name))
        out_cols.append(
            F.when(fresh, age).alias(f"{name}_staleness_ms")
        )
    return long_rel.where(F.col("__side") == 1).select(*out_cols)
