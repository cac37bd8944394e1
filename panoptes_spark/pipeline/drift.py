"""Distribution-drift detection: per-key two-sample Kolmogorov–Smirnov.

The monitoring question between two corpus snapshots or telemetry
windows: "did the value distribution change, per key?" The KS statistic
``max_v |F_a(v) - F_b(v)|`` is the standard nonparametric answer.

This operator is the engine's ``cogroup`` showcase: the two sides are
grouped on the key and each (group_a, group_b) pandas pair is scored in
one vectorized numpy pass (sort + searchsorted ECDFs over the union
grid) — Arrow-batched, keyed, no driver involvement. The statistic is
fully deterministic (exact rational cumulative counts, one correctly-
rounded division per grid point, 6 dp rounding), so a pure-SQL twin —
RANGE-framed cumulative counts over the pooled points — reproduces it
hash-exactly; the gate proves the two formulations agree.

Keys present on only one side emit nothing (no distribution to compare);
callers wanting them use an anti-join on the key sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ks_drift", "ks_oracle_sql"]


def ks_drift(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key KS statistic between ``a`` and ``b``'s ``value_col``
    distributions. Returns key cols + (n_a, n_b, ks)."""
    import numpy as np
    import pandas as pd

    if not key_cols:
        raise ValueError("ks_drift requires key columns")
    ktypes = dict(a.dtypes)
    schema = (
        ", ".join(f"{k} {ktypes[k]}" for k in key_cols)
        + ", n_a long, n_b long, ks double"
    )

    def ks(key, pa: pd.DataFrame, pb: pd.DataFrame) -> pd.DataFrame:
        na, nb = len(pa), len(pb)
        if na == 0 or nb == 0:
            return pd.DataFrame(
                columns=list(key_cols) + ["n_a", "n_b", "ks"]
            )
        va = np.sort(pa[value_col].to_numpy(dtype=np.float64))
        vb = np.sort(pb[value_col].to_numpy(dtype=np.float64))
        grid = np.union1d(va, vb)
        fa = np.searchsorted(va, grid, side="right") / np.float64(na)
        fb = np.searchsorted(vb, grid, side="right") / np.float64(nb)
        stat = round(float(np.max(np.abs(fa - fb))), 6)
        return pd.DataFrame(
            [list(key) + [na, nb, stat]],
            columns=list(key_cols) + ["n_a", "n_b", "ks"],
        )

    return (
        a.select(*key_cols, value_col)
        .groupBy(*key_cols)
        .cogroup(b.select(*key_cols, value_col).groupBy(*key_cols))
        .applyInPandas(ks, schema)
    )


def ks_oracle_sql(
    a_sql: str, b_sql: str, key: str, value: str = "v"
) -> str:
    """DuckDB twin: pooled points, RANGE-framed cumulative counts (ties
    collapse under RANGE), max |ECDF_a - ECDF_b| per key."""
    return f"""
WITH pa AS ({a_sql}), pb AS ({b_sql}),
pts AS (
  SELECT {key}, {value} AS v, 1 AS ia, 0 AS ib FROM pa
  UNION ALL
  SELECT {key}, {value}, 0, 1 FROM pb
),
cum AS (
  SELECT {key}, v,
    sum(ia) OVER (PARTITION BY {key} ORDER BY v
      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
    sum(ib) OVER (PARTITION BY {key} ORDER BY v
      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
  FROM pts
),
tot AS (SELECT {key}, sum(ia) AS n_a, sum(ib) AS n_b FROM pts GROUP BY 1)
-- CAST AS BIGINT: DuckDB sum() is HUGEINT, which pandas widens to
-- float64 and the driver's exact-hash canon rejects vs Spark's bigint
SELECT {key}, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  round(max(abs(ca / CAST(n_a AS DOUBLE) - cb / CAST(n_b AS DOUBLE))), 6)
    AS ks
FROM cum JOIN tot USING ({key})
WHERE n_a > 0 AND n_b > 0
GROUP BY {key}, n_a, n_b
"""
