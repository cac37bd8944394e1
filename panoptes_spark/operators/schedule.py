"""W6: uniform scheduling splay (reference parity).

The reference spreads plugin executions over the schedule interval with a
deterministic hash splay and resumes from the previous scheduler's
checkpoint:

- ``splay_s = mmh3.hash(name, signed=False) % min(interval, 60)``
  (``framework/celery_manager.py:252-254``)
- resume: if ``last_uniformly_scheduled_at + interval >= now >
  last_uniformly_scheduled_at`` the entry keeps the previous cadence and
  runs at ``last_uniformly_scheduled_at + interval``; otherwise it is
  re-splayed at ``now + splay_s`` (``celery_manager.py:234-255``).
- ``is_due``/checkpoint write-back (``celery_manager.py:273-310``) is the
  driver/trigger side and out of scope here; this operator computes the
  schedule assignment itself as a DataFrame transform.

MurmurHash3 x86 32-bit is implemented three ways, all canonical
(Austin Appleby's public-domain MurmurHash3_x86_32, smhasher):

- :func:`murmur3_x86_32` — pure-Python oracle for tests and driver-side
  checks.
- :func:`mmh3_sql_steps` — a chained column-expression pipeline in either
  Spark SQL or DuckDB SQL. Chunks are folded with ``aggregate`` /
  ``list_reduce`` (no per-row Python, stays in whole-stage codegen), and
  the finalization steps are bound to intermediate columns so the
  expression tree stays linear. 32-bit wraparound arithmetic is emulated
  on BIGINT with split multiplication: ``(a*b) mod 2^32 =
  ((a%2^16)*b + ((a div 2^16)*b % 2^16)*2^16) mod 2^32`` — every
  intermediate stays below 2^49.

The SQL path extracts bytes with ``ascii(substring(...))`` and therefore
requires ASCII names (byte == code point). Panoptes schedule-entry names
are ``plugin_name:resource`` identifier strings, which are ASCII; the
pure-Python path handles arbitrary UTF-8.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_FIN1 = 0x85EBCA6B
_FIN2 = 0xC2B2AE35
_HM = 0xE6546B64
_M32 = 1 << 32

#: reference cap on the splay window (celery_manager.py:252): the splay is
#: uniform over min(interval, 60) seconds.
SPLAY_CAP_S = 60


def murmur3_x86_32(data: bytes | str, seed: int = 0, signed: bool = False) -> int:
    """Canonical MurmurHash3_x86_32 (pure Python).

    Matches ``mmh3.hash(data, seed, signed=...)`` — the reference calls it
    with ``signed=False`` for the splay (celery_manager.py:252).
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    h = seed & 0xFFFFFFFF
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * _C1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * _C2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + _HM) & 0xFFFFFFFF
    tail = data[4 * nblocks :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * _C2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * _FIN1) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * _FIN2) & 0xFFFFFFFF
    h ^= h >> 16
    if signed and h >= 1 << 31:
        return h - _M32
    return h


# ---------------------------------------------------------------------------
# SQL expression generation (dialects: spark, duckdb)
# ---------------------------------------------------------------------------


def _dialect_ops(dialect: str) -> dict[str, Callable[..., str]]:
    if dialect == "spark":
        return {
            "xor": lambda a, b: f"(({a}) ^ ({b}))",
            "fdiv": lambda a, b: f"(({a}) div {b})",
            "byte": lambda s, pos: f"cast(ascii(substring({s}, {pos}, 1)) as bigint)",
            "blen": lambda s: f"cast(octet_length({s}) as bigint)",
        }
    if dialect == "duckdb":
        return {
            "xor": lambda a, b: f"xor(({a}), ({b}))",
            "fdiv": lambda a, b: f"(({a}) // {b})",
            "byte": lambda s, pos: f"cast(ord(substring({s}, {pos}, 1)) as bigint)",
            "blen": lambda s: f"cast(octet_length(encode({s})) as bigint)",
        }
    raise ValueError(f"unknown dialect: {dialect}")


def mmh3_sql_steps(
    name_sql: str, dialect: str, prefix: str = "__mm", seed: int = 0
) -> list[tuple[str, str]]:
    """Ordered (column_alias, sql_expr) steps computing the UNSIGNED
    murmur3_x86_32 of the ASCII string expression ``name_sql``.

    Each step may reference earlier aliases; the final alias is
    ``{prefix}_hash``. Feed to successive ``withColumn`` (Spark) or a
    chained-CTE SELECT (DuckDB oracle).
    """
    o = _dialect_ops(dialect)
    xor, fdiv, byte = o["xor"], o["fdiv"], o["byte"]

    def mul32(a: str, b: int) -> str:
        return (
            f"(((({a}) % 65536) * {b} + (({fdiv(a, 65536)}) * {b}) % 65536 * 65536)"
            f" % {_M32})"
        )

    def rotl(x: str, r: int) -> str:
        return f"((({x}) * {1 << r}) % {_M32} + {fdiv(x, 1 << (32 - r))})"

    def premix(k: str) -> str:
        return mul32(rotl(mul32(k, _C1), 15), _C2)

    def hmix(h: str, k: str) -> str:
        return f"({mul32(rotl(xor(h, k), 13), 5)} + {_HM}) % {_M32}"

    n, nc = f"{prefix}_n", f"{prefix}_nc"
    chunk = " + ".join(
        f"{byte(name_sql, f'i*4-{3 - j}')} * {1 << (8 * j)}" for j in range(4)
    )
    if dialect == "spark":
        # sequence(1, 0) would yield a DESCENDING [1, 0] — guard nc = 0.
        body = (
            f"CASE WHEN {nc} = 0 THEN cast({seed} as bigint) ELSE "
            f"aggregate(transform(sequence(1, {nc}), i -> {premix(chunk)}), "
            f"cast({seed} as bigint), (h, k) -> {hmix('h', 'k')}) END"
        )
    else:
        body = (
            f"list_reduce(list_prepend(cast({seed} as bigint), "
            f"list_transform(range(1, {nc} + 1), i -> {premix(chunk)})), "
            f"(h, k) -> {hmix('h', 'k')})"
        )
    base = f"{nc} * 4"
    tailk = (
        f"({byte(name_sql, f'{base} + 1')}"
        f" + CASE WHEN {n} % 4 >= 2 THEN {byte(name_sql, f'{base} + 2')} * 256"
        f" ELSE 0 END"
        f" + CASE WHEN {n} % 4 >= 3 THEN {byte(name_sql, f'{base} + 3')} * 65536"
        f" ELSE 0 END)"
    )
    h0, ht = f"{prefix}_h0", f"{prefix}_ht"
    f1, f2, f3, f4, f5 = (f"{prefix}_f{i}" for i in range(1, 6))
    return [
        (n, o["blen"](name_sql)),
        (nc, fdiv(n, 4)),
        (h0, body),
        (
            ht,
            f"CASE WHEN {n} % 4 = 0 THEN {h0} "
            f"ELSE {xor(h0, premix(tailk))} END",
        ),
        (f1, xor(ht, n)),
        (f2, xor(f1, fdiv(f1, 65536))),
        (f3, mul32(f2, _FIN1)),
        (f4, xor(f3, fdiv(f3, 8192))),
        (f5, mul32(f4, _FIN2)),
        (f"{prefix}_hash", xor(f5, fdiv(f5, 65536))),
    ]


def mmh3_sql_expr(name_sql: str, dialect: str, seed: int = 0) -> str:
    """Single-expression murmur3_x86_32 with TRUE let-bindings.

    Folds :func:`mmh3_sql_steps` into one expression where each
    intermediate is bound as a single-element-array lambda variable
    (``transform(array(e), x -> body)[1]``). Without this, a chain of
    ``withColumn`` steps gets collapsed by Catalyst into one projection
    that textually inlines every reference — the duplication is
    exponential (measured: a 6 MiB task binary and ~3 s of planning per
    query for two chained hashes). Lambda variables are evaluated once,
    keeping the expression linear in the step count.
    """

    def let(var: str, value: str, body: str) -> str:
        if dialect == "spark":
            return f"element_at(transform(array({value}), {var} -> {body}), 1)"
        return f"list_transform([{value}], {var} -> {body})[1]"

    steps = mmh3_sql_steps(name_sql, dialect, seed=seed)
    expr = steps[-1][1]
    for alias, value in reversed(steps[:-1]):
        expr = let(alias, value, expr)
    return expr


def mmh3_cte_chain(
    base_rel: str, name_sql: str, dialect: str = "duckdb", prefix: str = ""
) -> str:
    """CTE bodies chaining the murmur3 steps over relation ``base_rel``.

    Returns ``"s0 AS (...), s1 AS (...), ... , mmh3 AS (SELECT ...)"`` —
    splice after a WITH clause; the final relation ``{prefix}mmh3``
    carries every base column plus ``__mm_hash``. ``prefix`` namespaces
    the generated relation names so two chains can share one WITH clause
    (relation names are GENERATED here, never patched by string replace
    at the call site).
    """
    steps = mmh3_sql_steps(name_sql, dialect)
    ctes, prev = [], base_rel
    for i, (alias, expr) in enumerate(steps):
        rel = (
            f"{prefix}mmh3" if i == len(steps) - 1 else f"{prefix}__mm_s{i}"
        )
        ctes.append(f"{rel} AS (SELECT *, {expr} AS {alias} FROM {prev})")
        prev = rel
    return ", ".join(ctes)


# ---------------------------------------------------------------------------
# W6 operator
# ---------------------------------------------------------------------------


def uniform_schedule(
    df: DataFrame,
    now: float,
    name_col: str = "schedule_name",
    interval_col: str = "interval_s",
    last_col: str = "last_uniformly_scheduled_at",
) -> DataFrame:
    """Assign uniform-splay execution times (celery_manager.py:224-258).

    Adds:
    - ``splay_s``    — ``mmh3(name, signed=False) % min(interval, 60)``
    - ``resumed``    — picked up the previous scheduler's cadence
    - ``run_at``     — ``last + interval`` when resumed else ``now + splay_s``

    Pure column expressions (murmur3 via ``aggregate`` fold) — no shuffle,
    no Python; scales as a map-only stage over any resource count.
    """
    out_cols = df.columns
    df = df.withColumn("__mm_hash", F.expr(mmh3_sql_expr(name_col, "spark")))
    interval = F.col(interval_col).cast("bigint")
    last = F.col(last_col).cast("double")
    splay = F.col("__mm_hash") % F.least(interval, F.lit(SPLAY_CAP_S))
    expected = last + interval
    resumed = last.isNotNull() & (expected >= F.lit(now)) & (F.lit(now) > last)
    run_at = F.when(resumed, expected).otherwise(F.lit(now) + splay.cast("double"))
    return df.select(
        *out_cols,
        splay.alias("splay_s"),
        F.coalesce(resumed, F.lit(False)).alias("resumed"),
        run_at.alias("run_at"),
    )
