"""Key-value/table-store operators: S5 namespace scan, S10/S11 TTL
upserts, W3 TTL expiry.

Reference: ``framework/utilities/key_value_store.py`` (namespaced,
TTL'ed, sharded Redis) + the enrichment/resource store sinks
(``enrichment_plugin_agent.py:151-199``, ``resources.py:535-569``).

Spark mapping: the store is a keyed table with an ``expires_at`` column —
Redis ``SET ... EX ttl`` becomes upsert + expires_at; Redis lazy expiry
becomes a read-side filter (W3). On a real deployment this is a Delta
MERGE; here it's the equivalent join-based merge so it runs anywhere.
Redis's mmh3 key-sharding (``key_value_store.py:68-78``) is Spark's hash
partitioning — free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_with_ttl(
    store: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    now: float,
    ttl_col: str = "ttl",
) -> DataFrame:
    """SET key value EX ttl for every update row: replace-on-collision
    (enrichment.py:277-278 discard+add), expires_at = now + ttl."""
    upd = updates.withColumn(
        "expires_at", F.lit(now) + F.col(ttl_col).cast("double")
    ).drop(ttl_col)
    kept = store.join(upd.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(upd, allowMissingColumns=True)


def expire(store: DataFrame, now: float) -> DataFrame:
    """W3: drop expired rows (the read-side equivalent of Redis expiry)."""
    return store.where(
        F.col("expires_at").isNull() | (F.col("expires_at") > F.lit(now))
    )


def scan_namespace(
    store: DataFrame, prefix: str, key_col: str = "key"
) -> DataFrame:
    """S5: pattern scan with namespace-prefix pushdown
    (key_value_store.py:170-193 find_keys)."""
    return store.where(F.col(key_col).startswith(prefix))
