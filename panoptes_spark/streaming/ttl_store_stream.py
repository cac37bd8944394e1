"""Streaming twin of the TTL'ed enrichment/KV store (S10/S11/W3).

The batch form (``sources/stores.py``) is a join-based merge: Redis
``SET key value EX ttl`` becomes upsert + ``expires_at`` and lazy expiry
becomes the W3 read-side filter. On an unbounded update stream the store
row lives in Spark checkpointed state instead, like the reference's
enrichment KV writes (``enrichment_plugin_agent.py:151-199``,
``framework/utilities/key_value_store.py`` ``set(..., expire=ttl)``),
with Redis's ACTIVE expiry modeled as a processing-time state timeout:

- state key: the store key
- state value: (value, expires_at_ms, last_ts_ms)
- per micro-batch: last-write-wins by event timestamp — the reference's
  blind wall-clock ``SET`` is nondeterministic under replay, so the
  stream twin resolves collisions by event time like W5's reconcile
  conflict rule (documented deviation; in-order input is identical)
- on timeout: emit a tombstone (``expired = true``) and drop the state —
  the changelog event a downstream materializer needs to delete the row

Output: an append changelog (key, value, expires_at_ms, expired); the
latest non-tombstone row per key is the live store, matching the batch
``upsert_with_ttl`` + ``expire`` fold over the same updates.

Scale: one small state row per live key; TTL timeouts bound the state
store exactly like Redis key expiry bounds the reference's store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, value string, expires_at_ms long, expired boolean"
STATE_SCHEMA = "value string, expires_at_ms long, last_ts_ms long"


def _latest_update(pdfs: Iterator[pd.DataFrame]):
    """Max-(ts, value, ttl) row across the batch — a total order over
    the WHOLE row, so the winner is independent of micro-batch
    partitioning even when two updates tie on (ts, value) but carry
    different TTLs."""
    best = None
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            cand = (int(row.ts_ms), str(row.value), int(row.ttl_sec))
            if best is None or cand > best:
                best = cand
    return best


def _make_store_fn():
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        if state.hasTimedOut:
            value, expires_at, _ = state.get
            state.remove()
            yield pd.DataFrame(
                [{"key": k, "value": value,
                  "expires_at_ms": expires_at, "expired": True}]
            )
            return

        # The Scala GroupState contract says timeouts "have to be set
        # explicitly every time the function is invoked"; the PySpark
        # applyInPandasWithState bridge observably PRESERVES an
        # untouched timeout across invocations (verified empirically on
        # 4.1: a stale batch without re-arm still expires). Re-arm on
        # every early-return path anyway — it is one cheap call and
        # keeps the no-leak guarantee independent of which semantics a
        # future bridge implements.
        def _rearm_from_state():
            _, exp, last = state.get
            state.setTimeoutDuration(max(int(exp - last), 1))

        best = _latest_update(pdfs)
        if best is None:
            if state.exists:
                _rearm_from_state()
            return
        ts_ms, value, ttl_sec = best
        if state.exists:
            _, _, last_ts = state.get
            if ts_ms <= last_ts:
                # stale replay: the stored row is newer. Re-arm with the
                # stored row's full TTL — active expiry is postponed (to
                # at most one extra TTL per replayed batch) but never
                # cancelled; the read-side lazy filter on expires_at_ms
                # is unaffected.
                _rearm_from_state()
                return
        expires_at = ts_ms + ttl_sec * 1000
        state.update((value, expires_at, ts_ms))
        # active expiry: wall-clock countdown from now, Redis EX
        # semantics; clamp to 1ms — Redis rejects SET EX 0, the stream
        # twin degrades it to expire-immediately instead of crashing
        # the query mid-batch
        state.setTimeoutDuration(max(int(ttl_sec) * 1000, 1))
        yield pd.DataFrame(
            [{"key": k, "value": value,
              "expires_at_ms": expires_at, "expired": False}]
        )

    return fn


def ttl_store_stream(updates: DataFrame) -> DataFrame:
    """updates: streaming DataFrame with (key, value, ts_ms, ttl_sec).
    Returns the append changelog of the TTL'ed store."""
    return updates.groupBy("key").applyInPandasWithState(
        _make_store_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
