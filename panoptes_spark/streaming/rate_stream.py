"""Streaming twin of the rate transform (J6/W1) — applyInPandasWithState.

The batch form (operators/rate.py) is a lag window; on an unbounded stream
the previous sample lives in the state store, exactly like the reference's
Redis GETSET (``polling/polling_plugin_agent.py:178-242``) but with Spark
checkpointed state instead of an external KV:

- state key: the series identity (resource_id, metrics_group_type[, dims])
  — the reference's ``_make_key`` (:157-171)
- state value: (last_value, last_ts_ms)
- state TTL: 3 × interval (reference METRICS_KV_STORE_TTL_MULTIPLE,
  ``framework/const.py:109``) via processing-time timeout
- guards identical to batch: Δt<=0 skip, Δt>TTL skip, Δv<0 (wrap) skip

Outputs match ``rate_transform`` row-for-row for in-order input — tested by
replaying a batch through a memory stream (tests/test_rate_stream.py).

Scale: state is one small row per live series; with series-keyed Kafka
partitioning upstream (S9) the groupBy is shuffle-light, and state-store
compaction is bounded by the TTL cleanup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import METRICS_KV_STORE_TTL_MULTIPLE


def _make_rate_fn(interval_sec: int, ttl_multiple: int, emit_int_rate: bool):
    max_dt = float(ttl_multiple * interval_sec)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=[
                    "resource_id",
                    "metrics_group_type",
                    "ts_ms",
                    "metric_value",
                    "rate",
                    "confidence",
                ]
            )
            return

        last_v, last_t = state.get if state.exists else (None, None)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ms")
            for row in pdf.itertuples(index=False):
                v, t = float(row.metric_value), int(row.ts_ms)
                if last_t is not None:
                    dt = (t - last_t) / 1000.0
                    dv = v - last_v
                    if 0 < dt <= max_dt and dv >= 0:
                        rate = math.floor(dv / dt) if emit_int_rate else dv / dt
                        out_rows.append(
                            (
                                key[0],
                                key[1],
                                t,
                                v,
                                float(rate),
                                round(interval_sec / dt, 6),
                            )
                        )
                if last_t is None or t > last_t:
                    last_v, last_t = v, t
        state.update((last_v, last_t))
        state.setTimeoutDuration(int(max_dt * 1000))
        yield pd.DataFrame(
            out_rows,
            columns=[
                "resource_id",
                "metrics_group_type",
                "ts_ms",
                "metric_value",
                "rate",
                "confidence",
            ],
        )

    return fn


OUTPUT_SCHEMA = (
    "resource_id string, metrics_group_type string, ts_ms long,"
    " metric_value double, rate double, confidence double"
)
STATE_SCHEMA = "last_value double, last_ts long"


def rate_stream(
    points: DataFrame,
    interval_sec: int = 60,
    ttl_multiple: int = METRICS_KV_STORE_TTL_MULTIPLE,
    emit_int_rate: bool = True,
) -> DataFrame:
    """points: streaming DataFrame with (resource_id, metrics_group_type,
    ts_ms, metric_value). Returns the appended rate rows."""
    return points.groupBy("resource_id", "metrics_group_type").applyInPandasWithState(
        _make_rate_fn(interval_sec, ttl_multiple, emit_int_rate),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
