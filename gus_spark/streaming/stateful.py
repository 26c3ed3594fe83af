"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running session state the built-in operators can't express:
each user carries (event count, value sum, last event time) across
micro-batches; a state timeout emits a final summary row and clears the
entry, bounding state size — the pattern for custom streaming
aggregates the engine exposes beyond window/session_window.

State is keyed by user_id, so the only shuffle is the groupBy on the
key; each executor holds state for its key range only — at 1000
executors, state partitions horizontally with no coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("status", StringType()),  # 'active' | 'timed_out'
    ]
)


def _make_update(timeout_ms: int):
    def _update(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, total, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "status": ["timed_out"],
                }
            )
            return
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_us = max(
                    last_us, int(pdf["ts"].astype("int64").max()) // 1000
                )
        state.update((n, total, last_us))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "status": ["active"],
            }
        )

    return _update


def running_user_totals(
    events: DataFrame, timeout_ms: int = 60_000
) -> DataFrame:
    """Streaming per-user running totals with timeout-evicted state.

    ``timeout_ms`` bounds how long an idle key's state survives; the
    eviction batch emits the final 'timed_out' summary row. Note: with
    availableNow/processAllAvailable triggers the query stays active
    until pending timeouts fire — size the timeout to the trigger.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
