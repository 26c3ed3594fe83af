"""Custom stateful streaming operators via applyInPandasWithState.

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


def per_key_quota_stream(
    df: DataFrame,
    key_col: str = "user_id",
    quota: int = 100,
    reset_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key admission quota: pass rows through until a key
    has emitted ``quota`` rows, then drop the rest — the per-source cap
    a training-data pipeline applies so no domain/feed over-contributes
    to a corpus (C4/Pile-style source balancing), expressed as a
    streaming operator instead of a post-hoc groupBy.

    No built-in streaming operator can express this: it needs a running
    per-key count that both GATES and passes through rows. State is one
    long per key; with ``reset_ms`` the counter state times out and the
    quota re-opens — a rolling rate limit instead of a lifetime cap.
    Admission is first-come in arrival order, the contract a quota
    wants; output preserves the input schema.

    Scale shape: the only shuffle is the groupBy on ``key_col``; each
    executor holds one long per key in its range, so state partitions
    horizontally and an over-quota key costs O(batch rows), never
    O(history).

    (Implementation note: written against the v1 arbitrary-state API
    — applyInPandasWithState — because the v2 successor,
    transformWithStateInPandas, needs the protobuf package at runtime,
    which this environment does not ship. The operator contract is
    API-version-independent.)
    """
    out_schema = df.schema
    timeout = (
        GroupStateTimeout.NoTimeout
        if reset_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )

    def _gate(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()  # quota window expired: re-open
            return
        (n,) = state.get if state.exists else (0,)
        for pdf in pdf_iter:
            if n >= quota:
                continue  # keep draining the iterator
            take = min(len(pdf), quota - n)
            if take:
                n += take
                yield pdf.iloc[:take]
        state.update((n,))
        if reset_ms is not None:
            state.setTimeoutDuration(reset_ms)

    return df.groupBy(key_col).applyInPandasWithState(
        _gate,
        outputStructType=out_schema,
        stateStructType=StructType([StructField("n", LongType())]),
        outputMode="append",
        timeoutConf=timeout,
    )
