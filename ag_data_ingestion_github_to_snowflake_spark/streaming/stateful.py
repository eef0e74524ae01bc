"""Custom stateful streaming operator via ``applyInPandasWithState``.

Implements a per-key running aggregate with timeout-based state expiry
— the programmable-state escape hatch for semantics the built-in
windows can't express (here: a running per-user spend counter that
emits an updated row per micro-batch and expires idle users).

Scale notes: state is partitioned by the grouping key exactly like a
streaming aggregation; each executor holds only its keys' state, and
the processing-time timeout bounds state size for idle keys. The
kernel is Arrow-batched pandas per key-group per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def make_running_totals_kernel(idle_timeout_ms: int | None):
    """Kernel factory: accumulate (count, sum) per user across
    micro-batches, optionally expiring idle users via a
    processing-time timer."""

    def kernel(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        # State keeps the RAW accumulator; rounding only at emit —
        # re-rounding state every batch would compound drift.
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return kernel


def running_user_totals(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Per-user running totals over a stream (emits per batch).

    ``idle_timeout_ms`` arms a processing-time timer that expires idle
    users' state — use it on CONTINUOUS streams to bound state size.
    Leave it None for AvailableNow drains: pending timers keep the
    query alive past the last input batch, so a drain with timers set
    never terminates.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        make_running_totals_kernel(idle_timeout_ms),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
