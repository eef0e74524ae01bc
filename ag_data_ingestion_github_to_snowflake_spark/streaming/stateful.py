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


# ---------------------------------------------------------------------------
# transformWithState port (Spark 4.x arbitrary-state v2)
# ---------------------------------------------------------------------------
# Same running-totals semantics on the successor API. What v2 buys at
# scale over applyInPandasWithState:
# - typed state PRIMITIVES (value/list/map) instead of one opaque state
#   tuple — a map-state per key is stored as individual RocksDB
#   entries, so updating one sub-key doesn't rewrite the whole blob;
# - schema evolution of state across query restarts;
# - first-class timers (registerTimer/handleExpiredTimer) decoupled
#   from the input path.
# It REQUIRES the RocksDB state store provider
# (``streams.use_rocksdb_state_store``); the HDFS-heap store does not
# implement the v2 handle. The Python side of the v2 state protocol
# additionally needs ``google.protobuf`` at query runtime (the state
# server speaks protobuf) — absent from this test container, so the
# end-to-end test is importorskip-gated while the processor kernel
# itself is unit-tested with a fake handle.


def _make_running_totals_processor():
    """Build the StatefulProcessor class lazily: the import exists only
    on Spark >= 4.0, and constructing it at module import would bind
    the engine to the newest API everywhere."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            prev = self._totals.get() if self._totals.exists() else None
            n, total = prev if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            # raw accumulator in state, rounding only at emit (same
            # drift rule as the v1 kernel above)
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    output-identical to :func:`running_user_totals`, which the test
    asserts (both against the batch aggregate).

    Caller must switch the session to the RocksDB state store first
    (``streams.use_rocksdb_state_store(spark)``).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_running_totals_processor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
