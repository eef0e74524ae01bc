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


# ---------------------------------------------------------------------------
# CEP pattern matcher: first view -> click -> purchase chain per user
# ---------------------------------------------------------------------------
CEP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("tv_us", T.LongType()),
        T.StructField("tc_us", T.LongType()),
        T.StructField("tp_us", T.LongType()),
    ]
)

# (latest_view_us, latest_click_us, view_at_click_us, matched) with -1
# sentinels — GroupState tuples must be flat primitives.
CEP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("lv", T.LongType()),
        T.StructField("lc", T.LongType()),
        T.StructField("lcv", T.LongType()),
        T.StructField("matched", T.LongType()),
    ]
)

_CEP_RANK = {"view": 0, "click": 1, "purchase": 2}


def make_funnel_cep_kernel(window_us: int):
    """CEP kernel: per user, emit the FIRST purchase preceded (at or
    before, ties inclusive) by a click that itself had a view at or
    before it, with the view within ``window_us`` of the purchase.

    O(1) state per key — (latest view, latest click, that click's
    view) — never an event buffer: the 'latest click at-or-before the
    purchase' is exactly the last click processed, and its
    view-at-click was frozen when the click arrived. Requires
    time-ordered micro-batches (the staged slices guarantee it);
    within a batch, rows sort by (ts, stage-rank, event_id) so
    same-instant view->click->purchase chains match inclusively,
    mirroring the <= joins of the batch oracle.
    """

    def kernel(key, batches, state) -> "Iterator[pd.DataFrame]":
        if state.hasTimedOut:  # pragma: no cover - NoTimeout drains
            state.remove()
            return
        lv, lc, lcv, matched = (
            state.get if state.exists else (-1, -1, -1, 0)
        )
        out = []
        for pdf in batches:
            if matched:
                break
            # Plain-Python group interior (r14, guide §4.2 inverted for
            # TINY batches): each per-user group frame is a handful of
            # rows, where the former 4 pandas ops (isin filter, assign,
            # map, sort_values) cost fixed ~µs-scale overhead per call
            # that dominated the kernel. One generator + sorted() over
            # .values does the identical (ts, stage-rank, event_id)
            # ordering; unmapped stages (signup/error/...) are dropped
            # by the `et in _CEP_RANK` guard exactly as isin did.
            # Interleaved A/B ×3 at sf0.1: [3.52,3.67,3.78] s →
            # [3.21,3.22,3.30] s, emitted matches identical.
            rows = sorted(
                (int(ts), _CEP_RANK[et], int(eid))
                for ts, et, eid in zip(
                    pdf["ts_us"].values,
                    pdf["event_type"].values,
                    pdf["event_id"].values,
                )
                if et in _CEP_RANK
            )
            for ts, rank, _eid in rows:
                if rank == 0:
                    lv = ts
                elif rank == 1:
                    lc, lcv = ts, lv
                elif matched == 0 and lc >= 0 and lcv >= 0 and ts - lcv <= window_us:
                    out.append((key[0], lcv, lc, ts))
                    matched = 1
                    break
        state.update((lv, lc, lcv, matched))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "tv_us", "tc_us", "tp_us"]
            )

    return kernel


def funnel_cep_matches(events: DataFrame, window_us: int) -> DataFrame:
    """Streaming CEP over (user_id, ts_us, event_type, event_id):
    first qualifying view->click->purchase chain per user."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        make_funnel_cep_kernel(window_us),
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
