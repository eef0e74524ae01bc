"""Incremental rollup refresh: applying batches sequentially must
equal the full recompute, regardless of how the stream is split."""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.catalog import load_table
from ag_data_ingestion_github_to_snowflake_spark.operators.rollup import (
    merge_rollup,
    minute_rollup,
)

SF = "/root/testdata/sf0.001"


def test_incremental_equals_full_recompute(spark):
    ev = load_table(spark, SF, "events")
    full = minute_rollup(ev)

    # split the stream into 3 arbitrary batches (by event_id mod)
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    state = minute_rollup(batches[0])
    for b in batches[1:]:
        state = merge_rollup(state, b)

    got = sorted(state.collect())
    want = sorted(full.collect())
    assert got == want


def test_merge_touches_only_dirty_buckets(spark):
    ev = load_table(spark, SF, "events")
    first_day = ev.filter(F.dayofmonth("ts") <= 15)
    late_batch = ev.filter(F.dayofmonth("ts") > 15)
    state = minute_rollup(first_day)
    merged = merge_rollup(state, late_batch)
    # buckets from the first half must pass through unchanged
    before = {(r.minute, r.event_type): (r.n, r.sv) for r in state.collect()}
    after = {(r.minute, r.event_type): (r.n, r.sv) for r in merged.collect()}
    assert all(after[k] == v for k, v in before.items())
    assert len(after) > len(before)
