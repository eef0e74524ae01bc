"""Incremental rollup maintenance (hypertable continuous-aggregate
refresh): merge a new micro-batch into an existing time-bucket rollup
without touching raw history.

Because the rollup state is algebraic partials (count, decimal sum),
merging = union + re-aggregate on the bucket key — exact, idempotent
over batch boundaries, and the work is proportional to |new batch| +
|touched buckets|, never |history|. At 100 TB the history table is
only ever appended; the rollup refresh reads the delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC6 = "decimal(18,6)"


def minute_rollup(events: DataFrame) -> DataFrame:
    """Base rollup: per (minute, event_type) algebraic partials."""
    return events.groupBy(
        F.date_trunc("minute", "ts").alias("minute"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DEC6)).alias("sv"),
    )


def merge_rollup(existing: DataFrame, new_events: DataFrame) -> DataFrame:
    """Refresh: fold a new raw batch into an existing minute rollup.

    union(existing partials, partials(new)) -> re-aggregate. Buckets
    untouched by the batch pass through with a single groupBy identity
    merge; dirty buckets combine exactly (decimal partials are
    associative).
    """
    delta = minute_rollup(new_events)
    return (
        existing.unionByName(delta)
        .groupBy("minute", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
