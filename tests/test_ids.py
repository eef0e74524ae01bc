"""assign_sequential_ids: distributed contiguous numbering invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.ids import (
    assign_sequential_ids,
)


def test_ids_are_dense_and_order_preserving(spark):
    df = spark.createDataFrame(
        [(k,) for k in (42, 7, 99, 1, 500, 3, 250, 12)], "key long"
    )
    out = assign_sequential_ids(df, "key", num_partitions=3).collect()
    by_key = sorted(out, key=lambda r: r.key)
    # dense 0..n-1, and ascending with the key
    assert [r.seq_id for r in by_key] == list(range(len(out)))


def test_ids_independent_of_input_partitioning(spark):
    data = [(k,) for k in range(100, 0, -1)]
    a = assign_sequential_ids(
        spark.createDataFrame(data, "key long").repartition(13), "key"
    )
    b = assign_sequential_ids(
        spark.createDataFrame(data, "key long").coalesce(1), "key"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ids_handle_fewer_rows_than_partitions(spark):
    df = spark.createDataFrame([(5,), (2,)], "key long")
    out = assign_sequential_ids(df, "key", num_partitions=8).collect()
    assert sorted((r.key, r.seq_id) for r in out) == [(2, 0), (5, 1)]
