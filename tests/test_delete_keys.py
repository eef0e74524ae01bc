"""Surgical delete-by-key: only range-hit files rewritten, others
bit-identical; deletes are exact."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.sources.sinks import (
    delete_keys_surgical,
)


def _write_sorted_files(spark, path: str, n: int = 1000, files: int = 4) -> None:
    """Range-disjoint sorted files (the compacted-table layout)."""
    (
        spark.range(n)
        .withColumn("payload", F.concat(F.lit("row-"), F.col("id")))
        .repartitionByRange(files, "id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .parquet(path)
    )


def test_delete_rewrites_only_range_hit_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_sorted_files(spark, path)
    before = {
        f: (os.path.getsize(os.path.join(path, f)), os.path.getmtime(os.path.join(path, f)))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    # all three keys live in one range partition (0..249-ish)
    stats = delete_keys_surgical(spark, path, [10, 11, 12], "id")
    assert stats["rows_deleted"] == 3
    assert 1 <= stats["files_rewritten"] < stats["files_total"]
    back = spark.read.parquet(path)
    assert back.count() == 997
    assert back.filter(F.col("id").isin(10, 11, 12)).count() == 0
    # non-candidate files untouched (size+mtime identical)
    after = {
        f: (os.path.getsize(os.path.join(path, f)), os.path.getmtime(os.path.join(path, f)))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    unchanged = [f for f in before if before[f] == after.get(f)]
    assert len(unchanged) >= stats["files_total"] - stats["files_rewritten"]


def test_delete_missing_keys_is_noop_on_content(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_sorted_files(spark, path, n=100, files=2)
    stats = delete_keys_surgical(spark, path, [100000, 200000], "id")
    assert stats["rows_deleted"] == 0
    assert spark.read.parquet(path).count() == 100


def test_delete_spanning_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_sorted_files(spark, path, n=1000, files=4)
    # keys spread across distinct range partitions
    stats = delete_keys_surgical(spark, path, [5, 500, 995], "id")
    assert stats["rows_deleted"] == 3
    assert spark.read.parquet(path).count() == 997


def test_pruned_point_lookup_reads_only_range_hit_files(spark, tmp_path):
    from ag_data_ingestion_github_to_snowflake_spark.sources.sinks import (
        pruned_point_lookup,
    )

    path = str(tmp_path / "pl")
    _write_sorted_files(spark, path)  # 4 range-disjoint files over 0..999
    df, stats = pruned_point_lookup(spark, path, [3, 7], "id")
    rows = sorted(r.id for r in df.collect())
    assert rows == [3, 7]
    assert stats["files_total"] == 4
    # both keys live in the lowest range: one file read, three pruned
    assert stats["files_read"] == 1
    assert stats["files_pruned"] == 3


def test_pruned_point_lookup_missing_key_returns_empty(spark, tmp_path):
    from ag_data_ingestion_github_to_snowflake_spark.sources.sinks import (
        pruned_point_lookup,
    )

    path = str(tmp_path / "pl2")
    _write_sorted_files(spark, path)
    df, stats = pruned_point_lookup(spark, path, [10_000_000], "id")
    assert df.count() == 0
    assert stats["files_read"] == 0 and stats["files_pruned"] == 4
