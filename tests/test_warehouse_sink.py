"""Two-phase-commit JSONL warehouse sink: atomic visibility, manifest
accounting, overwrite semantics, abort hygiene."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.sources.warehouse_sink import (
    JsonlWarehouseDataSource,
)


def _load(path: str) -> list[dict]:
    rows = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".jsonl"):
            with open(os.path.join(path, f)) as fh:
                rows += [json.loads(line) for line in fh]
    return rows


def test_commit_publishes_all_rows_with_manifest(spark, tmp_path):
    spark.dataSource.register(JsonlWarehouseDataSource)
    out = str(tmp_path / "wh")
    os.makedirs(out)
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("double_id")
    ).repartition(4)
    df.write.format("jsonl_warehouse").option("path", out).mode("append").save()

    rows = _load(out)
    assert len(rows) == 100
    assert {r["id"] for r in rows} == set(range(100))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["n_rows"] == 100
    assert sorted(os.path.basename(p) for p in manifest["files"]) == sorted(
        f for f in os.listdir(out) if f.endswith(".jsonl")
    )
    assert not os.path.exists(os.path.join(out, "_staging"))  # cleaned up


def test_overwrite_replaces_previous_load(spark, tmp_path):
    spark.dataSource.register(JsonlWarehouseDataSource)
    out = str(tmp_path / "wh")
    os.makedirs(out)
    spark.range(50).write.format("jsonl_warehouse").option("path", out).mode(
        "append"
    ).save()
    spark.range(10).write.format("jsonl_warehouse").option("path", out).mode(
        "overwrite"
    ).save()
    rows = _load(out)
    assert len(rows) == 10
    assert json.load(open(os.path.join(out, "_SUCCESS")))["n_rows"] == 10


def test_append_accumulates_loads(spark, tmp_path):
    spark.dataSource.register(JsonlWarehouseDataSource)
    out = str(tmp_path / "wh")
    os.makedirs(out)
    for _ in range(2):
        spark.range(25).write.format("jsonl_warehouse").option("path", out).mode(
            "append"
        ).save()
    assert len(_load(out)) == 50
