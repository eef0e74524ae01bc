"""End-to-end composition smoke: the whole engine surface in one flow.

REST ingest (stub transport) → flatten → validation split → dedupe to
latest → two-phase-commit warehouse load (Python Data Source writer) →
idempotent key-merge into the parquet warehouse → sorted compaction →
profile + expectations — i.e. the reference pipeline
(extract → S3 stage → Snowflake load → SQL consumption,
``/root/reference/README.md``) each stage replaced by its Spark-native
counterpart, proven to hand off to the next.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.profile import (
    profile_table,
    validate_expectations,
)
from ag_data_ingestion_github_to_snowflake_spark.pipeline.github import (
    incremental_extract,
)
from ag_data_ingestion_github_to_snowflake_spark.sources.sinks import (
    compact_table,
    merge_into_warehouse,
)
from ag_data_ingestion_github_to_snowflake_spark.sources.state import MemoryWatermark
from ag_data_ingestion_github_to_snowflake_spark.sources.warehouse_sink import (
    JsonlWarehouseDataSource,
)
from ag_data_ingestion_github_to_snowflake_spark.sources.stub import StubTransport


def test_extract_stage_load_merge_compact_profile(spark, tmp_path):
    # -- extract (A1-A15): stubbed REST, 2 pages
    transport = StubTransport(n_repos=60)
    state = MemoryWatermark()
    result = incremental_extract(spark, transport, state, max_pages=2)
    valid = result.valid
    n_valid = valid.count()
    assert n_valid > 0
    assert result.new_watermark > 0

    # -- stage (A6): two-phase-commit JSONL load (the S3/stage analog)
    spark.dataSource.register(JsonlWarehouseDataSource)
    stage_dir = str(tmp_path / "stage")
    os.makedirs(stage_dir)
    valid.write.format("jsonl_warehouse").option("path", stage_dir).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(stage_dir, "_SUCCESS")))
    assert manifest["n_rows"] == n_valid

    # -- load (A9): idempotent merge into the parquet warehouse
    wh = str(tmp_path / "warehouse")
    merge_into_warehouse(spark, valid, wh, key="id")
    once = spark.read.parquet(wh).count()
    merge_into_warehouse(spark, valid, wh, key="id")  # re-load: no-op
    assert spark.read.parquet(wh).count() == once == n_valid

    # -- maintain: sorted compaction keeps the data, tightens layout
    n_files = compact_table(spark, wh, target_records_per_file=10_000, sort_cols=["id"])
    assert n_files == 1
    assert spark.read.parquet(wh).count() == n_valid

    # -- consume: profile + expectations over the warehouse table
    tbl = spark.read.parquet(wh)
    prof = {r.col_name: r for r in profile_table(tbl, ["id", "stargazers_count"]).collect()}
    assert prof["id"].n_nulls == 0
    assert prof["id"].n_distinct == n_valid
    report = validate_expectations(
        tbl,
        {
            "id_not_null": F.col("id").isNotNull(),
            "stars_non_negative": F.col("stargazers_count") >= 0,
        },
    )
    viol = {r.rule: r.n_violations for r in report.collect()}
    assert viol == {"id_not_null": 0, "stars_non_negative": 0}
