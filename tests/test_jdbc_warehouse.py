"""Generic JDBC / COPY INTO warehouse loader (reference README.md:285-291).

The SQL builders are exercised directly (pure functions); the staged
COPY path runs end-to-end against DuckDB executing the generated
delete_insert-dialect statements over the real staged parquet — a
genuine warehouse-side replay with zero network (DuckDB 1.0 predates
ANSI MERGE, which is exactly what the dialect option is for)."""

from __future__ import annotations

import duckdb
import pytest

from ag_data_ingestion_github_to_snowflake_spark.sources.jdbc_warehouse import (
    copy_into_sql,
    merge_sql,
    stage_for_copy,
)


def test_merge_sql_shape_and_dedup_window():
    sql = merge_sql("repos", "repos_staging", "id",
                    ["id", "name", "stars"], version_col="updated_at")
    assert 'MERGE INTO "repos"' in sql
    assert 'PARTITION BY "id" ORDER BY "updated_at" DESC, "id"' in sql
    assert "WHEN MATCHED THEN UPDATE SET" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    # key must never be assigned in the UPDATE branch
    assert '"id" = s."id"' not in sql.split("WHEN MATCHED")[1].split("WHEN NOT")[0]


def test_identifier_injection_rejected():
    with pytest.raises(ValueError):
        merge_sql('t"; DROP TABLE x; --', "s", "id", ["id"])
    with pytest.raises(ValueError):
        copy_into_sql("t", "path' ; DROP")
    with pytest.raises(ValueError):
        merge_sql("t", "s", "id", ["id"], dialect="nonsense")


def test_stage_for_copy_replays_in_duckdb(spark, tmp_path):
    """The generated statement batch must actually ingest the staged
    parquet with dedup-to-latest semantics when a warehouse runs it.
    DuckDB stands in for the warehouse via the delete_insert dialect;
    only the COPY/DDL statements are translated to DuckDB's syntax."""
    stage = str(tmp_path / "stage")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02"),
         (2, "b2", "2024-01-03")],  # in-batch duplicate: newest wins
        "id INT, name STRING, updated_at STRING",
    )
    stmts = stage_for_copy(df, stage, "repos", key="id",
                           version_col="updated_at", dialect="delete_insert")
    con = duckdb.connect()
    con.execute("CREATE TABLE repos (id INT, name VARCHAR, updated_at VARCHAR)")
    con.execute("INSERT INTO repos VALUES (1, 'old', '2023-01-01'), (3, 'keep', '2022-01-01')")
    for stmt in stmts:
        if stmt.startswith("COPY INTO"):
            # DuckDB's COPY syntax differs; same effect: stage -> staging
            con.execute(
                "INSERT INTO repos_staging "
                f"SELECT * FROM read_parquet('{stage}/*.parquet')"
            )
        elif stmt.startswith("CREATE OR REPLACE TEMPORARY TABLE"):
            con.execute(
                "CREATE OR REPLACE TEMP TABLE repos_staging AS "
                "SELECT * FROM repos LIMIT 0"
            )
        else:  # DELETE / INSERT / DROP run verbatim
            con.execute(stmt)
    rows = {
        r[0]: (r[1], r[2])
        for r in con.execute("SELECT * FROM repos ORDER BY id").fetchall()
    }
    assert rows == {
        1: ("a", "2024-01-01"),   # replaced by the load
        2: ("b2", "2024-01-03"),  # in-batch dedup kept the newest
        3: ("keep", "2022-01-01"),  # untouched: not in the batch
    }
    con.close()
