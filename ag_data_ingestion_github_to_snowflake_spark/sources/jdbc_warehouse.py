"""Generic JDBC warehouse loader — the reference's external-warehouse
load step (Snowflake ``PUT`` + ``COPY INTO`` + dedup-on-load,
``README.md:285-291``) expressed through Spark's built-in JDBC sink.

Two load paths, both idempotent on a key:

1. **Direct JDBC** (:func:`jdbc_load`): ``df.write.format("jdbc")``
   into a per-run STAGING table (append into a staging table is safe
   to retry after truncation), then one server-side MERGE from staging
   into the target. Spark parallelizes the INSERT across
   ``numPartitions`` executor connections with ``batchsize`` rows per
   round trip; the MERGE is a single set-based statement the warehouse
   optimizes — the standard bulk-upsert shape for Postgres/Snowflake/
   Redshift-class targets.
2. **Stage-and-copy** (:func:`stage_for_copy`): write parquet to a
   stage path (object store in production) and emit the ``COPY INTO``
   + ``MERGE`` statements for the warehouse to ingest the files —
   byte-for-byte the reference's Snowflake flow, with the dedup window
   function its README documents.

The SQL builders are pure functions so the statements are testable
without a live warehouse; the network write is the one untestable line
(gated behind the standard Spark JDBC datasource, public API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _quote(ident: str) -> str:
    """Conservative ANSI identifier quoting (rejects embedded quotes —
    identifiers come from config, not data, so fail loudly)."""
    if '"' in ident:
        raise ValueError(f"invalid identifier: {ident!r}")
    return '"' + ident + '"'


def _dedup_select(staging: str, key: str, columns: list[str],
                  version_col: str | None) -> str:
    """Dedup-to-latest over the staging table (the reference's
    QUALIFY ROW_NUMBER() = 1 on load, README.md:289)."""
    order = (
        f"{_quote(version_col)} DESC, {_quote(key)}" if version_col else _quote(key)
    )
    qcols = ", ".join(_quote(c) for c in columns)
    return (
        f"SELECT {qcols} FROM (\n"
        f"    SELECT {qcols}, ROW_NUMBER() OVER ("
        f"PARTITION BY {_quote(key)} ORDER BY {order}) AS _rn\n"
        f"    FROM {_quote(staging)}\n"
        f"  ) d WHERE _rn = 1"
    )


def merge_sql(
    target: str,
    staging: str,
    key: str,
    columns: list[str],
    version_col: str | None = None,
    dialect: str = "merge",
) -> str | list[str]:
    """Upsert from a deduplicated staging table into the target.

    Within-staging duplicates keep the highest ``version_col`` row
    (tiebreak on key), mirroring the reference's dedup-on-load
    (README.md:289: QUALIFY ROW_NUMBER() ... = 1) and the engine's own
    ``merge_into_warehouse`` semantics.

    ``dialect="merge"`` returns one ANSI MERGE statement
    (Snowflake/Postgres 15+/BigQuery). ``dialect="delete_insert"``
    returns the classic two-statement transaction for warehouses
    without MERGE (Redshift pattern; also how the DuckDB-backed test
    replays the load end-to-end).
    """
    cols = [c for c in columns]
    if key not in cols:
        raise ValueError(f"key {key!r} not in columns")
    qcols = ", ".join(_quote(c) for c in cols)
    dedup = _dedup_select(staging, key, cols, version_col)
    if dialect == "delete_insert":
        return [
            f"DELETE FROM {_quote(target)} WHERE {_quote(key)} IN "
            f"(SELECT {_quote(key)} FROM {_quote(staging)})",
            f"INSERT INTO {_quote(target)} ({qcols})\n{dedup}",
        ]
    if dialect != "merge":
        raise ValueError(f"unknown dialect: {dialect!r}")
    set_clause = ", ".join(
        f"{_quote(c)} = s.{_quote(c)}" for c in cols if c != key
    )
    insert_vals = ", ".join(f"s.{_quote(c)}" for c in cols)
    return (
        f"MERGE INTO {_quote(target)} t\n"
        f"USING (\n"
        f"  {dedup}\n"
        f") s ON t.{_quote(key)} = s.{_quote(key)}\n"
        f"WHEN MATCHED THEN UPDATE SET {set_clause}\n"
        f"WHEN NOT MATCHED THEN INSERT ({qcols}) VALUES ({insert_vals})"
    )


def copy_into_sql(target: str, stage_path: str, file_format: str = "PARQUET") -> str:
    """The reference's ``COPY INTO`` statement over a staged file set
    (README.md:285-288). ``stage_path`` is the warehouse-visible stage
    location (e.g. ``@my_stage/batch_42/`` on Snowflake)."""
    if "'" in stage_path:
        raise ValueError(f"invalid stage path: {stage_path!r}")
    return (
        f"COPY INTO {_quote(target)}\n"
        f"FROM '{stage_path}'\n"
        f"FILE_FORMAT = (TYPE = {file_format})\n"
        f"MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE"
    )


def stage_for_copy(
    df: DataFrame,
    stage_path: str,
    target: str,
    key: str = "id",
    version_col: str | None = None,
    dialect: str = "merge",
) -> list[str]:
    """Path 2: stage ``df`` as parquet files and return the statement
    batch (COPY into a temp table + MERGE) the warehouse runs to
    ingest them. The parquet write is the only Spark job; everything
    after is server-side set-based SQL."""
    df.write.mode("overwrite").parquet(stage_path)
    staging = f"{target}_staging"
    upsert = merge_sql(target, staging, key, df.columns, version_col, dialect)
    upserts = upsert if isinstance(upsert, list) else [upsert]
    return [
        f"CREATE OR REPLACE TEMPORARY TABLE {_quote(staging)} LIKE {_quote(target)}",
        copy_into_sql(staging, stage_path),
        *upserts,
        f"DROP TABLE {_quote(staging)}",
    ]


def jdbc_load(
    df: DataFrame,
    url: str,
    target: str,
    key: str = "id",
    version_col: str | None = None,
    properties: dict | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    run_sql=None,
) -> list[str]:
    """Path 1: bulk-append into a staging table over parallel JDBC
    connections, then MERGE server-side.

    ``run_sql`` is the injected statement executor (a JDBC connection's
    ``execute``); when None the statements are returned unexecuted so
    callers (and tests) can drive their own connection. The DataFrame
    write itself uses Spark's built-in JDBC datasource: ``batchsize``
    rows per executemany round trip, ``numPartitions`` parallel
    connections (repartition first if the upstream has thousands of
    tasks — one connection per task otherwise).

    At 100 TB the direct JDBC path is the wrong tool (row-protocol
    ingest); use :func:`stage_for_copy` — kept here because the
    reference's operational surface includes a plain warehouse load
    and small dimension/metrics tables load fine over JDBC.
    """
    staging = f"{target}_staging"
    writer = df.write.mode("append").format("jdbc")
    writer = (
        writer.option("url", url)
        .option("dbtable", staging)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "READ_COMMITTED")
    )
    if num_partitions:
        writer = writer.option("numPartitions", str(num_partitions))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
    upsert = merge_sql(target, staging, key, df.columns, version_col)
    statements = [
        upsert,
        f"TRUNCATE TABLE {_quote(staging)}",
    ]
    if run_sql is not None:
        for stmt in statements:
            run_sql(stmt)
    return statements
