"""Local mirror of the driver's DuckDB-oracle differential check:
row count + column names + order-insensitive value hash.

Used by tests/test_oracle_parity.py so mismatches surface before the
driver's per-round CORRECTNESS gate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from ag_data_ingestion_github_to_snowflake_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}"
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(df: pd.DataFrame) -> tuple[int, tuple[str, ...], int]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    cols = tuple(sorted(df.columns))
    rows = [
        "|".join(_norm_cell(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    return len(df), cols, hash(tuple(sorted(rows)))


@dataclass
class CompareResult:
    name: str
    match: bool
    detail: str


def compare(name: str, spark_df, con, sql: str) -> CompareResult:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    n1, c1, h1 = frame_fingerprint(sp)
    n2, c2, h2 = frame_fingerprint(du)
    if c1 != c2:
        return CompareResult(name, False, f"columns differ: spark={c1} duckdb={c2}")
    if n1 != n2:
        return CompareResult(name, False, f"row counts differ: spark={n1} duckdb={n2}")
    if h1 != h2:
        sp_rows = sorted(
            "|".join(_norm_cell(r[c]) for c in c1) for _, r in sp.iterrows()
        )
        du_rows = sorted(
            "|".join(_norm_cell(r[c]) for c in c2) for _, r in du.iterrows()
        )
        diff = [
            f"  spark: {a}\n  duck:  {b}"
            for a, b in zip(sp_rows, du_rows)
            if a != b
        ][:3]
        return CompareResult(name, False, "value hash differs; first diffs:\n" + "\n".join(diff))
    return CompareResult(name, True, "ok")
