"""Space-filling-curve correctness: the Spark hilbert_index column
expression must match the public xy2d reference bit-for-bit on every
cell, and the locality query's self-verifying property must hold —
consecutive Hilbert positions on a FULL grid are always Manhattan
distance 1 (the defining curve property; Morton provably jumps).

These assert against an independent Python reference, not the DuckDB
twin — a bug shared by both engine expressions would pass parity but
fail here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.functions.zorder import (
    hilbert_index,
    hilbert_index_sql,
)


def _rot(n: int, x: int, y: int, rx: int, ry: int) -> tuple[int, int]:
    if ry == 0:
        if rx == 1:
            x, y = n - 1 - x, n - 1 - y
        x, y = y, x
    return x, y


def _xy2d(n: int, x: int, y: int) -> int:
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        x, y = _rot(n, x, y, rx, ry)
        s //= 2
    return d


def test_hilbert_index_matches_reference_order4(spark):
    ref = {(x, y): _xy2d(16, x, y) for x in range(16) for y in range(16)}
    df = spark.range(256).select(
        (F.col("id") % 16).cast("int").alias("x"),
        (F.col("id") / 16).cast("int").alias("y"),
    )
    rows = df.select(
        "x", "y", hilbert_index(F.col("x"), F.col("y"), 4).alias("d")
    ).collect()
    assert all(ref[(r.x, r.y)] == r.d for r in rows)
    # bijectivity: 256 distinct indexes covering 0..255
    assert sorted(r.d for r in rows) == list(range(256))


def test_hilbert_sql_twin_matches_reference_order4():
    import duckdb

    ref = {(x, y): _xy2d(16, x, y) for x in range(16) for y in range(16)}
    body = hilbert_index_sql("cx", "cy", 4)
    sql = f"""
    WITH cells AS (
      SELECT x, y
      FROM (SELECT UNNEST(generate_series(0, 15)) AS x),
           (SELECT UNNEST(generate_series(0, 15)) AS y)
    ),
    r0 AS (SELECT x, y, x AS x0, y AS y0, 0 AS d0 FROM cells),
    {body}
    SELECT x, y, d4 FROM r4
    """
    rows = duckdb.connect().execute(sql).fetchall()
    assert all(ref[(x, y)] == d for x, y, d in rows)


def test_locality_query_self_verifying_property(spark):
    """On the (dense at sf0.01) 16x16 grid, every consecutive Hilbert
    step must be EXACTLY Manhattan distance 1, and Morton must be
    strictly worse on average with a max jump > 1."""
    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

    out = {
        r["curve"]: r
        for r in all_specs()["hilbert_vs_morton_locality"]
        .build(spark, "/root/testdata/sf0.01")
        .collect()
    }
    h, m = out["hilbert"], out["morton"]
    assert h["n_steps"] == 255  # full 256-cell grid
    assert h["avg_manhattan"] == 1.0
    assert h["max_step"] == 1
    assert m["avg_manhattan"] > 1.0
    assert m["max_step"] > 1
