"""SemDeDup: semantic deduplication of an embedding corpus via
cluster-pruned cosine search (Abbas et al. 2023, arXiv:2303.09540).

The published recipe: k-means the embeddings, compute pairwise cosine
similarity *within each cluster only*, and drop all but one member of
every near-duplicate group. Clustering turns the O(N^2) all-pairs
problem into sum-of-squares over cluster sizes — the same
bucket-then-expand shape as the MinHash-LSH dedup in
``operators/dedup.py``, with the coarse quantizer playing the role of
the band hash.

This implementation deviates from the paper in two deliberate,
determinism-preserving ways (documented for the oracle):

- Centroids are FIXED pseudo-random unit vectors (the seeded sine
  family from ``operators/similarity._hyperplanes``, normalized in
  float64 on the driver) rather than Lloyd-iterated. The assignment is
  then a pure function of the input, so a SQL oracle can replay the
  whole pipeline bit-for-bit by inlining the centroid literals. The
  Lloyd-trained variant is available via
  ``similarity.train_ivf_centroids`` and plugs into the same
  ``assign_cells``; only oracle-verifiability motivates the fixed
  family here.
- The keep rule is "a vector is a duplicate iff a LOWER-ID vector in
  the same cell has cosine >= eps" — the same deterministic min-id
  convention as ``dedup.exact_dedup``, instead of the paper's
  keep-farthest-from-centroid (which needs a per-group argmin and adds
  nothing to the dataflow being tested).

Scale notes (100 TB): assignment is a map-side fold per row — no
shuffle, whole-stage codegen, O(n_cells * dim) work per vector. The
within-cell pair join shuffles on the cell id once; with n_cells ~
sqrt(N) (the paper uses 50k clusters for LAION) cells stay small and
the quadratic stays bounded — n_cells here is 8 only because the test
fixture has 500 vectors. Skewed cells are AQE's skew-join case, and
the cosine threshold filter is applied inside the join so only
surviving pairs materialize.

All comparisons round cosines to 6 decimals first, making the
Spark-vs-DuckDB decision identical despite fold-order float noise
(registry rule, ``plans/registry.py`` module docstring).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.similarity import (
    _dot,
    _hyperplanes,
    _norm,
)


def fixed_unit_centroids(dim: int, n_cells: int, seed: int = 31) -> list[list[float]]:
    """Deterministic unit-norm centroids: the seeded sine family,
    normalized in float64 on the driver. A pure function of
    (dim, n_cells, seed) — both the Spark plan and the SQL oracle
    inline the same float64 literals, so there is no cross-engine
    numeric question about the centroids themselves."""
    cents = []
    for plane in _hyperplanes(dim, n_cells, seed=seed):
        nrm = math.sqrt(sum(x * x for x in plane))
        cents.append([x / nrm for x in plane])
    return cents


def _cell_expr(vec_sql: str, cents: list[list[float]]) -> Column:
    """Nearest-centroid id as a pure expression (no shuffle).

    Centroids are unit vectors, so argmax dot == argmax cosine. The
    winner is the SMALLEST cell index attaining the (round-6) max dot.
    r13 (optimization): the n_cells dot folds are generated as ONE SQL
    string (``vec_sql`` is the vector's SQL text) instead of py4j
    Column assembly, and the first-max is
    ``array_position(d, array_max(d)) - 1`` — the identical integer
    for the non-null finite round-6 dots this fold produces, with each
    fold appearing ~2x in the tree instead of the GREATEST/CASE
    chain's ~2k x (same rewrite as operators/pq.py; the first-max rule
    is pinned against a pure-Python reference in
    tests/test_semdedup.py).
    """
    dots = []
    for c in cents:
        # Non-finite floats have no SQL literal spelling (ADVICE r13).
        assert all(math.isfinite(x) for x in c), "non-finite centroid"
        lit = "array(" + ", ".join(f"{x!r}D" for x in c) + ")"
        dots.append(
            f"round(aggregate(zip_with({vec_sql}, {lit}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0.0D, (acc, x) -> acc + x), 6)"
        )
    d = "array(" + ", ".join(dots) + ")"
    return F.expr(f"CAST(array_position({d}, array_max({d})) - 1 AS INT)")


# Identifier backtick-quoted: a vec_col with spaces/dots/reserved
# words must parse as one name, as F.col(vec_col) did before the
# SQL-string rewrite (ADVICE r13).
_VCAST = "transform(`{col}`, x -> CAST(x AS DOUBLE))"


def assign_cells(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, v double-array, cell) — map-side only."""
    v_sql = _VCAST.format(col=vec_col)
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.expr(v_sql).alias("v"),
        _cell_expr(v_sql, cents).alias("cell"),
    )


def semdedup(
    df: DataFrame,
    cents: list[list[float]],
    eps: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Flag semantic duplicates: (vec_id, cell, is_dup).

    is_dup <=> some lower-id vector in the same cell has
    round(cosine, 6) >= eps. One shuffle (the within-cell self-join);
    assignment and scoring are map-side folds.
    """
    assigned = assign_cells(df, cents, vec_col=vec_col, id_col=id_col)
    a = assigned.alias("a")
    b = assigned.alias("b")
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v"))
        / (_norm(F.col("a.v")) * _norm(F.col("b.v"))),
        6,
    )
    dup_ids = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= F.lit(eps))
        .select(F.col("b.vec_id").alias("dup_id"))
        .distinct()
    )
    return (
        assigned.join(dup_ids, assigned.vec_id == dup_ids.dup_id, "left")
        .select(
            "vec_id",
            "cell",
            F.col("dup_id").isNotNull().alias("is_dup"),
        )
    )


def semdedup_oracle_sql(
    corpus_cte: str, cents: list[list[float]], eps: float
) -> str:
    """DuckDB replay of the full pipeline: centroid literals inlined,
    the same first-max CASE assignment, the same round-6 threshold.
    ``corpus_cte`` must define a CTE named ``corpus(vec_id, v)`` with
    ``v`` a DOUBLE[] column."""
    lits = [
        "[" + ", ".join(repr(x) for x in c) + "]" for c in cents
    ]
    dot_cols = ",\n             ".join(
        f"ROUND(list_sum(list_transform(list_zip(v, {lit}), "
        f"x -> x[1] * x[2])), 6) AS d{j}"
        for j, lit in enumerate(lits)
    )
    best = "GREATEST(" + ", ".join(f"d{j}" for j in range(len(cents))) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{j} = m THEN {j}" for j in range(len(cents)))
        + " END"
    )
    return f"""
    WITH {corpus_cte},
    dots AS (
      SELECT vec_id, v,
             {dot_cols}
      FROM corpus
    ),
    assigned AS (
      SELECT vec_id, v, CAST({case} AS INT) AS cell
      FROM (SELECT *, {best} AS m FROM dots)
    ),
    dups AS (
      SELECT DISTINCT b.vec_id AS dup_id
      FROM assigned a
      JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE ROUND(
              list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(a.v, y -> y * y)))
               * sqrt(list_sum(list_transform(b.v, y -> y * y)))),
            6) >= {eps!r}
    )
    SELECT s.vec_id, s.cell, d.dup_id IS NOT NULL AS is_dup
    FROM assigned s LEFT JOIN dups d ON s.vec_id = d.dup_id
    """
