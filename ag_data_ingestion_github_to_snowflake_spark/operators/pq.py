"""Product quantization (PQ) with asymmetric distance computation —
the FAISS ``PQ`` index shape (Jegou et al. 2011, "Product quantization
for nearest neighbor search").

The vector is split into m subspaces; each subspace is encoded as the
index of its nearest codeword from a per-subspace codebook of k
entries, compressing dim floats to m small ints (here 64 floats ->
4 codes = 64x). Search uses the ADC trick: per query, precompute the
m x k table of (query-subvector -> codeword) distances ONCE, then each
candidate costs m table lookups — no per-pair float math.

Spark mapping:

- Encoding is a per-row fold over literal codeword arrays — map-side,
  whole-stage codegen, no shuffle (m * k folds of dim/m elements; the
  parameters here keep that to 32 short folds, well under the codegen
  blowup the LSH module avoids with numpy).
- The ADC distance table is computed per QUERY row (the tiny side);
  candidates pay only ``element_at`` lookups inside a broadcast join —
  the same "broadcast the LIMITed query side, stream the corpus"
  shape as ``quantized_brute_force_topk``.
- Codebooks are FIXED seeded unit-range vectors
  (``similarity._hyperplanes``), so the whole pipeline — encoding
  argmin, table build, lookup sum, ranking — is a pure function of the
  input and replays in a DuckDB oracle with the codebook float64
  literals inlined (``pq_oracle_sql``). A Lloyd-trained codebook drops
  into the same encode/search path; only oracle-verifiability
  motivates the fixed one (same convention as ``operators/semdedup``).

All distances are rounded to 6 decimals before argmin/ranking, with
first-min / lowest-id tie rules, so the Spark and DuckDB decisions are
identical despite fold-order float noise (registry rule).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.similarity import (
    _hyperplanes,
)


def pq_codebooks(
    dim: int, m: int, k: int, seed: int = 57
) -> list[list[list[float]]]:
    """m codebooks of k codewords, each dim/m wide — deterministic
    seeded values in [-1, 1] (the fixture embedding range)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    return [
        _hyperplanes(d_sub, k, seed=seed + 101 * s) for s in range(m)
    ]


# r13 (optimization): the encode/table expressions are generated as
# SQL STRINGS and parsed with one F.expr call per column instead of
# being assembled from thousands of py4j Column operations — the
# expression trees (and therefore the results) are identical, but plan
# CONSTRUCTION drops from seconds of driver py4j chatter to
# milliseconds (measured: pq_encode build 7.4 s -> ~0; the registry
# carrier's build 3.9-6 s -> sub-second). Guide §5: driver time is
# part of the query's cost.


def _dlit(x: float) -> str:
    """Exact SQL double literal (the D suffix; repr round-trips).

    Non-finite floats have no SQL literal spelling (repr gives
    nan/inf, invalid SQL) — codebooks are seeded unit-range values,
    so this is an assert, not a runtime branch (ADVICE r13).
    """
    assert math.isfinite(x), f"non-finite codebook value {x!r}"
    return f"{x!r}D"


def _sub_sql(v: str, s: int, d_sub: int) -> str:
    return f"slice({v}, {s * d_sub + 1}, {d_sub})"


def _l2sq_sql(a: str, lits: list[float]) -> str:
    """round-6 squared L2 distance from a subvector to a literal
    codeword — one short fold (same expression the Column API built)."""
    cw = "array(" + ", ".join(_dlit(x) for x in lits) + ")"
    return (
        f"round(aggregate(zip_with({a}, {cw}, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, x) -> acc + x), 6)"
    )


def _argmin_code_sql(dists: list[str]) -> str:
    """First index attaining the minimum (round-6) distance.

    array_position(d, array_min(d)) IS the first-min index for the
    non-null finite distances this fold produces — same integer as the
    r12 CASE/least chain (asserted identical in tests/test_pq_cdc.py),
    with the k distance folds appearing ~2x in the expression tree
    instead of 2k x (the CASE duplicated least() per arm; analysis
    time is the build cost this rewrite removes)."""
    d = "array(" + ", ".join(dists) + ")"
    return f"CAST(array_position({d}, array_min({d})) - 1 AS INT)"


# Identifier backtick-quoted: a vec_col with spaces/dots/reserved
# words must parse as one name, as F.col(vec_col) did before the
# SQL-string rewrite (ADVICE r13).
_VCAST = "transform(`{col}`, x -> CAST(x AS DOUBLE))"


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, codes array<int> of length m) — map-side only."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    v = _VCAST.format(col=vec_col)
    codes = (
        "array("
        + ", ".join(
            _argmin_code_sql(
                [_l2sq_sql(_sub_sql(v, s, d_sub), cw) for cw in codebooks[s]]
            )
            for s in range(m)
        )
        + ")"
    )
    return df.select(F.col(id_col).alias("vec_id"), F.expr(codes).alias("codes"))


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    topk: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_dist, rnk).

    The query side carries its precomputed m x k distance TABLES
    (arrays); every candidate pays m element_at lookups — the ADC
    scan. Query side broadcast; candidates never shuffle until the
    final per-query top-k (tiny)."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    qv = _VCAST.format(col=vec_col)
    tables = [
        F.expr(
            "array("
            + ", ".join(
                _l2sq_sql(_sub_sql(qv, s, d_sub), cw) for cw in codebooks[s]
            )
            + ")"
        ).alias(f"tab{s}")
        for s in range(m)
    ]
    q = queries.select(F.col(id_col).alias("query_id"), *tables)
    c = pq_encode(corpus, codebooks, vec_col=vec_col, id_col=id_col).select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )
    adc = F.element_at(F.col("tab0"), F.col("codes")[0] + 1)
    for s in range(1, m):
        adc = adc + F.element_at(F.col(f"tab{s}"), F.col("codes")[s] + 1)
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(adc, 6).alias("adc_dist"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
    )


def pq_oracle_sql(
    corpus_cte: str,
    query_pred: str,
    codebooks: list[list[list[float]]],
    topk: int = 5,
) -> str:
    """DuckDB replay: codebook literals inlined; the same round-6
    argmin encode, per-query tables, lookup-sum ADC, and ranking.
    ``corpus_cte`` must define ``corpus(vec_id, v DOUBLE[])``;
    ``query_pred`` selects the query rows from corpus."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])

    def lit(cw: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in cw) + "]"

    def l2sq(sub: str, cw: list[float]) -> str:
        return (
            f"ROUND(list_sum(list_transform(list_zip({sub}, {lit(cw)}), "
            "x -> (x[1] - x[2]) * (x[1] - x[2]))), 6)"
        )

    def sub_expr(s: int) -> str:
        return f"v[{s * d_sub + 1}:{(s + 1) * d_sub}]"

    # encode: per subspace, k distance columns -> first-min CASE
    enc_cols = []
    for s in range(m):
        for j, cw in enumerate(codebooks[s]):
            enc_cols.append(f"{l2sq(sub_expr(s), cw)} AS e{s}_{j}")
    code_cases = []
    for s in range(m):
        least = "LEAST(" + ", ".join(f"e{s}_{j}" for j in range(len(codebooks[s]))) + ")"
        case = (
            "CASE "
            + " ".join(
                f"WHEN e{s}_{j} = m{s} THEN {j}"
                for j in range(len(codebooks[s]))
            )
            + " END"
        )
        code_cases.append((least, case))
    m_cols = ", ".join(
        f"{least} AS m{s}" for s, (least, _) in enumerate(code_cases)
    )
    code_cols = ", ".join(
        f"CAST({case} AS INT) AS c{s}" for s, (_, case) in enumerate(code_cases)
    )
    # query tables as list literals indexed by code
    tab_cols = ", ".join(
        "["
        + ", ".join(l2sq(sub_expr(s), cw) for cw in codebooks[s])
        + f"] AS tab{s}"
        for s in range(m)
    )
    adc = " + ".join(f"q.tab{s}[c.c{s} + 1]" for s in range(m))
    return f"""
    WITH {corpus_cte},
    enc0 AS (SELECT vec_id, v, {", ".join(enc_cols)} FROM corpus),
    enc1 AS (SELECT *, {m_cols} FROM enc0),
    codes AS (SELECT vec_id, {code_cols} FROM enc1),
    q AS (
      SELECT vec_id AS query_id, {tab_cols}
      FROM corpus WHERE {query_pred}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND({adc}, 6) AS adc_dist
      FROM codes c, q
      WHERE q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {topk}
    """
