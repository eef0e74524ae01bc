"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, plus an LSH
(random-hyperplane) bucketed variant as the 100 TB scale path.

Scale design:
- Brute force is O(n_query * n_corpus); correct but only viable when
  one side is small enough to broadcast. We broadcast the query set —
  the corpus streams through executors untouched, so it scales with
  corpus size linearly and never shuffles the corpus.
- The LSH variant hashes vectors to sign-pattern buckets using
  deterministic pseudo-random hyperplanes; candidates share a bucket in
  at least one table. Shuffle key = (table, bucket) — candidate join,
  not all-pairs.
- Dot products run as F.aggregate/zip_with fold over the array —
  JVM-side, no Python. For very wide vectors a pandas_udf over Arrow
  would batch better; at dim=64 the fold wins (no serialization).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def with_cosine(df: DataFrame, left: str, right: str, out: str = "cosine"):
    """Add cosine similarity between two array columns (JVM fold)."""
    return df.withColumn(
        out,
        _dot(F.col(left), F.col(right))
        / (_norm(F.col(left)) * _norm(F.col(right))),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Query side is broadcast.

    Returns (query_id, neighbor_id, cosine, rnk). Ranking uses the
    rounded similarity with neighbor-id tiebreak so results are fully
    deterministic (and oracle-comparable) even under float ties.
    """
    # Norms precomputed per side BEFORE the join: inside the crossed
    # join each norm would be recomputed once per pair (O(n_q*n_c*dim)
    # redundant folds) instead of once per vector.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no RNG state).

    Components from a fixed-seed sine sequence — the classic
    hash-to-uniform trick; adequate for LSH bucketing and fully
    reproducible across runs/executors.
    """
    planes = []
    for p in range(n_planes):
        vec = []
        for d in range(dim):
            x = math.sin(seed + p * 7919 + d * 104729) * 43758.5453
            vec.append((x - math.floor(x)) * 2.0 - 1.0)
        planes.append(vec)
    return planes


def _lsh_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
    dim: int,
) -> DataFrame:
    """Shared LSH candidate generation: (query_id, neighbor_id,
    q_vec, c_vec) pairs sharing at least one hash-table bucket."""

    # All tables' hyperplanes as one (n_tables*n_planes, dim) matrix:
    # bucketing is a single numpy matmul per Arrow batch. The naive
    # alternative — n_tables*n_planes literal array-fold expressions —
    # explodes codegen compile time and runs element-at-a-time.
    planes_matrix = np.array(
        [
            plane
            for t_idx in range(n_tables)
            for plane in _hyperplanes(dim, n_planes, seed=42 + t_idx * 1009)
        ],
        dtype=np.float64,
    )
    powers = np.array([1 << p for p in range(n_planes)], dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        signs = (mat @ planes_matrix.T) >= 0  # (batch, tables*planes)
        signs = signs.reshape(len(mat), n_tables, n_planes)
        buckets = (signs * powers).sum(axis=2)  # (batch, tables)
        return pd.Series(list(buckets))

    def bucket_cols(df: DataFrame, vid: str) -> DataFrame:
        out = df.withColumn("_buckets", bucket_ids(F.col(vec_col)))
        return out.select(
            F.col(vid),
            F.posexplode("_buckets").alias("tbl", "bucket"),
        )

    # Candidate pairs dedup on IDs ONLY: a pair colliding in all
    # n_tables tables would otherwise drag 2 dim-wide float vectors
    # through the distinct() shuffle once per table. Vectors (+ norms,
    # computed once per vector) re-attach after the dedup.
    qb = bucket_cols(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)), "query_id"
    )
    cb = bucket_cols(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)), "neighbor_id"
    )
    pair_ids = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    return pair_ids.join(q_vecs, "query_id").join(c_vecs, "neighbor_id")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Each of ``n_tables`` hash tables assigns a vector the integer whose
    bits are sign(v·h_i) over that table's ``n_planes`` hyperplanes.
    Query and corpus join on (table, bucket); exact cosine + window
    rank run only on candidates. Recall grows with n_tables; cost is
    bucket-local.
    """

    cand = _lsh_candidates(corpus, queries, id_col, vec_col, n_planes, n_tables, dim)
    scored = cand.withColumn(
        "cosine",
        F.round(
            _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ thr).

    LSH-bucketed self-join — the embedding analog of MinHash dedup.
    Thresholds the RAW cosine (rounding only the reported value), and
    works directly on the candidate set — no top-k cap, so vectors
    with many duplicates surface every pair.
    """
    cand = _lsh_candidates(df, df, id_col, vec_col, n_planes, n_tables, dim)
    raw = _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    return (
        # id-order filter BEFORE scoring: the self-join surfaces both
        # (a,b) and (b,a); score only one orientation.
        cand.filter(F.col("query_id") < F.col("neighbor_id"))
        .withColumn("_raw", raw)
        .filter(F.col("_raw") >= threshold)
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            F.round("_raw", 6).alias("cosine"),
        )
        .distinct()
    )
