"""Embedding compression: symmetric int8 scalar quantization.

At 100 TB an `array<float>` embedding column is often the widest thing
in the table; int8 quantization cuts it 4× with bounded error, which is
the standard storage/ANN-memory trade (FAISS `SQ8`, public knowledge).

Everything is built-in array expressions (transform / aggregate /
zip_with) — per-row, no shuffle, whole-stage codegen. The quantizer is
defined as ``floor(x/scale + 0.5)`` (half-up toward +inf) rather than
an engine ``round`` so Spark and the DuckDB oracle twin compute the
exact same integer on ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q8",
    scale_col: str = "scale",
) -> DataFrame:
    """Add per-vector int8 codes + the dequantization scale.

    scale = max(|x|)/127 (floored at 1e-12 so a zero vector encodes to
    zeros instead of dividing by zero); code_i = floor(x_i/scale + 0.5).
    Arithmetic in double — the float32 input is widened first so the
    oracle twin (which also widens) matches bit-for-bit.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = (
        F.greatest(
            F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12)
        )
        / F.lit(127.0)
    )
    df = df.withColumn(scale_col, scale)
    q = F.transform(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast("int"),
    )
    return df.withColumn(q_col, q)


def reconstruction_error(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q8",
    scale_col: str = "scale",
) -> DataFrame:
    """Add max_abs_err / mse columns comparing dequantized codes to the
    original vector (both widened to double)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    recon = F.transform(
        F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)
    )
    diff = F.zip_with(v, recon, lambda a, b: F.abs(a - b))
    max_err = F.array_max(diff)
    mse = F.aggregate(
        diff, F.lit(0.0), lambda acc, x: acc + x * x
    ) / F.greatest(F.size(v), F.lit(1)).cast("double")
    return df.withColumn("max_abs_err", max_err).withColumn("mse", mse)


def ivf_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell search over an int8-quantized corpus — the composed
    production ANN shape (FAISS ``IVF,SQ8``): the coarse quantizer
    prunes the candidate set to ``nprobe`` cells, and the residual
    scoring runs against 4×-smaller int8 codes (asymmetric distance:
    queries stay full-precision).

    Scale shape: the corpus is quantized and cell-assigned in one
    narrow pass (array exprs + one Arrow-batched argmax), then the only
    shuffle is the equi-join on ``cell``. At 100 TB both memberships
    (cell id: 4 bytes, codes: dim bytes) replace the float32 vector in
    the shuffle — the join moves ~4× fewer bytes than full-precision
    IVF.

    Determinism: the quantizer is exact integer math and cell
    membership is exhaustive at ``nprobe == n_cells``, so the full
    probe provably equals :func:`quantized_brute_force_topk` and hash-
    matches its SQL oracle; smaller ``nprobe`` is the approximate
    production path.
    """
    from pyspark.sql.window import Window

    from ag_data_ingestion_github_to_snowflake_spark.operators.similarity import (
        _nearest_cell_udf,
        _probe_cells_udf,
    )

    qz = quantize_int8(corpus, vec_col=vec_col)
    c = qz.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(
            F.col("q8"), lambda x: x.cast("double") * F.col("scale")
        ).alias("c_vec"),
    )
    c = c.withColumn(
        "c_norm",
        F.sqrt(F.aggregate(F.col("c_vec"), F.lit(0.0), lambda a, x: a + x * x)),
    ).withColumn("cell", _nearest_cell_udf(centroids)(F.col("c_vec")))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("q_vec"),
        )
        .withColumn(
            "q_norm",
            F.sqrt(F.aggregate(F.col("q_vec"), F.lit(0.0), lambda a, x: a + x * x)),
        )
        .withColumn("_cells", _probe_cells_udf(centroids, nprobe)(F.col("q_vec")))
        .select("query_id", "q_vec", "q_norm", F.explode("_cells").alias("cell"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        c.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(dot / (F.col("q_norm") * F.col("c_norm")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.select(
        "query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= k)


def quantized_brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k where the corpus side is int8-quantized.

    The asymmetric-distance ANN memory trade (FAISS SQ8 shape): corpus
    vectors are stored as codes + one scale (4× smaller, which at
    100 TB is the difference between an in-memory and a spilling
    index); queries stay full-precision. Scoring dequantizes inside
    the fold — still JVM array expressions, still a broadcast of the
    small query side, corpus never shuffles.

    Deterministic end-to-end: the quantizer is exact integer math, so
    the scores (rounded to 6) are oracle-reproducible — unlike most
    ANN, this approximation is itself value-checkable.
    """
    from pyspark.sql.window import Window

    qz = quantize_int8(corpus, vec_col=vec_col)
    c = qz.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(
            F.col("q8"), lambda x: x.cast("double") * F.col("scale")
        ).alias("c_vec"),
    )
    c = c.withColumn(
        "c_norm",
        F.sqrt(F.aggregate(F.col("c_vec"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("q_vec"),
    ).withColumn(
        "q_norm",
        F.sqrt(F.aggregate(F.col("q_vec"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn(
        "cosine", F.round(dot / (F.col("q_norm") * F.col("c_norm")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.select(
        "query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= k)
