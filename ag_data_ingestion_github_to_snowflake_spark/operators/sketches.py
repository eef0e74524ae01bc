"""From-scratch mergeable sketches with oracle-replayable hash
families: KMV (k-minimum-values) distinct-count and Count-Min
frequency estimation.

Companions to ``operators/hll.py`` (from-scratch HLL): Spark's
built-in DataSketches aggregates (``hll_sketch_agg`` etc.,
``plans/sketch_queries.py``) are the production path, but their binary
estimates are engine-specific, so no SQL oracle can check them. These
implementations use the md5-derived 60-bit hash
(``operators/dedup.md5_hash60``) that DuckDB reproduces bit-for-bit,
making the ENTIRE sketch pipeline — hashing, sampling, merge,
estimate — hash-verifiable against an exact SQL replay.

Why these matter at 100 TB:

- KMV: a distinct-count sketch whose state is just the k smallest
  hashes. Per-group (or per-partition, per-day) sketches merge by
  "union the samples, keep the k smallest" — associative and
  commutative, so incremental rollups never rescan raw data. The
  merged estimate provably equals the direct global sketch: any
  globally k-smallest hash is at most k-th smallest within its own
  group, hence survives every partial sketch.
- Count-Min: a d x w counter matrix updated additively — partial
  aggregation (map-side combine) does almost all the work, and the
  full sketch is w*d integers regardless of key cardinality. Point
  estimates (min over d rows) upper-bound true frequency with error
  eps*N at confidence 1-delta for w=e/eps, d=ln(1/delta).

All dataflow is built-in Column expressions: one shuffle for KMV (the
distinct + per-group top-k), one for Count-Min (the (row, bucket)
counter aggregation); no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.dedup import md5_hash60

_TWO60 = float(1 << 60)  # exactly representable in float64


def kmv_hash(col: Column) -> Column:
    """Uniform 60-bit hash of the stringified key (md5-derived,
    DuckDB-replayable)."""
    return md5_hash60(col.cast("string"))


def kmv_group_estimates(
    df: DataFrame, key_col: str, group_col: str, k: int
) -> DataFrame:
    """Per-group KMV distinct estimates: (group, exact, est, sample_n).

    exact is the true COUNT(DISTINCT key) for the accuracy contract;
    est is the sketch estimate (k-1) * 2^60 / h_k when the sketch is
    full, else the exact sample size (the standard KMV small-set rule).
    """
    hashed = (
        df.select(F.col(group_col).alias("grp"), kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    sampled = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return (
        sampled.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sample_n"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
        )
        .join(
            hashed.groupBy("grp").agg(F.count(F.lit(1)).cast("bigint").alias("exact")),
            "grp",
        )
        .select(
            F.col("grp"),
            F.col("exact"),
            F.when(
                F.col("h_k").isNotNull(),
                F.round(F.lit(float(k - 1)) * F.lit(_TWO60) / F.col("h_k").cast("double")).cast("bigint"),
            )
            .otherwise(F.col("sample_n"))
            .alias("est"),
            F.col("sample_n"),
        )
    )


def kmv_merged_estimate(df: DataFrame, key_col: str, group_col: str, k: int) -> DataFrame:
    """Global estimate via the MERGE path: per-group k-min samples are
    unioned, distinct-ed, and re-cut to the k smallest — exercising the
    sketch-merge algebra rather than re-sketching raw data. One row:
    (exact, est, sample_n)."""
    hashed = (
        df.select(F.col(group_col).alias("grp"), kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    samples = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("h")
        .distinct()
    )
    wg = Window.orderBy("h")
    merged = samples.withColumn("rn", F.row_number().over(wg)).filter(F.col("rn") <= k)
    exact = df.select(F.countDistinct(key_col).cast("bigint").alias("exact"))
    est = merged.agg(
        F.count(F.lit(1)).cast("bigint").alias("sample_n"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
    ).select(
        F.when(
            F.col("h_k").isNotNull(),
            F.round(F.lit(float(k - 1)) * F.lit(_TWO60) / F.col("h_k").cast("double")).cast("bigint"),
        )
        .otherwise(F.col("sample_n"))
        .alias("est"),
        "sample_n",
    )
    # 1-row x 1-row: a broadcast scalar join (allowed BNLJ class,
    # PLANAUDIT.md).
    return exact.crossJoin(est)


def cms_bucket(col: Column, row: int, width: int) -> Column:
    """Row-salted bucket: md5_hash60('<row>:<key>') % width."""
    return F.pmod(
        md5_hash60(F.concat_ws(":", F.lit(row), col.cast("string"))), F.lit(width)
    ).cast("int")


def cms_counters(
    df: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """The d x w counter matrix: (row, bucket, cnt). Each input row
    contributes one increment per sketch row; partial aggregation
    collapses the explode map-side, so the shuffle carries at most
    partitions * d * w rows."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cms_bucket(F.col(key_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate_keys(
    df: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: min over the d
    counters. The counter matrix (<= d*w rows) is broadcast to the
    candidate side — no shuffle of the candidates. An empty (row,
    bucket) cell counts as 0 — a LEFT join with coalesce, so a probed
    key absent from the corpus estimates 0 instead of vanishing (and a
    partially-empty cell cannot inflate the min)."""
    counters = cms_counters(df, key_col, depth, width)
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )
