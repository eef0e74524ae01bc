"""Training-shard writer: the terminal step of the corpus pipeline.

Trainers consume a corpus as N equal-ish shards with a manifest (what's
in each shard, how big, in what order) — the output contract of every
large-scale data pipeline, and the piece that turns this engine's
curation operators into something a training job can actually read.
No counterpart in the reference (its output is one JSON envelope per
run, /root/reference/src/extract_github_data.py:554-600).

Design:
- shard = ``seq_id div ceil(n/n_shards)`` over the dense ids minted by
  ``operators/ids.py`` — CONTIGUOUS key ranges per shard, so shard
  membership is reproducible from the order key alone (re-running the
  writer on the same corpus yields byte-identical shard membership),
  unlike hash sharding where adding one shard reshuffles everything.
- each shard is one parquet directory partition written in a single
  job (`partitionBy("shard")`); readers open exactly the shards they
  are assigned — partition pruning does the work.
- the manifest is a small DataFrame (shard, n_docs, n_chars,
  id_lo, id_hi) written alongside as JSON — trainer-side bookkeeping
  without opening data files.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.ids import (
    assign_sequential_ids,
)


def shard_assignments(
    df: DataFrame, order_col: str, n_shards: int
) -> DataFrame:
    """Add ``seq_id`` and ``shard`` (0..n_shards-1, contiguous ranges)."""
    n = df.count()
    per = max(1, math.ceil(n / n_shards))
    out = assign_sequential_ids(df, order_col)
    return out.withColumn(
        "shard", (F.col("seq_id") / per).cast("int")
    )


def write_training_shards(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    order_col: str,
    n_shards: int = 8,
) -> DataFrame:
    """Write ``df`` as contiguous shards + manifest; returns the
    manifest DataFrame (shard, n_docs, n_chars, id_lo, id_hi).

    One pass assigns ids and shards, one write job emits every shard
    (``partitionBy`` — each shard directory is written by the tasks
    owning its rows, no per-shard driver loop), and the manifest
    aggregation is shard-count sized. ``n_chars`` totals require a
    ``text`` column; absent one, the column is 0.
    """
    sharded = shard_assignments(df, order_col, n_shards).localCheckpoint(
        eager=True
    )  # ids+shards computed once, shared by the write and the manifest
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    chars = (
        F.sum(F.length("text")) if "text" in df.columns else F.lit(0)
    )
    manifest = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            chars.cast("bigint").alias("n_chars"),
            F.min(order_col).alias("id_lo"),
            F.max(order_col).alias("id_hi"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").json(path + "_manifest")
    return manifest
