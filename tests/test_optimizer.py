"""Optimizer-evidence tests: the two runtime re-planning features the
100 TB design leans on, pinned as hard plan assertions rather than
prose claims.

- AQE skew-join split: a hot key must get its shuffle partition SPLIT
  at runtime (SortMergeJoin(skew=true) + an AQEShuffleRead marked
  skewed) — the no-code-change answer to join skew that
  ``operators/skew.py``'s salting complements when AQE can't help
  (aggregations, forced partitionings).
- Dynamic partition pruning: joining a partitioned fact with a
  filtered dim must inject a runtime partition filter
  (SubqueryAdaptiveBroadcast dynamicpruning...) so only matching
  partition directories are scanned — the partition-level sibling of
  the runtime bloom filter (runtime_bloom_filter_join).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s2.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144"
    )
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    # 75% of rows hit key 7; the rest spread over 97 keys
    fact = s2.range(400000).select(
        F.when(F.col("id") % 4 != 0, F.lit(7))
        .otherwise(F.col("id") % 97)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = s2.range(100).select(F.col("id").alias("kd"), (F.col("id") * 2).alias("v"))
    j = fact.join(dim, fact.k == dim.kd).select("k", "payload", "v")
    assert len(j.collect()) == 400000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan[:1500]
    assert "skewed" in plan, plan[:1500]


def test_dynamic_partition_pruning_injected(spark):
    d = tempfile.mkdtemp(prefix="dpp_fact_")
    d2 = tempfile.mkdtemp(prefix="dpp_dim_")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.partitionBy(
        "event_type"
    ).mode("overwrite").parquet(d)
    spark.createDataFrame(
        [("click", 1), ("error", 2), ("view", 9)], "event_type STRING, w INT"
    ).write.mode("overwrite").parquet(d2)
    fact = spark.read.parquet(d)
    dim = spark.read.parquet(d2).filter(F.col("w") < 5)
    j = fact.join(dim, "event_type").groupBy("event_type").count()
    assert j.count() == 2  # only click + error survive the dim filter
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:1500]
