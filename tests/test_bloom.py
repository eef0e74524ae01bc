"""Bloom-filter runtime-pruning contract (operators/bloom.py).

The operator's one-sided guarantee is the whole point: NO false
negatives ever (pruning can never change join results), false
positives bounded well below 1 so the pruning is real.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 1000, 3).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k")
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    survived = {r.k for r in bloom_probe(fact, "k", bloom).collect()}
    member = set(range(0, 1000, 3))
    assert member <= survived, "bloom dropped a true member"


def test_bloom_prunes_most_non_members(spark):
    keys = spark.range(0, 30000, 3).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k")
    fact = spark.range(0, 30000).select(F.col("id").alias("k"))
    n_survived = bloom_probe(fact, "k", bloom).count()
    n_members = 10000
    # 2/3 of fact keys are non-members; at m=2^19, k=5, n=10k the FP
    # rate is well under 1%, so survivors ≈ members.
    assert n_survived >= n_members
    assert n_survived < n_members * 1.05, f"FP rate too high: {n_survived}"


def test_bloom_probe_is_exact_after_join(spark):
    build = spark.range(0, 500, 7).select(F.col("id").alias("k"))
    fact = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    pruned = bloom_probe(fact, "k", bloom_build(build, "k"))
    got = sorted(
        (r.k, r.v) for r in pruned.join(build, "k").select("k", "v").collect()
    )
    want = sorted((k, k * 2) for k in range(0, 500, 7))
    assert got == want
