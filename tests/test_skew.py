"""Skew-mitigation operators: salted results must equal plain results,
and the salted plan must actually spread the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.catalog import load_table
from ag_data_ingestion_github_to_snowflake_spark.operators.skew import (
    replicated_skew_join,
    salted_aggregate,
)

SF = "/root/testdata/sf0.001"


def skewed_df(spark):
    """90% of rows share one hot key."""
    return spark.range(10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = skewed_df(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sv"), F.count("v").alias("cv"), F.max("v").alias("mv")
    )
    salted = salted_aggregate(
        df,
        keys=["k"],
        aggs={"sv": ("v", "sum"), "cv": ("v", "count"), "mv": ("v", "max")},
        unique_col="uid",
        n_salts=16,
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_aggregate_spreads_hot_key(spark):
    df = skewed_df(spark)
    phase1_groups = (
        df.withColumn("_salt", F.pmod(F.xxhash64("uid"), F.lit(16)).cast("int"))
        .groupBy("k", "_salt")
        .count()
        .filter(F.col("k") == 0)
    )
    assert phase1_groups.count() == 16  # hot key split across all salts


def test_replicated_skew_join_matches_plain(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(o, "l_orderkey").groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = replicated_skew_join(
        li, o, key="l_orderkey", fact_unique_col="l_linenumber", n_salts=4
    ).groupBy("o_orderstatus").agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_aggregate_count_star_vs_nonnull(spark):
    """'count' is COUNT(*) even when the input column is nullable;
    'countnn' is SQL COUNT(col)."""
    df = spark.range(100).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("uid"),
        F.when(F.col("id") % 4 != 0, F.col("id").cast("double")).alias("v"),
    )
    salted = salted_aggregate(
        df,
        keys=["k"],
        aggs={"n_rows": ("v", "count"), "n_vals": ("v", "countnn")},
        unique_col="uid",
        n_salts=8,
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"), F.count("v").alias("n_vals")
    )
    assert sorted(salted.collect()) == sorted(plain.collect())
    rows = {r.k: r for r in salted.collect()}
    assert any(rows[k].n_rows != rows[k].n_vals for k in rows)
