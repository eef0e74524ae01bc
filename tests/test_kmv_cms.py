"""From-scratch KMV and Count-Min sketches (operators/sketches.py):
algebraic contracts beyond the registry's oracle-hash parity.

- KMV: the merged (per-group samples -> union -> re-cut) estimate must
  EQUAL the direct global sketch — mergeability is exact, not
  approximate. Estimates must track exact counts within the k-driven
  error bound on a cardinality large enough to exercise the full
  sketch.
- Count-Min: estimates never undercount, and with width >> distinct
  keys they are exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators import sketches as K


def _synth(spark, n_users=400, rows_per=5):
    return (
        spark.range(n_users * rows_per)
        .select(
            (F.col("id") % n_users).alias("user_id"),
            (F.col("id") % 4).cast("string").alias("grp"),
        )
    )


def test_kmv_merge_equals_direct_global(spark):
    df = _synth(spark)
    k = 16
    merged = K.kmv_merged_estimate(df, "user_id", "grp", k).collect()[0]
    # direct global sketch: one group spanning everything
    direct = (
        K.kmv_group_estimates(df.withColumn("g", F.lit("all")), "user_id", "g", k)
        .collect()[0]
    )
    assert merged["est"] == direct["est"]
    assert merged["sample_n"] == direct["sample_n"] == k


def test_kmv_estimate_tracks_exact(spark):
    df = _synth(spark, n_users=1000)
    k = 64
    row = K.kmv_merged_estimate(df, "user_id", "grp", k).collect()[0]
    assert row["exact"] == 1000
    # KMV relative error ~ 1/sqrt(k-2) ≈ 13% at k=64; allow 3 sigma.
    assert abs(row["est"] - 1000) < 1000 * 0.40


def test_kmv_small_set_exact_path(spark):
    df = _synth(spark, n_users=5)
    rows = K.kmv_group_estimates(df, "user_id", "grp", k=8).collect()
    for r in rows:
        assert r["est"] == r["exact"]  # sketch not full -> exact count


def test_cms_never_undercounts_and_exact_when_wide(spark):
    df = _synth(spark, n_users=30, rows_per=7)
    keys = df.select("user_id").distinct()
    truth = {r["user_id"]: r["cnt"] for r in df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # narrow sketch: overcount-only
    est_narrow = K.cms_estimate_keys(df, keys, "user_id", depth=4, width=8)
    for r in est_narrow.collect():
        assert r["cms_est"] >= truth[r["user_id"]]
    # wide sketch (w >> 30 distinct): min over 4 rows collides with
    # prob ~ (30/1024)^4 — effectively exact here
    est_wide = K.cms_estimate_keys(df, keys, "user_id", depth=4, width=1024)
    for r in est_wide.collect():
        assert r["cms_est"] == truth[r["user_id"]]
