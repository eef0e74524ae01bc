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


def test_cms_absent_key_estimates_zero(spark):
    """A probed key absent from the corpus must return est=0 (left
    join + coalesce), not disappear from the output; with a wide
    sketch its cells are empty, so the min is exactly 0."""
    df = _synth(spark, n_users=30, rows_per=7)
    keys = spark.createDataFrame([("ghost-user",)], "user_id STRING")
    rows = K.cms_estimate_keys(df, keys, "user_id", depth=4, width=4096).collect()
    assert len(rows) == 1
    assert rows[0]["user_id"] == "ghost-user"
    assert rows[0]["cms_est"] == 0


def test_quantile_hash_sample_accuracy(spark):
    """The 1/16 hash sample's quantile estimates must track exact
    within sample-size-appropriate tolerance (~128 rows per type at
    sf0.01: median is tight, the p90 tail is statistically noisier —
    order-statistic stderr ~ sqrt(p(1-p)/n) of rank ≈ ±4 ranks, which
    on a heavy-tailed value column is a wide value interval)."""
    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

    rows = all_specs()["quantile_hash_sample"].build(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows, "no groups"
    for r in rows:
        assert r["sample_n"] > 50, r
        spread = max(abs(r["p90_exact"]), 1.0)
        assert abs(r["p50_est"] - r["p50_exact"]) < 0.20 * spread, r
        assert abs(r["p90_est"] - r["p90_exact"]) < 0.35 * spread, r


def test_bucketed_lag_pairs_equal_global_lag(spark):
    """operators/temporal.bucketed_lag_pairs must produce EXACTLY the
    pair multiset a global per-group LAG produces — the boundary
    restoration is what makes the distributed twin exact."""
    from pyspark.sql import Window
    from ag_data_ingestion_github_to_snowflake_spark.operators.temporal import (
        bucketed_lag_pairs,
    )
    import datetime as dt

    rows = []
    base = dt.datetime(2025, 1, 1)
    for g in ("a", "b"):
        for i in range(50):
            # Every 11th value NULL: the operator must keep the
            # (NULL, y) pairs a true LAG emits, distinguishing them
            # from bucket-first rows (which produce no pair at all).
            v = None if i % 11 == 3 else float(i * 13 % 29)
            rows.append((g, base + dt.timedelta(hours=i * 7), i, v))
    df = spark.createDataFrame(rows, "g STRING, ts TIMESTAMP, event_id INT, v DOUBLE")
    key = lambda t: (t[0], t[1] is None, t[1], t[2] is None, t[2])  # noqa: E731
    got = sorted(
        (
            (r["g"], r["yprev"], r["y"])
            for r in bucketed_lag_pairs(
                df, "g", ["ts", "event_id"], "v",
                F.date_trunc("day", F.col("ts")),
            ).collect()
        ),
        key=key,
    )
    w = Window.partitionBy("g").orderBy("ts", "event_id")
    want = sorted(
        (
            (r["g"], r["yprev"], r["v"])
            for r in df.withColumn("yprev", F.lag("v").over(w))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") > 1)
            .collect()
        ),
        key=key,
    )
    assert got == want
