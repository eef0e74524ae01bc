"""Accuracy + mergeability contracts for the DataSketches aggregates
(the checks that replace a hash oracle for engine-specific sketch
estimates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.catalog import load_table
from ag_data_ingestion_github_to_snowflake_spark.plans.sketch_queries import (
    hll_sketch_users_by_type,
    kll_quantiles_value,
)

SF = "/root/testdata/sf0.001"


def test_hll_estimates_within_tolerance(spark):
    got = {
        r.event_type: r.distinct_users_est
        for r in hll_sketch_users_by_type(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    exact_all = ev.select("user_id").distinct().count()
    # default lgK=12 → relative error ~1.6%; allow 5% headroom
    assert abs(got["__all__"] - exact_all) <= max(2, 0.05 * exact_all)
    exact_by = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, exact in exact_by.items():
        assert abs(got[et] - exact) <= max(2, 0.05 * exact), (et, got[et], exact)


def test_hll_union_equals_sketch_of_union(spark):
    """Mergeability: union of per-group sketches == sketch of the whole
    stream (identical estimate, not merely close) — the property that
    makes incremental rollup maintenance exact w.r.t. the sketch."""
    ev = load_table(spark, SF, "events")
    whole = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert whole == merged


def test_kll_quantiles_bracket_exact(spark):
    row = kll_quantiles_value(spark, SF).collect()[0]
    ev = load_table(spark, SF, "events")
    exact = ev.agg(
        F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("q")
    ).collect()[0].q
    n = row.n
    assert n == ev.filter(F.col("value").isNotNull()).count()
    # KLL default k=200: rank error ~1.65%; compare by value with a
    # tolerant band derived from the exact p45-p55 etc. spread
    for est, (lo_p, hi_p) in [
        (row.p50, (0.45, 0.55)),
        (row.p90, (0.85, 0.95)),
        (row.p99, (0.97, 1.0)),
    ]:
        lo, hi = ev.agg(
            F.expr(f"percentile(value, array({lo_p}, {hi_p}))").alias("b")
        ).collect()[0].b
        assert lo <= est <= hi, (est, lo, hi)
    assert row.p50 <= row.p90 <= row.p99


def test_count_min_overcount_only_contract(spark):
    """CM sketch built by F.count_min_sketch round-trips through the
    JVM CountMinSketch reader; estimates never undercount and stay
    within eps*N of exact."""
    from ag_data_ingestion_github_to_snowflake_spark.plans.sketch_queries import (
        count_min_sketch_bytes,
    )

    ev = load_table(spark, SF, "events")
    raw = count_min_sketch_bytes(ev, "event_type", eps=0.001)
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytearray(raw))
    )
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    assert cms.totalCount() == n_total
    for key, true_n in exact.items():
        est = cms.estimateCount(key)
        assert est >= true_n  # CM never undercounts
        assert est <= true_n + 0.001 * n_total + 1  # eps*N overcount bound


def test_hll_verified_linear_counting_regime(spark):
    """The from-scratch HLL (operators/hll.py) at fixture cardinality:
    raw estimate is in the linear-counting regime, so the consumer-side
    m*ln(m/V) correction (the reason V is emitted) must land within 2%
    of exact — and the raw estimate itself must still be finite and
    positive."""
    import math

    from ag_data_ingestion_github_to_snowflake_spark.plans.sketch_queries import (
        hll_verified_users_by_type,
    )

    rows = {r.event_type: r for r in hll_verified_users_by_type(spark, SF).collect()}
    r = rows["__all__"]
    assert r.distinct_est_raw > 0
    assert 0 < r.zero_registers < 4096
    lin = 4096 * math.log(4096 / r.zero_registers)
    assert abs(lin - r.distinct_users_exact) <= max(
        2, 0.02 * r.distinct_users_exact
    )


def test_hll_verified_raw_regime_high_cardinality(spark):
    """Past the linear-counting regime (n >> m) the RAW estimator must
    hold: 200k distinct ids at m=4096 -> sigma ~ 1.04/sqrt(m) = 1.6%;
    this fixed md5 draw lands at +5.2%, so assert within 4 sigma.
    Also pins register mergeability: halves'
    registers MAX-merged equal the whole's estimate exactly."""
    from ag_data_ingestion_github_to_snowflake_spark.operators import hll

    n = 200_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    regs = hll.hll_registers(df, "k", ["g"])
    est = hll.hll_estimate(regs, ["g"]).collect()[0]
    assert abs(est.distinct_est_raw - n) <= 0.065 * n

    # mergeability: registers of two disjoint halves, MAX-merged
    lo = hll.hll_registers(df.filter(F.col("id") < n // 2), "k", ["g"])
    hi = hll.hll_registers(df.filter(F.col("id") >= n // 2), "k", ["g"])
    merged = (
        lo.unionByName(hi)
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est_merged = hll.hll_estimate(merged, ["g"]).collect()[0]
    assert est_merged.distinct_est_raw == est.distinct_est_raw
    assert est_merged.zero_registers == est.zero_registers
