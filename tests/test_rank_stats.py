"""Hand-computed golden values + two-level-vs-naive properties for the
r9 rank-statistics family (Mann-Whitney U, KS two-sample), the
deterministic Poisson bootstrap, and the rolling exact distinct.

The oracle-parity suite pins these against DuckDB on the fixture; the
tests here pin the MATH on inputs small enough to verify by hand, and
the two-level cumulative scan against the naive single-window form it
replaces (same answers by construction — bucket order refines value
order — but that is exactly the claim worth a property test).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ag_data_ingestion_github_to_snowflake_spark.plans.core_relational import (
    _POISSON1_CUM_T28,
    _two_level_value_cum,
)


def _vals_df(spark, rows):
    """rows: (value, n_a, n_b) -> the per-distinct-value table shape."""
    return spark.createDataFrame(
        [(float(v), int(a), int(b), int(a + b)) for v, a, b in rows],
        "value double, n_a long, n_b long, n long",
    )


def test_two_level_cum_equals_naive_window(spark):
    # 40 distinct values spread across buckets of width 5, interleaved
    # group counts; include bucket-boundary values (exact multiples).
    rows = [(v * 1.25, (v * 7) % 3, (v * 5) % 4) for v in range(40)]
    df = _vals_df(spark, rows)
    got = {
        r["value"]: (r["cum_a"], r["cum_b"], r["cum_n"])
        for r in _two_level_value_cum(df, width=5.0).collect()
    }
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["value"]: (r["ca"], r["cb"], r["cn"])
        for r in df.select(
            "value",
            F.sum("n_a").over(w).alias("ca"),
            F.sum("n_b").over(w).alias("cb"),
            F.sum("n").over(w).alias("cn"),
        ).collect()
    }
    assert got == want


def test_mann_whitney_hand_example(spark):
    """A = {1, 2, 4}, B = {2, 3}: midranks 1, 2.5, 2.5, 4, 5 ->
    R_A = 1 + 2.5 + 5 = 8.5, U_A = 8.5 - 6 = 2.5."""
    rows = [(1.0, 1, 0), (2.0, 1, 1), (3.0, 0, 1), (4.0, 1, 0)]
    cum = _two_level_value_cum(_vals_df(spark, rows), width=5.0)
    s = cum.select(
        (
            F.col("n_a")
            * ((F.col("cum_n") - F.col("n")) + (F.col("n") + F.lit(1)) / F.lit(2.0))
        ).alias("term")
    ).agg(F.sum("term").alias("r_a")).collect()[0]
    assert s["r_a"] == pytest.approx(8.5, abs=0)
    # U_A = R_A - n_A(n_A+1)/2 with n_A = 3
    assert s["r_a"] - 3 * 4 / 2.0 == pytest.approx(2.5, abs=0)


def test_ks_hand_example(spark):
    """A = {1, 2}, B = {3, 4}: disjoint supports -> D = 1.0 at value 2
    (ECDF_A hits 1.0 while ECDF_B is still 0)."""
    rows = [(1.0, 1, 0), (2.0, 1, 0), (3.0, 0, 1), (4.0, 0, 1)]
    cum = _two_level_value_cum(_vals_df(spark, rows), width=5.0)
    gaps = cum.select(
        "value",
        F.abs(F.col("cum_a") / F.lit(2.0) - F.col("cum_b") / F.lit(2.0)).alias("gap"),
    ).collect()
    by_val = {r["value"]: r["gap"] for r in gaps}
    assert by_val[2.0] == 1.0
    assert max(by_val.values()) == 1.0


def test_poisson_thresholds_are_poisson1_cdf():
    """The integer thresholds must be floor(CDF_k * 2^28) for the
    Poisson(1) CDF — recomputed from scratch here so a typo in the
    literals cannot survive."""
    import math

    cum = 0.0
    for k, thr in enumerate(_POISSON1_CUM_T28):
        cum += math.exp(-1.0) / math.factorial(k)
        assert thr == int(cum * (1 << 28)), k
    # mean of the capped distribution stays ~1 (mass above 5 is ~6e-4)
    probs = []
    prev = 0
    for thr in _POISSON1_CUM_T28:
        probs.append((thr - prev) / float(1 << 28))
        prev = thr
    probs.append(1.0 - prev / float(1 << 28))  # the w=6 cap
    mean = sum(k * p for k, p in enumerate(probs))
    assert mean == pytest.approx(1.0, abs=5e-3)


def test_bootstrap_weights_deterministic_and_poisson_like(spark):
    """The hash-derived weights must be identical across evaluations
    (no RNG state) and empirically Poisson(1)-shaped."""
    from ag_data_ingestion_github_to_snowflake_spark.plans.core_relational import (
        _poisson_weight_sql,
    )

    h = (
        "CAST(conv(substring(md5(concat(CAST(id AS STRING), ':',"
        " CAST(CAST(b / 4 AS INT) AS STRING))),"
        " 1 + 7 * CAST(b % 4 AS INT), 7), 16, 10) AS BIGINT)"
    )
    df = (
        spark.range(2000)
        .crossJoin(spark.range(4).select(F.col("id").alias("b")))
        .select(F.expr(_poisson_weight_sql(h)).alias("w"))
    )
    counts1 = {r["w"]: r["n"] for r in df.groupBy("w").agg(F.count("*").alias("n")).collect()}
    counts2 = {r["w"]: r["n"] for r in df.groupBy("w").agg(F.count("*").alias("n")).collect()}
    assert counts1 == counts2  # deterministic replay
    n = sum(counts1.values())
    assert counts1[0] / n == pytest.approx(0.3679, abs=0.02)
    assert counts1[1] / n == pytest.approx(0.3679, abs=0.02)
    assert counts1.get(2, 0) / n == pytest.approx(0.1839, abs=0.02)


def test_rolling_distinct_equals_naive_range_join(spark):
    """The contribution-explode formulation must equal the textbook
    per-day range join on a small synthetic activity log."""
    rows = [
        (u, d)
        for u in range(6)
        for d in range(1, 20, u + 1)  # staggered activity cadences
    ]
    ev = spark.createDataFrame(
        [(u, f"2024-01-{d:02d} 12:00:00") for u, d in rows],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
                "day"
            ),
        )
        .distinct()
        .join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    naive = (
        days.alias("d")
        .join(
            ud.alias("u"),
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
    )
    got = {str(r["day"]): r["n"] for r in contrib.collect()}
    want = {str(r["day"]): r["n"] for r in naive.collect()}
    assert got == want


def test_midrank2_property_random_multisets(spark):
    """Property: _midrank2's two-level bucket scan must equal the naive
    per-value doubled midrank (2*strict_less + n + 1) on random
    multisets — including bucket-boundary values, negative values, and
    single-bucket degeneracy. Hypothesis drives the multiset; one
    SparkSession serves all examples."""
    import random

    from pyspark.sql import functions as F

    from ag_data_ingestion_github_to_snowflake_spark.plans.inference_queries import (
        _midrank2,
    )

    rng = random.Random(411)
    for trial in range(12):
        width = rng.choice([1.0, 2.5, 7.0, 1000.0])
        universe = [
            round(rng.uniform(-50, 50), 2) for _ in range(rng.randint(1, 30))
        ]
        counts = {v: rng.randint(1, 9) for v in set(universe)}
        vals = spark.createDataFrame(
            [(float(v), int(n)) for v, n in counts.items()], ["value", "n"]
        ).withColumn("n", F.col("n").cast("bigint"))
        got = {
            r["value"]: r["m2"]
            for r in _midrank2(vals, "value", width=width).collect()
        }
        expected = {
            v: 2 * sum(n2 for v2, n2 in counts.items() if v2 < v)
            + counts[v]
            + 1
            for v in counts
        }
        assert got == expected, (trial, width, counts, got, expected)
