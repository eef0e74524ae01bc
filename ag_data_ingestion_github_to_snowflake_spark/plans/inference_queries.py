"""Statistical-inference queries: Welch's t, Spearman rank correlation,
Theil-Sen robust slope, Kaplan-Meier survival, mutual information.

These extend the r9 hypothesis-testing family (Mann-Whitney U, KS,
chi-square drift, bootstrap CI, conformal OLS) with the remaining
textbook inference tools an analytics warehouse ships: a parametric
two-sample test, a rank correlation, a robust regression slope, a
survival curve, and an information-theoretic dependence measure.

Scale rules shared by every query here (same as core_relational):
- No global rank/cumulative window over data-scale rows — midranks
  come from distinct-value tables via the two-level bucket scan
  (``_midrank2``), survival curves operate on calendar-bounded
  duration tables, robust slopes on a deterministic fixed-size sample.
- Exact integer/decimal arithmetic everywhere the hash can see it;
  libm (ln/exp/sqrt) only on final presentation columns, rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ag_data_ingestion_github_to_snowflake_spark.operators.portable_math import (
    floor_e6,
    floor_e6_sql,
    ordered_sum,
    ordered_sum_sql,
    portable_exp_sql,
    portable_ln_sql,
)
from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t


def _midrank2(vals: DataFrame, value_col: str, width: float) -> DataFrame:
    """Per-distinct-value table ``(value, n)`` -> add ``m2`` = 2x the
    midrank of that value in the underlying multiset (an INTEGER:
    2*midrank = 2*strict_less + n + 1, and strict_less = cum_n - n).

    Two-level cumulative scan (bucket prefix-sum + in-bucket window,
    the _two_level_value_cum pattern from core_relational) so no
    single task ever sees the whole distinct-value stream. Doubling
    the midrank keeps every downstream sum integer-exact.
    """
    b = vals.withColumn(
        "bkt", F.floor(F.col(value_col) / F.lit(width)).cast("long")
    )
    per = b.groupBy("bkt").agg(F.sum("n").alias("bn"))
    w_b = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carry = per.select(
        "bkt", (F.sum("bn").over(w_b) - F.col("bn")).alias("cn")
    )
    w_in = Window.partitionBy("bkt").orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_n = F.col("cn") + F.sum("n").over(w_in)
    return b.join(F.broadcast(carry), "bkt").select(
        value_col,
        "n",
        (F.lit(2) * (cum_n - F.col("n")) + F.col("n") + F.lit(1))
        .cast("bigint")
        .alias("m2"),
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test: click vs view event values
# ---------------------------------------------------------------------------
@register(
    "welch_ttest_value_clicks",
    # Sums and sums-of-squares go through DECIMAL so they are exact
    # and order-independent; the t statistic and Welch-Satterthwaite
    # df are then pure double expressions over exact inputs (division
    # and sqrt are correctly-rounded IEEE in both engines).
    oracle="""
    WITH s AS (
      SELECT
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        CAST(SUM(CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        CAST(SUM(CASE WHEN event_type = 'click'
                 THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sa,
        CAST(SUM(CASE WHEN event_type = 'view'
                 THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sb,
        CAST(SUM(CASE WHEN event_type = 'click'
                 THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) END)
             AS DOUBLE) AS qa,
        CAST(SUM(CASE WHEN event_type = 'view'
                 THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) END)
             AS DOUBLE) AS qb
      FROM events WHERE event_type IN ('click', 'view')
    ),
    m AS (
      SELECT na, nb,
             sa / na AS ma, sb / nb AS mb,
             (qa - sa * sa / na) / (na - 1) AS va,
             (qb - sb * sb / nb) / (nb - 1) AS vb
      FROM s
    )
    SELECT na AS n_click, nb AS n_view,
           ROUND(ma, 6) AS mean_click,
           ROUND(mb, 6) AS mean_view,
           ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
           ROUND(
             (va / na + vb / nb) * (va / na + vb / nb)
             / ((va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)),
           4) AS welch_df
    FROM m
    """,
    survey_ids=("B18", "B19", "B43"),
    description="Welch's unequal-variance t-test (click vs view values), one conditional pass",
)
def welch_ttest_value_clicks(spark: SparkSession, sf: str) -> DataFrame:
    """Welch's t-test: do click events carry different mean values than
    views, without assuming equal variances? The parametric sibling of
    mann_whitney_value_clicks.

    ONE conditional aggregation pass over the stream (map-side combine,
    a single 1-row shuffle); sums and sums-of-squares are exact
    decimals, so partial-aggregation order cannot perturb the t
    statistic. Scale shape: map-only reduce — the cheapest possible
    plan for a global two-sample test.
    """
    ev = t(spark, sf, "events").filter(F.col("event_type").isin("click", "view"))
    dec = F.col("value").cast("decimal(18,6)")
    is_a = F.col("event_type") == "click"
    s = ev.agg(
        F.sum(is_a.cast("long")).cast("bigint").alias("na"),
        F.sum((~is_a).cast("long")).cast("bigint").alias("nb"),
        F.sum(F.when(is_a, dec)).cast("double").alias("sa"),
        F.sum(F.when(~is_a, dec)).cast("double").alias("sb"),
        F.sum(F.when(is_a, dec * dec)).cast("double").alias("qa"),
        F.sum(F.when(~is_a, dec * dec)).cast("double").alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    ma, mb = F.col("sa") / na, F.col("sb") / nb
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - F.lit(1))
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - F.lit(1))
    se2_a, se2_b = va / na, vb / nb
    t_stat = (ma - mb) / F.sqrt(se2_a + se2_b)
    df = (se2_a + se2_b) * (se2_a + se2_b) / (
        se2_a * se2_a / (na - F.lit(1)) + se2_b * se2_b / (nb - F.lit(1))
    )
    return s.select(
        na.alias("n_click"),
        nb.alias("n_view"),
        F.round(ma, 6).alias("mean_click"),
        F.round(mb, 6).alias("mean_view"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(df, 4).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation: quantity vs extended price, midrank-exact
# ---------------------------------------------------------------------------
@register(
    "spearman_corr_qty_price",
    # Doubled midranks (m2 = 2*midrank) are INTEGERS, so every sum
    # below is integer-exact. The per-row products are formed in
    # HUGEINT (int128) — casting each operand BEFORE the multiply —
    # because the raw BIGINT product x2*x2 would wrap int64 past
    # x2 ~ 3e9 (n ~ 1.5e9 rows); with int128 per-term math the
    # identical contract holds to x2 < 1e19 (n < 5e18), matching the
    # Spark side's DECIMAL(38,0)-before-multiply (ADVICE r12 fix).
    # The rho expression is then identical double arithmetic over
    # identical exact inputs.
    oracle="""
    WITH rx AS (
      SELECT l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1
    ),
    mx AS (
      SELECT v,
             2 * (SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n) + n + 1 AS m2
      FROM rx
    ),
    ry AS (
      SELECT l_extendedprice AS v, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1
    ),
    my AS (
      SELECT v,
             2 * (SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n) + n + 1 AS m2
      FROM ry
    ),
    joined AS (
      SELECT CAST(mx.m2 AS BIGINT) AS x2, CAST(my.m2 AS BIGINT) AS y2
      FROM lineitem l
      JOIN mx ON l.l_quantity = mx.v
      JOIN my ON l.l_extendedprice = my.v
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x2) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y2) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y2 AS HUGEINT) * CAST(y2 AS HUGEINT))
                  AS DOUBLE) AS syy,
             CAST(SUM(CAST(x2 AS HUGEINT) * CAST(y2 AS HUGEINT))
                  AS DOUBLE) AS sxy
      FROM joined
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(
             (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
           6) AS rho_spearman
    FROM s
    """,
    survey_ids=("B23", "B29", "B10"),
    description="Spearman rank correlation (exact midranks, two-level scan, no global sort)",
)
def spearman_corr_qty_price(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Spearman rank correlation between l_quantity and
    l_extendedprice — the monotone-dependence measure Pearson's r
    misses (stats_corr_quantity_price covers the linear case).

    NO global rank window over the fact table, and (r11 rewrite, was
    alpha +1.06 / 27.7s at 100x; now +0.55 / 11.1s) NO full-fact
    shuffle either: the old plan shuffled every fact row to join the
    price rank map. The cross moment decomposes by price —
    sxy = SUM_price y2 * (SUM of x2 over that price's rows) — so the
    fact table is consumed by ONE map-side-combined groupBy(price)
    carrying (count, sum x2, sum x2^2) after a broadcast join of the
    50-row quantity rank map. l_extendedprice is cents-valued on a
    bounded range (~580k distinct values at every SF), so the combine
    actually reduces and the per-price table is corpus-size-INVARIANT.
    The price midrank attaches INLINE on that one stream (the
    _midrank2 two-level scan with the partial-sum columns preserved —
    a second consumer with different column pruning would defeat
    ReuseExchange and recompute the fact aggregate, measured 2.4x
    slower); the cross-bucket carry reduces straight from the fact to
    ~50 broadcast rows. Doubled midranks keep all five sufficient sums
    integer-exact; partials accumulate as DECIMAL(38,0) so the
    identical plan holds at ~1000x this corpus (sum x2*y2 <= 4n^3
    stays under 1e38 past 10^12 rows).
    """
    li = t(spark, sf, "lineitem").select("l_quantity", "l_extendedprice")
    # 50 distinct quantities: the cumulative window runs on 50 rows.
    rx = li.groupBy(F.col("l_quantity").alias("value")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    mx = _midrank2(rx, "value", width=5.0).withColumnRenamed("m2", "x2")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # The ONLY pass over the fact table: broadcast the quantity rank
    # map on, then reduce to the per-price sufficient partials with
    # map-side combine. x2 is exact on every row, so sum/sum-of-square
    # partials are exact integers in decimal(38,0).
    per_price = (
        li.join(F.broadcast(mx.select("value", "x2")),
                li.l_quantity == mx.value)
        .groupBy(F.col("l_extendedprice").alias("value"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec(F.col("x2"))).alias("sx2"),
            # Cast BEFORE squaring: x2 ~ 2N, so the bigint per-row
            # product x2*x2 would wrap int64 past ~1.5e9 rows; the
            # decimal(38,0) product holds to x2 < 1e19 (n < 5e18).
            F.sum(dec(F.col("x2")) * dec(F.col("x2"))).alias("sx2sq"),
        )
        .withColumn("bkt", F.floor(F.col("value") / F.lit(2000.0)).cast("long"))
    )
    # The price midrank is attached INLINE (the _midrank2 two-level
    # scan, but preserving the partial-sum columns) so per_price has a
    # single consumer — a second consumer with different column pruning
    # would defeat ReuseExchange and recompute the fact aggregate. The
    # cross-bucket carry comes straight from the fact (sum of n per
    # bucket == fact rows per bucket), a map-combined reduce to ~50
    # bucket rows, broadcast back.
    carry_src = li.groupBy(
        F.floor(F.col("l_extendedprice") / F.lit(2000.0))
        .cast("long")
        .alias("bkt")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("bn"))
    w_b = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carry = carry_src.select(
        "bkt", (F.sum("bn").over(w_b) - F.col("bn")).alias("cn")
    )
    w_in = Window.partitionBy("bkt").orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_n = F.col("cn") + F.sum("n").over(w_in)
    joined = per_price.join(F.broadcast(carry), "bkt").withColumn(
        "y2",
        (F.lit(2) * (cum_n - F.col("n")) + F.col("n") + F.lit(1)).cast("bigint"),
    )
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    s = joined.agg(
        F.sum(F.col("n")).cast("double").alias("n"),
        F.sum(F.col("sx2")).cast("double").alias("sx"),
        F.sum(d19(F.col("n")) * d19(F.col("y2"))).cast("double").alias("sy"),
        F.sum(F.col("sx2sq")).cast("double").alias("sxx"),
        F.sum(d19(F.col("n")) * d19(F.col("y2")) * d19(F.col("y2")))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("sx2") * d19(F.col("y2"))).cast("double").alias("sxy"),
    )
    n = F.col("n")
    rho = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        n.cast("bigint").alias("n_rows"),
        F.round(rho, 6).alias("rho_spearman"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust slope on a deterministic bounded sample
# ---------------------------------------------------------------------------
@register(
    "theil_sen_slope_sampled",
    # The sample is a deterministic hash gate (first sha256 byte < 8)
    # narrowed to the first 200 rows by (hash, key) total order, so
    # both engines see the IDENTICAL point set; pair slopes are plain
    # double ratios of identical inputs, and the median is the shared
    # linear-interpolation percentile (mad_outliers convention).
    oracle="""
    WITH pts AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS x,
             o_totalprice AS y
      FROM (
        SELECT *, sha256(CAST(o_orderkey AS VARCHAR)) AS hx FROM orders
        WHERE CAST(('0x' || substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 2)) AS INT) < 8
        ORDER BY hx, o_orderkey
        LIMIT 200
      )
    ),
    slopes AS (
      SELECT (b.y - a.y) / (b.x - a.x) AS slope
      FROM pts a JOIN pts b ON a.x < b.x OR (a.x = b.x AND a.y < b.y)
      WHERE a.x <> b.x
    ),
    med AS (
      SELECT COUNT(*) AS n_pairs, MEDIAN(slope) AS ts_slope FROM slopes
    ),
    mpt AS (
      SELECT COUNT(*) AS n_sample, MEDIAN(x) AS med_x, MEDIAN(y) AS med_y FROM pts
    )
    SELECT CAST(mpt.n_sample AS BIGINT) AS n_sample,
           CAST(med.n_pairs AS BIGINT) AS n_pairs,
           ROUND(med.ts_slope, 6) AS ts_slope,
           ROUND(mpt.med_y - med.ts_slope * mpt.med_x, 6) AS ts_intercept
    FROM med, mpt
    """,
    survey_ids=("B23", "B14", "B43"),
    description="Theil-Sen robust regression slope over a deterministic 200-point sample",
)
def theil_sen_slope_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen estimator: the median of pairwise slopes of
    (order date -> total price), with the Siegel-style intercept
    med(y) - slope*med(x). Robust to ~29% outliers where the existing
    ols_price_by_quantity is not.

    Theil-Sen is O(n^2) in points by definition, so the scale lever is
    the SAMPLE, not the pair join: a deterministic hash gate (~3%)
    followed by a (hash, key)-ordered LIMIT 200 — a map-side top-k
    heap, never a global sort — caps the pair set at 19,900 rows no
    matter the corpus size (the train_ivf_centroids bounded-sample
    pattern). The pair self-join broadcasts the 200-row side.
    """
    orders = t(spark, sf, "orders")
    hx = F.sha2(F.col("o_orderkey").cast("string"), 256)
    gate = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int") < 8
    pts = (
        orders.filter(gate)
        .select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .alias("x"),
            F.col("o_totalprice").alias("y"),
            hx.alias("hx"),
            "o_orderkey",
        )
        .orderBy("hx", "o_orderkey")
        .limit(200)
        .select("x", "y")
    )
    a, b = pts.alias("a"), F.broadcast(pts.alias("b"))
    pair_ok = (F.col("a.x") < F.col("b.x")) | (
        (F.col("a.x") == F.col("b.x")) & (F.col("a.y") < F.col("b.y"))
    )
    slopes = (
        a.join(b, pair_ok)
        .filter(F.col("a.x") != F.col("b.x"))
        .select(
            ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x")))
            .alias("slope")
        )
    )
    med = slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("ts_slope"),
    )
    mpt = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.expr("percentile(x, 0.5)").alias("med_x"),
        F.expr("percentile(y, 0.5)").alias("med_y"),
    )
    return med.join(F.broadcast(mpt)).select(
        "n_sample",
        "n_pairs",
        F.round("ts_slope", 6).alias("ts_slope"),
        F.round(F.col("med_y") - F.col("ts_slope") * F.col("med_x"), 6)
        .alias("ts_intercept"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival: time from first view to first purchase
# ---------------------------------------------------------------------------
@register(
    "kaplan_meier_survival",
    # Hash contract (r11/r12 red -> re-shaped r13, VERDICT r12 item 1):
    # durations are EXACT integer-microsecond epoch differences
    # integer-floor-divided to hours, so the event/censor/at-risk
    # table is integer-exact. Survival is a PURE-BIGINT per-step
    # quantization recurrence — s_0 = 10^6;
    # s_i = (s_{i-1} * (n_risk_i - n_event_i)) div n_risk_i —
    # no float anywhere in the hashed column, so no decimal-boundary
    # value (0.8, 0.5, ...) can flip under a 1-ulp accumulation
    # difference the way the r12 double-product provably did
    # (11/85 sf0.01 rows flipped floor(1e6*s) under fold reorder).
    # Step order is pinned on BOTH sides by spec-guaranteed
    # constructs: Spark array_sort over (dur_h,...) structs; DuckDB a
    # plain RECURSIVE CTE joined on row_number (r14, VERDICT r13 item
    # 1: the r13 oracle replayed the recurrence through
    # `list(... ORDER BY)` + list_prepend + list_reduce + list
    # slicing — green on the local DuckDB wheel at three scales and
    # three thread settings, red for the third consecutive round in
    # the driver's build, so the list higher-order-function surface
    # was the one remaining non-portable construct; the recursive CTE
    # uses only row_number, an equi-join and BIGINT `//`, semantics
    # that cannot vary across DuckDB builds). A d=n step multiplies
    # by 0 and absorbs the recurrence, so no guard CASE is needed;
    # headroom: acc<=1e6 and n_risk<2^62/1e6 keep every product
    # inside BIGINT. Equivalence to the r13 list-fold oracle was
    # verified row-for-row at sf0.001/0.01/0.1 under DuckDB
    # threads=default/1/32 before the swap.
    oracle="""
    WITH RECURSIVE fv AS (
      SELECT user_id, MIN(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS tp
      FROM events e JOIN fv ON e.user_id = fv.user_id AND e.ts >= fv.tv
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    ),
    gmax AS (SELECT MAX(ts) AS tmax FROM events),
    subj AS (
      SELECT fv.user_id,
             CAST((epoch_us(COALESCE(fp.tp, gmax.tmax)) - epoch_us(fv.tv))
                  // 3600000000 AS BIGINT) AS dur_h,
             CASE WHEN fp.tp IS NULL THEN 0 ELSE 1 END AS died
      FROM fv LEFT JOIN fp ON fv.user_id = fp.user_id, gmax
    ),
    km AS (
      SELECT dur_h,
             CAST(SUM(died) AS BIGINT) AS n_event,
             CAST(SUM(1 - died) AS BIGINT) AS n_censor
      FROM subj GROUP BY dur_h
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM subj),
    risk AS (
      SELECT dur_h, n_event, n_censor,
             CAST(n_total
             - (SUM(n_event + n_censor) OVER (ORDER BY dur_h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - (n_event + n_censor)) AS BIGINT) AS n_risk
      FROM km, tot
    ),
    ranked AS (
      SELECT risk.*, row_number() OVER (ORDER BY dur_h) AS rn FROM risk
    ),
    surv AS (
      SELECT rn, dur_h, n_risk, n_event, n_censor,
             (CAST(1000000 AS BIGINT) * (n_risk - n_event)) // n_risk
               AS survival_e6
      FROM ranked WHERE rn = 1
      UNION ALL
      SELECT r.rn, r.dur_h, r.n_risk, r.n_event, r.n_censor,
             (s.survival_e6 * (r.n_risk - r.n_event)) // r.n_risk
      FROM surv s JOIN ranked r ON r.rn = s.rn + 1
    )
    SELECT dur_h, n_risk, n_event, n_censor,
           CAST(survival_e6 AS BIGINT) AS survival_e6
    FROM surv
    """,
    survey_ids=("B23", "B31", "B12"),
    description="Kaplan-Meier survival curve: first view to first purchase, right-censored",
)
def kaplan_meier_survival(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier estimator of time-to-convert: for each user with a
    'view', the hours until their first subsequent 'purchase';
    users who never purchase are right-censored at the end of the
    observation window. Complements funnel_time_to_convert (which
    drops non-converters and so overstates conversion speed).
    survival_e6 is the Kaplan-Meier estimate held at 1e-6 resolution
    by a per-step BIGINT quantization recurrence
    (s_i = s_{i-1}*(n_risk-n_event) div n_risk, s_0 = 10^6): each
    step floors once, so the drift from the real-valued KM product is
    under (#steps)*1e-6 absolute — negligible for a curve estimate —
    and the hashed column never touches a float. Consumers divide by
    1e6 for the [0,1] curve.

    Scale shape: the stream reduces to ONE ROW PER USER (two grouped
    aggregates + an equi-join on user_id), then to one row per
    integer-hour duration — calendar-bounded (<= observation span in
    hours), so the ordered survival window runs on a provably tiny
    table, never on data-scale rows. The censor horizon is a 1-row
    broadcast.
    """
    ev = t(spark, sf, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    gmax = ev.agg(F.max("ts").alias("tmax"))
    subj = (
        fv.join(fp, "user_id", "left")
        .join(F.broadcast(gmax))
        .select(
            # Integer-microsecond difference, timezone-free on the
            # NTZ fixture columns (exact; the duration is non-negative
            # so `div` truncation == floor), mirroring the oracle's
            # epoch_us(...) // 3600000000.
            F.expr(
                "timestampdiff(MICROSECOND, tv, coalesce(tp, tmax))"
                " div 3600000000"
            )
            .cast("bigint")
            .alias("dur_h"),
            F.when(F.col("tp").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("died"),
        )
    )
    km = subj.groupBy("dur_h").agg(
        F.sum("died").cast("bigint").alias("n_event"),
        F.sum(F.lit(1) - F.col("died")).cast("bigint").alias("n_censor"),
    )
    tot = subj.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    # The remaining windows run over <=(observation span in hours)
    # rows — calendar-bounded, same exemption as seasonal baselines.
    w = Window.orderBy("dur_h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leave = F.col("n_event") + F.col("n_censor")
    risk = km.join(F.broadcast(tot)).select(
        "dur_h",
        "n_event",
        "n_censor",
        (F.col("n_total") - (F.sum(leave).over(w) - leave)).alias("n_risk"),
    )
    # Pure-BIGINT recurrence over the cumulative frame: collect the
    # (dur_h, n_event, n_risk) structs, array_sort pins ascending
    # dur_h (first struct field, distinct per row), then fold
    # s <- (s * (n_risk - n_event)) div n_risk from s = 10^6.
    # Integer-only: no value can sit within an ulp of a floor
    # boundary because there is no float to floor (the r11/r12
    # double-product red's mechanism, VERDICT r12 item 1).
    wf = risk.withColumn(
        "__km_steps",
        F.array_sort(
            F.collect_list(F.struct("dur_h", "n_event", "n_risk")).over(w)
        ),
    )
    surv = F.expr(
        "aggregate(__km_steps, CAST(1000000 AS BIGINT),"
        " (acc, e) -> (acc * (e.n_risk - e.n_event)) div e.n_risk)"
    )
    return wf.select(
        "dur_h",
        "n_risk",
        "n_event",
        "n_censor",
        surv.alias("survival_e6"),
    )


# ---------------------------------------------------------------------------
# Mutual information between document language and source
# ---------------------------------------------------------------------------
@register(
    "mutual_info_lang_source",
    # Hash contract (hardened r12, VERDICT r11 item 5): every ln is
    # the portable sqrt-reduction ln (bit-identical on any libm
    # build), the cross-cell sums replay as key-ORDERED folds, and
    # presentation is floor(1e6*x) — no libm, no engine ROUND, no
    # accumulation-order dependence anywhere in the hashed values.
    oracle=f"""
    WITH cell AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nxy
      FROM documents GROUP BY lang, source
    ),
    mx AS (SELECT lang, CAST(SUM(nxy) AS BIGINT) AS nx FROM cell GROUP BY lang),
    my AS (SELECT source, CAST(SUM(nxy) AS BIGINT) AS ny FROM cell GROUP BY source),
    tot AS (SELECT CAST(SUM(nxy) AS DOUBLE) AS n FROM cell),
    mi AS (
      SELECT {ordered_sum_sql(
          "(nxy / n) * " + portable_ln_sql(
              "(nxy * n) / (CAST(nx AS DOUBLE) * ny)", "duckdb"),
          "lang, source")} AS mi_nats
      FROM cell JOIN mx USING (lang) JOIN my USING (source), tot
    ),
    hx AS (SELECT -{ordered_sum_sql(
        "(nx / n) * " + portable_ln_sql("(nx / n)", "duckdb"),
        "lang")} AS h_lang FROM mx, tot),
    hy AS (SELECT -{ordered_sum_sql(
        "(ny / n) * " + portable_ln_sql("(ny / n)", "duckdb"),
        "source")} AS h_source FROM my, tot)
    SELECT {floor_e6_sql("mi.mi_nats")} AS mi_nats_e6,
           {floor_e6_sql("hx.h_lang")} AS h_lang_e6,
           {floor_e6_sql("hy.h_source")} AS h_source_e6,
           {floor_e6_sql("mi.mi_nats / LEAST(hx.h_lang, hy.h_source)")}
             AS norm_mi_e6
    FROM mi, hx, hy
    """,
    survey_ids=("B18", "B16", "B43"),
    description="Mutual information + marginal entropies of (lang, source), count-exact",
)
def mutual_info_lang_source(spark: SparkSession, sf: str) -> DataFrame:
    """How much does a document's source tell you about its language?
    MI in nats with both marginal entropies and the min-entropy
    normalized coefficient — the dependence audit run before
    stratifying a corpus on correlated facets (char_entropy_docs is
    per-document; this is the cross-column dependence).

    Scale shape: one grouped count to the |lang| x |source| cell table
    (map-side combine), margins re-aggregated FROM THE CELLS (never a
    second corpus pass), 1-row totals broadcast. Everything after the
    first shuffle operates on a few hundred rows.
    """
    docs = t(spark, sf, "documents")
    cell = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nxy")
    )
    cell = cell.persist()
    mx = cell.groupBy("lang").agg(F.sum("nxy").cast("bigint").alias("nx"))
    my = cell.groupBy("source").agg(F.sum("nxy").cast("bigint").alias("ny"))
    tot = cell.agg(F.sum("nxy").cast("double").alias("n"))
    mi_term = F.expr(
        "(nxy / n) * "
        + portable_ln_sql("(nxy * n) / (CAST(nx AS DOUBLE) * ny)", "spark")
    )
    mi = (
        cell.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .join(F.broadcast(tot))
        .agg(ordered_sum(mi_term, "lang", "source").alias("mi_nats"))
    )
    hx_term = F.expr(
        "(nx / n) * " + portable_ln_sql("(nx / n)", "spark")
    )
    hx = mx.join(F.broadcast(tot)).agg(
        (-ordered_sum(hx_term, "lang")).alias("h_lang")
    )
    hy_term = F.expr(
        "(ny / n) * " + portable_ln_sql("(ny / n)", "spark")
    )
    hy = my.join(F.broadcast(tot)).agg(
        (-ordered_sum(hy_term, "source")).alias("h_source")
    )
    return (
        mi.join(F.broadcast(hx))
        .join(F.broadcast(hy))
        .select(
            floor_e6(F.col("mi_nats")).alias("mi_nats_e6"),
            floor_e6(F.col("h_lang")).alias("h_lang_e6"),
            floor_e6(F.col("h_source")).alias("h_source_e6"),
            floor_e6(
                F.col("mi_nats") / F.least(F.col("h_lang"), F.col("h_source"))
            ).alias("norm_mi_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-user conversion rates
# ---------------------------------------------------------------------------
@register(
    "empirical_bayes_shrinkage",
    # The beta prior's method-of-moments fit uses exact integer counts
    # and exact decimal sums; every user's shrunk rate is then one
    # double expression over (x, n, alpha, beta) — identical inputs,
    # identical arithmetic, round-6 presentation.
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ),
    mom AS (
      -- method-of-moments beta fit over the raw per-user rates:
      -- mu = mean(rate), v = var(rate); k = mu(1-mu)/v - 1
      SELECT CAST(COUNT(*) AS DOUBLE) AS u,
             CAST(SUM(CAST(x AS DOUBLE) / n) AS DOUBLE) AS s1,
             CAST(SUM((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n))
                  AS DOUBLE) AS s2
      FROM per_user
    ),
    prior AS (
      SELECT (s1 / u) AS mu,
             ((s1 / u) * (1 - s1 / u) / ((s2 - s1 * s1 / u) / (u - 1)) - 1)
               AS k
      FROM mom
    )
    SELECT p.user_id, p.x, p.n,
           ROUND(CAST(p.x AS DOUBLE) / p.n, 6) AS raw_rate,
           ROUND(pr.mu * pr.k, 6) AS alpha,
           ROUND((1 - pr.mu) * pr.k, 6) AS beta,
           ROUND((p.x + pr.mu * pr.k) / (p.n + pr.k), 6) AS shrunk_rate
    FROM per_user p, prior pr
    ORDER BY p.user_id
    LIMIT 200
    """,
    survey_ids=("B16", "B23", "B43"),
    description="Empirical-Bayes (beta-binomial) shrinkage of per-user conversion rates",
)
def empirical_bayes_shrinkage(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user purchase rates shrunk toward an empirically-fit beta
    prior (method of moments): users with 3 events stop outranking
    users with 300 on raw rate — the estimator every leaderboard,
    seller-quality, and CTR system uses before sorting small-sample
    rates. grouped_zscore standardizes within groups; this REGULARIZES
    across them, the other half of robust rate estimation.

    Scale shape: one grouped count per user (map-side combine), ONE
    1-row moments aggregate over the per-user table fits the prior,
    broadcast back as two scalars — the shrinkage itself is a
    map-side expression. LIMIT 200 on user_id keeps the presented
    slice deterministic; the full-table write is the same plan minus
    the limit.
    """
    ev = t(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("bigint")
        .alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    rate = F.col("x").cast("double") / F.col("n")
    mom = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("u"),
        F.sum(rate).cast("double").alias("s1"),
        F.sum(rate * rate).cast("double").alias("s2"),
    )
    mu = F.col("s1") / F.col("u")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("u")) / (
        F.col("u") - F.lit(1)
    )
    prior = mom.select(
        mu.alias("mu"), (mu * (F.lit(1) - mu) / var - F.lit(1)).alias("k")
    )
    return (
        per_user.join(F.broadcast(prior))
        .select(
            "user_id",
            "x",
            "n",
            F.round(rate, 6).alias("raw_rate"),
            F.round(F.col("mu") * F.col("k"), 6).alias("alpha"),
            F.round((F.lit(1) - F.col("mu")) * F.col("k"), 6).alias("beta"),
            F.round(
                (F.col("x") + F.col("mu") * F.col("k")) / (F.col("n") + F.col("k")),
                6,
            ).alias("shrunk_rate"),
        )
        .orderBy("user_id")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test over the daily event-count series
# ---------------------------------------------------------------------------
@register(
    "mann_kendall_trend",
    # S and the tie term are exact integers; var_S is a ratio of exact
    # integers; z is one double expression. The pair comparison runs
    # over the CALENDAR-BOUNDED daily series (30 rows -> 435 pairs).
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    s AS (SELECT CAST(SUM(sgn) AS BIGINT) AS s_stat FROM pairs),
    ties AS (
      SELECT COALESCE(SUM(CAST(cnt AS DOUBLE) * (cnt - 1) * (2 * cnt + 5)), 0.0)
               AS tie_term
      FROM (SELECT y, COUNT(*) AS cnt FROM daily GROUP BY y HAVING COUNT(*) > 1)
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    v AS (
      SELECT n.n_days, s.s_stat,
             (CAST(n.n_days AS DOUBLE) * (n.n_days - 1) * (2 * n.n_days + 5)
              - ties.tie_term) / 18.0 AS var_s
      FROM n, s, ties
    )
    SELECT n_days, s_stat,
           ROUND(var_s, 6) AS var_s,
           ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z,
           CASE WHEN s_stat > 0 THEN 'increasing'
                WHEN s_stat < 0 THEN 'decreasing'
                ELSE 'no_trend' END AS direction
    FROM v
    """,
    survey_ids=("B23", "B14", "B33"),
    description="Mann-Kendall nonparametric trend test (tie-corrected) on the daily series",
)
def mann_kendall_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Is daily event volume trending, without assuming linearity or
    normality? Mann-Kendall counts concordant vs discordant day pairs
    (the trend-detection standard in monitoring/hydrology — robust
    where regr_trend's OLS slope is hostage to outliers), with the
    tie-corrected normal approximation and continuity correction.

    Scale shape: the stream reduces to the CALENDAR-BOUNDED daily
    series in one map-side-combined shuffle; the O(days^2) pair
    comparison is over 30 rows (435 pairs) — pairing is quadratic in
    CALENDAR DAYS, never in data volume, so the exponent is pure scan.
    """
    ev = t(spark, sf, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    daily = daily.persist()
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.y") > F.col("a.y"), F.lit(1))
        .when(F.col("b.y") < F.col("a.y"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    s = (
        a.join(F.broadcast(b), F.col("a.day") < F.col("b.day"))
        .agg(F.sum(sgn).cast("bigint").alias("s_stat"))
    )
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("cnt").cast("double")
                    * (F.col("cnt") - 1)
                    * (2 * F.col("cnt") + 5)
                ),
                F.lit(0.0),
            ).alias("tie_term")
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    v = (
        n.join(F.broadcast(s))
        .join(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            (
                (
                    F.col("n_days").cast("double")
                    * (F.col("n_days") - 1)
                    * (2 * F.col("n_days") + 5)
                    - F.col("tie_term")
                )
                / F.lit(18.0)
            ).alias("var_s"),
        )
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")),
        )
        .otherwise(F.lit(0.0))
    )
    return v.select(
        "n_days",
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.when(F.col("s_stat") > 0, F.lit("increasing"))
        .when(F.col("s_stat") < 0, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("direction"),
    )


# ---------------------------------------------------------------------------
# Propensity-stratified treatment effect (observational ATT)
# ---------------------------------------------------------------------------
@register(
    "propensity_stratified_att",
    # Strata boundaries come from the engines' shared interpolation
    # percentile over per-user activity; all rates are exact-integer
    # ratios; the weighted ATT combines them with integer weights.
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errors,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS purchases
      FROM events GROUP BY user_id
    ),
    med AS (SELECT MEDIAN(errors) AS err_med FROM u),
    cuts AS (
      SELECT quantile_cont(n_events, 0.25) AS q1,
             quantile_cont(n_events, 0.50) AS q2,
             quantile_cont(n_events, 0.75) AS q3
      FROM u
    ),
    marked AS (
      SELECT u.*,
             CAST(u.errors > med.err_med AS INT) AS treated,
             CASE WHEN u.n_events <= cuts.q1 THEN 0
                  WHEN u.n_events <= cuts.q2 THEN 1
                  WHEN u.n_events <= cuts.q3 THEN 2
                  ELSE 3 END AS stratum
      FROM u, med, cuts
    ),
    per AS (
      SELECT stratum,
             CAST(SUM(treated) AS BIGINT) AS n_treated,
             CAST(SUM(1 - treated) AS BIGINT) AS n_control,
             CAST(SUM(CASE WHEN treated = 1 THEN purchases END) AS BIGINT) AS p_t,
             CAST(SUM(CASE WHEN treated = 1 THEN n_events END) AS BIGINT) AS e_t,
             CAST(SUM(CASE WHEN treated = 0 THEN purchases END) AS BIGINT) AS p_c,
             CAST(SUM(CASE WHEN treated = 0 THEN n_events END) AS BIGINT) AS e_c
      FROM marked GROUP BY stratum
    ),
    rates AS (
      SELECT stratum, n_treated, n_control,
             CAST(p_t AS DOUBLE) / e_t AS rate_t,
             CAST(p_c AS DOUBLE) / e_c AS rate_c
      FROM per
      WHERE n_treated > 0 AND n_control > 0
    ),
    att AS (
      SELECT SUM((rate_t - rate_c) * n_treated) / SUM(n_treated) AS att
      FROM rates
    )
    SELECT CAST(stratum AS BIGINT) AS stratum, n_treated, n_control,
           ROUND(rate_t, 6) AS rate_t,
           ROUND(rate_c, 6) AS rate_c,
           ROUND(rate_t - rate_c, 6) AS stratum_effect,
           ROUND(att.att, 6) AS weighted_att
    FROM rates, att
    """,
    survey_ids=("B23", "B19", "B16"),
    description="Observational ATT: activity-stratified purchase-rate effect of high error exposure",
)
def propensity_stratified_att(spark: SparkSession, sf: str) -> DataFrame:
    """Observational causal estimate by stratification: does heavy
    error exposure (treatment = error count above the user median)
    move a user's purchase rate, comparing ONLY within activity
    quartiles so the obvious confounder — active users see more errors
    AND buy more — is held fixed? Emits per-stratum effects plus the
    treated-weighted ATT, the standard first-pass causal readout
    before anyone reaches for a model.

    Scale shape: one per-user reduce (map-side combine), two 1-row
    quantile aggregates broadcast back as literals (stratum assignment
    is a map-side CASE — no ntile window over data-scale users), one
    |strata|-row aggregate. Rates divide exact integers.
    """
    ev = t(spark, sf, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("bigint")
        .alias("errors"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("bigint")
        .alias("purchases"),
    )
    u = u.persist()
    med = u.agg(F.expr("percentile(errors, 0.5)").alias("err_med"))
    cuts = u.agg(
        F.expr("percentile(n_events, 0.25)").alias("q1"),
        F.expr("percentile(n_events, 0.5)").alias("q2"),
        F.expr("percentile(n_events, 0.75)").alias("q3"),
    )
    marked = (
        u.join(F.broadcast(med))
        .join(F.broadcast(cuts))
        .select(
            "*",
            (F.col("errors") > F.col("err_med")).cast("int").alias("treated"),
            F.when(F.col("n_events") <= F.col("q1"), F.lit(0))
            .when(F.col("n_events") <= F.col("q2"), F.lit(1))
            .when(F.col("n_events") <= F.col("q3"), F.lit(2))
            .otherwise(F.lit(3))
            .alias("stratum"),
        )
    )
    per = marked.groupBy("stratum").agg(
        F.sum("treated").cast("bigint").alias("n_treated"),
        F.sum(F.lit(1) - F.col("treated")).cast("bigint").alias("n_control"),
        F.sum(F.when(F.col("treated") == 1, F.col("purchases")))
        .cast("bigint")
        .alias("p_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("n_events")))
        .cast("bigint")
        .alias("e_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("purchases")))
        .cast("bigint")
        .alias("p_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("n_events")))
        .cast("bigint")
        .alias("e_c"),
    )
    rates = per.filter((F.col("n_treated") > 0) & (F.col("n_control") > 0)).select(
        "stratum",
        "n_treated",
        "n_control",
        (F.col("p_t").cast("double") / F.col("e_t")).alias("rate_t"),
        (F.col("p_c").cast("double") / F.col("e_c")).alias("rate_c"),
    )
    rates = rates.persist()
    att = rates.agg(
        (
            F.sum((F.col("rate_t") - F.col("rate_c")) * F.col("n_treated"))
            / F.sum("n_treated")
        ).alias("att")
    )
    return rates.join(F.broadcast(att)).select(
        F.col("stratum").cast("bigint").alias("stratum"),
        "n_treated",
        "n_control",
        F.round("rate_t", 6).alias("rate_t"),
        F.round("rate_c", 6).alias("rate_c"),
        F.round(F.col("rate_t") - F.col("rate_c"), 6).alias("stratum_effect"),
        F.round("att", 6).alias("weighted_att"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA: order totals across order priorities
# ---------------------------------------------------------------------------
@register(
    "anova_oneway_f",
    # N, S, Q are exact decimal/integer sums (order-independent). The
    # only cross-group double accumulation (sum of s_g^2/n_g over the 5
    # priority groups) runs as an ORDERED fold over the grp-sorted list
    # — the ewma replay technique — so both engines add in the same
    # sequence and the F statistic is bit-identical before round-6.
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(19,2))) AS s,
             SUM(CAST(o_totalprice AS DECIMAL(19,2))
                 * CAST(o_totalprice AS DECIMAL(19,2))) AS q
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS DOUBLE) AS ss,
             CAST(SUM(q) AS DOUBLE) AS qq,
             list_reduce(
               list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n ORDER BY grp),
               (acc, x) -> acc + x) AS sb
      FROM g
    )
    SELECT k AS k_groups, nn AS n_total,
           ROUND(sb - ss * ss / nn, 2) AS ss_between,
           ROUND((qq - ss * ss / nn) - (sb - ss * ss / nn), 2) AS ss_within,
           ROUND(((sb - ss * ss / nn) / (k - 1))
                 / (((qq - ss * ss / nn) - (sb - ss * ss / nn)) / (nn - k)), 6)
             AS f_stat,
           ROUND((sb - ss * ss / nn) / (qq - ss * ss / nn), 6) AS eta_sq
    FROM tot
    """,
    survey_ids=("B16", "B18", "B43"),
    description="One-way ANOVA F of order totals across priorities (exact moments, ordered fold)",
)
def anova_oneway_f(spark: SparkSession, sf: str) -> DataFrame:
    """Does mean order value differ across the five order priorities?
    One-way ANOVA from exact sufficient statistics: per-group (n, sum,
    sum-of-squares) in ONE map-side-combined shuffle, then the
    between/within decomposition over the 5-row group table.

    Scale shape: the fact scan reduces to k=5 rows; every data-scale
    sum is exact decimal. The only float accumulation (sum over groups
    of s^2/n) folds over the grp-SORTED 5-element list, so partial-agg
    order cannot move the hash. F and eta^2 are scalar double math.
    """
    o = t(spark, sf, "orders")
    dec = F.col("o_totalprice").cast("decimal(19,2)")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("q"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("double").alias("ss"),
        F.sum("q").cast("double").alias("qq"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("grp", "n", "s"))),
                lambda e: e["s"].cast("double") * e["s"].cast("double") / e["n"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sb"),
    )
    k, nn = F.col("k"), F.col("nn")
    ssb = F.col("sb") - F.col("ss") * F.col("ss") / nn
    sst = F.col("qq") - F.col("ss") * F.col("ss") / nn
    ssw = sst - ssb
    return tot.select(
        k.alias("k_groups"),
        nn.alias("n_total"),
        F.round(ssb, 2).alias("ss_between"),
        F.round(ssw, 2).alias("ss_within"),
        F.round((ssb / (k - F.lit(1))) / (ssw / (nn - k)), 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-nation proportion tests
# ---------------------------------------------------------------------------
_BH_PHI_TAIL_DOC = """Normal upper-tail via the Abramowitz-Stegun
26.2.17 polynomial, written in IDENTICAL Horner form in both engines;
exp is the portable sqrt-scaled Taylor (bit-identical on any build);
p-values are floor-quantized to integer 1e-9 grains BEFORE the BH
rank/threshold, which then runs in exact integer arithmetic."""

_BH_T = "(1.0 / (1.0 + 0.2316419 * az))"
_BH_HORNER = (
    f"({_BH_T} * (0.319381530 + {_BH_T} * (-0.356563782 + {_BH_T}"
    f" * (1.781477937 + {_BH_T} * (-1.821255978 + {_BH_T}"
    " * 1.330274429)))))"
)


def _bh_p_e9(dialect: str) -> str:
    tail = portable_exp_sql("-((az * az) / 2.0)", dialect)
    return (
        "CAST(floor(1000000000.0 * (2.0 * ("
        + tail
        + " * 0.3989422804014327) * "
        + _BH_HORNER
        + ")) AS BIGINT)"
    )


@register(
    "fdr_bh_segment_tests",
    # Hash contract (hardened r12, item 5): z is assembled from exact
    # integer counts (sqrt/div correctly rounded); the A&S tail uses
    # the portable exp, so p-values are bit-identical cross-engine and
    # cross-build; p_value_e9 = floor(1e9*p) is an exact integer, and
    # the BH step-up (largest rank i with p <= i*q/m, q=0.10) runs as
    # the exact integer comparison p_e9 * 10m <= rank * 1e9.
    oracle=f"""
    WITH per AS (
      SELECT n.n_name,
             CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x1
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n1) AS BIGINT) AS nn,
             CAST(SUM(x1) AS BIGINT) AS xx,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM per
    ),
    z AS (
      SELECT p.n_name, p.n1, p.x1, t.m,
             (CAST(p.x1 AS DOUBLE) / p.n1
              - CAST(t.xx - p.x1 AS DOUBLE) / (t.nn - p.n1))
             / sqrt((CAST(t.xx AS DOUBLE) / t.nn)
                    * (1.0 - CAST(t.xx AS DOUBLE) / t.nn)
                    * (1.0 / p.n1 + 1.0 / (t.nn - p.n1))) AS zv
      FROM per p, tot t
    ),
    pv AS (
      SELECT n_name, n1, x1, m, zv, {_bh_p_e9("duckdb")} AS p_value_e9
      FROM (SELECT *, abs(zv) AS az FROM z)
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_value_e9, n_name)
                     AS BIGINT) AS p_rank
      FROM pv
    ),
    kstar AS (
      SELECT COALESCE(MAX(p_rank), 0) AS ks
      FROM ranked WHERE p_value_e9 * (10 * m) <= p_rank * 1000000000
    )
    SELECT r.n_name, r.n1, r.x1,
           {floor_e6_sql("r.zv")} AS z_stat_e6,
           r.p_value_e9,
           r.p_rank,
           CAST(CASE WHEN r.p_rank <= k.ks THEN 1 ELSE 0 END AS INTEGER)
             AS bh_reject
    FROM ranked r, kstar k
    """,
    survey_ids=("B16", "B10", "B43"),
    description="BH false-discovery control over 25 per-nation proportion z-tests (q=0.10)",
)
def fdr_bh_segment_tests(spark: SparkSession, sf: str) -> DataFrame:
    """Multiple-testing control, the missing piece of the A/B family:
    each nation's 'F'-status order rate is z-tested against the rest of
    the world, then Benjamini-Hochberg step-up at q=0.10 decides which
    nations are genuine outliers — 25 simultaneous tests without 25x
    the false positives.

    Scale shape: one fact-dim join (customer broadcast at fixture SF,
    shuffle-hash beyond) reduces to a 25-row nation table; everything
    after — z, the A&S tail, the BH rank/threshold — runs on 25 rows.
    The 1-row totals row and k* attach via broadcast. p-values are
    floor-quantized to integer 1e-9 grains (portable exp, so the
    grains are bit-identical cross-engine) before ranking, and the BH
    threshold is an exact integer comparison.
    """
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    per = (
        o.join(c.select("c_custkey", "c_nationkey"),
               o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n1"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("x1"),
        )
    )
    per = per.persist()
    tot = per.agg(
        F.sum("n1").cast("bigint").alias("nn"),
        F.sum("x1").cast("bigint").alias("xx"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    z = per.join(F.broadcast(tot))
    pool = F.col("xx").cast("double") / F.col("nn")
    zv = (
        F.col("x1").cast("double") / F.col("n1")
        - (F.col("xx") - F.col("x1")).cast("double")
        / (F.col("nn") - F.col("n1"))
    ) / F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / (F.col("nn") - F.col("n1")))
    )
    z = z.select("n_name", "n1", "x1", "m", zv.alias("zv")).withColumn(
        "az", F.abs(F.col("zv"))
    )
    pv = z.select(
        "n_name",
        "n1",
        "x1",
        "m",
        "zv",
        F.expr(_bh_p_e9("spark")).alias("p_value_e9"),
    )
    w = Window.orderBy("p_value_e9", "n_name")
    ranked = pv.withColumn(
        "p_rank", F.row_number().over(w).cast("bigint")
    ).persist()
    kstar = ranked.filter(
        F.col("p_value_e9") * (F.lit(10) * F.col("m"))
        <= F.col("p_rank") * F.lit(1000000000)
    ).agg(F.coalesce(F.max("p_rank"), F.lit(0)).alias("ks"))
    return ranked.join(F.broadcast(kstar)).select(
        "n_name",
        "n1",
        "x1",
        floor_e6(F.col("zv")).alias("z_stat_e6"),
        "p_value_e9",
        "p_rank",
        F.when(F.col("p_rank") <= F.col("ks"), 1)
        .otherwise(0)
        .cast("int")
        .alias("bh_reject"),
    )


# ---------------------------------------------------------------------------
# Cramer's V association matrix over categorical column pairs
# ---------------------------------------------------------------------------
def _cramer_sql(pair: str, table: str, a: str, b: str) -> str:
    """One Cramer's-V block, EXACT-integer hash contract (r11 driver
    red -> hardened r12, VERDICT r11 item 2): the chi-square statistic
    is assembled entirely in 128-bit integer arithmetic — per cell,
    d = o*n - rm*cm (all exact counts), term = d*d*1e6 // (n*rm*cm)
    (integer floor division) — and SUMMED as integers, so the result
    is order-independent and identical on every engine/libm/DuckDB
    build (the old contract ROUND'd a double fold, which was a
    round-boundary away from mismatch on a different ROUND
    implementation). chi2_e6 is therefore a DEFINED exact integer
    (sum of per-cell floors; within cells/1e6 of the real chi2).
    cramers_v_e6 = floor(1e6 * sqrt(chi2_e6/1e6 / (n*(min(r,c)-1))))
    — int->double conversion, /, sqrt, * are all IEEE
    correctly-rounded, so the double is bit-identical cross-engine
    and its floor is deterministic. Exact-range bound: the BINDING
    limit is Spark's decimal(38,0) cap on d*d*1e6 — |d| <= 3.1e15,
    i.e. n < 5.6e7 rows per analyzed table (DuckDB's HUGEINT reaches
    ~1.3e16 and then ERRORS, whereas Spark past its cap NULLs the
    term and SUM silently drops it, so outside the bound the engines
    fail differently — stay inside it); larger corpora should
    pre-aggregate or sample a stratum first (the contingency grid
    itself is already count-sufficient)."""
    return f"""
    SELECT '{pair}' AS pair, n, r_levels, c_levels, chi2_e6,
           CAST(floor(1000000.0 * sqrt(
             CAST(chi2_e6 AS DOUBLE) / 1000000.0
             / CAST(n * (CASE WHEN r_levels < c_levels
                              THEN r_levels ELSE c_levels END - 1)
                    AS DOUBLE))) AS BIGINT) AS cramers_v_e6
    FROM (
      SELECT MAX(n) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS r_levels,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS c_levels,
             CAST(SUM(
               (CAST(o AS HUGEINT) * n - CAST(rm AS HUGEINT) * cm)
               * (CAST(o AS HUGEINT) * n - CAST(rm AS HUGEINT) * cm)
               * 1000000
               // (CAST(n AS HUGEINT) * rm * cm)
             ) AS BIGINT) AS chi2_e6
      FROM (
        SELECT c.a, c.b, c.o,
               CAST(SUM(c.o) OVER (PARTITION BY c.a) AS BIGINT) AS rm,
               CAST(SUM(c.o) OVER (PARTITION BY c.b) AS BIGINT) AS cm,
               CAST(SUM(c.o) OVER () AS BIGINT) AS n
        FROM (
          SELECT {a} AS a, {b} AS b, CAST(COUNT(*) AS BIGINT) AS o
          FROM {table} GROUP BY 1, 2
        ) c
      )
    )
    """


@register(
    "cramers_v_pairs",
    oracle=" UNION ALL ".join(
        [
            _cramer_sql(
                "orders:priority~status", "orders",
                "o_orderpriority", "o_orderstatus",
            ),
            _cramer_sql(
                "events:type~isodow", "events",
                "event_type", "CAST(isodow(ts) AS VARCHAR)",
            ),
            _cramer_sql(
                "customer:segment~natmod5", "customer",
                "c_mktsegment", "CAST(c_nationkey % 5 AS VARCHAR)",
            ),
        ]
    ),
    survey_ids=("B16", "B19", "B43"),
    description="Cramer's V association strength for three categorical column pairs",
)
def cramers_v_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Categorical-association profiling: chi-square independence and
    Cramer's V for three column pairs across three tables — the
    dataset-datasheet companion that tells a feature engineer which
    categorical columns are redundant (V near 1) vs independent (V
    near 0).

    Scale shape: each pair reduces its table to a BOUNDED contingency
    grid (|a| x |b| cells) in one map-side-combined shuffle; margins
    are windows over that tiny cell table, and the chi-square sum is
    an order-independent EXACT integer sum of per-cell floor-divided
    terms (decimal(38,0) arithmetic — see _cramer_sql for the hash
    contract and the n < 1e8 exact-range bound). chi2_e6 and
    cramers_v_e6 are the statistics scaled by 1e6; consumers divide
    by 1e6.
    """

    def one(pair: str, df: DataFrame, a, b) -> DataFrame:
        cells = df.select(a.alias("a"), b.alias("b")).groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("bigint").alias("o")
        )
        wa = Window.partitionBy("a")
        wb = Window.partitionBy("b")
        wn = Window.partitionBy()
        g = cells.select(
            "a",
            "b",
            "o",
            F.sum("o").over(wa).alias("rm"),
            F.sum("o").over(wb).alias("cm"),
            F.sum("o").over(wn).alias("n"),
        )
        # d = o*n - rm*cm and term = d*d*1e6 // (n*rm*cm), all in
        # decimal(38,0) integer arithmetic (cast each bigint operand
        # BEFORE multiplying — the product wraps int64 otherwise).
        dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
        d = (dec("o") * dec("n") - dec("rm") * dec("cm")).cast("decimal(19,0)")
        num6 = d * d * F.lit(1000000).cast("decimal(7,0)")
        den = (dec("n") * dec("rm")).cast("decimal(19,0)") * dec("cm")
        terms = g.select(
            "a",
            "b",
            "n",
            num6.alias("num6"),
            den.alias("den"),
        ).withColumn("term_e6", F.expr("num6 div den"))
        agg = terms.agg(
            F.max("n").cast("bigint").alias("n"),
            F.count_distinct(F.col("a")).cast("bigint").alias("r_levels"),
            F.count_distinct(F.col("b")).cast("bigint").alias("c_levels"),
            F.sum("term_e6").cast("bigint").alias("chi2_e6"),
        )
        mindim = F.when(
            F.col("r_levels") < F.col("c_levels"), F.col("r_levels")
        ).otherwise(F.col("c_levels"))
        v = F.sqrt(
            F.col("chi2_e6").cast("double")
            / F.lit(1000000.0)
            / (F.col("n") * (mindim - F.lit(1))).cast("double")
        )
        return agg.select(
            F.lit(pair).alias("pair"),
            "n",
            "r_levels",
            "c_levels",
            "chi2_e6",
            F.floor(F.lit(1000000.0) * v).cast("bigint").alias("cramers_v_e6"),
        )

    o = t(spark, sf, "orders")
    ev = t(spark, sf, "events")
    c = t(spark, sf, "customer")
    return (
        one(
            "orders:priority~status",
            o,
            F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
        .unionAll(
            one(
                "events:type~isodow",
                ev,
                F.col("event_type"),
                (F.expr("weekday(ts)") + F.lit(1)).cast("string"),
            )
        )
        .unionAll(
            one(
                "customer:segment~natmod5",
                c,
                F.col("c_mktsegment"),
                (F.col("c_nationkey") % 5).cast("string"),
            )
        )
    )


# ---------------------------------------------------------------------------
# Median (LAD) regression slope by exact grid search
# ---------------------------------------------------------------------------
@register(
    "quantile_regression_grid",
    # Candidate slopes are exact decimals (k * 25.00), so residuals
    # y - b*x and their absolute sums are EXACT decimal arithmetic end
    # to end — the loss curve has zero float content; the argmin is an
    # exact comparison with a smallest-slope tie-break.
    oracle="""
    WITH grid AS (
      SELECT CAST(k * 25 AS DECIMAL(8,2)) AS slope
      FROM range(1, 81) r(k)
    ),
    losses AS (
      SELECT g.slope,
             SUM(ABS(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     - g.slope * CAST(l.l_quantity AS DECIMAL(18,2))))
               AS loss
      FROM lineitem l JOIN grid g ON TRUE
      GROUP BY 1
    ),
    best AS (SELECT MIN(loss) AS mloss FROM losses)
    SELECT CAST(l.slope AS DOUBLE) AS slope,
           CAST(l.loss AS DOUBLE) AS lad_loss,
           CAST(CASE WHEN l.loss = b.mloss
                     AND l.slope = (SELECT MIN(slope) FROM losses l2, best b2
                                    WHERE l2.loss = b2.mloss)
                THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM losses l, best b
    """,
    survey_ids=("B18", "B16", "B43"),
    description="LAD (median-regression) slope via exact decimal grid search, full loss curve",
)
def quantile_regression_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Robust through-origin price-per-unit estimation: the slope
    minimizing SUM |extendedprice - b * quantity| (least absolute
    deviations = tau=0.5 quantile regression) over an 80-point exact
    decimal grid — the outlier-immune sibling of ols_price_by_quantity,
    returning the full loss curve with the argmin flagged.

    Scale shape (r11 rewrite, was 147s at the 100x decade): the loss is
    separable over DISTINCT (x, y) pairs — SUM |y - b*x| = SUM over
    pairs of cnt * |y - b*x| — and the (quantity, price) domain is
    value-bounded (~580k pairs at every SF: 50 quantities x the cents-
    granular price range), so the fact table reduces FIRST to a
    corpus-size-invariant (x, y, cnt) histogram via one map-side-
    combined shuffle, and the 80-element grid explode + decimal
    residual math runs over the bounded histogram, not over every row
    (honest 100x: 146.8s -> ~2s, alpha +0.75 -> ~0). The argmin is a
    1-row aggregate broadcast back.

    The residual hot loop (80 x pairs rows) runs in INTEGER CENTS —
    y, x, and the grid slopes are all cents-exact, so
    |y - b*x| dollars = |yc - bc*xc| cents / 100 with every operand a
    BIGINT that whole-stage codegen compiles to primitive ops instead
    of Decimal128 calls (2.6x on the fixed cost). Only the per-term
    product crosses back into decimal — cnt and |res| are each cast
    to DECIMAL(19,0) BEFORE the multiply (ADVICE r12 fix), so the
    product is exact DECIMAL(38,0) with true headroom to
    cnt*|res| < 1e38; the int64 bound applies only to the residual
    itself, which is domain-bounded (|yc - k*2500*xc| <= ~2e8 cents),
    never to the product. The division by 100 is exact decimal, so
    the double output is bit-identical to the oracle's decimal loss.
    """
    li = t(spark, sf, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("yc"),
        F.col("l_quantity").cast("bigint").alias("xc"),
    )
    pairs = li.groupBy("xc", "yc").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    losses = (
        pairs.select(
            "xc", "yc", "cnt",
            F.explode(F.sequence(F.lit(1), F.lit(80))).alias("k"),
        )
        .groupBy("k")
        .agg(
            # Cast cnt and the residual to decimal BEFORE multiplying:
            # the bigint per-term product cnt*|resid| wraps int64 past
            # ~4.6e11 rows per (xc,yc) pair; the decimal(38,0) product
            # is exact to 1e38. (The residual itself is domain-bounded
            # — yc, k*2500*xc <= ~1e7 — so int64 is safe inside abs.)
            F.sum(
                F.col("cnt").cast("decimal(19,0)")
                * F.abs(
                    F.col("yc") - F.col("k") * F.lit(2500) * F.col("xc")
                ).cast("decimal(19,0)")
            ).alias("loss_c")
        )
        .select(
            (F.col("k") * 25).cast("decimal(8,2)").alias("slope"),
            (F.col("loss_c") / F.lit(100)).alias("loss"),
        )
    )
    losses = losses.persist()
    best = losses.agg(F.min("loss").alias("mloss"))
    bslope = (
        losses.join(F.broadcast(best), losses["loss"] == best["mloss"])
        .agg(F.min("slope").alias("bslope"))
    )
    return (
        losses.join(F.broadcast(bslope))
        .select(
            F.col("slope").cast("double").alias("slope"),
            F.col("loss").cast("double").alias("lad_loss"),
            F.when(F.col("slope") == F.col("bslope"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_best"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe (out-of-fold) target encoding
# ---------------------------------------------------------------------------
@register(
    "target_encoding_kfold",
    # All counts/sums are exact integers; the global prior mean and the
    # out-of-fold encodings are double expressions over them in fixed
    # operand order. The corpus total rides the 25-row cell table as a
    # window sum — no 1-row cross join anywhere.
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS cat,
             CAST(CAST(('0x' || substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 2))
                       AS INT) % 5 AS BIGINT) AS fold,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT cat, fold, n, s,
             SUM(n) OVER (PARTITION BY cat) AS cn,
             SUM(s) OVER (PARTITION BY cat) AS cs,
             SUM(n) OVER () AS tn,
             SUM(s) OVER () AS ts
      FROM cells
    )
    SELECT cat, fold, n AS n_rows,
           ROUND((CAST(cs - s AS DOUBLE)
                  + 10.0 * (CAST(ts AS DOUBLE) / tn))
                 / (CAST(cn - n AS DOUBLE) + 10.0), 6) AS oof_encoding
    FROM m
    ORDER BY cat, fold
    """,
    survey_ids=("B16", "B19", "B29"),
    description="Out-of-fold smoothed target encoding of order priority (leakage-safe)",
)
def target_encoding_kfold(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe target encoding: replace a categorical feature by
    the target rate computed WITHOUT the row's own fold — the standard
    trick that lets tree/linear models consume high-cardinality
    categoricals without peeking at their own labels. Smoothed toward
    the global rate with a pseudo-count prior (alpha=10).

    Scale shape: ONE map-side-combined shuffle reduces the fact table
    to |cat| x |folds| cells; category margins and the global prior are
    window sums over that bounded cell table (equi/window only — no
    1-row broadcast). Every input to the encoding is an exact integer.
    """
    from ag_data_ingestion_github_to_snowflake_spark.plans.sampling_queries import (
        hash_bucket,
    )

    o = t(spark, sf, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("cat"),
        (hash_bucket(F.col("o_orderkey")) % 5).cast("bigint").alias("fold"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("s"),
    )
    wc = Window.partitionBy("cat")
    wa = Window.partitionBy()
    m = cells.select(
        "cat",
        "fold",
        "n",
        "s",
        F.sum("n").over(wc).alias("cn"),
        F.sum("s").over(wc).alias("cs"),
        F.sum("n").over(wa).alias("tn"),
        F.sum("s").over(wa).alias("ts"),
    )
    return m.select(
        "cat",
        "fold",
        F.col("n").alias("n_rows"),
        F.round(
            (
                (F.col("cs") - F.col("s")).cast("double")
                + F.lit(10.0) * (F.col("ts").cast("double") / F.col("tn"))
            )
            / ((F.col("cn") - F.col("n")).cast("double") + F.lit(10.0)),
            6,
        ).alias("oof_encoding"),
    ).orderBy("cat", "fold")


# ---------------------------------------------------------------------------
# Population stability index between two periods
# ---------------------------------------------------------------------------
_PSI_PA = "((CAST(na AS DOUBLE) + 1.0) / (CAST(ta AS DOUBLE) + k))"
_PSI_PE = "((CAST(ne AS DOUBLE) + 1.0) / (CAST(te AS DOUBLE) + k))"


def _psi_term(dialect: str) -> str:
    return (
        f"({_PSI_PA} - {_PSI_PE}) * "
        + portable_ln_sql(f"({_PSI_PA} / {_PSI_PE})", dialect)
    )


@register(
    "psi_population_stability",
    # Hash contract (hardened r12, item 5): bucket counts are exact
    # integers; the Laplace-smoothed per-bucket term uses the portable
    # sqrt-reduction ln (bit-identical on any build), the cross-bucket
    # sum is a bucket-ORDERED fold, and presentation is floor(1e6*x).
    oracle=f"""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
             CAST(SUM(CASE WHEN o_orderdate <  TIMESTAMP '1996-07-01'
                      THEN 1 ELSE 0 END) AS BIGINT) AS ne,
             CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-07-01'
                      THEN 1 ELSE 0 END) AS BIGINT) AS na
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT bucket, ne, na,
             SUM(ne) OVER () AS te, SUM(na) OVER () AS ta,
             COUNT(*) OVER () AS k
      FROM b
    ),
    tot AS (
      SELECT CAST(MAX(te) AS BIGINT) AS te, CAST(MAX(ta) AS BIGINT) AS ta,
             CAST(MAX(k) AS BIGINT) AS k,
             {ordered_sum_sql(_psi_term("duckdb"), "bucket")} AS psi
      FROM m
    )
    SELECT te AS n_expected, ta AS n_actual, k AS k_buckets,
           {floor_e6_sql("psi")} AS psi_e6
    FROM tot
    """,
    survey_ids=("B16", "B19", "B43"),
    description="PSI of the order-value distribution across two halves of the order history",
)
def psi_population_stability(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index — the model-monitoring drift metric:
    sum over buckets of (p_actual - p_expected) * ln(p_actual /
    p_expected), comparing order-value mix before vs after mid-1996.
    Complements drift_chi2_events (chi-square answers 'did it move?';
    PSI is the banking-standard magnitude with the 0.1/0.25 rulebook).

    Scale shape: one conditional aggregation to 10 fixed buckets
    (map-side combine), Laplace-smoothed rates, and the cross-bucket
    sum as a bucket-sorted ordered fold — no data-scale state past the
    first reduce.
    """
    o = t(spark, sf, "orders")
    cut = F.lit("1996-07-01").cast("timestamp")
    b = o.groupBy(
        F.least(F.floor(F.col("o_totalprice") / 50000).cast("bigint"), F.lit(9)).alias(
            "bucket"
        )
    ).agg(
        F.sum(F.when(F.col("o_orderdate") < cut, 1).otherwise(0))
        .cast("bigint")
        .alias("ne"),
        F.sum(F.when(F.col("o_orderdate") >= cut, 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
    )
    wa = Window.partitionBy()
    b2 = b.select(
        "bucket",
        "ne",
        "na",
        F.sum("ne").over(wa).alias("te"),
        F.sum("na").over(wa).alias("ta"),
        F.count(F.lit(1)).over(wa).alias("k"),
    )
    tot = b2.withColumn("term", F.expr(_psi_term("spark"))).agg(
        F.max("te").cast("bigint").alias("n_expected"),
        F.max("ta").cast("bigint").alias("n_actual"),
        F.max("k").cast("bigint").alias("k_buckets"),
        ordered_sum(F.col("term"), "bucket").alias("psi_raw"),
    )
    return tot.select(
        "n_expected",
        "n_actual",
        "k_buckets",
        floor_e6(F.col("psi_raw")).alias("psi_e6"),
    )


# ---------------------------------------------------------------------------
# Best single-split decision stump by Gini impurity
# ---------------------------------------------------------------------------
@register(
    "decision_stump_split",
    # The value histogram is exact integers; cumulative counts come
    # from a window over the ~50-row distinct-value table; weighted
    # Gini is a double expression over exact integers in fixed operand
    # order, rounded to 9 before the argmin rank (threshold asc breaks
    # ties).
    oracle="""
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT q, n, pos,
             SUM(n) OVER (ORDER BY q) AS cn,
             SUM(pos) OVER (ORDER BY q) AS cp,
             SUM(n) OVER () AS tn,
             SUM(pos) OVER () AS tp
      FROM h
    ),
    s AS (
      SELECT q AS threshold, cn AS n_left, tn - cn AS n_right,
             cp AS pos_left, tp - cp AS pos_right,
             ROUND(
               (CAST(cn AS DOUBLE) / tn)
               * (2.0 * (CAST(cp AS DOUBLE) / cn)
                      * (1.0 - CAST(cp AS DOUBLE) / cn))
               + (CAST(tn - cn AS DOUBLE) / tn)
                 * (2.0 * (CAST(tp - cp AS DOUBLE) / (tn - cn))
                        * (1.0 - CAST(tp - cp AS DOUBLE) / (tn - cn))),
             9) AS weighted_gini
      FROM c WHERE cn < tn
    )
    SELECT CAST(threshold AS BIGINT) AS threshold,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(pos_left AS BIGINT) AS pos_left,
           CAST(pos_right AS BIGINT) AS pos_right,
           weighted_gini
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY weighted_gini, threshold) AS rn
      FROM s
    ) WHERE rn = 1
    """,
    survey_ids=("B16", "B29", "B43"),
    description="Best decision-stump split of quantity predicting returns (Gini argmin)",
)
def decision_stump_split(spark: SparkSession, sf: str) -> DataFrame:
    """One-feature decision-tree induction in pure SQL: the quantity
    threshold that best separates returned line items, by weighted
    Gini impurity over every candidate split — the inner loop of
    CART/GBDT expressed as histogram + prefix-sum + argmin.

    Scale shape: the fact table reduces to the ~50-row distinct-value
    histogram in one map-side-combined shuffle; cumulative class
    counts are a window over that bounded table; every candidate's
    impurity is a double expression over exact integers, rounded to 9
    before the deterministic argmin. This is exactly how distributed
    GBDT frameworks (XGBoost/LightGBM histogram mode) evaluate splits.
    """
    li = t(spark, sf, "lineitem")
    h = li.groupBy(F.col("l_quantity").cast("bigint").alias("q")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
    )
    wq = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wa = Window.partitionBy()
    c = h.select(
        "q",
        F.sum("n").over(wq).alias("cn"),
        F.sum("pos").over(wq).alias("cp"),
        F.sum("n").over(wa).alias("tn"),
        F.sum("pos").over(wa).alias("tp"),
    )
    pl = F.col("cp").cast("double") / F.col("cn")
    pr = (F.col("tp") - F.col("cp")).cast("double") / (F.col("tn") - F.col("cn"))
    s = c.filter(F.col("cn") < F.col("tn")).select(
        F.col("q").alias("threshold"),
        F.col("cn").alias("n_left"),
        (F.col("tn") - F.col("cn")).alias("n_right"),
        F.col("cp").alias("pos_left"),
        (F.col("tp") - F.col("cp")).alias("pos_right"),
        F.round(
            (F.col("cn").cast("double") / F.col("tn"))
            * (F.lit(2.0) * pl * (F.lit(1.0) - pl))
            + ((F.col("tn") - F.col("cn")).cast("double") / F.col("tn"))
            * (F.lit(2.0) * pr * (F.lit(1.0) - pr)),
            9,
        ).alias("weighted_gini"),
    )
    wr = Window.orderBy("weighted_gini", "threshold")
    return (
        s.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("threshold").cast("bigint").alias("threshold"),
            F.col("n_left").cast("bigint").alias("n_left"),
            F.col("n_right").cast("bigint").alias("n_right"),
            F.col("pos_left").cast("bigint").alias("pos_left"),
            F.col("pos_right").cast("bigint").alias("pos_right"),
            "weighted_gini",
        )
    )


# ---------------------------------------------------------------------------
# Difference-in-differences: promo parts before/after 1997
# ---------------------------------------------------------------------------
@register(
    "diff_in_diff_promo",
    # Four cell means from exact decimal sums and integer counts in one
    # conditional aggregation; the DiD estimate is scalar double math
    # over those exact inputs.
    oracle="""
    WITH j AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
             CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                  THEN 1 ELSE 0 END AS post,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
        CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
        CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
        CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
        CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN y END) AS DOUBLE) AS s_t0,
        CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN y END) AS DOUBLE) AS s_t1,
        CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN y END) AS DOUBLE) AS s_c0,
        CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN y END) AS DOUBLE) AS s_c1
      FROM j
    )
    SELECT n_t0, n_t1, n_c0, n_c1,
           ROUND(s_t0 / n_t0, 6) AS mean_treated_pre,
           ROUND(s_t1 / n_t1, 6) AS mean_treated_post,
           ROUND(s_c0 / n_c0, 6) AS mean_control_pre,
           ROUND(s_c1 / n_c1, 6) AS mean_control_post,
           ROUND((s_t1 / n_t1 - s_t0 / n_t0) - (s_c1 / n_c1 - s_c0 / n_c0), 6)
             AS did_estimate
    FROM s
    """,
    survey_ids=("B10", "B19", "B18"),
    description="Difference-in-differences of promo vs non-promo line-item value across 1997",
)
def diff_in_diff_promo(spark: SparkSession, sf: str) -> DataFrame:
    """The 2x2 difference-in-differences design: did PROMO-type parts'
    line-item value move differently across the 1997 boundary than
    everything else's? The causal-inference companion to
    propensity_stratified_att (panel-over-time vs cross-sectional).

    Scale shape: one fact-dim equi-join (part side broadcast/shuffled
    by AQE), then ONE conditional aggregation to eight exact sufficient
    statistics — the whole 2x2 panel collapses map-side; the estimate
    is scalar arithmetic on the 1-row result.
    """
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select(
        "p_partkey",
        F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("treated"),
    )
    j = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        "treated",
        F.when(
            F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("post"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
    )

    def cnt(tr, po):
        return (
            F.sum(
                F.when((F.col("treated") == tr) & (F.col("post") == po), 1)
                .otherwise(0)
            )
            .cast("bigint")
        )

    def tot(tr, po):
        return (
            F.sum(
                F.when((F.col("treated") == tr) & (F.col("post") == po), F.col("y"))
            )
            .cast("double")
        )

    s = j.agg(
        cnt(1, 0).alias("n_t0"),
        cnt(1, 1).alias("n_t1"),
        cnt(0, 0).alias("n_c0"),
        cnt(0, 1).alias("n_c1"),
        tot(1, 0).alias("s_t0"),
        tot(1, 1).alias("s_t1"),
        tot(0, 0).alias("s_c0"),
        tot(0, 1).alias("s_c1"),
    )
    m = lambda sc, nc: F.col(sc) / F.col(nc)  # noqa: E731
    return s.select(
        "n_t0",
        "n_t1",
        "n_c0",
        "n_c1",
        F.round(m("s_t0", "n_t0"), 6).alias("mean_treated_pre"),
        F.round(m("s_t1", "n_t1"), 6).alias("mean_treated_post"),
        F.round(m("s_c0", "n_c0"), 6).alias("mean_control_pre"),
        F.round(m("s_c1", "n_c1"), 6).alias("mean_control_post"),
        F.round(
            (m("s_t1", "n_t1") - m("s_t0", "n_t0"))
            - (m("s_c1", "n_c1") - m("s_c0", "n_c0")),
            6,
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# Expected calibration error of a score against a binary label
# ---------------------------------------------------------------------------
@register(
    "calibration_ece_bins",
    # The score is LEAST(n_chars, 1000)/1000: binning and confidence
    # sums stay INTEGER-exact on both sides (DuckDB decimal division
    # returns DOUBLE, so the clamped integer is summed and divided
    # only at presentation); ECE folds the bin-SORTED |acc-conf|
    # terms (the anova convention).
    oracle="""
    WITH s AS (
      SELECT LEAST(n_chars, 1000) AS score_milli,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents
    ),
    b AS (
      SELECT LEAST(score_milli // 100, 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS pos,
             CAST(SUM(score_milli) AS BIGINT) AS conf_milli
      FROM s GROUP BY 1
    ),
    m AS (
      SELECT bin, n, pos, conf_milli, SUM(n) OVER () AS tn FROM b
    ),
    tot AS (
      SELECT CAST(MAX(tn) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS k_bins,
             list_reduce(
               list((CAST(n AS DOUBLE) / tn)
                    * abs(CAST(pos AS DOUBLE) / n
                          - CAST(conf_milli AS DOUBLE) / 1000.0 / n)
                    ORDER BY bin),
               (acc, x) -> acc + x) AS ece
      FROM m
    )
    SELECT n_total, k_bins, ROUND(ece, 6) AS ece
    FROM tot
    """,
    survey_ids=("B16", "B19", "B43"),
    description="Expected calibration error of a length-based score vs the is-English label",
)
def calibration_ece_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Model-evaluation calibration: bin a [0,1000]-milli score into deciles and
    measure the weighted gap between each bin's mean confidence and its
    empirical accuracy (ECE) — the reliability-diagram summary that
    completes the eval family next to exact_auc (discrimination) and
    calibration-free rank metrics.

    Scale shape: one conditional aggregation to 10 bins (map-side
    combine) with exact decimal confidence sums; the cross-bin ECE sum
    folds over the bin-sorted 10-element list. No data-scale state
    past the first reduce.
    """
    d = t(spark, sf, "documents")
    s = d.select(
        F.least(F.col("n_chars"), F.lit(1000)).alias("score_milli"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    b = s.groupBy(
        F.least(
            F.floor(F.col("score_milli") / 100).cast("bigint"), F.lit(9)
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("pos"),
        F.sum("score_milli").cast("bigint").alias("conf_milli"),
    )
    wa = Window.partitionBy()
    m = b.withColumn("tn", F.sum("n").over(wa))
    return m.agg(
        F.max("tn").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("k_bins"),
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct("bin", "n", "pos", "conf_milli", "tn")
                    )
                ),
                F.lit(0.0),
                lambda acc, e: acc
                + (e["n"].cast("double") / e["tn"])
                * F.abs(
                    e["pos"].cast("double") / e["n"]
                    - e["conf_milli"].cast("double") / F.lit(1000.0) / e["n"]
                ),
            ),
            6,
        ).alias("ece"),
    )
