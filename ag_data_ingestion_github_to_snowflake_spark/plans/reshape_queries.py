"""Reshape surface: pivot, unpivot (melt), GROUPING SETS, and
time-series gap-fill — the table-reshaping operations an analytics
consumer reaches for right after plain aggregation.

Scale notes per query are inline; all four are single-shuffle shapes
(pivot/grouping-sets aggregate once; unpivot is a pure map; gap-fill
builds its dense grid by exploding a 1-row aggregate — no cross join
node anywhere, so the plan-audit red-flag gate stays clean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t

_YEARS = list(range(1995, 2002))


@register(
    "pivot_priority_by_year",
    oracle="""
    SELECT o_orderpriority,
           {cols}
    FROM orders
    GROUP BY o_orderpriority
    """.format(
        cols=",\n           ".join(
            f"CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = {y} "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS y{y}"
            for y in _YEARS
        )
    ),
    survey_ids=("B16", "B19"),
    description="Pivot: order counts, priorities x order years",
)
def pivot_priority_by_year(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot order counts to one column per order year.

    The pivot value list is pinned (not discovered with an extra scan),
    so this is ONE aggregation shuffle with a fixed output schema — at
    scale, always pass explicit pivot values: the discovery pass is a
    full distinct scan and makes the schema data-dependent.
    """
    df = t(spark, sf, "orders").withColumn("o_year", F.year("o_orderdate"))
    out = (
        df.groupBy("o_orderpriority")
        .pivot("o_year", _YEARS)
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(str(y)), F.lit(0)).alias(f"y{y}") for y in _YEARS],
    )
    return renamed


@register(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value
    FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
    survey_ids=("B27", "B4"),
    description="Unpivot (melt): wide customer metrics to long (key, metric, value)",
)
def unpivot_customer_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Melt two customer columns into long form.

    ``unpivot`` is a pure row-local map (each input row emits N output
    rows) — no shuffle, fully codegen'd; the inverse of pivot.
    """
    c = t(spark, sf, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    survey_ids=("B22",),
    description="GROUPING SETS: status-only, priority-only, and grand-total rows",
)
def grouping_sets_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit grouping sets (neither rollup nor cube expresses this
    exact set: the two single-dimension marginals plus the grand total,
    WITHOUT the (status, priority) cross cells).

    Spark's SQL layer plans this as a single Expand + one aggregation
    shuffle — same cost class as a plain groupBy, 3x the rows into the
    exchange (one replica per set).
    """
    t(spark, sf, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "gapfill_hourly_events",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi,
             list(DISTINCT event_type) AS types
      FROM events
    ),
    grid AS (
      -- two separate UNNESTs then cross join: parallel UNNESTs in one
      -- SELECT would zip positionally, not cross-product
      SELECT h.hour_ts, ty.event_type
      FROM (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
            FROM bounds) h
      CROSS JOIN (SELECT UNNEST(types) AS event_type FROM bounds) ty
    ),
    counts AS (
      SELECT date_trunc('hour', ts) AS hour_ts, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT g.hour_ts, g.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN counts c
      ON g.hour_ts = c.hour_ts AND g.event_type = c.event_type
    """,
    survey_ids=("B46", "B41", "B12"),
    description="Gap-fill: dense hourly grid per event type, zero-filled",
)
def gapfill_hourly_events(spark: SparkSession, sf: str) -> DataFrame:
    """Zero-fill missing (hour, event_type) cells — the time-series
    densification every monitoring/feature pipeline needs before
    window math.

    The dense grid is built by exploding a ONE-ROW global aggregate
    (min, max, collect_set(type)) — sequence() then two explodes — so
    there is no cross-join node (grid size = hours x types, generated,
    not joined). The only shuffles: the 1-row aggregate and the left
    join back to hourly counts, keyed on (hour, type). DuckDB's
    generate_series is inclusive of both bounds, as is F.sequence.
    """
    ev = t(spark, sf, "events").select(
        F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
    )
    bounds = ev.agg(
        F.min("hour_ts").alias("lo"),
        F.max("hour_ts").alias("hi"),
        F.collect_set("event_type").alias("types"),
    )
    grid = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
            "types",
        )
        .select("hour_ts", F.explode("types").alias("event_type"))
    )
    counts = ev.groupBy("hour_ts", "event_type").agg(F.count(F.lit(1)).alias("_n"))
    return grid.join(counts, ["hour_ts", "event_type"], "left").select(
        "hour_ts",
        "event_type",
        F.coalesce(F.col("_n"), F.lit(0)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Weighted median (exact, decimal-threshold crossing)
# ---------------------------------------------------------------------------
@register(
    "weighted_median_lineitem",
    # The crossing rule is pure exact-decimal algebra (2*cumw >= total
    # — no division, no interpolation), so the picked VALUE is
    # engine-identical by construction; value ties cannot change the
    # crossing value regardless of tie order inside the cumsum.
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag,
             l_extendedprice AS price,
             CAST(l_quantity AS DECIMAL(18,6)) AS wgt,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    cum AS (
      SELECT flag, price, wgt,
             SUM(wgt) OVER (PARTITION BY flag
                            ORDER BY price, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS cumw,
             SUM(wgt) OVER (PARTITION BY flag) AS total
      FROM w
    ),
    crossed AS (
      SELECT flag, MIN(price) AS weighted_median
      FROM cum WHERE 2 * cumw >= total
      GROUP BY flag
    ),
    stats AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(wgt) AS DOUBLE) AS total_weight
      FROM w GROUP BY flag
    )
    SELECT s.flag, s.n_rows, ROUND(s.total_weight, 6) AS total_weight,
           ROUND(c.weighted_median, 6) AS weighted_median
    FROM stats s JOIN crossed c ON s.flag = c.flag
    """,
    survey_ids=("B23", "B29", "B31"),
    description="exact weighted median of price by quantity per returnflag (no interpolation)",
)
def weighted_median_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted median: the smallest price whose cumulative quantity
    weight reaches half the group total — the inventory-weighted
    'typical price' statistic plain median misstates when row weights
    vary. Built-in percentile() cannot weight rows.

    TWO-LEVEL prefix sum (the C89/C90/C114 window-wall fix family; a
    naive per-group cumulative window concentrates each flag's full
    series in ONE task — measured alpha +1.85 / 92 s at 100x with only
    3 groups):

    1. bucket rows by price band and aggregate per-(flag, bucket)
       weight — fully parallel, one small shuffle;
    2. prefix-sum the TINY per-bucket totals (about 105 buckets x 3
       flags) to locate each flag's crossing bucket and its carry-in
       weight — trivially cheap regardless of data size;
    3. finish INSIDE the crossing bucket only (~1/n_buckets of the
       rows): carry-in + within-bucket cumulative weight, same exact
       decimal crossing rule (2*cumw >= total — no division, no
       interpolation, no float question in the decision).

    Bucketing by the ORDER KEY (price) makes bucket-major order a
    refinement of the global order, so the crossing value is exactly
    the naive answer; measured 7.5 s / alpha +0.74 at 100x vs the
    naive 92 s / +1.85 (the residual is the stats and crossing-bucket
    re-scans, both embarrassingly parallel). The DuckDB oracle keeps
    the one-window formulation — same answer, different algorithm,
    which is the point."""
    li = t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("decimal(18,6)").alias("wgt"),
        "l_orderkey",
        "l_linenumber",
    )
    b = li.withColumn(
        "bkt", F.floor(F.col("price") / F.lit(1000.0)).cast("long")
    )
    per = b.groupBy("flag", "bkt").agg(F.sum("wgt").alias("bw"))
    w_b = (
        Window.partitionBy("flag")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_flag = Window.partitionBy("flag")
    cumb = per.select(
        "flag",
        "bkt",
        "bw",
        F.sum("bw").over(w_b).alias("cumb"),
        F.sum("bw").over(w_flag).alias("total"),
    )
    # first bucket whose running weight reaches the half-total: its
    # carry-in is the running weight MINUS its own bucket weight.
    info = (
        cumb.filter(F.lit(2) * F.col("cumb") >= F.col("total"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("flag").orderBy("bkt")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "flag",
            F.col("bkt").alias("cbkt"),
            (F.col("cumb") - F.col("bw")).alias("carry"),
            "total",
        )
    )
    sub = b.join(F.broadcast(info), "flag").filter(
        F.col("bkt") == F.col("cbkt")
    )
    w_in = (
        Window.partitionBy("flag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    crossed = (
        sub.withColumn(
            "cumw", F.col("carry") + F.sum("wgt").over(w_in)
        )
        .filter(F.lit(2) * F.col("cumw") >= F.col("total"))
        .groupBy("flag")
        .agg(F.min("price").alias("weighted_median"))
    )
    stats = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("wgt").cast("double").alias("total_weight"),
    )
    return stats.join(crossed, "flag").select(
        "flag",
        "n_rows",
        F.round("total_weight", 6).alias("total_weight"),
        F.round("weighted_median", 6).alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# Linear-interpolation gap-fill: the value-imputation upgrade of
# gapfill_hourly_events (which zero-fills counts)
# ---------------------------------------------------------------------------
@register(
    "linear_interp_gapfill",
    # Portable gaps-and-islands formulation (no IGNORE NULLS window
    # option): a running count of known cells forms a group id whose
    # FIRST row is the known anchor, in both directions. Hour indexes
    # are exact integers, known means are exact decimal sums / counts,
    # and the interpolation weight is a ratio of small integers — the
    # arithmetic is identical double ops over identical inputs.
    oracle="""
    WITH ev AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS ih, event_type, value
      FROM events
    ),
    bounds AS (
      SELECT MIN(ih) AS lo, MAX(ih) AS hi, list(DISTINCT event_type) AS types
      FROM ev
    ),
    grid AS (
      SELECT h.ih, ty.event_type
      FROM (SELECT UNNEST(generate_series(lo, hi)) AS ih FROM bounds) h
      CROSS JOIN (SELECT UNNEST(types) AS event_type FROM bounds) ty
    ),
    known AS (
      SELECT ih, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
      FROM ev GROUP BY ih, event_type
    ),
    g AS (
      SELECT grid.ih, grid.event_type, known.v,
             SUM(CASE WHEN known.v IS NOT NULL THEN 1 END)
               OVER (PARTITION BY grid.event_type ORDER BY grid.ih
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gp,
             SUM(CASE WHEN known.v IS NOT NULL THEN 1 END)
               OVER (PARTITION BY grid.event_type ORDER BY grid.ih DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gn
      FROM grid LEFT JOIN known USING (ih, event_type)
    ),
    anch AS (
      SELECT ih, event_type, v,
             FIRST_VALUE(v) OVER (PARTITION BY event_type, gp ORDER BY ih
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             FIRST_VALUE(ih) OVER (PARTITION BY event_type, gp ORDER BY ih
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             FIRST_VALUE(v) OVER (PARTITION BY event_type, gn ORDER BY ih DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv,
             FIRST_VALUE(ih) OVER (PARTITION BY event_type, gn ORDER BY ih DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nh
      FROM g
    )
    SELECT ih AS hour_idx, event_type,
           CAST(v IS NOT NULL AS BOOLEAN) AS observed,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (CAST(ih - ph AS DOUBLE) / (nh - ph))
           END, 6) AS value_filled
    FROM anch
    """,
    survey_ids=("B31", "B12", "B46"),
    description="Dense hourly grid with linear interpolation between known cells",
)
def linear_interp_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-fill with LINEAR INTERPOLATION: every (hour, event_type)
    cell gets a value — observed hourly means stay as-is, missing
    hours take the straight line between their known neighbors, and
    edge gaps extend the nearest known value. gapfill_hourly_events
    zero-fills counts; this imputes a continuous measure, which is
    what feature pipelines need before window math over sensor-like
    series.

    Portable gaps-and-islands (no IGNORE NULLS dependency): a running
    count of known cells per direction forms a group id; the group's
    first row IS the anchor, so two window passes recover (prev, next)
    anchors exactly. All windows run over the CALENDAR-BOUNDED grid
    (hours x types), partitioned by event_type — never data-scale rows;
    the raw stream reduces to hourly means in one map-side-combined
    shuffle.
    """
    ev = t(spark, sf, "events").select(
        F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("bigint").alias("ih"),
        "event_type",
        "value",
    )
    bounds = ev.agg(
        F.min("ih").alias("lo"),
        F.max("ih").alias("hi"),
        F.collect_set("event_type").alias("types"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("ih"), "types"
    ).select("ih", F.explode("types").alias("event_type"))
    known = ev.groupBy("ih", "event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    g = grid.join(known, ["ih", "event_type"], "left")
    known_flag = F.when(F.col("v").isNotNull(), F.lit(1))
    w_fwd = Window.partitionBy("event_type").orderBy("ih").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_bwd = Window.partitionBy("event_type").orderBy(F.col("ih").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = g.select(
        "ih",
        "event_type",
        "v",
        F.sum(known_flag).over(w_fwd).alias("gp"),
        F.sum(known_flag).over(w_bwd).alias("gn"),
    )
    w_gp = Window.partitionBy("event_type", "gp").orderBy("ih").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_gn = Window.partitionBy("event_type", "gn").orderBy(F.col("ih").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    anch = g.select(
        "ih",
        "event_type",
        "v",
        F.first("v").over(w_gp).alias("pv"),
        F.first("ih").over(w_gp).alias("ph"),
        F.first("v").over(w_gn).alias("nv"),
        F.first("ih").over(w_gn).alias("nh"),
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("ih") - F.col("ph")).cast("double") / (F.col("nh") - F.col("ph")))
        )
    )
    return anch.select(
        F.col("ih").alias("hour_idx"),
        "event_type",
        F.col("v").isNotNull().alias("observed"),
        F.round(filled, 6).alias("value_filled"),
    )
