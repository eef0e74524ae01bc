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
