"""Additional TPC-H-shaped analytical queries (Q3/Q18 analogs):
fact-fact-dim joins with grouped HAVING semantics and global top-k —
the shapes a warehouse consumer of the reference's table would run
once it grows past the three README queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.functions.exact import DEC2 as DEC
from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t


@register(
    "shipping_priority_top10",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate <  TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  >= TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    survey_ids=("B15", "B24", "B16"),
    description="TPC-H Q3 shape: segment-filtered star join, top-10 revenue orders",
)
def shipping_priority_top10(spark: SparkSession, sf: str) -> DataFrame:
    """Q3 analog: unshipped-revenue top-10 for one market segment."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-03-15").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "nation_volume_flows",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
    survey_ids=("B15", "B10", "B33"),
    description="TPC-H Q7 shape: two-nation trade volume with OR'd pair predicate",
)
def nation_volume_flows(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 analog: shipping volume between a nation pair, per year.

    The OR'd pair predicate lands on the two broadcast nation dims
    (cheap residual filter), never widening the fact join.
    """
    li = t(spark, sf, "lineitem")
    s = F.broadcast(t(spark, sf, "supplier"))
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    # Pre-filter both nation dims to the pair: the first fact joins
    # then drop ~92% of rows (2 of 25 nations); the OR'd residual only
    # rejects the two same-nation cross terms.
    pair_nations = t(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = F.broadcast(pair_nations.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(pair_nations.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    volume = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("volume"))
    )


@register(
    "priority_shipping_case_counts",
    oracle="""
    SELECT l.l_returnflag AS rflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    survey_ids=("B19", "B10", "B9"),
    description="TPC-H Q12 shape: CASE-counting priorities across a fact join",
)
def priority_shipping_case_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 analog: high/low-priority line counts per return flag."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = t(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("rflag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                               * CAST(1 - l.l_discount AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE),
           6) AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    survey_ids=("B19", "B11", "B43"),
    description="TPC-H Q14 shape: conditional revenue ratio per year",
)
def promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 analog: percent of revenue from PROMO parts, per ship year.

    Both numerator and denominator are exact decimal sums, so the
    ratio is a deterministic double division on both engines.
    """
    li = t(spark, sf, "lineitem")
    p = F.broadcast(t(spark, sf, "part"))
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo_rev).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_share_pct")
        )
    )


@register(
    "order_priority_exists",
    oracle="""
    SELECT o_orderpriority AS priority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    survey_ids=("B13", "B14", "B16"),
    description="TPC-H Q4 shape: EXISTS correlated subquery as a semi join",
)
def order_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """Q4 analog: priority counts for orders with a late-shipping line.

    The correlated EXISTS is a left-semi join with the correlation as
    an extra join condition — no subquery re-execution per row.
    """
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf, "lineitem")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders")
    )


@register(
    "returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS lost_revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    survey_ids=("B15", "B24", "B6"),
    description="TPC-H Q10 shape: top-20 customers by returned-item revenue",
)
def returned_item_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 analog: customers losing the most revenue to returns."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(t(spark, sf, "nation"))
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    survey_ids=("B13", "B18", "B17"),
    description="TPC-H Q22 shape: scalar-subquery threshold + anti join",
)
def idle_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 analog: above-average-balance customers with no orders.

    The scalar average becomes a broadcast single-row cross join (not
    a collect — the threshold stays inside the plan), and NOT EXISTS
    is a left-anti join.
    """
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")).alias("v"))
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("v"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
    )


@register(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT count(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_type = 'PROMO'    AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
       OR (p.p_type = 'STANDARD' AND p.p_size BETWEEN 5 AND 25 AND l.l_quantity >= 20)
       OR (p.p_type = 'ECONOMY'  AND p.p_size BETWEEN 10 AND 40 AND l.l_quantity >= 30)
    """,
    survey_ids=("B9", "B11", "B19"),
    description="TPC-H Q19 shape: OR-of-ANDs predicate across a broadcast join",
)
def disjunctive_predicate_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 analog: disjunctive multi-column predicate spanning both
    join sides. Catalyst extracts the common constraints for pushdown
    and evaluates the residual OR after the broadcast join."""
    li = t(spark, sf, "lineitem")
    p = F.broadcast(t(spark, sf, "part"))
    arm = lambda ptype, lo, hi, qty: (  # noqa: E731
        (F.col("p_type") == ptype)
        & F.col("p_size").between(lo, hi)
        & (F.col("l_quantity") >= qty)
    )
    cond = arm("PROMO", 1, 15, 10) | arm("STANDARD", 5, 25, 20) | arm("ECONOMY", 10, 40, 30)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


@register(
    "large_orders_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_name,
           o.o_orderkey,
           o.o_orderdate,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
    """,
    survey_ids=("B15", "B13", "B16"),
    description="TPC-H Q18 shape: HAVING-filtered semi join back to dims",
)
def large_orders_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 analog: customers holding orders with total quantity > 150.

    The HAVING aggregate runs first (partial-agg friendly), its key set
    semi-joins the fact — at scale the semi join's build side is only
    the qualifying orderkeys, not the fact table.
    """
    li = t(spark, sf, "lineitem")
    # Decimal-exact HAVING: a raw double sum near the threshold could
    # flip row membership between engines (no rounding can absorb it).
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    orders = t(spark, sf, "orders")
    o = orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
    c = t(spark, sf, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"))
    )


@register(
    "market_share_by_year",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * CAST(1 - l.l_discount AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
    GROUP BY 1
    """,
    survey_ids=("B15", "B19", "B11"),
    description="TPC-H Q8 shape: one nation's share of a region's market per year",
)
def market_share_by_year(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 analog: NATION_3 suppliers' share of PROMO-part revenue sold
    into EUROPE, per order year.

    All five dims broadcast; the only shuffles are the two fact-side
    joins (lineitem⋈orders on orderkey, ⋈customer on custkey) and the
    final year aggregation. Numerator and denominator are exact decimal
    sums; the share divides as DOUBLE identically on both engines.
    """
    li = t(spark, sf, "lineitem")
    p = F.broadcast(t(spark, sf, "part").filter(F.col("p_type") == "PROMO"))
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n1 = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    # customer-side nation pre-joined to the region filter: one tiny
    # broadcast dim (nations in EUROPE) instead of nation x region at
    # the fact level.
    cust_nations = F.broadcast(
        n1.join(r, n1.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("cn_key")
        )
    )
    s = F.broadcast(t(spark, sf, "supplier"))
    n2 = F.broadcast(
        t(spark, sf, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    vol = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(cust_nations, F.col("c_nationkey") == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nation_vol).cast("double") / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    survey_ids=("B12", "B16", "B22"),
    description="TPC-H Q13 shape: order-count histogram over a filtered left join",
)
def customer_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 analog: how many customers placed how many (non-urgent)
    orders — customers with zero survive via the left join.

    Two-level aggregation: per-customer counts shuffle on custkey (the
    same key the join shuffled on, so AQE coalesces the exchange), the
    histogram re-aggregates on the tiny count domain.
    """
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    survey_ids=("B15", "B16", "B24"),
    description="TPC-H Q15 shape: supplier(s) achieving the max quarterly revenue",
)
def top_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 analog: the top revenue supplier(s) for 1996Q1.

    The max-of-aggregate is an equi-join against a broadcast 1-row
    aggregate (not a global sort): rev shuffles once on suppkey, the
    1-row MAX broadcasts, ties all surface. Revenue compares as exact
    DECIMAL so the equality is safe; the reported value casts to
    DOUBLE.
    """
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    vol = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(vol).alias("total_rev")
    )
    max_rev = F.broadcast(rev.agg(F.max("total_rev").alias("max_rev")))
    s = t(spark, sf, "supplier")
    return (
        rev.join(max_rev, rev.total_rev == max_rev.max_rev)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH th AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*)) AS thr
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN th     ON th.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_type = 'SMALL'
      AND CAST(l.l_quantity AS DOUBLE) < th.thr
    """,
    survey_ids=("B16", "B18", "B9"),
    description="TPC-H Q17 shape: below-avg-quantity revenue via correlated threshold",
)
def small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 analog: yearly revenue from lines under 20% of their part's
    average order quantity.

    The correlated AVG decorrelates into one per-part aggregate (a
    single shuffle on partkey — the full table, as TPC-H requires the
    average over ALL lines of the part, not just the filtered brand)
    joined back on the same key. The threshold is computed as exact
    decimal SUM / COUNT in both engines, so membership of the strict
    inequality cannot flip.
    """
    li = t(spark, sf, "lineitem")
    th = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("thr")
    ).withColumnRenamed("l_partkey", "th_partkey")
    p = F.broadcast(
        t(spark, sf, "part").filter(
            (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL")
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(th, li.l_partkey == F.col("th_partkey"))
        .filter(F.col("l_quantity").cast("double") < F.col("thr"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
    """,
    survey_ids=("B13", "B15", "B16"),
    description="TPC-H Q21 shape: sole-late-supplier count via EXISTS + NOT EXISTS",
)
def waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 analog: suppliers who were the ONLY late shipper on a
    finished multi-supplier order (late = shipped >100 days after the
    order date; the fixture has no commit/receipt dates).

    Both correlated EXISTS clauses decorrelate to hash semi/anti joins
    on orderkey with the supplier-inequality as a residual — the
    classic double self-join, never a cartesian. The late set is
    computed once and reused by both the probe and the anti side.

    Shuffle-floor note (r10, VERDICT r9 item 6 — MEASURED): a bloom
    pre-filter on l2 (bloom over late.l_orderkey, operators/bloom.py,
    probe before the semi join) was tried and LOST at both decades —
    sf0.1 1.69→2.35 s, sf10 9.69→14.40 s, rows identical — because the
    late subplan is recomputed for the bloom build and the surviving
    order fraction (any F-order with one late line) is too high to
    repay it. The full-fact shuffle on orderkey IS the floor for this
    shape; selectivity here is scale-invariant, so pruning moves
    constants, never the exponent.
    """
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 100 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    l1 = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    s = F.broadcast(t(spark, sf, "supplier"))
    return (
        l1.join(s, l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
