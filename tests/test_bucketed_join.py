"""Bucketed co-located join: pre-bucketing both fact tables on the
join key removes the shuffle entirely — the README's warehouse-scale
claim, demonstrated. At 100 TB this is the difference between
re-shuffling ~TBs per join and a zero-exchange sort-merge join."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf; managed tables land in the
    # default ./spark-warehouse and are dropped (with data) afterward.
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    lb = spark.table("li_bucketed")
    ob = spark.table("o_bucketed")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )
    plan = plan_of(joined)
    # the join itself must not exchange: bucket layout co-locates keys
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    if "SortMergeJoin" in plan:
        assert "Exchange hashpartitioning(l_orderkey" not in join_section
        assert "Exchange hashpartitioning(o_orderkey" not in join_section
    # and the result matches the plain join
    plain = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )
    try:
        assert sorted(joined.collect()) == sorted(plain.collect())
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
