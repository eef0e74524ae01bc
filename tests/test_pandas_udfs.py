"""Grouped-agg pandas UDAF + Python UDTF tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.functions.pandas_udfs import (
    make_split_sentences_udtf,
    make_weighted_avg_udaf,
)


def test_weighted_avg_udaf(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", v=10.0, w=1.0),
            Row(k="a", v=20.0, w=3.0),
            Row(k="b", v=5.0, w=2.0),
        ]
    )
    got = {
        r.k: r.wavg
        for r in df.groupBy("k").agg(make_weighted_avg_udaf()("v", "w").alias("wavg")).collect()
    }
    assert got["a"] == 17.5  # (10*1 + 20*3) / 4
    assert got["b"] == 5.0


def test_weighted_avg_udaf_zero_weight(spark):
    df = spark.createDataFrame([Row(k="z", v=9.0, w=0.0)])
    got = df.groupBy("k").agg(make_weighted_avg_udaf()("v", "w").alias("wavg")).collect()[0]
    assert got.wavg == 0.0


def test_split_sentences_udtf(spark):
    spark.udtf.register("split_sentences", make_split_sentences_udtf())
    rows = spark.sql(
        "SELECT s.* FROM (SELECT 'Hello world. How are you. ' AS t), "
        "LATERAL split_sentences(t) s"
    ).collect()
    assert [(r.sentence, r.n_words, r.position) for r in rows] == [
        ("Hello world", 2, 0),
        ("How are you", 3, 1),
    ]


def test_split_sentences_udtf_null_safe(spark):
    spark.udtf.register("split_sentences", make_split_sentences_udtf())
    rows = spark.sql(
        "SELECT s.* FROM (SELECT CAST(NULL AS STRING) AS t), LATERAL split_sentences(t) s"
    ).collect()
    assert rows == []
