"""applyInPandasWithState: running per-user totals accumulate across
micro-batches and the final state matches the batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.catalog import load_table
from ag_data_ingestion_github_to_snowflake_spark.streaming import streams as S
from ag_data_ingestion_github_to_snowflake_spark.streaming.stateful import (
    running_user_totals,
)

SF = "/root/testdata/sf0.001"


def test_running_totals_match_batch_aggregate(spark, tmp_path):
    # Small sample + few state partitions: per-partition state stores
    # plus Arrow round-trips per micro-batch are heavy on local mode,
    # and the semantics under test don't need volume.
    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 40)
    src = str(tmp_path / "src")
    ev.repartition(2).write.mode("overwrite").parquet(src)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        sdf = S.stream_events_from_parquet(spark, src, ev.schema, max_files_per_trigger=1)
        out = running_user_totals(sdf.select("user_id", "value"))
        q = (
            out.writeStream.outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .format("memory")
            .queryName("running1")
            .start()
        )
        assert q.awaitTermination(240)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    # update mode emits one row per user per batch it appeared in; the
    # LAST emission per user must equal the batch aggregate.
    got = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM running1
        ) WHERE rn = 1
        """
    )
    expected = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    g = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    e = {r.user_id: (r.n_events, r.total_value) for r in expected.collect()}
    assert set(g) == set(e)
    for uid in e:
        assert g[uid][0] == e[uid][0]
        assert abs(g[uid][1] - e[uid][1]) < 1e-4  # float accumulation order differs
