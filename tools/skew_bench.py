"""Measure the skew machinery against a plain shuffle join on the
genuinely-skewed fixture from ``tools/gen_skew_fixture.py``.

Three plans for the same query — lineitem_skew JOIN supplier ON
l_suppkey, GROUP BY s_nationkey (sum revenue, count) — asserted
row-identical before any timing is reported:

  plain      sort-merge join, AQE OFF: the hot key's rows land on one
             reducer (the 100 TB failure mode this tool demonstrates)
  aqe        sort-merge join, AQE ON with skew-join splitting: Spark's
             runtime mitigation
  salted     ``operators/skew.py:replicated_skew_join`` (fact salted by
             row hash, dim replicated n_salts-fold), AQE OFF: the
             manual mitigation for when AQE can't fire (skew feeding
             another shuffle, streaming micro-batches, non-SMJ plans)

``spark.sql.autoBroadcastJoinThreshold=-1`` for all three runs: at the
target scale the dim side exceeds broadcast, which is the only regime
where join skew exists at all (a broadcast join has no shuffle to
skew). Each plan runs ``reps`` times after a warm-up; median reported.

Writes skew_bench.json and prints a markdown table for BASELINE.md.

Usage: python tools/skew_bench.py [fixture_dir] [n_salts] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.skew import (
    replicated_skew_join,
)
from ag_data_ingestion_github_to_snowflake_spark.session import get_spark


def agg(joined):
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("revenue"),
    )


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "skew",
    )
    n_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{fixture}/lineitem_skew.parquet").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    supp = spark.read.parquet(f"{fixture}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )

    def plain():
        return agg(li.join(supp, li.l_suppkey == supp.s_suppkey))

    def salted():
        fact = li.withColumn("_uid", F.xxhash64("l_orderkey", "l_linenumber"))
        dim = supp.withColumnRenamed("s_suppkey", "l_suppkey")
        joined = replicated_skew_join(
            fact, dim, key="l_suppkey", fact_unique_col="_uid", n_salts=n_salts
        )
        return agg(joined)

    def set_aqe(on: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(on).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())

    # correctness gate: all three plans must be row-identical
    set_aqe(False)
    rows_plain = sorted(map(tuple, plain().collect()))
    rows_salted = sorted(map(tuple, salted().collect()))
    set_aqe(True)
    rows_aqe = sorted(map(tuple, plain().collect()))
    assert rows_plain == rows_salted == rows_aqe, "plans disagree"
    n_groups = len(rows_plain)

    # skew profile of the fixture (for the report)
    total = li.count()
    top = (
        li.groupBy("l_suppkey").count().orderBy(F.desc("count")).limit(3).collect()
    )
    top_share = sum(r["count"] for r in top) / total

    def timed(build, aqe: bool) -> list[float]:
        set_aqe(aqe)
        times = []
        for rep in range(reps + 1):  # +1 warm-up
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if rep:
                times.append(dt)
        return times

    # Aggregation twin experiment: the SAME hot key under a plain
    # groupBy vs salted_aggregate. Algebraic aggregates partial-combine
    # map-side, so a hot KEY does not melt a reducer the way a hot JOIN
    # key does — this measurement documents when NOT to salt (salting
    # adds a second shuffle stage for nothing). Checked row-identical
    # like the join plans.
    from ag_data_ingestion_github_to_snowflake_spark.operators.skew import (
        salted_aggregate,
    )

    def agg_plain():
        return li.groupBy("l_suppkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
        )

    def agg_salted():
        fact = li.withColumn("_uid", F.xxhash64("l_orderkey", "l_linenumber"))
        return salted_aggregate(
            fact,
            keys=["l_suppkey"],
            aggs={"n": ("l_extendedprice", "count"),
                  "rev": ("_price_dec", "sum")},
            unique_col="_uid",
            n_salts=n_salts,
        )

    # salted_aggregate sums a pre-cast column; stage it once
    li = li.withColumn("_price_dec", F.col("l_extendedprice").cast("decimal(18,2)"))
    set_aqe(False)
    a_plain = sorted(map(tuple, agg_plain().collect()))
    a_salted = sorted(
        map(tuple, agg_salted().select("l_suppkey", "n", "rev").collect())
    )
    assert a_plain == a_salted, "aggregation plans disagree"

    results = {
        "plain_aqe_off": timed(plain, aqe=False),
        "plain_aqe_on": timed(plain, aqe=True),
        f"salted_{n_salts}_aqe_off": timed(salted, aqe=False),
        "agg_plain_groupby": timed(agg_plain, aqe=False),
        f"agg_salted_{n_salts}": timed(agg_salted, aqe=False),
    }
    medians = {k: round(statistics.median(v), 3) for k, v in results.items()}
    report = {
        "fixture": fixture,
        "fact_rows": total,
        "top3_key_share": round(top_share, 4),
        "n_groups": n_groups,
        "n_salts": n_salts,
        "reps": reps,
        "times_sec": results,
        "median_sec": medians,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "skew_bench.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print("\n| plan | median sec |\n|---|---|")
    for k, v in medians.items():
        print(f"| {k} | {v} |")


if __name__ == "__main__":
    main()
