"""Isolated per-query lane-probed trace (the `pricing_summary`
attribution method, BASELINE.md r12 section, generalized).

Runs ONE registry query N times at a fixture scale on an otherwise
idle box, bracketing each rep with the same two lane probes bench.py
stamps per segment (a ~0.2 s CPU fold and a ~0.4 s shuffle probe), so
a per-rep time can be read against the machine lane it ran in.  Used
to attribute driver-line movement to ENVIRONMENT (query time co-moves
with an elevated lane) vs PLAN (query time moves on flat lanes).

Usage::

    python tools/trace_query.py top_revenue_nations \
        [--sf-dir /root/testdata/sf0.1] [--reps 6]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # IDENTICAL probe plans to bench.py's per-segment lane probes, so
    # the cpu/shuffle columns here read against the same historical
    # bands as BENCHLOG / BASELINE.md lane tables.
    probe_li = spark.read.parquet(
        f"{args.sf_dir}/customer.parquet"
    ).select("c_custkey", "c_acctbal")

    def cpu_probe() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id % 1000003) as s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def shuffle_probe() -> float:
        t0 = time.perf_counter()
        probe_li.repartition(32, "c_custkey").groupBy("c_custkey").agg(
            {"c_acctbal": "sum"}
        ).selectExpr("count(*) as n").write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    spec = all_specs()[args.query]
    # one warm-up rep (JIT, file listing) excluded from the table
    spec.build(spark, args.sf_dir).collect()
    print(f"| rep | {args.query} | cpu lane | shuffle lane |")
    print("|---|---|---|---|")
    for rep in range(args.reps):
        c = cpu_probe()
        s = shuffle_probe()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.build(spark, args.sf_dir).collect()
        q = time.perf_counter() - t0
        print(f"| {rep} | {q:.3f} | {c:.3f} | {s:.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
