"""Scaling evidence on a MULTI-row-group fixture layout (VERDICT r13
item 7).

The sf0.1 fixtures are single-row-group parquet files, so every scan is
one unsplittable task and the headline joins' map sides cannot use more
cores — the r13 scaling block (8 vs 32 cores) read ~1.0 for them, and
the optimizer's claim "the one-task map side is unavoidable at this
layout" rested on plan reading alone. This tool stages a split copy of
the fixture (every table rewritten as N row-group-sized files, all
values identical; mtime-marker cached like every other staged layout)
and times the headline joins against BOTH layouts in the same session,
so the layout is the only variable.

Run it at two core counts for the scaling ratio:

    SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py
    SPARK_GRAFT_CPUS=8  python tools/scaling_probe.py

Timing evidence only — the bench and every registry contract still read
the canonical fixtures; nothing here feeds a query result.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: F401

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SPLIT = {"lineitem": 16, "orders": 16, "events": 16, "customer": 8}
QUERIES = [
    "pricing_summary",
    "top_revenue_nations",
    "star_join_wide",
    "join_inner_lineitem_orders",
    "join_left_customer_orders",
    "shipping_priority_top10",
]


def stage_split_fixture(spark, sf: str) -> str:
    from ag_data_ingestion_github_to_snowflake_spark.sources.staging import (
        stage_dir,
        write_marker,
    )

    out = stage_dir("ag_mrg_fixture", sf)
    marker = os.path.join(out, "_staged")
    src_mtime = max(
        os.path.getmtime(os.path.join(sf, f"{t}.parquet")) for t in TABLES
    )
    if os.path.exists(marker) and os.path.getmtime(marker) >= src_mtime:
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLES:
        src = os.path.join(sf, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        n = SPLIT.get(t)
        if n is None:
            shutil.copy(src, dst)  # small dims: layout irrelevant
        else:
            # N files of one row group each == an N-way-splittable scan
            spark.read.parquet(src).repartition(n).write.mode(
                "overwrite"
            ).parquet(dst)
    write_marker(marker)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
    from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

    spark = get_spark("ag-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    specs = all_specs()
    split_dir = stage_split_fixture(spark, args.sf_dir)

    def run(name: str, d: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        specs[name].build(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    results = {}
    for name in QUERIES:
        # warm both arms once, then interleave reps and keep the min
        run(name, args.sf_dir)
        run(name, split_dir)
        single, split = [], []
        for _ in range(args.reps):
            single.append(run(name, args.sf_dir))
            split.append(run(name, split_dir))
        results[name] = {
            "single_rowgroup_sec": round(min(single), 3),
            "split_sec": round(min(split), 3),
            "speedup": round(min(single) / min(split), 2),
        }
        print(
            f"{name}: 1-rowgroup {min(single):.2f}s  "
            f"split {min(split):.2f}s  ({min(single)/min(split):.2f}x) "
            f"@{cores} cores"
        )
    out = {"cores": cores, "sf_dir": args.sf_dir, "queries": results}
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
