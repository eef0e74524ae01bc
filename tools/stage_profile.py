"""Per-stage breakdown of ONE registry query execution: stage id,
task count, executorRunTime, shuffle bytes, and the top RDD/plan name
— the 'where does the time actually go' view the optimization rounds
need before touching a plan.

Usage: python tools/stage_profile.py <query> [--sf-dir D] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: F401


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
    from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

    spark = get_spark("ag-stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ui = spark.sparkContext.uiWebUrl
    app_id = _get(f"{ui}/api/v1/applications")[0]["id"]
    base = f"{ui}/api/v1/applications/{app_id}"

    spec = all_specs()[args.query]
    # warm rep(s), then the measured rep is the LAST one
    for _ in range(args.reps):
        before = {s["stageId"] for s in _get(f"{base}/stages")}
        df = spec.build(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    stages = [s for s in _get(f"{base}/stages")
              if s["stageId"] not in before and s["status"] == "COMPLETE"]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    total = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"last-rep stages: {len(stages)}, total executorRunTime {total} ms")
    for s in stages[:14]:
        print(
            f"  stage {s['stageId']:>5} tasks {s['numCompleteTasks']:>4} "
            f"run {s.get('executorRunTime', 0):>7} ms  "
            f"shW {s.get('shuffleWriteBytes', 0)//1024:>7} KiB  "
            f"shR {s.get('shuffleReadBytes', 0)//1024:>7} KiB  "
            f"{(s.get('description') or s.get('name', ''))[:70]}"
        )


if __name__ == "__main__":
    main()
