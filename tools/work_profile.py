"""Deterministic work profile per registry query: jobs, stages, tasks,
shuffle bytes, input bytes — counts that do not move with box load.

The optimization rounds use these (plus explain plans) as the primary
before/after evidence, because wall-clock on the shared sandbox swings
2x minute-to-minute (BENCHLOG lane probes). A structural optimization
(fewer exchanges, fewer jobs, fewer tasks, fewer shuffled bytes) shows
up here invariantly. Metrics come from the Spark UI REST API.

Usage:
    python tools/work_profile.py [names...] [--sf-dir ...] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: F401


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
    from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

    import bench

    specs = all_specs()
    names = args.names or list(bench.HEADLINE)
    spark = get_spark("ag-work-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = _get(f"{ui}/api/v1/applications")[0]["id"]
    base = f"{ui}/api/v1/applications/{app_id}"

    def job_ids() -> set[int]:
        return {j["jobId"] for j in _get(f"{base}/jobs")}

    def stage_map() -> dict:
        return {
            (s["stageId"], s["attemptId"]): s
            for s in _get(f"{base}/stages")
            if s["status"] in ("COMPLETE", "ACTIVE", "FAILED")
        }

    rows = {}
    # warm the session so JIT/codegen doesn't pollute the first query
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        if name not in specs:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        jobs_before = job_ids()
        stages_before = set(stage_map().keys())
        t0 = time.perf_counter()
        df = specs[name].build(spark, args.sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t0
        new_jobs = job_ids() - jobs_before
        sm = stage_map()
        new_stages = [s for k, s in sm.items() if k not in stages_before]
        agg = {
            "tasks": sum(s["numCompleteTasks"] + s["numFailedTasks"] for s in new_stages),
            "input_mb": round(sum(s["inputBytes"] for s in new_stages) / 1e6, 2),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in new_stages) / 1e6, 2
            ),
            "shuffle_read_mb": round(
                sum(
                    s["shuffleLocalBytesRead"] + s["shuffleRemoteBytesRead"]
                    for s in new_stages
                )
                / 1e6,
                2,
            ),
        }
        rows[name] = {
            "build_s": round(t_build, 3),
            "exec_s": round(t_exec, 3),
            "jobs": len(new_jobs),
            "stages": len(new_stages),
            **agg,
        }
        print(
            f"{name}: jobs={len(new_jobs)} stages={len(new_stages)} "
            f"tasks={agg['tasks']} shW={agg['shuffle_write_mb']}MB "
            f"build={t_build:.2f}s exec={t_exec:.2f}s"
        )
        spark.catalog.clearCache()
    if args.json:
        Path(args.json).write_text(json.dumps(rows, indent=1) + "\n")


if __name__ == "__main__":
    main()
