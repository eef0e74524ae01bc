"""Interleaved same-session A/B of the r13 drain tuning (state-store
provider unload + input-derived partition floor) for named streaming
queries. Arm A = r12 behavior (no unload, floor 8); arm B = r13
(unload, floor 2). Alternates A,B,A,B per query; reports min per arm.

Usage: python tools/ab_stream_drain.py name1 ... [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: F401

ARMS = {
    "r12": {"SPARK_GRAFT_STREAM_UNLOAD": "0", "SPARK_GRAFT_STREAM_PART_FLOOR": "8"},
    "unl8": {"SPARK_GRAFT_STREAM_UNLOAD": "1", "SPARK_GRAFT_STREAM_PART_FLOOR": "8"},
    "unl2": {"SPARK_GRAFT_STREAM_UNLOAD": "1", "SPARK_GRAFT_STREAM_PART_FLOOR": "2"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
    from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

    specs = all_specs()
    spark = get_spark("ag-ab-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def stop_providers():
        try:
            spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        except Exception:
            pass

    # GROUP-level A/B: the unload arm's whole point is what it does to
    # the NEXT drain, so per-query interleaving contaminates arms. Each
    # group = all named queries drained sequentially under one arm's
    # env; groups alternate, with an untimed provider stop + cache
    # clear between groups so each group starts from the same state.
    for n in args.names:  # warm: JIT + stage dirs (untimed)
        specs[n].build(spark, args.sf_dir)
    group_times: dict[str, list[float]] = {k: [] for k in ARMS}
    for _ in range(args.reps):
        for arm, env in ARMS.items():
            stop_providers()
            spark.catalog.clearCache()
            os.environ.update(env)
            t0 = time.perf_counter()
            for n in args.names:
                specs[n].build(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            group_times[arm].append(time.perf_counter() - t0)
            print(f"  group {arm}: {group_times[arm][-1]:.2f}s", flush=True)
    out = {"group": {k: round(min(v), 3) for k, v in group_times.items()}}
    print("GROUP min:", out["group"], flush=True)
    print(json.dumps(out))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
