"""Interleaved same-session A/B of the parallelize_cpu_scan gate.

For each named query, builds the plan with SPARK_GRAFT_SCAN_REPARTITION
flipped off (A) and on (B), alternating A,B,A,B... reps in ONE session
(same JIT state, same page cache, adjacent in time), and reports
min-of-N per arm. The interleaving cancels the box-load drift that
makes separate-process A/B runs unreadable (±30% swings).

Usage:
    python tools/ab_scan_repartition.py name1 name2 ... [--reps 3]
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
    spark = get_spark("ag-ab-scan-repartition")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    warm = "/root/testdata/sf0.001"
    for n in args.names:
        for flag in ("0", "1"):
            os.environ["SPARK_GRAFT_SCAN_REPARTITION"] = flag
            try:
                specs[n].build(spark, warm).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    spark.catalog.clearCache()

    out = {}
    for n in args.names:
        # Build ONCE per arm (outside the timer): plan construction is
        # driver-side work whose py4j/GC noise would otherwise swamp
        # the executor-side signal. The noop write re-executes the
        # whole physical plan every rep.
        dfs = {}
        for flag, key in (("0", "off"), ("1", "on")):
            os.environ["SPARK_GRAFT_SCAN_REPARTITION"] = flag
            dfs[key] = specs[n].build(spark, args.sf_dir)
        times: dict[str, list[float]] = {"off": [], "on": []}
        for _ in range(args.reps):
            for key in ("off", "on"):
                spark.sparkContext.setJobDescription(f"ab:{n}:{key}")
                t0 = time.perf_counter()
                dfs[key].write.format("noop").mode("overwrite").save()
                times[key].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        off, on = min(times["off"]), min(times["on"])
        out[n] = {"off": round(off, 3), "on": round(on, 3),
                  "speedup": round(off / on, 3)}
        print(f"{n}: off={off:.3f}s on={on:.3f}s speedup={off/on:.2f}x",
              flush=True)
    print(json.dumps(out))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
