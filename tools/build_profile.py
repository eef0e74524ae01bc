"""Profile DataFrame CONSTRUCTION time (spec.build) per registry query.

The bench clock includes ``spec.build(spark, sf_dir)`` (driver-side
Python + py4j plan construction) in every rep. Queries that assemble
thousands of Column objects (inlined codebook/centroid literals, long
fold chains) can spend 0.5–2 s per rep before Spark sees a single row
— pure driver overhead that also burdens a real cluster's job-submit
path. This tool times build() alone (no action) to rank that cost.

Usage: python tools/build_profile.py [--sf-dir ...] [--top 40]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: F401


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--skip-streaming", action="store_true", default=True)
    args = ap.parse_args()

    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
    from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

    spark = get_spark("ag-build-profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    rows = []
    for name, spec in specs.items():
        # streaming drains EXECUTE inside build; skip (their build cost
        # is measured by the bench itself)
        if name.startswith("streaming_"):
            continue
        try:
            t0 = time.perf_counter()
            spec.build(spark, args.sf_dir)
            t1 = time.perf_counter()
            rows.append((t1 - t0, name))
        except Exception as exc:
            rows.append((float("nan"), f"{name} ERR {type(exc).__name__}"))
        spark.catalog.clearCache()
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows if r[0] == r[0])
    print(f"total build time over {len(rows)} non-streaming queries: {total:.1f}s")
    for t, name in rows[: args.top]:
        print(f"{t:8.3f}  {name}")


if __name__ == "__main__":
    main()
