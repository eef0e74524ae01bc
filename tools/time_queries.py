"""Min-of-N noop-sink timer for a named query subset — bench.py's
exact methodology (warm-up pass at sf0.001, min-of-2 at the target
scale, cache cleared between queries) without the full-registry cost.
Used during optimization rounds for quick before/after wall-clock on
the queries being touched; the committed evidence remains bench.py
lines + work_profile structural counts.

Usage:
    python tools/time_queries.py name1 name2 ... [--sf-dir D] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: F401


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
    from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

    specs = all_specs()
    spark = get_spark("ag-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    warm = "/root/testdata/sf0.001"
    for n in args.names:
        try:
            specs[n].build(spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    spark.catalog.clearCache()

    out = {}
    for n in args.names:
        spark.sparkContext.setJobDescription(f"time:{n}")
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            specs[n].build(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        out[n] = round(best, 3)
        print(f"{n}: {out[n]}s", flush=True)
    print(json.dumps(out))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
