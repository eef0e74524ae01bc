"""Measure streaming_dedup_events drain knobs at the 100x fixture.

VERDICT r7 item 5: the dedup drain (dropDuplicatesWithinWatermark,
single AvailableNow commit) measures alpha +1.30 / 31.6 s at 100x —
the worst remaining streaming exponent. The session drain's r7 win
came from re-measuring store x partition knobs under append mode;
this sweep applies the same method here: state store provider
{heap, rocksdb} x shuffle partitions {8, 32} x watermark delay
{40 days, 1 day}. Each cell is one full drain of the sf10 fixture
(19.2M events -> 19.2M dedup states) in a fresh checkpoint.

Usage::

    SPARK_GRAFT_SCALE_BIG=/root/repo/.localdata/sf10 \
        python tools/sweep_dedup_drain.py [reps]

Prints one line per cell and a JSON summary; paste the numbers into
the streaming_dedup_events docstring.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ag_data_ingestion_github_to_snowflake_spark.session import get_spark  # noqa: E402
from ag_data_ingestion_github_to_snowflake_spark.streaming import streams as S  # noqa: E402
from ag_data_ingestion_github_to_snowflake_spark.plans.streaming_queries import (  # noqa: E402
    _drain,
    _staged_events_stream,
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    big = os.environ.get("SPARK_GRAFT_SCALE_BIG", "/root/repo/.localdata/sf10")
    spark = get_spark("dedup-drain-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    cores = str(spark.sparkContext.defaultParallelism)

    cells = [
        ("heap", "8", "40 days"),
        ("heap", cores, "40 days"),
        ("rocksdb", "8", "40 days"),
        ("rocksdb", cores, "40 days"),
        # delay width probe: with a single AvailableNow commit the
        # watermark only advances at the end, so delay should be
        # cost-neutral — measure to confirm rather than assume.
        ("heap", cores, "1 day"),
    ]
    out = {}
    for store, parts, delay in cells:
        best = None
        for _ in range(reps):
            sdf, _ = _staged_events_stream(spark, big)
            plan = S.dedup_stream(sdf, ["event_id"], delay=delay).select("event_id")
            t0 = time.perf_counter()
            em = _drain(
                plan,
                spark,
                "append",
                rocksdb=(store == "rocksdb"),
                shuffle_partitions=parts,
            )
            n = em.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(
                f"store={store:8s} parts={parts:3s} delay={delay:8s} "
                f"{dt:7.1f}s  rows={n}",
                flush=True,
            )
        out[f"{store}/{parts}/{delay}"] = round(best, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
