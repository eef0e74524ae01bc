"""Simulate the correctness driver's per-round gate locally.

Drives ``__spark_entry__`` exactly the way the driver does — a BARE
SparkSession (not the tuned session factory), the first 50 entries of
``queries()`` at sf0.01, each compared to its ``oracle_sql()`` with the
driver-style canonicalization (columns sorted by name, rows sorted
through pandas, order-insensitive value hash). The pandas row sort is
the step that crashed r10's ``feature_hashing_vectorize`` (ARRAY cells
are unhashable), so running this before round close catches
representation bugs the local parity harness' own canonicalizer may
tolerate.

Usage::

    python tools/driver_sim.py [--sf-dirs a,b,...] [--cap 50]
        [--oracle-threads default,1,32]

By default the window is swept at ALL THREE fixture scales
(sf0.001, sf0.01, sf0.1) — r11's kaplan_meier red was invisible at
the driver's own sf0.01 (no hour-boundary straddle in 85 durations)
and only reproduced at sf0.1, so a single-sf gate is not a gate.
Pass --sf-dirs /root/testdata/sf0.01 for the fast driver-exact run.

``--oracle-threads`` (r13, VERDICT r12 item 7) re-runs the ORACLE
side under explicit DuckDB ``SET threads=N`` settings: parallel
aggregate/window state assembly is a determinism axis on the oracle
side exactly as Spark partitioning is on ours, and the r12
``kaplan_meier`` red came from a driver DuckDB build assembling
windowed-list state in a different order than the local
single-config run. Only one DuckDB wheel ships in this environment,
so thread-count (plus the fold-reversal property gate in
tests/test_fold_order_invariance.py) is the available proxy for
"any build". Default sweeps ``default,1,32``.

Exit 1 if any window query fails rows/schema/hash or raises at any
swept scale under any oracle-threads setting.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True)
    rows = []
    for _, r in df.iterrows():
        cells = []
        for c in cols:
            v = r[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("N")
            elif isinstance(v, float):
                cells.append(f"{v:.9g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    digest = hashlib.md5("\n".join(sorted(rows)).encode()).hexdigest()
    return len(df), tuple(cols), digest


DEFAULT_SWEEP = (
    "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs",
        default=DEFAULT_SWEEP,
        help="comma-separated fixture dirs to sweep (default: all three)",
    )
    ap.add_argument("--sf-dir", default=None, help="alias: single dir")
    ap.add_argument("--cap", type=int, default=50)
    ap.add_argument(
        "--oracle-threads",
        default="default,1,32",
        help=(
            "comma list of DuckDB SET threads values for the oracle "
            "side; 'default' leaves the connection untouched"
        ),
    )
    args = ap.parse_args()
    sf_dirs = [args.sf_dir] if args.sf_dir else args.sf_dirs.split(",")
    thread_settings = [t.strip() for t in args.oracle_threads.split(",") if t.strip()]

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    # Parallelism is itself a determinism axis: a contract that leans
    # on partial-aggregation order would pass at one partition count
    # and fail at another. SPARK_GRAFT_SIM_MASTER/_PARTITIONS let the
    # gate re-run under a deliberately different layout (e.g.
    # local[3] / 7 partitions) to shake that class out.
    import os

    master = os.environ.get("SPARK_GRAFT_SIM_MASTER", "local[8]")
    parts = os.environ.get("SPARK_GRAFT_SIM_PARTITIONS", "8")
    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", parts)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = E.queries(), E.oracle_sql()
    window = list(qs)[: args.cap]
    failures = 0
    for sf_dir in sf_dirs:
        cons = []
        for setting in thread_settings:
            con = duckdb.connect()
            if setting != "default":
                con.execute(f"SET threads={int(setting)}")
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            cons.append((setting, con))
        sf_fail = 0
        for name in window:
            try:
                sp = qs[name](spark, sf_dir).toPandas()
                if name not in osql:
                    print(f"{name:40s} rows-only ({len(sp)} rows)")
                    continue
                a = _canon(sp)
                bad = False
                for setting, con in cons:
                    du = con.execute(osql[name]).fetchdf()
                    b = _canon(du)
                    if a != b:
                        bad = True
                        print(
                            f"{name:40s} [{sf_dir} threads={setting}]"
                            f" MISMATCH spark={a} oracle={b}"
                        )
                sf_fail += bad
            except Exception as e:  # noqa: BLE001 — the driver records errors too
                sf_fail += 1
                print(f"{name:40s} [{sf_dir}] ERROR {str(e)[:140]}")
        # The driver's own pass is single-sf; keep its summary line
        # per swept scale so "50/50 window queries green" stays
        # greppable.
        print(
            f"\n{len(window) - sf_fail}/{len(window)} window queries green"
            f" at {sf_dir} (oracle threads: {','.join(thread_settings)})"
        )
        failures += sf_fail
        for _s, con in cons:
            con.close()
        spark.catalog.clearCache()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
