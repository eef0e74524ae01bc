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

    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] [--cap 50]

Exit 1 if any window query fails rows/schema/hash or raises.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cap", type=int, default=50)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs, osql = E.queries(), E.oracle_sql()
    window = list(qs)[: args.cap]
    failures = 0
    for name in window:
        try:
            sp = qs[name](spark, args.sf_dir).toPandas()
            if name not in osql:
                print(f"{name:40s} rows-only ({len(sp)} rows)")
                continue
            du = con.execute(osql[name]).fetchdf()
            a, b = _canon(sp), _canon(du)
            if a == b:
                continue
            failures += 1
            print(f"{name:40s} MISMATCH spark={a} oracle={b}")
        except Exception as e:  # noqa: BLE001 — the driver records errors too
            failures += 1
            print(f"{name:40s} ERROR {str(e)[:140]}")
    print(f"\n{len(window) - failures}/{len(window)} window queries green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
