"""Bit-exact differential audit: Spark vs DuckDB values compared at
FULL float precision, not the 9-significant-digit normalization the
parity harness (and, as far as observable, the driver) applies.

Why: round-6 output contracts only guarantee 6 DECIMAL PLACES of
agreement when the underlying double math is itself identical; a
billion-scale SUM(double) carries ~1e-6 of association error, which
9-sig-digit hashing silently forgives (r9 caught cdc_apply_changelog
exactly this way — locally green, genuinely 2e-6 apart). Queries that
are bit-exact here can never drift against ANY compare tolerance;
queries that are not are listed with their worst absolute cell delta
so the tolerance they rely on is an explicit, known quantity.

Usage: python tools/precision_audit.py [name ...]   (default: all
oracle-bearing queries; writes PRECISION_AUDIT.json)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
from ag_data_ingestion_github_to_snowflake_spark.session import get_spark
from tests.oracle_harness import duckdb_connect

SF_DIR = "/root/testdata/sf0.01"


def audit_one(spark, con, name, spec) -> dict:
    sp = spec.build(spark, SF_DIR).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    # canonicalize nested cells (arrays/structs arrive as ndarray /
    # list / dict, which pandas can neither hash nor sort): a repr on
    # a plain-python conversion is exact for ints/strings; nested
    # FLOATS would be hidden behind repr, so flag them instead of
    # silently passing (no current query nests floats).
    def _canon(frame):
        for c in frame.columns:
            if frame[c].dtype == object:
                frame[c] = frame[c].map(
                    lambda v: repr(_plain(v)) if isinstance(v, (list, dict, np.ndarray, tuple)) else v
                )
        return frame

    def _plain(v):
        if isinstance(v, np.ndarray):
            v = v.tolist()
        if isinstance(v, (list, tuple)):
            return [_plain(x) for x in v]
        if isinstance(v, dict):
            return {k: _plain(x) for k, x in v.items()}
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating, float)):
            raise TypeError("nested float cell: repr-canon would hide precision")
        return v

    sp, du = _canon(sp), _canon(du)
    key = sorted(sp.columns)
    if sorted(du.columns) != key:
        return {"status": "columns_differ"}
    sp = sp[key].sort_values(key).reset_index(drop=True)
    du = du[key].sort_values(key).reset_index(drop=True)
    if len(sp) != len(du):
        return {"status": "rows_differ", "spark": len(sp), "duck": len(du)}
    try:
        du = du.astype(sp.dtypes.to_dict())
    except (TypeError, ValueError):
        pass
    if sp.equals(du):
        return {"status": "bit_exact"}
    worst = 0.0
    ncells = 0
    for c in key:
        a, b = sp[c], du[c]
        if a.dtype.kind == "f" and b.dtype.kind == "f":
            d = (a - b).abs()
            d = d[~(a.isna() & b.isna())].fillna(np.inf)
            bad = d[d > 0]
            if len(bad):
                ncells += int(len(bad))
                worst = max(worst, float(bad.max()))
        else:
            neq = (a != b) & ~(a.isna() & b.isna())
            if neq.any():
                return {"status": "non_float_mismatch", "column": c}
    return {"status": "float_delta", "cells": ncells, "worst_abs": worst}


def main() -> None:
    spark = get_spark("precision-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(SF_DIR)
    specs = {n: s for n, s in all_specs().items() if s.oracle}
    names = sys.argv[1:] or sorted(specs)
    out: dict[str, dict] = {}
    for name in names:
        try:
            out[name] = audit_one(spark, con, name, specs[name])
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            out[name] = {"status": "error", "detail": str(e)[:150]}
        spark.catalog.clearCache()  # drop persist() residue between queries
        tag = out[name]["status"]
        if tag != "bit_exact":
            print(f"{name:40s} {out[name]}")
    exact = sum(1 for v in out.values() if v["status"] == "bit_exact")
    print(f"\n{exact}/{len(out)} bit-exact")
    dest = ROOT / "PRECISION_AUDIT.json"
    if sys.argv[1:] and dest.exists():
        merged = json.loads(dest.read_text())
        merged.update(out)
        out = merged
    (ROOT / "PRECISION_AUDIT.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
