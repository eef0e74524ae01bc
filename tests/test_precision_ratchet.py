"""Precision ratchet: every oracle-bearing registry query must have a
bit-exact entry in the committed PRECISION_AUDIT.json — and any query
ADDED since the artifact was generated is audited live here, so new
code cannot quietly start depending on the parity harness's
9-significant-digit float normalization (the r9 cdc_apply_changelog
lesson: locally green, genuinely 2e-6 apart).

Steady-state cost: zero live audits (the artifact covers everything);
adding a query without regenerating the artifact costs one live
differential for just that query.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

ROOT = Path(__file__).resolve().parent.parent
ARTIFACT = ROOT / "PRECISION_AUDIT.json"


def _artifact() -> dict:
    if not ARTIFACT.exists():
        return {}
    return json.loads(ARTIFACT.read_text())


def test_committed_artifact_is_all_bit_exact():
    bad = {
        n: rec
        for n, rec in _artifact().items()
        if rec.get("status") != "bit_exact"
    }
    assert not bad, f"non-bit-exact entries in PRECISION_AUDIT.json: {bad}"


def test_new_queries_are_bit_exact(spark):
    """Queries not yet in the artifact get a live full-precision
    differential (regenerate the artifact with tools/precision_audit.py
    to move them into the committed record)."""
    from tools.precision_audit import SF_DIR, audit_one
    from tests.oracle_harness import duckdb_connect

    known = set(_artifact())
    specs = {n: s for n, s in all_specs().items() if s.oracle}
    fresh = sorted(set(specs) - known)
    if not fresh:
        pytest.skip("artifact covers every oracle-bearing query")
    con = duckdb_connect(SF_DIR)
    try:
        results = {n: audit_one(spark, con, n, specs[n]) for n in fresh}
    finally:
        con.close()
    bad = {n: r for n, r in results.items() if r.get("status") != "bit_exact"}
    assert not bad, (
        f"new queries not bit-exact vs DuckDB (decimal-accumulate or fix): {bad}"
    )
