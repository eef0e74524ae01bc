"""Registry-wide physical-plan audit as a CI gate (SURVEY §7: every
operator must carry a scale-correct plan, not just a correct answer).

Red flags = CartesianProduct, BroadcastNestedLoopJoin (outside the
documented allowlist), or row-at-a-time Python eval (BatchEvalPython).
See tools/plan_audit.py for the rationale per flag.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.plan_audit import run_audit  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_no_plan_red_flags(spark):
    results = run_audit(spark, SF_DIR)
    flagged = {n: r["flags"] for n, r in results.items() if r["flags"]}
    assert not flagged, f"scale red flags in plans: {flagged}"
    # the sweep must actually cover the registry (guard against an
    # import failure silently auditing nothing)
    assert len(results) > 70


def test_broadcast_joins_present_where_expected(spark):
    """Dim-table joins must broadcast (no shuffle of the small side)."""
    results = run_audit(spark, SF_DIR)
    for name in ("top_revenue_nations", "star_join_wide", "join_broadcast_nation_region"):
        assert results[name]["broadcasts"] >= 1, name
