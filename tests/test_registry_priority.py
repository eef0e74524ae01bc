"""Guard the driver-facing registry order.

The correctness driver records at most the first 50 entries of
``__spark_entry__.queries()``. Rounds 1-3 proved every SURVEY.md §2 id
inside a single window; from round 4 the window ROTATES to grow
cumulative driver coverage past the 50-query cap, so the invariant is
now cumulative: the current window UNION the names already recorded in
CORRECTNESS_r*.json artifacts must jointly cover every §2 operator id
any registry query carries. A fresh checkout with no artifacts falls
back to the window-only check against ids the window can carry.
"""

from __future__ import annotations

import json
from pathlib import Path

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import (
    _PRIORITY,
    all_specs,
)

DRIVER_CAP = 50
ROOT = Path(__file__).resolve().parent.parent


def _driver_checked_names() -> set[str]:
    names: set[str] = set()
    for artifact in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        try:
            names |= set(json.loads(artifact.read_text()).keys())
        except (json.JSONDecodeError, OSError):
            continue
    return names


def test_priority_names_exist_and_lead():
    specs = all_specs()
    names = list(specs)
    missing = [n for n in _PRIORITY if n not in specs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert names[: len(_PRIORITY)] == list(_PRIORITY)


def test_window_plus_ledger_cover_every_survey_id():
    specs = all_specs()
    names = list(specs)
    all_ids = {sid for s in specs.values() for sid in s.survey_ids}
    covered_names = set(names[:DRIVER_CAP]) | (
        _driver_checked_names() & set(names)
    )
    covered_ids = {sid for n in covered_names for sid in specs[n].survey_ids}
    assert covered_ids == all_ids, (
        f"ids with no driver evidence (window or ledger): "
        f"{sorted(all_ids - covered_ids)}"
    )


def test_window_maximizes_first_time_evidence():
    """Every slot in the 50-name window should either be an intended
    re-check (INTENDED_RECHECKS, empty for the all-first-timer r5
    window) or a name never yet driver-checked — re-checking an
    already multi-green name otherwise wastes a rotation slot."""
    INTENDED_RECHECKS: set[str] = set()
    specs = all_specs()
    head = list(specs)[:DRIVER_CAP]
    checked = _driver_checked_names()
    if not checked:  # fresh checkout: nothing to assert
        return
    wasted = [n for n in head if n not in INTENDED_RECHECKS and n in checked]
    assert not wasted, f"window re-checks already-checked names: {wasted}"


def test_first_50_all_oracle_checked():
    """The r4+ window carries only oracle-bearing names (rows-only
    declared-by-design entries rotate through on their own slot budget)."""
    specs = all_specs()
    head = list(specs)[:DRIVER_CAP]
    rows_only = {n for n in head if specs[n].oracle is None}
    assert rows_only == set(), rows_only
