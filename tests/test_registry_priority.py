"""Guard the driver-facing registry order.

The correctness driver records at most the first 50 entries of
``__spark_entry__.queries()``. These tests pin the invariant that those
first 50 jointly cover every SURVEY.md §2 operator id any registry query
carries, so no operator is driver-unchecked merely because its carrier
registered late (the round-1 failure mode).
"""

from __future__ import annotations

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import (
    _PRIORITY,
    all_specs,
)

DRIVER_CAP = 50


def test_priority_names_exist_and_lead():
    specs = all_specs()
    names = list(specs)
    missing = [n for n in _PRIORITY if n not in specs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert names[: len(_PRIORITY)] == list(_PRIORITY)


def test_first_50_cover_every_survey_id():
    specs = all_specs()
    names = list(specs)
    all_ids = {sid for s in specs.values() for sid in s.survey_ids}
    head_ids = {
        sid for n in names[:DRIVER_CAP] for sid in specs[n].survey_ids
    }
    assert head_ids == all_ids, f"uncovered past cap: {sorted(all_ids - head_ids)}"


def test_first_50_mostly_oracle_checked():
    """Rows-only entries in the head should be the two declared-by-design
    sketch ops (approx_count_distinct, MinHash pair generation)."""
    specs = all_specs()
    head = list(specs)[:DRIVER_CAP]
    rows_only = {n for n in head if specs[n].oracle is None}
    assert rows_only <= {"approx_distinct_users", "dedup_minhash_pairs"}, rows_only
