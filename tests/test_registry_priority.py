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


def _artifact_name_sets() -> list[set[str]]:
    sets: list[set[str]] = []
    for artifact in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        try:
            sets.append(set(json.loads(artifact.read_text()).keys()))
        except (json.JSONDecodeError, OSError):
            continue
    return sets


def _driver_checked_names() -> set[str]:
    names: set[str] = set()
    for s in _artifact_name_sets():
        names |= s
    return names


def _checked_before_current_window(head: list[str]) -> set[str]:
    """Ledger names EXCLUDING any artifact that is exactly the current
    window's own result.

    The driver writes CORRECTNESS_rN.json after the builder's final
    commit, so at every round boundary the newest artifact records
    precisely the pinned head-50 — which made the r4 and r5 freshness
    guards trip on their own (already successful) window. An artifact
    whose key set equals the current head is this window's result, not
    prior evidence, and is exempt.
    """
    head_set = set(head)
    names: set[str] = set()
    for s in _artifact_name_sets():
        # Subset, not equality: a driver run that aborted partway
        # records fewer than 50 keys but is still this window's own
        # result, not prior evidence.
        if s and s <= head_set:
            continue
        names |= s
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


# r8 window: steady-state freshness (VERDICT r7 item 6). Every slot
# except the four genuinely new r8 queries
# (embedding_pca_project_verified, similarity_ivf_trained,
# asof_join_forward_tolerance, mad_outliers_events) is an intended
# re-check: the 3 headline queries last checked r6, then all 9
# r2-cohort and all 34 r3-cohort names (oldest first). After a green
# r8 no query's last driver check is older than r4.
INTENDED_RECHECKS: set[str] = {
    "pricing_summary",
    "star_join_wide",
    "join_inner_lineitem_orders",
    "order_priority_exists",
    "range_join_bucketed",
    "promo_revenue_share",
    "salted_group_sum",
    "window_lag_lead_orders",
    "window_moving_avg_events",
    "session_window_events",
    "streaming_dedup_events",
    "weighted_avg_udaf_parts",
    "approx_distinct_users",
    "bm25_keyword_search",
    "stats_corr_quantity_price",
    "leakage_safe_split_clusters",
    "sessionize_events_gaps",
    "gapfill_hourly_events",
    "variant_extract_events",
    "streaming_corpus_curation",
    "weekly_cohort_retention",
    "conditional_scalar_funcs",
    "setops_all_variants",
    "stratified_sample_by_lang",
    "lateral_top_nations_per_region",
    "idle_rich_customers",
    "csv_sink_roundtrip",
    "pii_redaction_docs",
    "per_domain_cap",
    "unpivot_customer_metrics",
    "grouping_sets_orders",
    "struct_pack_events",
    "winnowing_fingerprints",
    "date_arith_orders",
    "profile_orders_columns",
    "expectations_orders",
    "skew_join_revenue_by_segment",
    "pivot_priority_by_year",
    "similarity_ivf_persisted",
    "training_shuffle_shards",
    "incremental_join_refresh",
    "udtf_split_sentences",
    "schema_evolution_merge",
    "graph_triangle_count",
    "decontaminate_train_eval",
    "bloom_prefilter_join",
}

# r8 window: two rows-only rides — the new Lloyd-trained IVF recall
# query (accuracy contract in tests/test_operators.py) and the
# r3-cohort HLL estimate re-check.
INTENDED_ROWS_ONLY: set[str] = {
    "similarity_ivf_trained",
    "approx_distinct_users",
}


def test_window_maximizes_first_time_evidence():
    """Every slot in the 50-name window should either be an intended
    re-check (INTENDED_RECHECKS) or a name never driver-checked BEFORE
    this window — re-checking an already multi-green name otherwise
    wastes a rotation slot. Evidence from the current window's own
    CORRECTNESS artifact (written by the driver after the final commit)
    is exempt, so the round boundary no longer reddens this guard."""
    specs = all_specs()
    head = list(specs)[:DRIVER_CAP]
    checked = _checked_before_current_window(head)
    if not checked:  # fresh checkout: nothing to assert
        return
    wasted = [n for n in head if n not in INTENDED_RECHECKS and n in checked]
    assert not wasted, f"window re-checks already-checked names: {wasted}"


def test_first_50_all_oracle_checked():
    """Window slots are oracle-bearing except the explicitly budgeted
    rows-only carriers (INTENDED_ROWS_ONLY) rotating through for
    ledger completeness."""
    specs = all_specs()
    head = list(specs)[:DRIVER_CAP]
    rows_only = {n for n in head if specs[n].oracle is None}
    assert rows_only == INTENDED_ROWS_ONLY, rows_only
