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


# r9 window: clear-the-ledger round (VERDICT r8 item 1). The head-8
# are the r8 additions that landed after the r8 window was drawn and
# have never been driver-checked — first-time evidence, not re-checks.
# Every other slot is an intended re-check of the oldest (r4) cohort:
# the 9 sole-carrier names first, then 33 more r4 names (7 TPC-H-gap
# analogs defer to r10 for slot budget).
INTENDED_RECHECKS: set[str] = {
    "filter_all_notnull_customer",
    "conditional_counts_orders",
    "limit_first_orders",
    "date_format_keys",
    "from_unixtime_reset",
    "nested_struct_flatten",
    "json_sink_roundtrip",
    "corrupt_json_quarantine",
    "sliding_window_events",
    "funnel_click_purchase_daily",
    "event_transition_matrix",
    "user_event_paths",
    "cumulative_distinct_users",
    "kfold_assign_documents",
    "pack_sequences_bins",
    "weighted_sample_docs",
    "temperature_mixture_sample",
    "stratified_topk_sample",
    "corpus_snapshot_diff",
    "ssjoin_prefix_jaccard",
    "dedup_simhash_pairs",
    "multimodal_image_features",
    "multimodal_decode_real",
    "embedding_quantize_error",
    "ngram_vocab_topk",
    "tfidf_top_terms",
    "similarity_topk_quantized",
    "similarity_ivf_quantized",
    "repetition_stats_docs",
    "incremental_dedup_bloom",
    "json_extract_props",
    "local_supplier_volume",
    "important_parts_share",
    "priority_shipping_case_counts",
    "returned_item_customers",
    "disjunctive_predicate_revenue",
    "streaming_tumbling_events",
    "streaming_interval_join_events",
    "window_rank_price",
    "window_distribution_acctbal",
    "window_value_funcs",
    "window_range_frame_orders",
}

# r9 window: every slot is oracle-bearing — no rows-only rides this
# round (the two r8 riders already have ledger evidence).
INTENDED_ROWS_ONLY: set[str] = set()


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
