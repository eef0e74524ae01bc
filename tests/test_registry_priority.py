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


# r11 window: backlog-drain round (VERDICT r10 items 1-2). 48 slots are
# first-time evidence (never-checked r10 additions); the only intended
# re-checks are the two fix confirmations: `feature_hashing_vectorize`
# (r10 driver-red on output representation, now string-serialized CSR)
# and `similarity_lsh_topk` (first driver check since its rows-only →
# oracle flip in r9).
# r13: ledger-close round (VERDICT r12 items 1 + 3). The 6 head
# slots are the last never-driver-checked names; kaplan_meier rides
# after its contract re-shape; spearman/LAD re-check because the
# oracle TEXT changed (values did not); the remaining 41 slots drain
# the stalest greens (all last checked r05/r06), bounding the age of
# every query's latest driver evidence.
INTENDED_RECHECKS: set[str] = {
    # (b) r12 red, re-shaped to the BIGINT quantization recurrence
    "kaplan_meier_survival",
    # (c) oracle SQL text changed this round (spearman HUGEINT
    #     casts; LAD re-checked alongside as its window twin)
    "spearman_corr_qty_price",
    "quantile_regression_grid",
    # (d) stalest-green rotation: every name last checked r05/r06,
    #     so the oldest evidence in the cumulative ledger advances
    "ab_test_two_proportion_z",
    "argmax_order_per_segment",
    "arrow_normalize_embeddings",
    "assign_sequence_ids",
    "concurrent_intervals_distributed",
    "concurrent_intervals_sweep",
    "decile_lift_acctbal",
    "dedup_minhash_verified",
    "ewma_events_daily",
    "fk_integrity_audit",
    "forecast_revenue_change",
    "funnel_time_to_convert",
    "gini_revenue_concentration",
    "incremental_dedup_new_batch",
    "join_full_outer_daily_activity",
    "join_null_safe_priority",
    "mixture_sample_counts",
    "mmr_rerank_topk",
    "orc_sink_roundtrip",
    "passage_dedup_chunks",
    "pipe_syntax_quality_funnel",
    "provenance_dedup_priority",
    "recursive_cte_chunk_threading",
    "regr_trend_monthly_revenue",
    "robust_outlier_trim",
    "sample_documents_hash",
    "scd2_event_type_intervals",
    "session_event_type_pairs",
    "similarity_ivf_topk",
    "skew_diagnostic_orders",
    "split_leakage_audit",
    "string_agg_nations_by_region",
    "theta_join_rank_rewrite",
    "top_acctbal_supplier_per_nation",
    "train_test_split_counts",
    "try_funcs_orders",
    "url_parse_components",
    "zorder_morton_events",
    "autocorrelation_lag1_distributed",
    "approx_topk_event_types",
    "array_hof_embeddings",
}

# r13 window: every slot is oracle-bearing.
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
