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
# r12: every re-check slot is deliberate — the two r11 reds after
# their exact-arithmetic fixes, the 24 other contracts migrated off
# libm (portable_math + floor-e6: CHANGED hash contracts, so their
# green history no longer applies), the two ADVICE decimal fixes, and
# 15 green re-confirmations filling the remaining slots (headliners +
# ordered-fold kin; nothing unchecked was displaced — the cumulative
# ledger is 341/341 once the 7 never-checked head names clear).
INTENDED_RECHECKS: set[str] = {
    # (b) r11 red fixes
    "kaplan_meier_survival",
    "cramers_v_pairs",
    # (c) libm-hardened contracts
    "mutual_info_lang_source",
    "psi_population_stability",
    "fdr_bh_segment_tests",
    "char_entropy_docs",
    "dsir_importance_sample",
    "pmi_collocations_topk",
    "stupid_backoff_trigram_lm",
    "bm25_keyword_search",
    "quality_classifier_inference",
    "doc_perplexity_unigram",
    "ccnet_perplexity_buckets",
    "naive_bayes_lang_confusion",
    "record_linkage_fs",
    "embedding_quantize_error",
    "tfidf_top_terms",
    "heaps_law_fit",
    "hll_overlap_users",
    "hll_verified_users_by_type",
    "profile_orders_approx",
    "dp_laplace_counts",
    "math_funcs_customer",
    "sprt_sequential_ab",
    "weighted_sample_docs",
    "weighted_reservoir_topk",
    # (d) ADVICE decimal-overflow fixes
    "spearman_corr_qty_price",
    "quantile_regression_grid",
    # (e) green re-confirmations
    "pricing_summary",
    "topk_orders",
    "group_count_mktsegment",
    "group_avg_acctbal",
    "anova_oneway_f",
    "welch_ttest_value_clicks",
    "mann_kendall_trend",
    "seasonal_trend_decompose",
    "capm_beta_by_type",
    "empirical_bayes_shrinkage",
    "knn_label_majority",
    "similarity_lsh_topk",
    "feature_hashing_vectorize",
    "cohort_ltv_curve",
    "asof_join_nearest",
}

# r12 window: every slot is oracle-bearing.
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
