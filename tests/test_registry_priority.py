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


# r7 window: verification-freshness repair. After r6 the cumulative
# ledger reached 239/239, so EVERY slot except the one genuinely new
# query (profile_orders_approx) is an intended re-check: the r7
# changes (embedding_pca_project output fix, fuzzy_join_part_names
# compound blocking, streaming_session_window_events append drain),
# the two verification-stale repairs (doc_fingerprints: oracled since
# r2 but never driver-oracle-checked), the 15 headline bench queries
# last checked r1-r4, and the 30 longest-unchecked registry names.
INTENDED_RECHECKS: set[str] = {
    "embedding_pca_project",
    "doc_fingerprints",
    "fuzzy_join_part_names",
    "streaming_session_window_events",
    "top_revenue_nations",
    "join_left_customer_orders",
    "group_avg_acctbal",
    "topk_orders",
    "window_topk_orders_per_customer",
    "tumbling_window_events",
    "dedup_exact_documents",
    "dedup_minhash_pairs",
    "similarity_topk_cosine",
    "text_stats_by_lang",
    "asof_join_events",
    "grouped_zscore_events",
    "embedding_near_dup",
    "rollup_cascade_daily",
    "shipping_priority_top10",
    "filter_eq_events",
    "group_count_mktsegment",
    "cube_counts",
    "distinct_nation_segment",
    "union_all_orders",
    "except_nations",
    "join_broadcast_nation_region",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_theta_acctbal",
    "similarity_lsh_topk",
    "token_count_bpe",
    "quality_scores",
    "language_id_confusion",
    "date_parts_orders",
    "array_ops_embeddings",
    "math_funcs_customer",
    "project_filter_part",
    "global_agg_orders",
    "count_distinct_customers",
    "rollup_orders",
    "percentiles_nchars",
    "intersect_nations",
    "jaccard_adjacent_docs",
    "multimodal_pack",
    "dedup_cluster_canonical",
    "corpus_prep_pipeline",
    "to_timestamp_iso8601",
    "string_funcs_part",
    "rollup_incremental_merge",
}

# r7 window: the three rows-only carriers riding through are the fixed
# PCA projection (re-windowed per VERDICT r6 item 1 to replace the red
# r6 row with a clean one) and the two rows-only names in the
# longest-unchecked tail.
INTENDED_ROWS_ONLY: set[str] = {
    "embedding_pca_project",
    "dedup_minhash_pairs",
    "similarity_lsh_topk",
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
