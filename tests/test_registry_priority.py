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
# r13: ledger-close round (VERDICT r12 items 1 + 3): 6 never-checked
# head slots + kaplan_meier re-shape + 2 oracle-text re-checks + 41
# stalest greens.
# r14: same policy. kaplan_meier re-checks because its ORACLE was
# restated as a recursive CTE (VERDICT r13 item 1 — the 3-round driver
# red the rewrite must clear); 8 slots re-check contracts whose
# EXECUTION PATH this round touched (simhash SQL-string vote, pagerank
# lazy checkpoints, profile_orders_approx repartition, cep kernel
# interior, the biggest cached-plan-flag movers) — values pinned
# identical locally, driver confirmation wanted; the remaining 36
# slots drain the stalest greens (last checked r06/r07).
INTENDED_RECHECKS: set[str] = {
    # (b) 3-round red; oracle restated as recursive CTE in r14
    "kaplan_meier_survival",
    # (c) r14-touched execution paths
    "dedup_simhash_pairs",
    "pagerank_link_graph",
    "profile_orders_approx",
    "streaming_cep_funnel",
    "jaccard_link_prediction",
    "clustering_coefficient_nodes",
    "dau_mau_stickiness",
    "dedup_minhash_verified",
    # (d) stalest-green rotation: last driver-checked r06/r07
    "autocorrelation_lag1_events",
    "bitwise_funcs_events",
    "bpe_apply_tokenize",
    "cdc_chunk_boundaries",
    "countmin_heavy_hitters",
    "dataset_datasheet",
    "decile_lift_distributed",
    "explode_outer_long_words",
    "gini_revenue_distributed",
    "gopher_quality_rules",
    "half_stock_suppliers",
    "histogram_acctbal_buckets",
    "image_ahash_neardup",
    "ivf_recall_fixed_cells",
    "kmv_distinct_users",
    "large_orders_customers",
    "map_funcs_orders",
    "metadata_agg_pushdown",
    "partition_grouped_pushdown",
    "posexplode_tokens",
    "quantile_hash_sample",
    "runtime_bloom_filter_join",
    "semdedup_embeddings",
    "similarity_pq_adc",
    "span_dedup_corpus",
    "streaming_multibatch_rollup",
    "streaming_stateful_totals",
    "supplier_part_counts",
    "unicode_nfc_audit",
    "url_canonical_dedup",
    "xml_extract_orders",
    "array_ops_embeddings",
    "asof_join_events",
    "corpus_prep_pipeline",
    "count_distinct_customers",
    "cube_counts",
}

# r14 window: every slot is oracle-bearing.
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
