"""Query registry: named QuerySpecs binding a PySpark builder to its
ANSI-SQL oracle twin.

This is the single source of truth behind ``__spark_entry__.queries()``
and ``oracle_sql()``. Each spec covers one or more operator ids from
``SURVEY.md §2`` (cited per spec). Oracle-parity rules (SURVEY §7.4):

- Money/double aggregates go through DECIMAL(18,2)/(18,6) before SUM so
  the arithmetic is *exact* and therefore identical in Spark and DuckDB
  regardless of partial-aggregation order; the final value is cast back
  to DOUBLE (deterministic IEEE conversion both sides).
- Averages are computed as exact decimal SUM cast to double, divided by
  COUNT — never engine-native AVG (whose intermediate types differ).
- Every LIMIT carries a total order with a unique tiebreak key.
- Computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ag_data_ingestion_github_to_snowflake_spark.catalog import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    survey_ids: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""
    # Set on deliberately NAIVE pedagogical carriers whose 100x scaling
    # is super-linear by construction: names the oracle-identical
    # distributed rewrite that is the actual scale path. Surfaced in
    # COVERAGE.md and the scale-curve report so no consumer mistakes
    # the carrier for the recommended plan; guarded by
    # tests/test_scale_guard.py (every measured alpha>1.3 query must
    # carry this tag, and the named twin must exist with the same
    # oracle).
    naive_twin_of: str | None = None


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ids: tuple[str, ...] = (),
    description: str = "",
    naive_twin_of: str | None = None,
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        doc_first_line = (fn.__doc__ or "").strip().splitlines()[0] if fn.__doc__ else ""
        _REGISTRY[name] = QuerySpec(
            name=name,
            build=fn,
            oracle=oracle,
            survey_ids=survey_ids,
            description=description or doc_first_line,
            naive_twin_of=naive_twin_of,
        )
        return fn

    return deco


# The correctness driver records at most the FIRST 50 entries of
# ``queries()``. This list pins an explicit order (guarded by
# tests/test_registry_priority.py): the current window UNION the
# cumulative ledger (CORRECTNESS_r*.json) must cover every SURVEY.md
# §2 operator id carried by the registry.
#
# ROTATION (round 13, VERDICT r12 items 1 + 3): close the ledger.
# Slots: (a) the 6 never-driver-checked names (the r12-born corpus
# stats + dictionary_encoding_audit); (b) kaplan_meier_survival after
# its re-shape to the pure-BIGINT per-step quantization recurrence
# (two rounds red on the float product fold); (c) the two contracts
# whose oracle SQL text changed this round (spearman's
# HUGEINT-before-multiply; values unchanged); (d) 41 stalest greens —
# every name last checked r05/r06 — so the oldest driver evidence in
# the cumulative ledger advances. All 50 slots are oracle-bearing.
# Local parity (tests/test_oracle_parity.py) covers the rotated-out
# tail with the identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- (a) never driver-checked (pinned r13 head, VERDICT r12 item 3) --
    "fightin_words_contrast",
    "kl_divergence_sources",
    "platt_scaling_grid",
    "entropy_rate_bigram",
    "js_divergence_lang_pairs",
    "dictionary_encoding_audit",
    # -- (b) r12 red, re-shaped to the pure-BIGINT quantization
    #    recurrence (VERDICT r12 item 1) --
    "kaplan_meier_survival",
    # -- (c) oracle text touched this round (values unchanged:
    #    HUGEINT-before-multiply in spearman's oracle; re-check
    #    anyway since the SQL string changed) --
    "spearman_corr_qty_price",
    "quantile_regression_grid",
    # -- (d) stalest greens: last driver-checked r05/r06; the window
    #    re-confirms the oldest evidence first so every query's
    #    latest-green age stays bounded --
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
)


def all_specs() -> dict[str, QuerySpec]:
    """Return the registry, priority names first (driver checks first 50)."""
    # Import side-effect modules here to avoid circular imports.
    from ag_data_ingestion_github_to_snowflake_spark.plans import (  # noqa: F401
        behavior_queries,
        core_relational,
        corpus_stats_queries,
        curation_queries,
        inference_queries,
        joins,
        llm_ops,
        reshape_queries,
        sampling_queries,
        semantic_queries,
        scalar_funcs,
        scale_ops,
        sketch_queries,
        sql_surface,
        temporal_queries,
        tpch_gaps,
        tpch_like,
        udf_io_queries,
        streaming_queries,
        web_queries,
        windows_queries,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand: load one fixture table."""
    return load_table(spark, sf_dir, name)
