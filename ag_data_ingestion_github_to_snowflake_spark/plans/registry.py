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
# ROTATION (round 9): r8 went 48/50 full-pass (2 declared rows-only
# rode along), leaving exactly 8 registry names never driver-checked.
# This window clears them and refreshes the oldest (r4) cohort. Local
# parity (tests/test_oracle_parity.py) covers the rotated-out tail
# with the identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- r9 window (pinned in COVERAGE.md:365 at the r8 boundary) --
    # Head: the 8 r8 additions that landed after the r8 window was
    # drawn and have NEVER been driver-checked (local parity green);
    # a green r9 brings the cumulative ledger to 252/252. Then the
    # 9 sole-carrier names (each the ONLY registry carrier of some
    # SURVEY ids) whose last driver check is r4, then the rest of the
    # r4 cohort oldest-first. 7 TPC-H-gap analogs with heavy sibling
    # join/agg coverage (profit_by_nation_year .. waiting_suppliers)
    # defer to r10 for slot budget. All 50 slots are oracle-bearing.
    "benford_first_digit_orders",
    "corr_matrix_lineitem",
    "drift_chi2_events",
    "equidepth_histogram_totalprice",
    "ols_price_by_quantity",
    "scd2_customer_history",
    "streaming_enriched_rollup",
    "weighted_median_lineitem",
    # -- sole-carrier core, last checked r4 --
    "filter_all_notnull_customer",
    "conditional_counts_orders",
    "limit_first_orders",
    "date_format_keys",
    "from_unixtime_reset",
    "nested_struct_flatten",
    "json_sink_roundtrip",
    "corrupt_json_quarantine",
    "sliding_window_events",
    # -- rest of the r4 cohort (last driver check r4) --
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
)


def all_specs() -> dict[str, QuerySpec]:
    """Return the registry, priority names first (driver checks first 50)."""
    # Import side-effect modules here to avoid circular imports.
    from ag_data_ingestion_github_to_snowflake_spark.plans import (  # noqa: F401
        behavior_queries,
        core_relational,
        curation_queries,
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
