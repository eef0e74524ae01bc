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
# ROTATION (round 6): r5 went 50/50 green, bringing the ledger to
# 192/235 queries driver-checked at least once. This window holds ALL
# 47 never-driver-checked names (the 43 r5 C99–C127 additions plus the
# four r6 additions: distributed-rank twins, Stupid Backoff LM, NFC
# audit; 40 oracle-bearing + the 7 declared rows-only carriers, so the
# ledger reaches 239/239 — full registry coverage) and 3 TPC-H-core
# re-checks. Local parity (tests/test_oracle_parity.py) covers the
# rotated-out tail with the identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- r8 window: steady-state freshness (VERDICT r7 item 6) --
    # Head: two r8 additions (frozen-axis PCA projection twin,
    # Lloyd-trained IVF recall); then the 3 headline bench queries
    # last driver-checked r6; then EVERY name whose last driver check
    # is r2 (9) or r3 (34), oldest cohorts first; the final 2 slots
    # are the other two r8 additions (forward as-of, MAD outliers).
    # After a green r8 no query's last driver check is older than r4.
    "embedding_pca_project_verified",  # NEW r8: oracle-verified PCA projection
    "similarity_ivf_trained",  # NEW r8: Lloyd IVF end-to-end recall contract
    # -- headline queries last checked r6 --
    "pricing_summary",
    "star_join_wide",
    "join_inner_lineitem_orders",
    # -- every name last driver-checked in r2 --
    "order_priority_exists",
    "range_join_bucketed",
    "promo_revenue_share",
    "salted_group_sum",
    "window_lag_lead_orders",
    "window_moving_avg_events",
    "session_window_events",
    "streaming_dedup_events",
    "weighted_avg_udaf_parts",
    # -- every name last driver-checked in r3 --
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
    # -- the other two r8 additions (first-time driver evidence) --
    "asof_join_forward_tolerance",
    "mad_outliers_events",
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
