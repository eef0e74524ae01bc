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
    # -- r7 window: verification-freshness repair (VERDICT r6 item 2) --
    # Head: the r7 changes + the two verification-stale repairs;
    # then the 15 headline bench queries last driver-checked in
    # r1-r4 (the 3 checked r6 stay out); then the 30 longest-
    # unchecked registry names (all r1/r2), oldest first.
    "embedding_pca_project",  # r6 red row fixed: exploded scalar output
    "doc_fingerprints",  # only oracled query never driver-oracle-checked
    "profile_orders_approx",  # NEW r7: HLL sketch profile twin
    "fuzzy_join_part_names",  # r7 change: compound blocking key
    "streaming_session_window_events",  # r7 change: append-mode flush drain
    # -- stale headline bench queries (freshest-verified bench core) --
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
    # -- longest-unchecked: every r1-checked name not already above --
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
    # -- then the oldest r2-checked names, registry order --
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
