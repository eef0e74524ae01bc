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
# ROTATION (round 10): r9 went 50/50 full-pass, leaving exactly the 34
# r9-addition names never driver-checked. This window clears ALL of
# them (cumulative ledger hits 286/286 driver-checked on a green run),
# then refreshes the 7 TPC-H-gap analogs deferred from the r9 draw
# (last driver check r4), then the 9 stalest r5-cohort names. All 50
# slots are oracle-bearing (INTENDED_ROWS_ONLY is empty). Local parity
# (tests/test_oracle_parity.py) covers the rotated-out tail with the
# identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- the 34 r9 additions, never driver-checked (COVERAGE.md pin) --
    "bitmap_distinct_users_by_type",
    "bootstrap_ci_order_total",
    "cdc_apply_changelog",
    "contrastive_negative_sample",
    "cusum_changepoint_daily",
    "exact_auc_quality_english",
    "feature_hashing_vectorize",
    "hll_overlap_users",
    "inverted_index_and_query",
    "join_fanout_audit",
    "k_anonymity_audit",
    "ks_two_sample_value",
    "last_touch_attribution",
    "mann_whitney_value_clicks",
    "matryoshka_truncation_recall",
    "mix_shift_decomposition",
    "multi_touch_attribution",
    "ohlc_resample_events",
    "ordered_funnel_3step",
    "parquet_bloom_pointlookup",
    "partition_evolution_union",
    "quantile_transform_by_type",
    "randomized_response_debias",
    "retractable_rollup_maintenance",
    "rfm_segmentation_users",
    "rolling_distinct_users_7d",
    "seasonal_baseline_anomalies",
    "small_file_compaction",
    "spatial_grid_neighbors",
    "split_conformal_ols",
    "streaming_dlq_ingest",
    "streaming_drift_monitor",
    "table_checksum_orders",
    "twap_daily_value",
    # -- the 7 TPC-H-gap analogs deferred from r9 (last checked r4) --
    "profit_by_nation_year",
    "nation_volume_flows",
    "market_share_by_year",
    "customer_order_distribution",
    "top_supplier_revenue",
    "small_quantity_revenue",
    "waiting_suppliers",
    # -- stalest r5-cohort re-greens (last driver check r5) --
    "bucketed_join_colocated",
    "html_text_extract",
    "html_link_graph",
    "pagerank_link_graph",
    "arrow_ipc_roundtrip",
    "warc_extract_records",
    "audio_tags",
    "video_container_meta",
    "audio_container_meta",
)


def all_specs() -> dict[str, QuerySpec]:
    """Return the registry, priority names first (driver checks first 50)."""
    # Import side-effect modules here to avoid circular imports.
    from ag_data_ingestion_github_to_snowflake_spark.plans import (  # noqa: F401
        behavior_queries,
        core_relational,
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
