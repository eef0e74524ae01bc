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


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ids: tuple[str, ...] = (),
    description: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        doc_first_line = (fn.__doc__ or "").strip().splitlines()[0] if fn.__doc__ else ""
        _REGISTRY[name] = QuerySpec(
            name=name,
            build=fn,
            oracle=oracle,
            survey_ids=survey_ids,
            description=description or doc_first_line,
        )
        return fn

    return deco


# The correctness driver records at most the FIRST 50 entries of
# ``queries()``. This list pins an explicit order whose first 50 names
# jointly cover every SURVEY.md §2 operator id carried by the registry
# (guarded by tests/test_registry_priority.py).
#
# ROTATION (round 3, amended in-round): the window is re-drawn each
# round so cumulative
# driver-verified coverage grows past the 50-query cap. The r3 window
# keeps the 15 r2-green names that are the SOLE §2-id carriers (their
# ids have no other oracle-bearing query), re-covers every other id
# with never-driver-checked carriers, and fills the remaining slots
# with more never-checked names — 35 of the 50 are first-time entries;
# every name rotated out stayed green in r1/r2 and remains verified by
# the local parity suite each round. The cumulative per-round ledger is
# the "Driver-check ledger" section of COVERAGE.md
# (tools/gen_coverage.py reads CORRECTNESS_r*.json).
_PRIORITY: tuple[str, ...] = (
    # -- retained r2-green sole carriers of their §2 ids --
    "filter_all_notnull_customer",  # B7 B8 A12
    "conditional_counts_orders",    # B19 A13
    "approx_distinct_users",        # B21 (rows-only by design)
    "limit_first_orders",           # B25 A11
    "date_format_keys",             # B33 B36 A16 A19
    "from_unixtime_reset",          # B35 A17
    "json_extract_props",           # B38 A18
    "json_sink_roundtrip",          # B2 B3 A6
    "nested_struct_flatten",        # B5 B4 A10
    "corrupt_json_quarantine",      # A14 B2 B19 (PERMISSIVE quarantine)
    "sliding_window_events",        # B47
    "streaming_tumbling_events",    # B44 B46 A22
    "streaming_interval_join_events",  # B44 B49 (stream-stream join)
    "multimodal_image_features",    # B57 B51 B52
    # -- first-time names that re-cover the remaining §2 ids --
    "bm25_keyword_search",          # B56 B24 B16 B11
    "stats_corr_quantity_price",    # B23 B18 B43
    "leakage_safe_split_clusters",  # B54 B55 B26
    "sessionize_events_gaps",       # B48 B30 B31
    "fuzzy_join_part_names",        # B10 B29 B39
    "gapfill_hourly_events",        # B46 B41 B12
    "variant_extract_events",       # B38 B5 B37
    "streaming_corpus_curation",    # B50 B44 B53
    "weekly_cohort_retention",      # B16 B20 B33
    "conditional_scalar_funcs",     # B36 B43 B9
    "setops_all_variants",          # B28 B27
    "stratified_sample_by_lang",    # B6 B19
    "lateral_top_nations_per_region",  # B14 B15 B24
    "idle_rich_customers",          # B13 B18 B17
    "csv_sink_roundtrip",           # B2 B3 B16
    "pii_redaction_docs",           # B40 B56
    "per_domain_cap",               # B29 B32 B6
    "unpivot_customer_metrics",     # B27 B4
    "grouping_sets_orders",         # B22
    "struct_pack_events",           # B42 B38 (constructors, JSON-pinned oracle)
    "winnowing_fingerprints",       # B56 B41 (engine-exact fingerprint index)
    "date_arith_orders",            # B33 B34
    "profile_orders_columns",       # B18 B20 A15
    "expectations_orders",          # A12 B19
    # -- first-time fills (extra evidence breadth) --
    "rollup_cascade_daily",         # B46 B18 B27 (headline query)
    "skew_join_revenue_by_segment", # B10 B16 (skew path)
    "pivot_priority_by_year",       # B22 B19
    "multimodal_decode_real",       # B57 (real decode incl. PNG defilter + GIF LZW paths)
    "similarity_ivf_persisted",     # B55 B3 (persisted cell-partitioned index)
    "training_shuffle_shards",      # B24 B29 B6 (seeded epoch shuffle)
    "incremental_join_refresh",     # B10 B16 B27 (delta-join view maintenance)
    "udtf_split_sentences",         # B51 B52 B40 (Arrow Python UDTF)
    "schema_evolution_merge",       # B1 B3 B7 (mergeSchema round-trip)
    "graph_triangle_count",         # B10 B16
    "decontaminate_train_eval",     # B54 B41
    "bloom_prefilter_join",         # B10 B11 (runtime bloom join pruning)
    # -- past the 50-cap; driver-checked in a later rotation --
    "project_filter_part",          # B1 B4 B9 (r1+r2 green, rotated out)
    "assign_sequence_ids",          # B29 (scale-safe id assignment)
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
        scalar_funcs,
        scale_ops,
        sketch_queries,
        sql_surface,
        temporal_queries,
        tpch_gaps,
        tpch_like,
        udf_io_queries,
        streaming_queries,
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
