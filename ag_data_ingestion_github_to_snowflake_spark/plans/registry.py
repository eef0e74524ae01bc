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
# ROTATION (round 14): same ledger-closing policy as r13 (VERDICT r12
# items 1 + 3 precedent). Slots: (a) the 5 corpus-stats names born in
# the r13 partial-BUILD commit and never driver-checked; (b)
# kaplan_meier_survival — its oracle was restated this round as a
# recursive CTE (list-HOF-free, VERDICT r13 item 1; values verified
# identical at 3 scales) and it is the 3-round red the rewrite must
# clear IN THE DRIVER; (c) every contract whose execution path this
# round touched (simhash SQL-string vote, pagerank lazy checkpoints,
# profile_orders_approx repartition, cep kernel interior, the biggest
# cached-plan-flag movers) — values pinned identical locally, driver
# re-check anyway; (d) stalest greens — last driver-checked r06/r07 —
# so the oldest evidence in the cumulative ledger keeps advancing.
# All 50 slots are oracle-bearing. Local parity
# (tests/test_oracle_parity.py) covers the rotated-out tail with the
# identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- (a) never driver-checked (r13-born corpus stats) --
    "g2_keyness_by_source",
    "burrows_delta_sources",
    "chunked_ttr_docs",
    "oov_rate_by_source",
    "doclen_lognormal_fit",
    # -- (b) 3-round red; oracle restated as recursive CTE this round --
    "kaplan_meier_survival",
    # -- (c) r14-touched execution paths --
    "dedup_simhash_pairs",
    "pagerank_link_graph",
    "profile_orders_approx",
    "streaming_cep_funnel",
    "jaccard_link_prediction",
    "clustering_coefficient_nodes",
    "dau_mau_stickiness",
    "dedup_minhash_verified",
    # -- (d) stalest greens: last driver-checked r06/r07 --
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
