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
# ROTATION (round 11, VERDICT r10 items 1-2): consolidation round — no
# registry growth; the window drains the never-checked backlog. Slots:
# (a) `feature_hashing_vectorize`, the single r10 driver-red (its CSR
# ARRAY output crashed the driver's canonicalizer; now emitted as
# comma-joined strings both engine- and oracle-side — the re-check
# confirms the fix); (b) `similarity_lsh_topk`, whose rows-only→oracle
# flip (r9) has never had a driver hash check (last driver runs r1/r7
# predate the flip); (c) 48 of the 55 never-checked r10 additions. The
# 7 that don't fit — each with a same-family sibling IN the window
# (streaming_cep_funnel shares its oracle with cep_funnel_first_match;
# zipf/burstiness ride with heaps_law_fit; join_size_estimate with
# range_partition_balance; hilbert_vs_morton with the spatial family;
# double_ewma with the time-series four; theil_sen with mann_kendall)
# — are pinned as the r12 head (COVERAGE.md). All 50 slots are
# oracle-bearing (INTENDED_ROWS_ONLY is empty). Local parity
# (tests/test_oracle_parity.py) covers the rotated-out tail with the
# identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- fix confirmations (the only two non-first-timer slots) --
    "feature_hashing_vectorize",
    "similarity_lsh_topk",
    # -- 48 of the 55 r10 additions, never driver-checked --
    "anova_oneway_f",
    "asof_join_nearest",
    "calibration_ece_bins",
    "capm_beta_by_type",
    "cep_funnel_first_match",
    "cluster_topic_terms",
    "clustering_coefficient_nodes",
    "cohort_ltv_curve",
    "containment_join_docs",
    "cramers_v_pairs",
    "dau_mau_stickiness",
    "decision_stump_split",
    "deletion_vector_scan",
    "diff_in_diff_promo",
    "domain_mixture_reweight",
    "dp_laplace_counts",
    "empirical_bayes_shrinkage",
    "expanding_holdout_backtest",
    "fdr_bh_segment_tests",
    "graph_degree_assortativity",
    "heaps_law_fit",
    "hybrid_rank_fusion",
    "jaccard_link_prediction",
    "kaplan_meier_survival",
    "knn_label_majority",
    "linear_interp_gapfill",
    "longest_daily_streak_users",
    "mann_kendall_trend",
    "max_drawdown_daily",
    "mutual_info_lang_source",
    "naive_bayes_lang_confusion",
    "ngram_novelty_docs",
    "pointintime_scd2_join",
    "propensity_stratified_att",
    "psi_population_stability",
    "quantile_regression_grid",
    "range_partition_balance",
    "record_linkage_fs",
    "seasonal_trend_decompose",
    "shapley_channel_attribution",
    "skyline_price_date_orders",
    "spearman_corr_qty_price",
    "sprt_sequential_ab",
    "streaming_scd2_upsert",
    "target_encoding_kfold",
    "vwap_cumulative_daily",
    "weighted_reservoir_topk",
    "welch_ttest_value_clicks",
)

# Pinned r12 head: the 7 never-checked names the r11 window couldn't
# absorb (each covered this round by a same-family in-window sibling
# plus local parity): streaming_cep_funnel, zipf_law_fit,
# burstiness_interarrival, join_size_estimate,
# hilbert_vs_morton_locality, double_ewma_forecast,
# theil_sen_slope_sampled.


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
