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
# ROTATION (round 12, VERDICT r11 items 1-3 + 5): hardening round.
# Slots: (a) the 7 never-checked names pinned as the r12 head last
# round; (b) the two r11 driver reds, re-checked after their exact
# arithmetic fixes (`kaplan_meier_survival`: integer-microsecond
# durations + product-fold survival; `cramers_v_pairs`: 128-bit
# integer chi-square); (c) all 24 other queries whose hash contracts
# were migrated off libm this round (portable ln/exp, ordered folds,
# floor-1e6 quantization — operators/portable_math.py); (d) the two
# ADVICE-touched decimal-overflow fixes (values unchanged, re-checked
# anyway); (e) 15 previously-green re-confirmations, biased toward the
# bench headliners and the ordered-fold family. All 50 slots are
# oracle-bearing. Local parity (tests/test_oracle_parity.py) covers
# the rotated-out tail with the identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- (a) never driver-checked (pinned r12 head) --
    "streaming_cep_funnel",
    "zipf_law_fit",
    "burstiness_interarrival",
    "join_size_estimate",
    "hilbert_vs_morton_locality",
    "double_ewma_forecast",
    "theil_sen_slope_sampled",
    # -- (b) r11 red fixes --
    "kaplan_meier_survival",
    "cramers_v_pairs",
    # -- (c) libm-hardened contracts (r12 item 5) --
    "mutual_info_lang_source",
    "psi_population_stability",
    "fdr_bh_segment_tests",
    "char_entropy_docs",
    "dsir_importance_sample",
    "pmi_collocations_topk",
    "stupid_backoff_trigram_lm",
    "bm25_keyword_search",
    "quality_classifier_inference",
    "doc_perplexity_unigram",
    "ccnet_perplexity_buckets",
    "naive_bayes_lang_confusion",
    "record_linkage_fs",
    "embedding_quantize_error",
    "tfidf_top_terms",
    "heaps_law_fit",
    "hll_overlap_users",
    "hll_verified_users_by_type",
    "profile_orders_approx",
    "dp_laplace_counts",
    "math_funcs_customer",
    "sprt_sequential_ab",
    "weighted_sample_docs",
    "weighted_reservoir_topk",
    # -- (d) ADVICE decimal-overflow fixes (values unchanged) --
    "spearman_corr_qty_price",
    "quantile_regression_grid",
    # -- (e) green re-confirmations (headliners + ordered-fold kin) --
    "pricing_summary",
    "topk_orders",
    "group_count_mktsegment",
    "group_avg_acctbal",
    "anova_oneway_f",
    "welch_ttest_value_clicks",
    "mann_kendall_trend",
    "seasonal_trend_decompose",
    "capm_beta_by_type",
    "empirical_bayes_shrinkage",
    "knn_label_majority",
    "similarity_lsh_topk",
    "feature_hashing_vectorize",
    "cohort_ltv_curve",
    "asof_join_nearest",
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
