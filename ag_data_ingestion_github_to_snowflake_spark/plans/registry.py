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
# ``queries()``. This list pins an explicit order (guarded by
# tests/test_registry_priority.py): the current window UNION the
# cumulative ledger (CORRECTNESS_r*.json) must cover every SURVEY.md
# §2 operator id carried by the registry.
#
# ROTATION (round 5): r4 went 50/50 green, bringing the ledger to
# 142/206 queries driver-checked at least once. Every r5 slot is a
# FIRST-TIMER — all 50 are oracle-bearing names never yet in a driver
# window, led by the r4 late additions (bucketed join, HTML/PageRank,
# WARC, Arrow IPC, audio/video probes, verified HLL/MinHash twins).
# A green r5 raises cumulative coverage to 192/206; the remaining 14
# (9 oracled + 5 declared rows-only) are pinned for the r6 window in
# COVERAGE.md "Driver-check ledger" alongside re-checks of the sole-
# carrier core. Local parity (tests/test_oracle_parity.py) covers the
# tail in the meantime with the identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- r4 late additions: new operator families, first-eligible now --
    "bucketed_join_colocated",        # B10 B3 B16 (co-bucketed shuffle-free SMJ)
    "html_text_extract",              # B39 B40 B56
    "html_link_graph",                # B39 B16 B24 B56
    "pagerank_link_graph",            # B10 B16 B24 (exact integer PageRank)
    "arrow_ipc_roundtrip",            # B2 B3 B52 B16
    "warc_extract_records",           # B52 B2 B56
    "audio_tags",                     # B57 (Vorbis comments + ID3v2)
    "video_container_meta",           # B57 (ISO-BMFF box tree)
    "audio_container_meta",           # B57 (WAV/FLAC/MP3/OGG probes)
    "hll_verified_users_by_type",     # B21 B16 (bit-exact DuckDB HLL replay)
    "theta_join_rank_rewrite",        # B14 B31 (O(n log n) theta-count twin)
    "concurrent_intervals_distributed",  # B30 B31 (two-level prefix sum)
    "url_parse_components",           # B39 B36
    "dedup_minhash_verified",         # B54 (LSH recall replayed in DuckDB)
    "mmr_rerank_topk",                # B55 B52 B29 (greedy MMR via recursive CTE)
    # -- statistics / analytics first-timers --
    "try_funcs_orders",               # B37 B43
    "string_agg_nations_by_region",   # B16 B41 B36
    "assign_sequence_ids",            # B29 B24
    "ab_test_two_proportion_z",       # B18 B19 B43
    "funnel_time_to_convert",         # B16 B23
    "session_event_type_pairs",       # B10 B16 B26
    "fk_integrity_audit",             # B12 B16 B19
    "gini_revenue_concentration",     # B16 B18 B29
    "decile_lift_acctbal",            # B13 B16 B29
    "regr_trend_monthly_revenue",     # B18 B23 B33
    "robust_outlier_trim",            # B23 B16 B10
    "skew_diagnostic_orders",         # B16 B18
    "forecast_revenue_change",        # B18 B9
    # -- sampling / curation first-timers --
    "sample_documents_hash",          # B6 B9
    "train_test_split_counts",        # B16 B19
    "mixture_sample_counts",          # B16 B11 B19
    "quality_classifier_inference",   # B56 B43 B16
    "doc_perplexity_unigram",         # B56 B43 B16
    "provenance_dedup_priority",      # B53 B29 B26
    "split_leakage_audit",            # B54 B19 B10
    "passage_dedup_chunks",           # B53 B54
    "incremental_dedup_new_batch",    # B53 B13 B26
    # -- joins / windows / temporal first-timers --
    "argmax_order_per_segment",       # B16 B24 B10
    "join_full_outer_daily_activity", # B12 B16 B33
    "join_null_safe_priority",        # B10 B16
    "recursive_cte_chunk_threading",  # B10 B16
    "pipe_syntax_quality_funnel",     # B16 B24 B6
    "scd2_event_type_intervals",      # B29 B30 B32
    "concurrent_intervals_sweep",     # B30 B31
    "ewma_events_daily",              # B31 B33
    "top_acctbal_supplier_per_nation",  # B13 B29 B11
    # -- similarity / io first-timers --
    "similarity_ivf_topk",            # B55
    "zorder_morton_events",           # B43
    "orc_sink_roundtrip",             # B2 B3 B16
    "arrow_normalize_embeddings",     # B51 B41
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
