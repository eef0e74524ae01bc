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
# ROTATION (round 6): r5 went 50/50 green, bringing the ledger to
# 192/235 queries driver-checked at least once. This window holds ALL
# 47 never-driver-checked names (the 43 r5 C99–C127 additions plus the
# four r6 additions: distributed-rank twins, Stupid Backoff LM, NFC
# audit; 40 oracle-bearing + the 7 declared rows-only carriers, so the
# ledger reaches 239/239 — full registry coverage) and 3 TPC-H-core
# re-checks. Local parity (tests/test_oracle_parity.py) covers the
# rotated-out tail with the identical compare.
_PRIORITY: tuple[str, ...] = (
    # -- r5 curation/quality additions, first-eligible now --
    "span_dedup_corpus",              # B54 B53 (Lee et al. span dedup)
    "gopher_quality_rules",           # B56
    "ccnet_perplexity_buckets",       # B56 B29 (per-lang NTILE buckets)
    "dsir_importance_sample",         # B56 B43 (now distributed top-k)
    "semdedup_embeddings",            # B54 B55 (cluster-pruned near-dup)
    "similarity_pq_adc",              # B55 (PQ + ADC search)
    "ivf_recall_fixed_cells",         # B55 (recall@5 hash-pinned)
    "cdc_chunk_boundaries",           # B56 B53 (content-defined chunking)
    "bpe_apply_tokenize",             # B56 B52 (BPE merge application)
    "char_entropy_docs",              # B56 B43
    "pmi_collocations_topk",          # B56 B16 (now distributed top-k)
    "url_canonical_dedup",            # B53 B39
    "image_ahash_neardup",            # B57 B54 (perceptual aHash blocks)
    "dataset_datasheet",              # B16 B18 B22 (per-source datasheet)
    # -- r5 sketch/scale additions --
    "kmv_distinct_users",             # B21 (KMV sketch replay)
    "countmin_heavy_hitters",         # B21 B16
    "quantile_hash_sample",           # B23 (hash-sample quantiles)
    "approx_topk_event_types",        # B21 B24
    "metadata_agg_pushdown",          # B1 (footer-only min/max/count)
    "partition_grouped_pushdown",     # B1 B16
    "runtime_bloom_filter_join",      # B10 B11 (bloom-pruned probe side)
    "histogram_acctbal_buckets",      # B16 B43
    "autocorrelation_lag1_events",    # B30 B18 (naive contrast carrier)
    "autocorrelation_lag1_distributed",  # B30 B18 (boundary-pair twin)
    "xml_extract_orders",             # B38 B39
    # -- r5 streaming additions --
    "streaming_stateful_totals",      # B44 B49 (RocksDB update-mode drain)
    "streaming_session_window_events",   # B48 B44
    "streaming_multibatch_rollup",    # B44 B45 (8 genuine micro-batches)
    # -- scalar/array surface first-timers --
    "bitwise_funcs_events",           # B43
    "array_hof_embeddings",           # B41
    "map_funcs_orders",               # B42
    "posexplode_tokens",              # B41 B56
    "explode_outer_long_words",       # B41 B56
    "supplier_part_counts",           # B16 B10
    "half_stock_suppliers",           # B13 B9
    "large_orders_customers",         # B16 B9 (TPC-H Q18 shape)
    # -- declared rows-only carriers: weaker rows-only driver check, by
    #    design (driver records them as no_oracle; ledger completeness) --
    "approx_percentiles_nchars",      # B23 (approx_percentile, no exact twin)
    "similarity_ivf_probed",          # B55 (nprobe sweep, ranking-only)
    "bpe_train_merges",               # B56 (driver-coordinated training)
    "embedding_pca_project",          # B55 B43 (sign-indeterminate basis)
    "hll_sketch_users_by_type",       # B21 (engine-native HLL internals)
    "kll_quantiles_value",            # B23 (KLL sketch, rank-error bound)
    "streaming_neardup_curation",     # B50 B54 (LSH probe of indexed corpus)
    # -- r6 additions (VERDICT r5 item 2 + new operators), first-eligible --
    "gini_revenue_distributed",       # B16 B18 B29 (range-partition rank)
    "decile_lift_distributed",        # B13 B16 B29 (closed-form NTILE cut)
    "stupid_backoff_trigram_lm",      # B56 B16 B10 B43 (Brants et al. 2007)
    "unicode_nfc_audit",              # B51 B56 B27 (UCD differential)
    # -- headline re-checks: bench core doubles as freshest-verified set --
    "pricing_summary",                # B17 B16 (TPC-H Q1)
    "star_join_wide",                 # B15 B10
    "join_inner_lineitem_orders",     # B10
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
