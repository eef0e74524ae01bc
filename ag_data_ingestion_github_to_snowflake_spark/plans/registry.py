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
# ROTATION (round 4): the window is re-drawn each round so cumulative
# driver-verified coverage grows past the 50-query cap. Through r3 the
# ledger shows 107/192 queries driver-checked at least once. The r4
# window keeps the 14-name core of sole §2-id carriers (every other id
# stays cumulatively green via the COVERAGE.md ledger) and fills the
# remaining 36 slots with never-driver-checked, oracle-bearing names —
# spread across TPC-H analogs, window functions, behavior analytics,
# sampling/curation, similarity, text, and dedup so a single failure
# mode can't sink the round. `multimodal_decode_real` replaces the
# rows-only `approx_distinct_users` core slot (B21 stays covered by its
# r1-r3 rows; the decode query re-verifies B57 with the new FLAC rows).
# The ~49 still-unchecked names (43 oracled + 6 declared rows-only)
# close out in the r5 window. Cumulative per-round ledger: COVERAGE.md
# "Driver-check ledger" (tools/gen_coverage.py reads CORRECTNESS_r*.json).
_PRIORITY: tuple[str, ...] = (
    # -- retained green sole carriers of their §2 ids --
    "filter_all_notnull_customer",  # B7 B8 A12
    "conditional_counts_orders",    # B19 A13
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
    "multimodal_decode_real",       # B57 (real decode; r4 adds FLAC audio rows)
    "dedup_simhash_pairs",          # B54 (r4: flipped rows-only -> sha2-replayed oracle)
    # -- first-time: TPC-H analog suite --
    "shipping_priority_top10",      # B15 B24 (TPC-H Q3)
    "market_share_by_year",         # B11 B15 B19 (TPC-H Q8)
    "profit_by_nation_year",        # B15 B16 B33 (TPC-H Q9)
    "local_supplier_volume",        # B11 B15 B16 (TPC-H Q5)
    "returned_item_customers",      # B6 B15 B24 (TPC-H Q10)
    "top_supplier_revenue",         # B15 B16 B24 (TPC-H Q15)
    "waiting_suppliers",            # B13 B15 B16 (TPC-H Q21)
    "important_parts_share",        # B11 B16 B18 (TPC-H Q11)
    "customer_order_distribution",  # B12 B16 B22 (TPC-H Q13)
    "nation_volume_flows",          # B10 B15 B33 (TPC-H Q7)
    "small_quantity_revenue",       # B9 B16 B18 (TPC-H Q17)
    "priority_shipping_case_counts",  # B9 B10 B19 (TPC-H Q12)
    "disjunctive_predicate_revenue",  # B9 B11 B19 (TPC-H Q19)
    # -- first-time: window functions --
    "window_rank_price",            # B29
    "window_value_funcs",           # B29 B31 (first/last/nth value)
    "window_range_frame_orders",    # B31 (RANGE frame)
    "window_distribution_acctbal",  # B29 (percent_rank/cume_dist/ntile)
    # -- first-time: behavior analytics --
    "funnel_click_purchase_daily",  # B12 B14 B16
    "user_event_paths",             # B16 B24 B29
    "event_transition_matrix",      # B16 B30
    "cumulative_distinct_users",    # B20 B31
    # -- first-time: sampling / curation --
    "weighted_sample_docs",         # B6 B24 B43 (A-ES weighted sampling)
    "temperature_mixture_sample",   # B11 B16 B19
    "stratified_topk_sample",       # B6 B29 B32
    "kfold_assign_documents",       # B16 B43
    "pack_sequences_bins",          # B16 B31 B43 (sequence packing)
    "corpus_snapshot_diff",         # B16 B19 B26
    # -- first-time: similarity / embeddings --
    "similarity_ivf_quantized",     # B41 B43 (IVF,SQ8 index)
    "similarity_topk_quantized",    # B41 B43 (int8 asymmetric distance)
    "embedding_quantize_error",     # B41 B43
    # -- first-time: text analysis --
    "tfidf_top_terms",              # B16 B29
    "ngram_vocab_topk",             # B16 B24
    "repetition_stats_docs",        # B41 B56
    # -- first-time: dedup / misc scalars --
    "ssjoin_prefix_jaccard",        # B10 B41 (PPJoin prefix filter)
    "incremental_dedup_bloom",      # B13 B26 (bloom-gated incremental dedup)
    "try_funcs_orders",             # B37 B43
    # -- past the 50-cap; driver-checked in the r5 rotation --
    "string_agg_nations_by_region", # B36 B41 B16
    "dedup_minhash_verified",       # B54 (r4: LSH recall + scores replayed in DuckDB)
    "approx_distinct_users",        # B21 (rows-only by design; green r1-r3)
    "assign_sequence_ids",          # B29 (scale-safe id assignment)
    # -- r4 late additions, first-eligible in r5 --
    "audio_container_meta",         # B57 (WAV/FLAC/MP3/OGG header probe)
    "hll_verified_users_by_type",   # B21 B16 (bit-exact DuckDB HLL replay)
    "theta_join_rank_rewrite",      # B14 B31 (O(n log n) theta-count twin)
    "concurrent_intervals_distributed",  # B30 B31 (two-level prefix-sum sweep)
    "url_parse_components",         # B39 B36 (parse_url + domain derivation)
    "audio_tags",                   # B57 (Vorbis comments + ID3v2 text frames)
    "video_container_meta",         # B57 (ISO-BMFF box-tree probe)
    "warc_extract_records",         # B52 B2 (WARC build+explode round-trip)
    "html_text_extract",            # B39 B40 B56 (HTML boilerplate strip)
    "html_link_graph",              # B39 B16 (href explode -> in-degree)
    "pagerank_link_graph",          # B10 B16 (exact integer PageRank)
    "arrow_ipc_roundtrip",          # B2 B3 B52 (Arrow IPC shard round-trip)
    "bucketed_join_colocated",      # B10 B3 (co-bucketed shuffle-free SMJ)
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
