"""Mergeable-sketch aggregates (Apache DataSketches, built into Spark
3.5+): HLL distinct-count sketches and KLL quantile sketches.

Why these are first-class at 100 TB: a sketch is an algebraic,
MERGEABLE aggregation state — per-partition (or per-day) sketches
combine associatively into the global answer, so rollups, incremental
refresh, and cross-cluster union all work without re-scanning raw
data. Exact COUNT(DISTINCT) re-shuffles every value; an HLL sketch
ships ~1.5 KB per group. Exact percentiles need a global sort; KLL is
one pass, bounded memory, provable error.

Both queries are rows-only by declared design (a sketch estimate is
engine-specific — DuckDB's approx_* uses different internals, so no
hash oracle can exist); their accuracy contracts are asserted against
exact answers in ``tests/test_sketches.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t


@register(
    "hll_sketch_users_by_type",
    oracle=None,  # sketch estimates are engine-specific by design
    survey_ids=("B21", "B16"),
    description="HLL sketches per event_type, merged to a global distinct estimate",
)
def hll_sketch_users_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type HLL distinct-user sketches UNIONED into the
    global estimate — the merge is the point: per-group (or per-day)
    sketches combine without touching raw data, which is how a 100 TB
    rollup maintains distinct counts incrementally.
    """
    ev = t(spark, sf, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    merged = per_type.agg(
        F.hll_union_agg("sk").alias("sk_all"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )
    out_type = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("distinct_users_est"),
        "n_events",
    )
    out_all = merged.select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk_all").cast("bigint").alias("distinct_users_est"),
        "n_events",
    )
    return out_type.unionAll(out_all)


@register(
    "kll_quantiles_value",
    oracle=None,  # sketch estimates are engine-specific by design
    survey_ids=("B23",),
    description="KLL quantile sketch: one-pass mergeable p50/p90/p99 of event value",
)
def kll_quantiles_value(spark: SparkSession, sf: str) -> DataFrame:
    """One-pass KLL quantile estimates for the event value stream.
    Unlike percentile_approx's fixed-memory t-digest-ish internals,
    KLL has a published worst-case error bound and its state is
    mergeable across batches — the streaming-rollup quantile shape.
    """
    ev = t(spark, sf, "events")
    sk = ev.agg(F.kll_sketch_agg_double("value").alias("sk"))
    return sk.select(
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
        F.kll_sketch_get_n_double("sk").cast("bigint").alias("n"),
    )


def count_min_sketch_bytes(df: DataFrame, col: str, eps: float = 0.001) -> bytes:
    """Build a count-min frequency sketch over ``col`` and return its
    serialized bytes (Spark's ``CountMinSketch`` wire format).

    CM never undercounts (estimate >= true count, overcount bounded by
    eps*N with prob. delta) and merges associatively — the
    heavy-hitter shape when the key space is too large for an exact
    groupBy. Spark 4.1 exposes only the *builder* in SQL (no
    ``count_min_sketch_estimate`` point lookup), so consumers read the
    bytes back through ``org.apache.spark.util.sketch.CountMinSketch``
    — see ``tests/test_sketches.py`` for the round-trip and the
    overcount-only contract.
    """
    return df.agg(
        F.count_min_sketch(col, F.lit(eps), F.lit(0.99), F.lit(1)).alias("sk")
    ).collect()[0].sk
