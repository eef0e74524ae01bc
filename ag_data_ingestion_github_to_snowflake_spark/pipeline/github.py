"""The reference pipeline, Spark-first: nested-record flatten,
required-field validation split, run-summary metrics, idempotent
incremental extraction.

Covers SURVEY §2 A10 (flatten), A12/A13 (validation split), A14 (error
row skip), A15 (run counters), A21 (resume/at-least-once), composed in
``incremental_extract`` — the whole of the reference's
``extract_repositories`` (/root/reference/src/extract_github_data.py:
607-762) as one lazily-planned DataFrame pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ag_data_ingestion_github_to_snowflake_spark.sources.rest import (
    RestSourceConfig,
    Transport,
    enrich_details,
    list_scan_df,
)
from ag_data_ingestion_github_to_snowflake_spark.sources.state import WatermarkStore

# The canonical 14-column schema: REQUIRED_FIELDS (reference :53-71)
# = Snowflake DDL columns (README.md:267-283).
REQUIRED_FIELDS = (
    "id",
    "name",
    "full_name",
    "html_url",
    "description",
    "stargazers_count",
    "language",
    "created_at",
    "updated_at",
    "owner_login",
    "owner_id",
    "owner_type",
    "owner_avatar_url",
    "owner_url",
)


def flatten_repos(raw: DataFrame) -> DataFrame:
    """A10: nested ~100-field record -> flat 14-column projection.

    Hoists owner.* to owner_* (reference :494-527, design rationale
    README.md:15) and parses the ISO-8601 'Z' timestamp strings to
    TIMESTAMP (DDL README.md:276-277). Pure projection: Catalyst
    prunes every untouched field at the scan.
    """
    return raw.select(
        F.col("id"),
        F.col("name"),
        F.col("full_name"),
        F.col("html_url"),
        F.col("description"),
        F.col("stargazers_count"),
        F.col("language"),
        F.to_timestamp("created_at", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("created_at"),
        F.to_timestamp("updated_at", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("updated_at"),
        F.col("owner.login").alias("owner_login"),
        F.col("owner.id").alias("owner_id"),
        F.col("owner.type").alias("owner_type"),
        F.col("owner.avatar_url").alias("owner_avatar_url"),
        F.col("owner.html_url").alias("owner_url"),
    )


def valid_predicate(columns: tuple[str, ...] = REQUIRED_FIELDS):
    """A12: row valid iff every required field is non-null (:530-547)."""
    return reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in columns])


def with_missing_fields(df: DataFrame, columns: tuple[str, ...] = REQUIRED_FIELDS) -> DataFrame:
    """Attach the missing-field list the reference reports per invalid
    row (:541-546): array of required column names that are null."""
    pairs = F.array(
        *[
            F.when(F.col(c).isNull(), F.lit(c)).otherwise(F.lit(None))
            for c in columns
        ]
    )
    return df.withColumn("missing_fields", F.filter(pairs, lambda x: x.isNotNull()))


def validation_split(df: DataFrame, columns: tuple[str, ...] = REQUIRED_FIELDS) -> tuple[DataFrame, DataFrame]:
    """A13: split into (valid, invalid-with-missing-list) off one input."""
    pred = valid_predicate(columns)
    return df.filter(pred), with_missing_fields(df.filter(~pred), columns)


def latest_snapshot(df: DataFrame, key: str = "id", order_col: str = "updated_at") -> DataFrame:
    """Dedupe-to-latest per key (B29 pattern): at-least-once upstream
    delivery means repeated extractions accumulate; keep the newest."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def run_metrics(
    flat: DataFrame,
    api_calls: int = 0,
    cache_hits: int = 0,
    test_mode: bool = False,
) -> DataFrame:
    """A15: the run-summary counters as one aggregate row
    (processed/valid/invalid + id range; reference :730-742)."""
    pred = valid_predicate()
    return flat.agg(
        F.count("*").alias("total_processed"),
        F.sum(F.when(pred, 1).otherwise(0)).alias("valid_count"),
        F.sum(F.when(~pred, 1).otherwise(0)).alias("invalid_count"),
        F.min("id").alias("start_repo_id"),
        F.max("id").alias("last_repo_id"),
        F.lit(api_calls).alias("api_calls"),
        F.lit(cache_hits).alias("cache_hits"),
        F.lit(test_mode).alias("test_mode"),
        F.current_timestamp().alias("extraction_date"),
    )


@dataclass
class ExtractResult:
    valid: DataFrame
    invalid: DataFrame
    metrics: DataFrame
    new_watermark: int


def incremental_extract(
    spark: SparkSession,
    transport: Transport,
    state: WatermarkStore,
    config: RestSourceConfig | None = None,
    max_pages: int = 1,
    commit_state: bool = True,
) -> ExtractResult:
    """The full reference pipeline as one Spark job (A1-A15, A21).

    state-read -> paginated list scan -> budget limit -> distributed
    detail enrichment -> flatten -> validate split -> dedupe on id ->
    metrics. The watermark commits once per batch (not per row as the
    reference does, :714) and only AFTER the batch has materialized —
    the outputs are persisted and computed before ``state.set``, so a
    failed enrichment job aborts with the watermark untouched and the
    next run re-fetches the batch. Idempotency comes from
    ``latest_snapshot`` on id — the documented at-least-once design
    (README.md:121-129) made exactly-once at the table level. Callers
    writing to durable sinks should pass ``commit_state=False`` and
    commit the watermark themselves after the sink write succeeds.
    """
    config = config or RestSourceConfig()
    since = state.get()
    list_df, new_wm = list_scan_df(spark, transport, since, config, max_pages)
    raw = enrich_details(list_df, transport, config)
    flat = latest_snapshot(flatten_repos(raw), "id", "updated_at")
    flat = flat.persist()
    valid, invalid = validation_split(flat)
    metrics = run_metrics(flat)
    if commit_state:
        flat.count()  # force the fetch/flatten to succeed first
        state.set(new_wm)
    return ExtractResult(valid=valid, invalid=invalid, metrics=metrics, new_watermark=new_wm)


def observed_run_metrics(flat: DataFrame):
    """A15 counters as a zero-extra-scan ``Observation``.

    :func:`run_metrics` recomputes the counters with a second aggregate
    over the data — at 100 TB that is a second full pass over the
    warehouse write's input. ``df.observe`` instead piggybacks the
    counters on whatever action consumes the returned DataFrame (the
    sink write itself): accumulator-style, exactly-once per action, no
    extra job.

    Returns ``(observed_df, observation)`` — write ``observed_df``,
    then read ``observation.get`` for the metrics dict.
    """
    from pyspark.sql import Observation

    pred = valid_predicate()
    obs = Observation("run_metrics")
    observed = flat.observe(
        obs,
        F.count(F.lit(1)).alias("total_processed"),
        F.sum(F.when(pred, 1).otherwise(0)).alias("valid_count"),
        F.sum(F.when(~pred, 1).otherwise(0)).alias("invalid_count"),
        F.min("id").alias("start_repo_id"),
        F.max("id").alias("last_repo_id"),
    )
    return observed, obs
