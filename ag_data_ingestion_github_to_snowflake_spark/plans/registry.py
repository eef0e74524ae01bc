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


def all_specs() -> dict[str, QuerySpec]:
    """Return the full registry (importing query modules registers them)."""
    # Import side-effect modules here to avoid circular imports.
    from ag_data_ingestion_github_to_snowflake_spark.plans import (  # noqa: F401
        core_relational,
        joins,
        llm_ops,
        scalar_funcs,
        scale_ops,
        temporal_queries,
        tpch_like,
        udf_io_queries,
        streaming_queries,
        windows_queries,
    )

    return dict(_REGISTRY)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand: load one fixture table."""
    return load_table(spark, sf_dir, name)
