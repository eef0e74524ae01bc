"""Table profiling and data-quality expectations.

``profile_table`` is ANALYZE-style column statistics as a query: one
aggregation pass computes per-column null counts, distinct counts and
min/max, then an unpivot turns the single wide row into one row per
column. The training-data use is drift detection — profile every
ingest batch, diff against yesterday's profile.

``validate_expectations`` generalizes the reference's required-field
validation (/root/reference/src/extract_github_data.py:533-556, A12)
into a rule set evaluated in a single pass: each rule is a boolean
column; the report counts violations per rule without materializing
the failing rows (callers filter for them when the count is non-zero).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings so mixed-type
    tables profile into one uniform schema.

    Single scan, single aggregation. The multi-column exact distinct
    makes Catalyst EXPAND the input (one replica per distinct column),
    so cost is n_cols × scan — acceptable for scheduled profiling; for
    hot-path monitoring swap count_distinct for approx_count_distinct
    and the expand disappears.
    """
    names = cols or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in names:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)

    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in names
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def validate_expectations(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """Evaluate named boolean expectations in one pass.

    ``rules`` maps rule name -> boolean Column (True = row passes).
    Returns (rule, n_rows, n_violations, pass_rate). NULL rule results
    count as violations — an expectation that cannot be evaluated on a
    row has not been met by that row.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, 1).otherwise(0)
            ).alias(f"{name}__viol")
        )
    wide = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{name}__viol").cast("long").alias("n_violations"),
                F.round(
                    (F.col("n_rows") - F.col(f"{name}__viol"))
                    / F.greatest(F.col("n_rows"), F.lit(1)).cast("double"),
                    6,
                ).alias("pass_rate"),
            )
            for name in rules
        ]
    )
    return wide.select(F.explode(per_rule).alias("r")).select("r.*")
