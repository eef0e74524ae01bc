"""HyperLogLog from public primitives, cross-engine replayable.

Spark's built-in DataSketches HLL (``hll_sketch_agg``) is the fast
path (plans/sketch_queries.py) but its register layout is
engine-internal — no foreign engine can replay the estimate. This
module implements the original Flajolet-Fusy-Gandouet-Meunier
estimator (AofA 2007 paper, public) from first principles on top of the
md5-derived 60-bit hash family (operators/dedup.py:md5_hash60) that is
bit-identical in Spark and DuckDB, with every step chosen to be
IEEE-deterministic across engines:

- register index = top ``p`` hash bits; rank rho = leading-zero count
  of the remaining 48 bits + 1, computed by an integer CASE cascade
  (no floating log2 — exact at power-of-two boundaries);
- the harmonic denominator is accumulated as the INTEGER
  sum of 2^(49-rho) — integer addition is order-independent, where a
  float 2^-rho sum would round differently under Spark's partial
  aggregation order vs DuckDB's;
- the only float op is one final division by a constant embedded via
  ``repr`` in both engines — correctly rounded per IEEE-754, so the
  raw estimate is bit-identical and hash-comparable.

The raw estimator is emitted WITHOUT the small-range linear-counting
correction: that branch needs ln(), which neither Java's Math.log nor
DuckDB's libm guarantees correctly rounded, so it cannot be part of a
bit-exact cross-engine contract. The zero-register count V is emitted
alongside so consumers can apply m*ln(m/V) themselves when
V > 0 and the estimate is small.

Dataflow: one shuffle to (group, bucket) registers — at most
groups x 4096 rows regardless of input volume — then a tiny
per-group aggregation. Scale-safe at any corpus size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.dedup import md5_hash60

P_BITS = 12
M_REGISTERS = 1 << P_BITS  # 4096
W_BITS = 60 - P_BITS  # 48 rank bits
_TWO49 = 1 << (W_BITS + 1)  # integer scale of the harmonic sum

# alpha_m * m^2 * 2^49 — computed once in Python; repr-embedded in both
# engines so the single final division is the only rounding step.
ALPHA_M = 0.7213 / (1.0 + 1.079 / M_REGISTERS)
EST_NUMERATOR = ALPHA_M * float(M_REGISTERS * M_REGISTERS) * float(_TWO49)


def rho48(w: Column) -> Column:
    """Rank of a 48-bit value: leading zeros + 1 (all-zero -> 49).

    Integer comparison cascade — exact at every power-of-two boundary,
    unlike floor(log2(w)) in doubles. The same cascade is emitted as
    SQL text by :func:`rho48_sql` for the DuckDB oracle.
    """
    expr = F.when(w == 0, F.lit(49))
    for k in range(1, W_BITS + 1):
        expr = expr.when(w >= (1 << (W_BITS - k)), F.lit(k))
    return expr


def rho48_sql(w_expr: str) -> str:
    """The DuckDB text twin of :func:`rho48`."""
    branches = [f"WHEN {w_expr} = 0 THEN 49"]
    branches += [
        f"WHEN {w_expr} >= {1 << (W_BITS - k)} THEN {k}"
        for k in range(1, W_BITS + 1)
    ]
    return "CASE " + " ".join(branches) + " END"


def hll_registers(
    df: DataFrame, key: str, group_cols: list[str]
) -> DataFrame:
    """(group_cols..., bucket, rho) register rows — the mergeable HLL
    state. Merging = MAX(rho) per bucket over any union of states."""
    h = md5_hash60(F.col(key).cast("string"))
    bucket = F.shiftright(h, W_BITS).alias("bucket")
    w = h.bitwiseAND(F.lit((1 << W_BITS) - 1))
    return (
        df.select(*group_cols, bucket, rho48(w).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate + zero-register count per group from register
    rows. Integer harmonic sum; one repr-constant float division."""
    per_group = registers.groupBy(*group_cols).agg(
        # 2^(49-rho) as an exact integer shift (libm pow is not
        # contractually exact even on integer powers of two)
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - rho AS INT))")
        ).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_present"),
    )
    s_total = F.col("_s_present") + (
        (F.lit(M_REGISTERS) - F.col("_n_present")) * F.lit(_TWO49)
    )
    return per_group.select(
        *group_cols,
        (F.lit(EST_NUMERATOR) / s_total.cast("double")).alias(
            "distinct_est_raw"
        ),
        (F.lit(M_REGISTERS) - F.col("_n_present"))
        .cast("long")
        .alias("zero_registers"),
    )
