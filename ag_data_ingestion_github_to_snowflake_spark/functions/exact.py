"""Exact-arithmetic aggregate helpers for cross-engine determinism.

Floating-point SUM is order-dependent; Spark's partial aggregation
order varies with partitioning, so a double SUM can differ between
runs — and between Spark and an oracle engine — in the last ulps.
Routing money/metric columns through DECIMAL makes the arithmetic
exact and associative: any aggregation order yields the identical
result, which then converts to the identical DOUBLE. This is the
engine-wide convention (see README "Oracle parity rules"); every
query in plans/ uses these shapes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC2 = "decimal(18,2)"
DEC6 = "decimal(18,6)"


def dsum(col: str | Column, alias: str | None = None, scale: str = DEC2) -> Column:
    """Order-independent SUM: cast to decimal, sum exactly, emit double."""
    out = F.sum(F.col(col).cast(scale) if isinstance(col, str) else col.cast(scale)).cast(
        "double"
    )
    return out.alias(alias) if alias else out


def davg(col: str | Column, alias: str | None = None, scale: str = DEC2) -> Column:
    """Order-independent AVG: exact decimal SUM / COUNT(*) in double.

    COUNT(*) (not COUNT(col)) to match the registry's oracle
    convention — the two differ on nullable columns.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(scale)).cast("double") / F.count(F.lit(1))
    return out.alias(alias) if alias else out


def count_if(pred: Column, alias: str | None = None) -> Column:
    """Conditional counter (the reference's valid/invalid tallies)."""
    out = F.sum(F.when(pred, 1).otherwise(0))
    return out.alias(alias) if alias else out
