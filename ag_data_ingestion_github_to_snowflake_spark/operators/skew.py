"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting handles sort-merge join skew automatically
(enabled in session.py); these operators cover the cases AQE does not:

- ``salted_aggregate``: a groupBy whose key distribution is heavily
  skewed (one hot key holding most rows) bottlenecks on a single
  reducer. Two-phase aggregation — first on (key, salt), then on key —
  spreads the hot key over ``n_salts`` reducers. Works for any
  algebraic aggregate (sum/count/min/max); averages decompose into
  sum+count.
- ``replicated_skew_join``: joining a skewed fact key against a
  non-broadcastable right side: replicate each right row ``n_salts``
  times (one per salt), salt the fact side randomly-but-deterministically
  (hash of a unique column mod n_salts), join on (key, salt). The
  shuffle spreads each hot key across n_salts partitions at the cost of
  replicating the right side n_salts-fold — the classic trade when the
  right side is mid-sized (too big to broadcast, small next to the
  fact).

Both are deterministic (salt = hash of a unique id, not random) so
results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(unique_col: str | Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(unique_col), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, countnn, min, max}. Phase 1 aggregates on keys+salt
    (spreads a hot key over n_salts reducers); phase 2 merges partials
    on keys. ``count`` is COUNT(*) row-count semantics regardless of
    nulls in the input column (which is ignored); ``countnn`` is
    SQL COUNT(col) non-null semantics.
    """
    merge_fn = {
        "sum": F.sum,
        "count": F.sum,
        "countnn": F.sum,
        "min": F.min,
        "max": F.max,
    }
    first_fn = {
        "sum": F.sum,
        "count": lambda _col: F.count(F.lit(1)),
        "countnn": F.count,
        "min": F.min,
        "max": F.max,
    }

    salted = df.withColumn("_salt", _salt(unique_col, n_salts))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[first_fn[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge_fn[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: fact side salted by hash, dim side replicated.

    Join key becomes (key, salt); each hot fact key spreads across
    n_salts shuffle partitions. Result is row-identical to the plain
    join (replication x salting covers every original pair once).

    Only ``inner`` and ``left`` are supported: with a right/full outer
    join an unmatched dim key would survive once per replica
    (n_salts duplicate rows), silently corrupting the result.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"replicated_skew_join supports how='inner'|'left', got {how!r}: "
            "outer joins would emit one row per dim replica for unmatched keys"
        )
    salted_fact = fact.withColumn("_salt", _salt(fact_unique_col, n_salts))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_dim = dim.select("*", salts)
    out = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return out.drop("_salt")
