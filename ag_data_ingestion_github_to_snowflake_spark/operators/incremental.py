"""Incremental JOIN view maintenance (delta-join algebra).

A materialized join view J = L ⋈ R refreshes from appended deltas
without recomputing the full join:

    J_new = J_old  ∪  ΔL ⋈ R_old  ∪  L_old ⋈ ΔR  ∪  ΔL ⋈ ΔR

(the classic incremental view-maintenance identity for append-only
inputs — Blakeley et al., "Efficiently Updating Materialized Views",
SIGMOD 1986). The three delta terms each have a SMALL side: at 100 TB
the ΔL/ΔR batch joins broadcast (or at worst shuffle the delta, never
the standing table re-partitioned from scratch), so refresh cost is
O(|Δ| x join fan-out), independent of |J_old| — the reason warehouse
pipelines maintain joined fact views incrementally instead of
re-running the nightly join.

``delta_join_append`` returns ONLY the rows to append; the caller owns
the storage append (sinks.partitioned_append / merge_into_warehouse),
keeping the algebra composable with any table format. Deletions/updates
need keyed MERGE (sinks.merge_into_warehouse) — out of scope here, as
in most append-only fact pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_join_append(
    old_left: DataFrame,
    delta_left: DataFrame,
    old_right: DataFrame,
    delta_right: DataFrame,
    on,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Rows ADDED to L ⋈ R when ΔL appends to L and ΔR appends to R.

    ``on`` is the equi-join key (column name or list). With
    ``broadcast_deltas`` (default) the two mixed terms broadcast the
    delta side — the standing tables are scanned once each, never
    shuffled. The ΔL ⋈ ΔR term is delta-sized on both sides.
    """
    dl = F.broadcast(delta_left) if broadcast_deltas else delta_left
    dr = F.broadcast(delta_right) if broadcast_deltas else delta_right
    return (
        old_left.join(dr, on)
        .unionByName(dl.join(old_right, on))
        .unionByName(dl.join(dr, on) if broadcast_deltas else delta_left.join(delta_right, on))
    )
