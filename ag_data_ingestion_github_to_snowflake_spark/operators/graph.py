"""Distributed connected components: near-dup pairs -> dedup clusters.

The near-dup operators (``operators/dedup.py``, ``operators/
similarity.py``) emit PAIRS (id_a, id_b). A training-data pipeline
needs CLUSTERS: the transitive closure of "is a near-dup of", with one
canonical representative per cluster to keep. That closure is exactly
connected components over the pair graph.

Algorithm: iterative min-label propagation — every node starts
labelled with its own id; each round a node adopts the minimum label
among itself and its neighbors; fixpoint = each node carries the
minimum id of its component. Rounds needed = graph diameter, which for
near-dup clusters is tiny (duplicates of one document are mutually
similar, so components are near-cliques — diameter 1-3). For adversarial
long-path graphs the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
ACM SoCC 2014 — public) converges in O(log^2 n) rounds with the same
join-shape per round; the propagation loop below is the right engine
shape for either and documents the swap point.

Scale notes per round: ONE shuffle (the groupBy on node; the
neighbor-message join reuses the edge partitioning), labels truncated
with ``localCheckpoint`` so the plan does not grow with iterations
(lineage-free, like GraphX's Pregel). Convergence is detected from a
1-row aggregate — labels only ever decrease, so an unchanged global sum
means an exact fixpoint.

No counterpart exists in the reference (a single-pass ETL script); this
is net-new capability the target workload (100 TB corpus dedup) needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``edges`` is undirected input (each pair listed once in either
    orientation). ``nodes``, if given, contributes isolated nodes —
    rows with no edges keep their own id as the component (a document
    with no near-dups is its own canonical). Returns ``(node, comp)``.

    Driver involvement per round is ONE 1-row aggregate (the
    convergence probe) — bounded, like ``train_ivf_centroids``'s
    k x dim collect; all per-node state stays distributed.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()

    universe = sym.select(F.col("s").alias("node"))
    if nodes is not None:
        universe = universe.unionByName(nodes.select(F.col(node_col).alias("node")))
    labels = (
        universe.distinct().withColumn("comp", F.col("node")).localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]  # bounded: 1 row

    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels.select(F.col("node").alias("d"), "comp"), "d"
        ).select(F.col("s").alias("node"), "comp")
        labels = (
            labels.unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        # comp is elementwise non-increasing, so an unchanged sum is an
        # exact fixpoint, not a hash collision.
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]  # bounded: 1 row
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def canonical_members(labels: DataFrame) -> DataFrame:
    """The one row to KEEP per cluster: the node that is its own label.

    Composes with any (node, comp) labelling; join the complement
    against the corpus to drop near-duplicates.
    """
    return labels.filter(F.col("node") == F.col("comp")).select("node")
