"""Connected components over a pair list — turns near-duplicate PAIRS
(dedup.jaccard_verified_pairs) into dedup CLUSTERS with a canonical
(minimum) id per cluster.

Iterative min-label propagation: each node adopts the minimum component
id among itself and its neighbors until a fixed point. The driver loop
is the accepted Spark pattern for iterative algorithms (each iteration
is one distributed join + aggregate; intermediate results are cached,
lineage is cut periodically via localCheckpoint to keep plans bounded).
Converges in O(diameter) iterations — near-dup clusters are shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id_a, id_b) undirected pairs → (node, component) with component =
    min node id in the connected component.

    Self-loops are folded into the edge set so every round is exactly ONE
    join + ONE aggregate: comp'(b) = min over a ∈ N(b) ∪ {b} of comp(a).
    That both initializes labels for free (round 1 degenerates to
    min(a) GROUP BY b — no separate distinct-nodes pass) and removes the
    per-round left-join/least repair step a loop without self-loops needs.
    """
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .union(e.select("a", "a"))
        .union(e.select(F.col("b").alias("a"), F.col("b").alias("b")))
        .distinct()
        .cache()
    )
    # Round 1: comp = node, so the neighborhood min is just min(a).
    labels = (
        edges.groupBy(F.col("b").alias("node"))
        .agg(F.min("a").alias("comp"))
        .localCheckpoint()
    )
    # Convergence check: labels only ever decrease (min-propagation, the
    # self-loop keeps each node's own label in the min), so the label sum
    # strictly decreases on any change — comparing sums costs one cheap
    # aggregate over checkpointed data instead of a self-join.
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter - 1):
        labels = (
            edges.join(labels, edges.a == labels.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()  # cut lineage so plans stay bounded
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node"), F.col("comp").alias("component"))
