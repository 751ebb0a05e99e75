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
    min node id in the connected component."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .cache()
    )
    # Convergence check: labels only ever decrease (min-propagation), so
    # the label sum strictly decreases on any change — comparing sums
    # costs one shuffle-free aggregate per round instead of a self-join.
    prev_sum = None
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("comp").alias("ncomp"))
        )
        labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("ncomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()  # cut lineage so plans stay bounded
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node"), F.col("comp").alias("component"))
