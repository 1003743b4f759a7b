"""Duplicate-cluster resolution: connected components over candidate
pairs (the step after LSH/near-dup pair generation — every document in
a component shares a canonical representative).

Algorithm: iterative min-label propagation on DataFrames.  Each node
starts labeled with its own id; every round each node takes the min of
its label and its neighbours' labels; converged when no label changes.
Rounds needed = graph diameter (dedup clusters are small and dense, so
typically 2-4).  Each round is one shuffle; lineage is cut with
localCheckpoint so the plan doesn't grow unboundedly — the standard
iterative-algorithm pattern on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id_a, id_b) undirected edges → (doc_id, cluster_id) where
    cluster_id = min node id in the component.

    Nodes are the ids appearing in any pair; isolated documents are the
    caller's concern (they are their own cluster by definition)."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(
            pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b"))
        )
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .dropDuplicates(["node"])
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for it in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "b"), on="b"
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        old_labels, labels = labels, new_labels
        # convergence check is an extra job per round; rounds 0-1 almost
        # never converge (diameter ≥ 2 whenever any edge exists), so
        # only start checking from round 2
        if it >= 2:
            changed = (
                labels.alias("n")
                .join(old_labels.alias("o"), on="node")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
