"""Distributed PageRank over an edge list (power iteration).

Why it's here: the dedup pipeline produces similarity GRAPHS (LSH /
set-similarity / near-dup pairs), and "which member represents the
cluster" is better answered by centrality than by min-id when quality
matters — the member most similar to everything else is the natural
canonical.  PageRank is also the engine's representative of the
iterative-algorithm class (SURVEY §2's "non-SQL-expressible" bucket,
like streaming state and union-find): a fixed-point loop the driver
steers while every step stays a distributed join + aggregation.

Plan shape per iteration (the part that must hold at 100 TB):
- ONE equi-join ranks ⋈ edges on the source id (ranks is |V| rows —
  small next to edges; AQE broadcasts it when it fits) and ONE
  groupBy(dst) sum with map-side partial aggregation;
- dangling mass and the L1 delta are single-row aggregates (bounded
  driver scalars, the same bounded-metadata collect class as IVF
  centroids);
- each iteration ends in ``localCheckpoint`` — without it the plan
  doubles per iteration and iteration k replans the whole history
  (the classic iterative-Spark trap).

Determinism: float sums shuffle-order-dependent at the last ulp, so
ranks are reproducible to ~1e-12 — fine for ranking; tests compare
against a numpy mirror with tolerances, not hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    directed: bool = False,
) -> DataFrame:
    """PageRank over ``edges``; returns (node, rank) with Σrank = 1.

    ``directed=False`` (the similarity-graph case) walks every edge
    both ways.  Dangling nodes (no out-edges) spread their mass
    uniformly, the standard correction.  Stops at ``max_iter`` or when
    the L1 change drops under ``tol``."""
    e = edges.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.dropDuplicates(["src", "dst"])
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # edges carry their source degree once, up front — the per-iter
    # join then only needs the current ranks
    e_deg = e.join(out_deg, "src").localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        contrib = (
            e_deg.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        # dangling mass: rank sitting on nodes with no out-edges
        dangling = (
            ranks.join(
                out_deg.select(F.col("src").alias("node")), "node",
                "left_anti",
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        new_ranks = (
            nodes.join(
                contrib.select(F.col("dst").alias("node"), "in_mass"),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = (
            new_ranks.join(
                ranks.select(F.col("node"), F.col("rank").alias("old")),
                "node",
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks


def canonical_by_centrality(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    damping: float = 0.85,
    max_iter: int = 20,
) -> DataFrame:
    """For each connected component of the pair graph: its members
    with the component id and the PAGERANK-canonical member — the
    centrality upgrade of ``resolve_clusters``'s min-id rule (the
    best-connected duplicate represents the cluster, not the one with
    the smallest id).  Returns (doc_id, cluster_id, rank,
    canonical_id, is_canonical); rank ties break to the smaller id."""
    from pyspark.sql import Window

    from ..llmops.clusters import resolve_clusters

    comps = resolve_clusters(pairs, id_a, id_b)
    ranks = pagerank(
        pairs, id_a, id_b, damping=damping, max_iter=max_iter
    )
    joined = comps.join(
        ranks.select(F.col("node").alias("doc_id"), "rank"), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("rank").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn(
            "canonical_id",
            F.first("doc_id").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )
