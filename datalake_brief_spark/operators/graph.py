"""Iterative graph algorithms over edge-list DataFrames (§2.14 extension).

Complements the connected-components labeler in ``operators/dedup.py`` with
rank-style iteration. Same execution discipline: every round is keyed
joins/aggregations on the node id (one shuffle key throughout), per-round
``localCheckpoint`` truncates lineage so the plan never grows with the
iteration count, and the driver holds no graph state — at 100 TB the edge
list is a partitioned relation like any other, never a driver structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 15,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a DIRECTED edge list → (id, rank), rank-mass
    formulation: ranks start at 1.0 per node and each round every node
    keeps ``1 - damping`` plus ``damping`` times the rank its in-neighbors
    shipped along their out-edges (each sender splits its rank evenly over
    its out-degree). With no dangling nodes (every node has at least one
    out-edge — symmetrize undirected graphs first) total rank mass is
    conserved at exactly n_nodes every round, which makes mass an
    end-to-end invariant of the join/agg loop rather than a tuning detail.

    Shape (and why it scales): out-degrees are computed once; each round
    is edges ⋈ ranks on the source id (both sides hash-partitioned on the
    SAME key), a groupBy on the destination id, and a left join back onto
    the node set for isolated-receiver handling — three shuffles on node
    ids per round, nothing proportional to rank history. Fixed iteration
    count keeps the result deterministic (no float-threshold stopping that
    could flip across engines); per-round ``localCheckpoint`` keeps the
    plan O(1) in rounds. Dedup clusters, citation graphs, and co-purchase
    graphs at corpus scale all run through the same relation-only loop.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
