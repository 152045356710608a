"""Distributed connected components by iterative min-label propagation.

Used by operators.lines.merge_lines (GEOSMergeLines analog) and
operators.dedup.minhash_dedup's exact-cluster mode. Large-star/
small-star-style label propagation on an edge list: each round every
vertex takes the min label among itself and its neighbors; converges
in O(diameter) rounds (checked by a fixed-point count). Each round
persists its labels so round N's plan does not recursively contain
round N-1 (the lineage-compounding trap)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """edges (src, dst) -> (vertex, component) with component = min
    vertex id in the component. Vertex ids must be orderable (long).

    Each round combines one hop of min-label propagation with one
    POINTER-JUMPING step (label := label of my label — the large-star/
    small-star shortcut), so convergence is O(log diameter) rounds, not
    O(diameter): a 10^6-segment polyline chain converges in ~20 rounds
    instead of 10^6. If the fixed point is not reached within
    ``max_iter`` rounds the function RAISES rather than silently
    returning wrong (split) components.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    # localCheckpoint (not just persist): each iteration would otherwise
    # grow the logical plan, and Catalyst re-analysis of the deepening
    # self-join tree dominates wall time long before the data does.
    sym = sym.where(F.col("a") != F.col("b")).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        # (1) candidate label per vertex = min over neighbors' labels
        nbr = (
            sym.join(labels.withColumnRenamed("vertex", "b"), "b")
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_min"))
        )
        hop = (
            labels.withColumnRenamed("component", "_old")
            .join(nbr, "vertex", "left")
            .select(
                "vertex",
                "_old",
                F.least(F.col("_old"), F.coalesce("nbr_min", F.col("_old"))).alias("_hop"),
            )
        )
        # (2) pointer jumping: component := component(component)
        ptr = hop.select(F.col("vertex").alias("_hop"), F.col("_hop").alias("_hop2"))
        ptr = ptr.groupBy("_hop").agg(F.min("_hop2").alias("_jump"))
        new_labels = (
            hop.join(ptr, "_hop", "left")
            .select(
                "vertex",
                "_old",
                F.least(F.col("_hop"), F.coalesce("_jump", F.col("_hop"))).alias("component"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where(F.col("component") != F.col("_old")).limit(1).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            f"raise max_iter (rounds needed ~ log2(component diameter))"
        )
    return labels
