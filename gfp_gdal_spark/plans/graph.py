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
    vertex id in the component. Vertex ids must be orderable (long)."""
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
    for _ in range(max_iter):
        # candidate label per vertex = min over neighbors' labels
        nbr = (
            sym.join(labels.withColumnRenamed("vertex", "b"), "b")
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.withColumnRenamed("component", "_old")
            .join(nbr, "vertex", "left")
            .select(
                "vertex",
                F.col("_old").alias("_old"),
                F.least(F.col("_old"), F.coalesce("nbr_min", F.col("_old"))).alias("component"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where(F.col("component") != F.col("_old")).limit(1).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            break
    return labels
