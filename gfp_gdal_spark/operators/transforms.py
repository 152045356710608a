"""Per-feature geometry transform operators — the GEOS-node analogs.

DataFrame-level wrappers over the vectorized geometry UDFs, with the
reference's parameter semantics preserved:

- simplify_polygons <-> PolygonSimplifyGEOS (geos_nodes.cpp:133-185):
  tolerance, output_failures (keep original vs drop), orient after.
- buffer_polygons   <-> PolygonBufferGEOS (geos_nodes.cpp:187-213):
  offset may be negative; invalid result passes original through.
- orient_polygons   <-> orientation canon (geos_nodes.cpp:31-67).
- enrich_geometry   <-> OGRLoader derived columns `area`, `is_valid`,
  `wkt` (ogr_reader_node.cpp:245,265,275).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfp_gdal_spark.functions.geometry import (
    buffer_ring,
    orient_ring,
    ring_area,
    ring_is_valid,
    ring_wkt,
    simplify_ring,
)

__all__ = [
    "simplify_polygons",
    "buffer_polygons",
    "orient_polygons",
    "enrich_geometry",
]


def simplify_polygons(
    df: DataFrame,
    tolerance: float,
    ring: str = "ring",
    output_failures: bool = True,
) -> DataFrame:
    """Douglas-Peucker simplify each polygon's exterior ring.

    output_failures=True keeps failed rows with the ORIGINAL ring and
    simplify_ok=False (the pass-through arm of geos_nodes.cpp:146,
    155,164,176); False drops them.
    """
    out = df.withColumn("_s", simplify_ring(F.col(ring), tolerance))
    out = out.withColumn(ring, F.col("_s.ring")).withColumn(
        "simplify_ok", F.col("_s.ok")
    ).drop("_s")
    if not output_failures:
        out = out.where(F.col("simplify_ok")).drop("simplify_ok")
    return out


def buffer_polygons(df: DataFrame, offset: float, ring: str = "ring") -> DataFrame:
    """Buffer each polygon by ``offset`` (negative shrinks). Invalid
    results pass the original through with buffer_ok=False
    (geos_nodes.cpp:202-207). v1 kernel is exact for the engine's
    axis-aligned footprint quads (bbox Minkowski)."""
    out = df.withColumn("_b", buffer_ring(F.col(ring), offset))
    return (
        out.withColumn(ring, F.col("_b.ring"))
        .withColumn("buffer_ok", F.col("_b.ok"))
        .drop("_b")
    )


def orient_polygons(df: DataFrame, ring: str = "ring", ccw: bool = True) -> DataFrame:
    return df.withColumn(ring, orient_ring(F.col(ring), ccw=ccw))


def enrich_geometry(df: DataFrame, ring: str = "ring", holes: str | None = None) -> DataFrame:
    """Add the OGRLoader-derived columns: area, is_valid, wkt."""
    hole_col = F.col(holes) if holes and holes in df.columns else None
    df = df.withColumn("area", ring_area(F.col(ring)))
    df = df.withColumn("is_valid", ring_is_valid(F.col(ring)))
    if hole_col is not None:
        df = df.withColumn("wkt", ring_wkt(F.col(ring), hole_col))
    else:
        df = df.withColumn("wkt", ring_wkt(F.col(ring)))
    return df
