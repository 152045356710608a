"""Geometry pandas UDFs over the ragged-ring numpy kernels.

Each UDF converts the Arrow batch to (flat, offsets) ragged form once
and runs one vectorized kernel pass — the Spark-idiomatic replacement
for the reference's per-feature loops (ogr_reader_node.cpp:236,
geos_nodes.cpp:141,193).

Ring column type: ``array<array<double>>`` (inner = [x, y]);
holes column type: ``array<array<array<double>>>``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfp_gdal_spark.kernels import geom as _g

RING_T = T.ArrayType(T.ArrayType(T.DoubleType()))
HOLES_T = T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))


def _ragged(s: pd.Series):
    return _g.ragged_from_lists(s.tolist())


def ring_area(ring: Column) -> Column:
    """|shoelace| area — OGRLoader's derived `area` (ogr_reader_node.cpp:275,287)."""
    @F.pandas_udf(T.DoubleType())
    def _f(s: pd.Series) -> pd.Series:
        flat, off = _ragged(s)
        return pd.Series(abs(_g.signed_area(flat, off)))

    return _f(ring)


def ring_is_ccw(ring: Column) -> Column:
    @F.pandas_udf(T.BooleanType())
    def _f(s: pd.Series) -> pd.Series:
        flat, off = _ragged(s)
        return pd.Series(_g.signed_area(flat, off) > 0)

    return _f(ring)


def ring_is_valid(ring: Column) -> Column:
    """Validity — OGRLoader's `is_valid` (ogr_reader_node.cpp:265,276,288)."""
    @F.pandas_udf(T.BooleanType())
    def _f(s: pd.Series) -> pd.Series:
        flat, off = _ragged(s)
        return pd.Series(_g.rings_valid(flat, off))

    return _f(ring)


def orient_ring(ring: Column, ccw: bool = True) -> Column:
    """Canonical orientation (ogr_reader_node.cpp:86-99; geos_nodes.cpp:31-67)."""
    @F.pandas_udf(RING_T)
    def _f(s: pd.Series) -> pd.Series:
        flat, off = _ragged(s)
        out = _g.orient_rings(flat, off, ccw=ccw)
        return pd.Series(_g.ragged_to_lists(out, off))

    return _f(ring)


def ring_wkt(ring: Column, holes: Column | None = None) -> Column:
    """WKT emit — OGRLoader `wkt` terminal (ogr_reader_node.cpp:245)."""
    if holes is None:
        @F.pandas_udf(T.StringType())
        def _f(s: pd.Series) -> pd.Series:
            flat, off = _ragged(s)
            return pd.Series(_g.rings_to_wkt(flat, off))

        return _f(ring)

    @F.pandas_udf(T.StringType())
    def _fh(s: pd.Series, hs: pd.Series) -> pd.Series:
        flat, off = _ragged(s)
        return pd.Series(_g.rings_to_wkt(flat, off, hs.tolist()))

    return _fh(ring, holes)


def simplify_ring(ring: Column, tolerance: float) -> Column:
    """Douglas–Peucker simplify -> struct(ring, ok). ok=False means the
    original ring was passed through (PolygonSimplifyGEOS failure
    semantics, geos_nodes.cpp:144-176)."""
    out_t = T.StructType(
        [T.StructField("ring", RING_T), T.StructField("ok", T.BooleanType())]
    )

    @F.pandas_udf(out_t)
    def _f(s: pd.Series) -> pd.DataFrame:
        flat, off = _ragged(s)
        nf, no, ok = _g.simplify_rings(flat, off, tolerance)
        return pd.DataFrame({"ring": _g.ragged_to_lists(nf, no), "ok": ok})

    return _f(ring)


def buffer_ring(ring: Column, offset: float) -> Column:
    """v1 bbox buffer -> struct(ring, ok) (PolygonBufferGEOS analog,
    geos_nodes.cpp:187-213; invalid result passes original through)."""
    out_t = T.StructType(
        [T.StructField("ring", RING_T), T.StructField("ok", T.BooleanType())]
    )

    @F.pandas_udf(out_t)
    def _f(s: pd.Series) -> pd.DataFrame:
        flat, off = _ragged(s)
        nf, no, ok = _g.buffer_bbox_rings(flat, off, offset)
        return pd.DataFrame({"ring": _g.ragged_to_lists(nf, no), "ok": ok})

    return _f(ring)


def pip_refine(px: Column, py: Column, ring: Column, holes: Column | None = None) -> Column:
    """Exact point-in-polygon (ray cast, holes honored) — the refine
    stage of pip_join after the cell-bucket equi-join."""
    if holes is None:
        @F.pandas_udf(T.BooleanType())
        def _f(x: pd.Series, y: pd.Series, r: pd.Series) -> pd.Series:
            flat, off = _ragged(r)
            return pd.Series(
                _g.points_in_rings_pairwise(x.to_numpy(float), y.to_numpy(float), flat, off)
            )

        return _f(px, py, ring)

    @F.pandas_udf(T.BooleanType())
    def _fh(x: pd.Series, y: pd.Series, r: pd.Series, hs: pd.Series) -> pd.Series:
        flat, off = _ragged(r)
        return pd.Series(
            _g.point_in_polygon_pairwise(
                x.to_numpy(float), y.to_numpy(float), flat, off, hs.tolist()
            )
        )

    return _fh(px, py, ring, holes)


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Haversine meters as a pure Column expression (JVM-side)."""
    r = 6371008.8
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    return 2 * r * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
