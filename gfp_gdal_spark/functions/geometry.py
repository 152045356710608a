"""Geometry pandas UDFs over the ragged-ring numpy kernels.

Each UDF converts the Arrow batch to (flat, offsets) ragged form once
and runs one vectorized kernel pass — the Spark-idiomatic replacement
for the reference's per-feature loops (ogr_reader_node.cpp:236,
geos_nodes.cpp:141,193).

Ring column type: ``array<array<double>>`` (inner = [x, y]);
holes column type: ``array<array<array<double>>>``.
"""

from __future__ import annotations

import numpy as np
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
    """WKT emit — OGRLoader `wkt` terminal (ogr_reader_node.cpp:245).

    NOTE: triply-nested array columns (holes) cross the Arrow boundary
    as JSON strings — this environment's pyarrow segfaults converting a
    null/empty outer list<list<list<double>>> to pandas; to_json round-
    trips doubles exactly (shortest-repr) and sidesteps the crash."""
    if holes is None:
        @F.pandas_udf(T.StringType())
        def _f(s: pd.Series) -> pd.Series:
            flat, off = _ragged(s)
            return pd.Series(_g.rings_to_wkt(flat, off))

        return _f(ring)

    import json

    @F.pandas_udf(T.StringType())
    def _fh(s: pd.Series, hs: pd.Series) -> pd.Series:
        flat, off = _ragged(s)
        holes_rows = [None if h is None else json.loads(h) for h in hs]
        return pd.Series(_g.rings_to_wkt(flat, off, holes_rows))

    return _fh(ring, F.to_json(holes))


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


def buffer_ring(ring: Column, offset: float, method: str = "round", quad_segs: int = 8) -> Column:
    """Buffer -> struct(ring, ok) (PolygonBufferGEOS analog,
    geos_nodes.cpp:187-213; invalid result passes original through).

    method="round": Minkowski round-join buffer for convex rings
    (GEOS quadrantSegments semantics; negative = inward miter).
    method="bbox": the axis-aligned bbox kernel (exact for the
    engine's footprint quads, cheaper)."""
    out_t = T.StructType(
        [T.StructField("ring", RING_T), T.StructField("ok", T.BooleanType())]
    )
    kern = _g.buffer_convex_rings if method == "round" else _g.buffer_bbox_rings

    @F.pandas_udf(out_t)
    def _f(s: pd.Series) -> pd.DataFrame:
        flat, off = _ragged(s)
        if method == "round":
            nf, no, ok = kern(flat, off, offset, quad_segs)
        else:
            nf, no, ok = kern(flat, off, offset)
        return pd.DataFrame({"ring": _g.ragged_to_lists(nf, no), "ok": ok})

    return _f(ring)


# ---------------------------------------------------------------------------
# z / 2.5D helpers — reference geometry is xyz (arr3f,
# ogr_reader_node.cpp:93), with a base_elevation z-override (:93-97)
# ---------------------------------------------------------------------------

def ring_set_z(ring: Column, z: Column) -> Column:
    """Lift a 2D ring to xyz at constant z (or override an existing z)
    — the base_elevation knob, pure JVM."""
    return F.transform(ring, lambda p: F.array(p[0], p[1], z))


def ring_z0(ring: Column) -> Column:
    """z of the first vertex (null for 2D rings) — pure JVM."""
    return F.element_at(F.element_at(ring, 1), 3)


# ---------------------------------------------------------------------------
# WKT parse (input direction — OGR accepts WKT; interchange must be
# two-way). Pure JVM string ops: no Python stage in a WKT-ingest scan.
# ---------------------------------------------------------------------------

def parse_wkt_polygon(wkt: Column) -> Column:
    """'POLYGON ((x y[ z], ...))' -> exterior ring array<array<double>>
    in the engine canon (UNCLOSED: the closing vertex is dropped).
    Holes, if present, are ignored here — use parse_wkt_polygon_holes.
    Returns null for 'POLYGON EMPTY'."""
    body = F.regexp_extract(wkt, r"\(\(([^()]*)[\)]", 1)
    pts = F.split(body, r",\s*")
    ring = F.transform(
        pts, lambda p: F.transform(F.split(F.trim(p), r"\s+"), lambda v: v.cast("double"))
    )
    ring = F.slice(ring, 1, F.size(ring) - 1)  # drop the closing vertex
    return F.when(F.length(body) > 0, ring)


def parse_wkt_polygon_holes(wkt: Column) -> Column:
    """Hole rings of a POLYGON wkt as array<array<array<double>>>
    (empty array when none)."""
    inner = F.regexp_extract(wkt, r"^[A-Z Z]*\s*\((.*)\)\s*$", 1)
    rings = F.split(inner, r"\)\s*,\s*\(")
    rings = F.transform(rings, lambda s: F.regexp_replace(s, r"[()]", ""))
    parsed = F.transform(
        rings,
        lambda s: F.transform(
            F.split(s, r",\s*"),
            lambda p: F.transform(F.split(F.trim(p), r"\s+"), lambda v: v.cast("double")),
        ),
    )
    hole_rings = F.slice(parsed, 2, F.greatest(F.size(parsed) - 1, F.lit(0)))
    return F.transform(hole_rings, lambda r: F.slice(r, 1, F.size(r) - 1))


# ---------------------------------------------------------------------------
# LineString column ops (reference reads line_strings first-class,
# ogr_reader_node.cpp:254-263)
# ---------------------------------------------------------------------------

def line_length_col(points: Column) -> Column:
    """Planar length of a polyline array<array<double>> — pure JVM
    (zip consecutive vertices, aggregate hypot)."""
    n = F.size(points)
    segs = F.sequence(F.lit(0), n - 2)
    return F.when(
        n >= 2,
        F.aggregate(
            segs,
            F.lit(0.0),
            lambda acc, i: acc
            + F.sqrt(
                F.pow(F.get(points, i + 1)[0] - F.get(points, i)[0], 2)
                + F.pow(F.get(points, i + 1)[1] - F.get(points, i)[1], 2)
            ),
        ),
    ).otherwise(F.lit(0.0))


def linestring_wkt(points: Column) -> Column:
    """LINESTRING wkt from a points array — pure JVM formatting (%.9g
    parity with kernels.rings_to_wkt's float format is NOT claimed;
    this uses repr-style doubles)."""
    return F.concat(
        F.lit("LINESTRING ("),
        F.array_join(
            F.transform(
                points,
                lambda p: F.concat_ws(" ", F.transform(p, lambda v: v.cast("string"))),
            ),
            ", ",
        ),
        F.lit(")"),
    )


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

    import json

    @F.pandas_udf(T.BooleanType())
    def _fh(x: pd.Series, y: pd.Series, r: pd.Series, hs: pd.Series) -> pd.Series:
        flat, off = _ragged(r)
        holes_rows = [None if h is None else json.loads(h) for h in hs]
        return pd.Series(
            _g.point_in_polygon_pairwise(
                x.to_numpy(float), y.to_numpy(float), flat, off, holes_rows
            )
        )

    # holes cross the Arrow boundary as JSON (see ring_wkt note)
    return _fh(px, py, ring, F.to_json(holes))


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Haversine meters as a pure Column expression (JVM-side)."""
    r = 6371008.8
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    return 2 * r * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def ring_centroid(ring: Column) -> Column:
    """Area-weighted polygon centroid (the shoelace/Green's-theorem
    formula) of an UNCLOSED ring — pure JVM fold, orientation-
    independent (the signed area cancels in the Cx/Cy ratios).
    Returns struct(cx, cy); degenerate rings (|area| == 0, e.g. all
    points collinear) fall back to the vertex mean — defined for every
    input rather than NaN."""
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 1)

    def cross(i):
        p = F.get(ring, i)
        q = F.get(ring, F.pmod(i + 1, n))  # wrap last -> first
        return p[0] * q[1] - q[0] * p[1]

    acc0 = F.struct(
        F.lit(0.0).alias("a"), F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy")
    )
    folded = F.aggregate(
        idx,
        acc0,
        lambda acc, i: F.struct(
            (acc["a"] + cross(i)).alias("a"),
            (
                acc["sx"]
                + (F.get(ring, i)[0] + F.get(ring, F.pmod(i + 1, n))[0]) * cross(i)
            ).alias("sx"),
            (
                acc["sy"]
                + (F.get(ring, i)[1] + F.get(ring, F.pmod(i + 1, n))[1]) * cross(i)
            ).alias("sy"),
        ),
    )
    mean_x = F.aggregate(
        ring, F.lit(0.0), lambda acc, p: acc + p[0]
    ) / n.cast("double")
    mean_y = F.aggregate(
        ring, F.lit(0.0), lambda acc, p: acc + p[1]
    ) / n.cast("double")
    cx = F.when(
        folded["a"] != 0.0, folded["sx"] / (F.lit(3.0) * folded["a"])
    ).otherwise(mean_x)
    cy = F.when(
        folded["a"] != 0.0, folded["sy"] / (F.lit(3.0) * folded["a"])
    ).otherwise(mean_y)
    return F.struct(cx.alias("cx"), cy.alias("cy"))


def points_hull(points: Column) -> Column:
    """Convex hull of a point array (array<array<double>>) — Andrew's
    monotone chain (1979) with STRICT turns, so collinear boundary
    points are excluded. Returns struct(ring, n_hull, hull_area):
    hull ring CCW, unclosed, starting at the lexicographic-min vertex
    (canonical — deterministic across runs/engines); area by the
    shoelace formula (0 for degenerate <3-point hulls). Arrow-batched
    pandas UDF; per-ROW work is one numpy chain over that row's
    points (rows here are per-key aggregates, not raw points)."""
    out_t = T.StructType(
        [
            T.StructField("ring", T.ArrayType(T.ArrayType(T.DoubleType()))),
            T.StructField("n_hull", T.IntegerType()),
            T.StructField("hull_area", T.DoubleType()),
        ]
    )

    def _hull_one(arr) -> tuple:
        pts = np.asarray([np.asarray(p, dtype=np.float64) for p in arr])
        pts = np.unique(pts[:, :2], axis=0)  # lexicographic sort + dedup
        if len(pts) == 1:
            return ([pts[0].tolist()], 1, 0.0)

        def chain(seq):
            out: list = []
            for p in seq:
                while len(out) >= 2 and (
                    (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                    - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                ) <= 0:
                    out.pop()
                out.append(p)
            return out

        lower = chain(pts)
        upper = chain(pts[::-1])
        hull = lower[:-1] + upper[:-1]
        n = len(hull)
        area = 0.0
        for i in range(n):
            x0, y0 = hull[i][0], hull[i][1]
            x1, y1 = hull[(i + 1) % n][0], hull[(i + 1) % n][1]
            area += x0 * y1 - x1 * y0
        return ([p.tolist() for p in hull], n, abs(area) / 2.0)

    @F.pandas_udf(out_t)
    def _f(s: pd.Series) -> pd.DataFrame:
        rows = [_hull_one(arr) for arr in s]
        return pd.DataFrame(
            {
                "ring": [r[0] for r in rows],
                "n_hull": [r[1] for r in rows],
                "hull_area": [r[2] for r in rows],
            }
        )

    return _f(points)


def segmentize_ring(ring: Column, max_len: float, closed: bool = True) -> Column:
    """Densify so no segment exceeds ``max_len`` (the `ogr2ogr
    -segmentize` rule); original vertices preserved exactly."""

    @F.pandas_udf(RING_T)
    def _f(s: pd.Series) -> pd.Series:
        flat, off = _ragged(s)
        nf, no = _g.segmentize_rings(flat, off, max_len, closed=closed)
        return pd.Series(_g.ragged_to_lists(nf, no))

    return _f(ring)


def simplify_line(points: Column, tol: float) -> Column:
    """DP-simplify an OPEN polyline (endpoints anchored, no ring
    gates) — the line-layer side of `ogr2ogr -simplify`."""

    @F.pandas_udf(RING_T)
    def _f(s: pd.Series) -> pd.Series:
        flat, off = _ragged(s)
        nf, no = _g.simplify_lines(flat, off, tol)
        return pd.Series(_g.ragged_to_lists(nf, no))

    return _f(points)


def clip_ring_bbox(
    ring: Column, xmin: float, ymin: float, xmax: float, ymax: float
) -> Column:
    """Sutherland-Hodgman rect clip -> struct(ring, area). Fully
    outside rings come back empty with area 0.0 (the operator layer
    decides whether to drop them)."""
    out_t = T.StructType(
        [T.StructField("ring", RING_T), T.StructField("area", T.DoubleType())]
    )

    @F.pandas_udf(out_t)
    def _f(s: pd.Series) -> pd.DataFrame:
        flat, off = _ragged(s)
        nf, no = _g.clip_rings_bbox(flat, off, xmin, ymin, xmax, ymax)
        return pd.DataFrame(
            {"ring": _g.ragged_to_lists(nf, no),
             "area": np.abs(_g.signed_area(nf, no))}
        )

    return _f(ring)
