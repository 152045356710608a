"""Spatial column functions.

WebMercator tiling and footprint derivation are pure Column
expressions — they compile into whole-stage codegen and cost no
Python round-trip (check: ``df.explain`` shows no ArrowEvalPython for
tile_assign). Hex/S2 cell ids need the numpy kernels → pandas UDFs.

Footprint contract (FIXTURES.md §1): the georeference of an image is
derived ONLY from (phash, w, h):

    lon_c = (phash & 0xFFFFFFFF) / 2^32 * 360 - 180
    lat_c = ((phash >> 32) & 0xFFFFFFFF) / 2^32 * 170 - 85
    dlon  = w * 1e-4 ; dlat = h * 1e-4
    ring  = axis-aligned quad, CCW, unclosed   (ring canon of the
            reference: ogr_reader_node.cpp:86-99)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfp_gdal_spark.kernels import cells as _cells

_U32 = 4294967295  # 0xFFFFFFFF
_P32 = 4294967296.0  # 2^32
MAX_LAT = _cells.MAX_LAT_WEBMERC


# ---------------------------------------------------------------------------
# footprints (pure column math)
# ---------------------------------------------------------------------------

def footprint_cols(phash: Column, w: Column, h: Column) -> dict[str, Column]:
    """Center + half-extent columns of the deterministic footprint."""
    lon_c = (phash.bitwiseAND(F.lit(_U32)).cast("double") / F.lit(_P32)) * 360.0 - 180.0
    lat_c = (
        F.shiftright(phash, 32).bitwiseAND(F.lit(_U32)).cast("double") / F.lit(_P32)
    ) * 170.0 - 85.0
    return {
        "lon_c": lon_c,
        "lat_c": lat_c,
        "dlon": w.cast("double") * 1e-4,
        "dlat": h.cast("double") * 1e-4,
    }


def footprint_ring_col(lon_c: Column, lat_c: Column, dlon: Column, dlat: Column) -> Column:
    """CCW unclosed quad ring as array<array<double>>."""
    x0, x1 = lon_c - dlon, lon_c + dlon
    y0, y1 = lat_c - dlat, lat_c + dlat
    return F.array(
        F.array(x0, y0), F.array(x1, y0), F.array(x1, y1), F.array(x0, y1)
    )


def with_footprint(df: DataFrame, phash="phash", w="w", h="h") -> DataFrame:
    """images table -> + lon_c/lat_c/dlon/dlat/ring columns."""
    c = footprint_cols(F.col(phash), F.col(w), F.col(h))
    df = df.withColumns(c)
    return df.withColumn(
        "ring", footprint_ring_col(F.col("lon_c"), F.col("lat_c"), F.col("dlon"), F.col("dlat"))
    )


# ---------------------------------------------------------------------------
# WebMercator tiles (pure column math — slippy map spec; the same
# floor/ln/tan formula is used verbatim in the DuckDB oracles)
# ---------------------------------------------------------------------------

def tile_cols(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    n = float(1 << z)
    lat_cl = F.greatest(F.least(lat, F.lit(MAX_LAT)), F.lit(-MAX_LAT))
    lat_r = F.radians(lat_cl)
    xt = F.floor((lon + 180.0) / 360.0 * n)
    yt = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / F.lit(3.141592653589793)) / 2.0 * n
    )
    xt = F.greatest(F.least(xt, F.lit(int(n - 1))), F.lit(0)).cast("long")
    yt = F.greatest(F.least(yt, F.lit(int(n - 1))), F.lit(0)).cast("long")
    return xt, yt


def tile_cover_cols(
    min_lon: Column, min_lat: Column, max_lon: Column, max_lat: Column, z: int
) -> tuple[Column, Column, Column, Column]:
    """Inclusive tile ranges (x0,x1,y0,y1) covering a bbox. Explode with
    ``F.explode(F.sequence(x0, x1))`` — the multi-tile analog of the
    reference's multipolygon flatten (ogr_reader_node.cpp:281-291)."""
    x0, y1 = tile_cols(min_lon, min_lat, z)
    x1, y0 = tile_cols(max_lon, max_lat, z)
    return x0, x1, y0, y1


# ---------------------------------------------------------------------------
# hex / s2 cells (pandas UDFs over the numpy kernels)
# ---------------------------------------------------------------------------

def hex_cell(lon: Column, lat: Column, res: int) -> Column:
    @F.pandas_udf(T.LongType())
    def _enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(_cells.hex_encode(lo.to_numpy(), la.to_numpy(), res))

    return _enc(lon, lat)


def s2_cell(lon: Column, lat: Column, level: int) -> Column:
    @F.pandas_udf(T.LongType())
    def _enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(_cells.s2_encode(lo.to_numpy(), la.to_numpy(), level))

    return _enc(lon, lat)


def hex_kring(cell: Column, k: int) -> Column:
    """array<long> of the 3k(k+1)+1 cells within hex distance k
    (h3.grid_disk analog). Explode to turn a kNN search into an
    equi-join on cell id."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _disk(c: pd.Series) -> pd.Series:
        ids = _cells.hex_neighbors_of(c.to_numpy(), k)
        return pd.Series(list(ids))

    return _disk(cell)
