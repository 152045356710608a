"""Coordinate reference system transforms — vectorized numpy kernels.

The reference pushes every geometry through a pipeline-level SRS
transform on read (ogr_reader_node.cpp:220-224, applied :93-97,
:257-261) and the reverse transform on write (ogr_writer_node.cpp:179,
applied :42-57). This module is the engine's analog: pure-numpy
implementations of the PUBLIC projection formulas —

- WGS84 lon/lat <-> WebMercator (EPSG:3857): the spherical-Mercator
  closed form (slippy-map / EPSG:3857 spec).
- WGS84 lon/lat <-> Transverse Mercator (incl. every UTM zone): the
  Snyder series expansions (USGS Professional Paper 1395, eqs
  8-9..8-25), WGS84 ellipsoid, accurate to <1 mm within a zone.

CRS names accepted everywhere: "EPSG:4326" (identity), "EPSG:3857",
"EPSG:326NN"/"EPSG:327NN" (UTM zone NN north/south), "utm:NN[n|s]".
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "webmercator_fwd",
    "webmercator_inv",
    "tm_fwd",
    "tm_inv",
    "utm_params",
    "transform",
    "parse_crs",
]

WEBMERC_R = 6378137.0

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_E1 = (1.0 - math.sqrt(1.0 - _E2)) / (1.0 + math.sqrt(1.0 - _E2))


def webmercator_fwd(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees -> EPSG:3857 meters (spherical Mercator)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = WEBMERC_R * np.radians(lon)
    y = WEBMERC_R * np.log(np.tan(math.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_inv(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WEBMERC_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEBMERC_R)) - math.pi / 2.0)
    return lon, lat


def _meridian_arc(phi: np.ndarray) -> np.ndarray:
    """Meridian arc length M (Snyder 3-21), WGS84."""
    e2, e4, e6 = _E2, _E2**2, _E2**3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def tm_fwd(
    lon, lat, lon0: float, k0: float = 0.9996, fe: float = 500000.0, fn: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """Transverse Mercator forward (Snyder 8-9..8-15), WGS84."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam0 = math.radians(lon0)
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    n = _A / np.sqrt(1 - _E2 * sin_p**2)
    t = tan_p**2
    c = _EP2 * cos_p**2
    a_ = (lam - lam0) * cos_p
    m = _meridian_arc(phi)
    x = fe + k0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a_**5 / 120
    )
    y = fn + k0 * (
        m
        + n
        * tan_p
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    )
    return x, y


def tm_inv(
    x, y, lon0: float, k0: float = 0.9996, fe: float = 500000.0, fn: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """Transverse Mercator inverse (Snyder 8-17..8-25), WGS84."""
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    m = y / k0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    e1 = _E1
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = x / (n1 * k0)
    phi = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2) * d**6 / 720
    )
    lam = math.radians(lon0) + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
    ) / cos1
    return np.degrees(lam), np.degrees(phi)


def utm_params(zone: int, south: bool = False) -> dict:
    """UTM zone -> TM parameters (public definition)."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone {zone} out of range 1..60")
    return {
        "lon0": float(-183 + 6 * zone),
        "k0": 0.9996,
        "fe": 500000.0,
        "fn": 10000000.0 if south else 0.0,
    }


def parse_crs(crs: str) -> tuple[str, dict]:
    """CRS name -> (kind, params). kind in {lonlat, webmercator, tm}."""
    c = crs.strip().lower().replace(" ", "")
    if c in ("epsg:4326", "wgs84", "lonlat"):
        return "lonlat", {}
    if c in ("epsg:3857", "epsg:900913", "webmercator"):
        return "webmercator", {}
    if c.startswith("epsg:326") and len(c) == 10:
        return "tm", utm_params(int(c[8:]), south=False)
    if c.startswith("epsg:327") and len(c) == 10:
        return "tm", utm_params(int(c[8:]), south=True)
    if c.startswith("utm:"):
        tail = c[4:]
        south = tail.endswith("s")
        zone = int(tail.rstrip("ns"))
        return "tm", utm_params(zone, south=south)
    raise ValueError(f"unsupported CRS {crs!r} (EPSG:4326/3857, EPSG:326NN/327NN, utm:NN[n|s])")


def transform(x, y, src: str, dst: str) -> tuple[np.ndarray, np.ndarray]:
    """Transform coordinate arrays src -> dst (through lon/lat)."""
    skind, sp = parse_crs(src)
    dkind, dp = parse_crs(dst)
    if skind == "lonlat":
        lon, lat = np.asarray(x, np.float64), np.asarray(y, np.float64)
    elif skind == "webmercator":
        lon, lat = webmercator_inv(x, y)
    else:
        lon, lat = tm_inv(x, y, **sp)
    if dkind == "lonlat":
        return lon, lat
    if dkind == "webmercator":
        return webmercator_fwd(lon, lat)
    return tm_fwd(lon, lat, **dp)
