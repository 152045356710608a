"""Spatial cell-index kernels: WebMercator tiles, hex cells (H3-style
API), S2-style cube-face Hilbert cells. Pure numpy, fully vectorized.

The reference has no spatial index (its joins live elsewhere in
geoflow); these implement the BASELINE.json north_rule requirements.
The WebMercator math is the public slippy-map spec; the S2-style id is
the public cube-face + Hilbert-curve construction; the hex grid is OUR
OWN documented spec ("hexlite") with an API that mirrors the public
h3 package (latlng_to_cell / grid_disk / cell_to_parent) so the real
h3 wheel can be swapped in on a cluster — bit-compat with Uber H3 is
explicitly NOT claimed (no h3 available offline; see SURVEY.md §7.3c).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "lonlat_to_tile",
    "tile_range_for_bbox",
    "hex_encode",
    "hex_to_center",
    "hex_parent",
    "hex_disk_offsets",
    "hex_neighbors_of",
    "hex_cover_bbox",
    "s2_encode",
    "HEX_BASE_SIZE_DEG",
    "MAX_LAT_WEBMERC",
]

MAX_LAT_WEBMERC = 85.05112878


# ---------------------------------------------------------------------------
# WebMercator z/x/y tiles (slippy map spec) — the `tile_assign` core.
# Same formula is SQL-expressible (floor/ln/tan), which is what the
# DuckDB oracles use.
# ---------------------------------------------------------------------------

def lonlat_to_tile(lon, lat, z: int) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT_WEBMERC, MAX_LAT_WEBMERC)
    n = float(1 << z)
    xt = np.floor((lon + 180.0) / 360.0 * n)
    lat_r = np.radians(lat)
    yt = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / math.pi) / 2.0 * n)
    xt = np.clip(xt, 0, n - 1).astype(np.int64)
    yt = np.clip(yt, 0, n - 1).astype(np.int64)
    return xt, yt


def tile_range_for_bbox(min_lon, min_lat, max_lon, max_lat, z: int):
    """Tile index ranges covering each bbox: (x0, x1, y0, y1) inclusive."""
    x0, y1 = lonlat_to_tile(min_lon, min_lat, z)  # south-west: max y
    x1, y0 = lonlat_to_tile(max_lon, max_lat, z)  # north-east: min y
    return x0, x1, y0, y1


# ---------------------------------------------------------------------------
# "hexlite" hex grid — our documented spec (h3-style API).
#
# Pointy-top hexes in (lon, lat)-degree space, axial coordinates (q, r):
#   size(res) = HEX_BASE_SIZE_DEG * 7**(-res/2)      (aperture-7 scaling,
#                                                     like H3's res steps)
#   x = lon, y = lat
#   qf = (sqrt(3)/3 * x - 1/3 * y) / size ; rf = (2/3 * y) / size
#   (q, r) = cube_round(qf, rf)
# Cell id packing (fits a positive int64):
#   id = (res << 59) | (zigzag(q) << 28) | zigzag(r)
# with zigzag(v) = (v << 1) ^ (v >> 63). Field widths (worst case at
# res 15, size = 7^-7.5 ≈ 4.6e-7 deg, lon in ±180, lat in ±90):
#   |q| <= (sqrt(3)/3*180 + 90/3)/size ≈ 2.92e8  -> zigzag < 2^31 (31 bits)
#   |r| <= (2/3*90)/size               ≈ 1.31e8  -> zigzag < 2^28 (28 bits)
#   res <= 15                                     -> 4 bits at 59..62
# so the id stays a positive int64 through res 15 for the full lon/lat
# domain (res 15 << 59 = 8.65e18 < 2^63). res > 15 raises.
# ---------------------------------------------------------------------------

HEX_BASE_SIZE_DEG = 1.0
HEX_MAX_RES = 15
HEX_RES_SHIFT = 59
HEX_Q_SHIFT = 28
HEX_R_MASK = (1 << 28) - 1
HEX_Q_MASK = (1 << 31) - 1
_SQ3 = math.sqrt(3.0)


def _hex_size(res: int) -> float:
    return HEX_BASE_SIZE_DEG * (7.0 ** (-res / 2.0))


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return (u >> 1) ^ -(u & 1)


def _pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    if res > HEX_MAX_RES:
        raise ValueError(f"hexlite res {res} > max {HEX_MAX_RES} (id packing overflows)")
    return (np.int64(res) << HEX_RES_SHIFT) | (_zigzag(q) << HEX_Q_SHIFT) | _zigzag(r)


def _unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> HEX_RES_SHIFT
    q = _unzigzag((cell >> HEX_Q_SHIFT) & HEX_Q_MASK)
    r = _unzigzag(cell & HEX_R_MASK)
    return res, q, r


def hex_encode(lon, lat, res: int) -> np.ndarray:
    """lat/lng -> hexlite cell id at ``res`` (h3.latlng_to_cell analog)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    size = _hex_size(res)
    qf = (_SQ3 / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 / 3.0 * lat) / size
    q, r = _cube_round(qf, rf)
    return _pack(res, q, r)


def hex_to_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lon, lat) of the hex center (h3.cell_to_latlng analog)."""
    res, q, r = _unpack(cell)
    size = HEX_BASE_SIZE_DEG * np.power(7.0, -res.astype(np.float64) / 2.0)
    # inverse of hex_encode: y = 1.5*r*s, x = sqrt3*s*(q + r/2)
    lat = 1.5 * r * size
    lon = _SQ3 * (q + r / 2.0) * size
    return lon, lat


def hex_parent(cell, parent_res: int) -> np.ndarray:
    """Coarser-res cell containing this cell's center
    (h3.cell_to_parent analog; deterministic, spec-defined)."""
    lon, lat = hex_to_center(cell)
    return hex_encode(lon, lat, parent_res)


def hex_disk_offsets(k: int) -> np.ndarray:
    """All axial (dq, dr) offsets within hex distance k (incl. center):
    the h3.grid_disk neighborhood, 3k(k+1)+1 cells. Small; computed on
    the driver and joined via explode."""
    offs = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            offs.append((dq, dr))
    return np.asarray(offs, dtype=np.int64)


def hex_neighbors_of(cell, k: int) -> np.ndarray:
    """grid_disk: [n, 3k(k+1)+1] neighbor ids per input cell."""
    res, q, r = _unpack(cell)
    offs = hex_disk_offsets(k)
    qq = q[:, None] + offs[None, :, 0]
    rr = r[:, None] + offs[None, :, 1]
    return (res[:, None] << HEX_RES_SHIFT) | (_zigzag(qq) << HEX_Q_SHIFT) | _zigzag(rr)


def hex_cover_bbox(min_lon, min_lat, max_lon, max_lat, res: int):
    """Hex cells covering each bbox (SUPERSET cover): axial ranges of
    the bbox corners expanded by a +2-cell margin, so every hex whose
    interior intersects the bbox is included (a point's own hex center
    can sit up to one circumradius outside the bbox). Returns
    (cell_ids flat array, row_index flat array) — the explode feed of
    the hex-bucketed pip_join.

    Coverage guarantee (used by pip_join correctness): a point P inside
    the bbox maps to hex H(P); H(P)'s center is within circumradius s
    of P, so its axial coords lie within the corner axial range +-
    ceil(s-effect) <= 2 cells. Superset covers only cost join width,
    never correctness (the refine is exact)."""
    if res > HEX_MAX_RES:
        raise ValueError(f"hexlite res {res} > max {HEX_MAX_RES} (id packing overflows)")
    min_lon = np.asarray(min_lon, dtype=np.float64)
    min_lat = np.asarray(min_lat, dtype=np.float64)
    max_lon = np.asarray(max_lon, dtype=np.float64)
    max_lat = np.asarray(max_lat, dtype=np.float64)
    size = _hex_size(res)

    def axial_f(lon, lat):
        qf = (_SQ3 / 3.0 * lon - lat / 3.0) / size
        rf = (2.0 / 3.0 * lat) / size
        return qf, rf

    # axial coords of the 4 corners
    qs, rs = [], []
    for lon, lat in [
        (min_lon, min_lat),
        (max_lon, min_lat),
        (min_lon, max_lat),
        (max_lon, max_lat),
    ]:
        qf, rf = axial_f(lon, lat)
        qs.append(qf)
        rs.append(rf)
    q0 = np.floor(np.minimum.reduce(qs)).astype(np.int64) - 2
    q1 = np.ceil(np.maximum.reduce(qs)).astype(np.int64) + 2
    r0 = np.floor(np.minimum.reduce(rs)).astype(np.int64) - 2
    r1 = np.ceil(np.maximum.reduce(rs)).astype(np.int64) + 2
    nq = q1 - q0 + 1
    nr = r1 - r0 + 1
    counts = (nq * nr).astype(np.int64)
    n = len(counts)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    total = int(counts.sum())
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
    )
    nr_rep = np.repeat(nr, counts)
    q = np.repeat(q0, counts) + intra // nr_rep
    r = np.repeat(r0, counts) + intra % nr_rep
    res_arr = np.full(total, res, dtype=np.int64)
    cells = (res_arr << HEX_RES_SHIFT) | (_zigzag(q) << HEX_Q_SHIFT) | _zigzag(r)
    return cells, row


# ---------------------------------------------------------------------------
# S2-style cells: cube face + quadratic ST transform + Hilbert curve.
# Public construction (S2 geometry papers/docs); vectorized bit loop.
# id = face * 4**level + hilbert_position  (distinct from real S2's
# bit layout — we don't claim bit-compat, only the same geometry).
# ---------------------------------------------------------------------------

def s2_encode(lon, lat, level: int) -> np.ndarray:
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    # (u, v) on the face in [-1, 1]
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (un, vn, dn) in enumerate(
        [(1, 2, 0), (2, 0, 1), (0, 1, 2), (1, 2, 0), (2, 0, 1), (0, 1, 2)]
    ):
        m = face == f
        if not m.any():
            continue
        comps = (x, y, z)
        denom = comps[dn][m]
        sgn = 1.0 if f < 3 else -1.0
        u[m] = comps[un][m] / (sgn * denom)
        v[m] = comps[vn][m] / (sgn * denom)
    # quadratic uv->st (public S2 transform), st in [0,1]
    def uv_to_st(w):
        with np.errstate(invalid="ignore"):
            return np.where(w >= 0, 0.5 * np.sqrt(1 + 3 * w), 1 - 0.5 * np.sqrt(1 - 3 * w))

    s = np.clip(uv_to_st(u), 0, np.nextafter(1, 0))
    t = np.clip(uv_to_st(v), 0, np.nextafter(1, 0))
    n = np.int64(1) << level
    i = np.minimum((s * n).astype(np.int64), n - 1)
    j = np.minimum((t * n).astype(np.int64), n - 1)
    # vectorized Hilbert d2xy inverse (xy2d), standard bit-twiddling loop
    rx = np.zeros_like(i)
    d = np.zeros_like(i)
    ii, jj = i.copy(), j.copy()
    sbit = np.int64(1) << (level - 1) if level > 0 else np.int64(0)
    while sbit > 0:
        rx = ((ii & sbit) > 0).astype(np.int64)
        ry = ((jj & sbit) > 0).astype(np.int64)
        d += sbit * sbit * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        ii_f = np.where(flip, sbit - 1 - ii, ii)
        jj_f = np.where(flip, sbit - 1 - jj, jj)
        ii, jj = np.where(swap, jj_f, ii_f), np.where(swap, ii_f, jj_f)
        sbit >>= 1
    return face * (np.int64(1) << (2 * level)) + d
