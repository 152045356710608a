"""Property tests for the round-3 operators: bucketed asof parity on
random data, and the general (concave) buffer's closed-form area on
random star-shaped polygons."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from gfp_gdal_spark.kernels import geom as G


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**6), st.integers(4, 12), st.floats(0.01, 0.3))
def test_buffer_star_polygon_closed_form(seed, n_verts, r):
    """Random star-shaped (radial) polygons are always simple; when the
    buffer succeeds its area must equal
    A + P*r + sum_cvx (r^2/2)*m*sin(theta/m) - sum_rfx r^2*tan(beta/2);
    when it passes through (topology change) the ring is unchanged."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    # enforce distinct angles so edges have nonzero length
    if np.min(np.diff(ang, append=ang[0] + 2 * np.pi)) < 1e-3:
        return
    rad = rng.uniform(1.0, 3.0, n_verts)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    flat, off = G.ragged_from_lists([ring.tolist()])
    quad_segs = 8
    nf, no, ok = G.buffer_convex_rings(flat, off, r, quad_segs=quad_segs)
    if not ok[0]:
        assert (nf == flat).all()
        return
    # closed form from the ring's own turn angles — computed on the
    # CCW orientation, as the kernel normalizes before offsetting (a
    # radial ring not containing the origin can come out CW; the turn
    # convex/reflex classification flips with orientation)
    A = float(G.signed_area(flat, off)[0])
    if A < 0:
        ring = ring[::-1]
        A = -A
    d = np.roll(ring, -1, axis=0) - ring
    P = float(np.hypot(d[:, 0], d[:, 1]).sum())
    step_max = math.pi / 2.0 / quad_segs
    extra = 0.0
    for j in range(n_verts):
        v_in, v_out = d[j - 1], d[j]
        cross = v_in[0] * v_out[1] - v_in[1] * v_out[0]
        dot = float(v_in @ v_out)
        theta = math.atan2(abs(cross), dot)
        if cross >= 0:  # convex: polygonalized arc
            m = max(int(math.ceil(theta / step_max - 1e-12)), 1)
            extra += (r * r / 2.0) * m * math.sin(theta / m)
        else:  # reflex: miter overlap
            extra -= r * r * math.tan(theta / 2.0)
    got = float(G.signed_area(nf, no)[0])
    assert got == pytest.approx(A + P * r + extra, rel=1e-9, abs=1e-9)


def test_asof_bucketed_random_parity(spark):
    """Randomized parity across bucket widths with null right values,
    duplicate timestamps, and keys missing on one side."""
    from gfp_gdal_spark.operators.temporal import asof_join

    rng = np.random.default_rng(99)
    nl, nr = 600, 300
    l_pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, nl),          # key 5 missing on right
            "t": rng.integers(0, 500, nl).astype("float") / 2.0,
            "lid": range(nl),
        }
    )
    r_pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, nr),
            # unique right timestamps: ties between RIGHT rows are
            # resolved arbitrarily by both variants, so parity on `v`
            # is only well-defined without them
            "t": rng.choice(2000, nr, replace=False).astype("float") / 2.0,
            "v": [None if i % 7 == 0 else float(i) for i in range(nr)],
        }
    )
    l = spark.createDataFrame(l_pdf)
    r = spark.createDataFrame(r_pdf)
    base = {row["lid"]: row["v"] for row in asof_join(l, r, on="t", by="k").collect()}
    # pandas reference (merge_asof needs sorted; allow ties -> last right wins
    # is direction-dependent, so just compare bucketed vs unbucketed Spark)
    for width in (1.0, 17.5, 250.0, 10_000.0):
        got = {
            row["lid"]: row["v"]
            for row in asof_join(l, r, on="t", by="k", bucket_width=width).collect()
        }
        assert got == base, f"width={width}"
