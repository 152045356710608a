"""Property tests for the round-3 operators: bucketed asof parity on
random data, and the general (concave) buffer's closed-form area on
random star-shaped polygons."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import example, given, settings, strategies as st

from pyspark.sql import functions as F

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
    for direction in ("backward", "forward"):
        base = {
            row["lid"]: row["v"]
            for row in asof_join(l, r, on="t", by="k", direction=direction).collect()
        }
        # numpy reference on the unbucketed result (unique right ts, so
        # the answer is well-defined): per left row, the right row with
        # max t<=lt (backward) / min t>=lt (forward) in the same key
        rk, rt = r_pdf["k"].to_numpy(), r_pdf["t"].to_numpy()
        rv = r_pdf["v"].to_numpy(dtype=object)
        for _, row in l_pdf.iterrows():
            m = rk == row["k"]
            m &= (rt <= row["t"]) if direction == "backward" else (rt >= row["t"])
            if not m.any():
                assert base[row["lid"]] is None, (direction, row["lid"])
            else:
                j = rt[m].argmax() if direction == "backward" else rt[m].argmin()
                want = rv[m][j]
                if pd.isna(want):  # matched row carries a NULL value
                    assert base[row["lid"]] is None, (direction, row["lid"])
                else:
                    assert base[row["lid"]] == want, (direction, row["lid"])
        for width in (1.0, 17.5, 250.0, 10_000.0):
            got = {
                row["lid"]: row["v"]
                for row in asof_join(
                    l, r, on="t", by="k", direction=direction, bucket_width=width
                ).collect()
            }
            assert got == base, f"direction={direction} width={width}"


# ---------------------------------------------------------------------------
# radius_join antimeridian / pole-band properties (VERDICT r03 ask #6)
# ---------------------------------------------------------------------------

def _haversine_np(lon1, lat1, lon2, lat2):
    """numpy twin of functions.geometry.haversine_m (same sphere R);
    inherently periodic in dlon, so it is wrap-correct by construction."""
    r = 6371008.8
    p1, p2 = np.radians(lat1), np.radians(lat2)
    a = (
        np.sin(np.radians(lat2 - lat1) / 2) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(np.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * r * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def _scatter(rng, lon0, lat0, radius_m, n):
    """n points scattered within ~1.6 radii of (lon0, lat0), longitudes
    wrapped to [-180, 180) so clusters straddling the antimeridian
    arrive in the discontinuous representation the join must handle."""
    deg = radius_m / 111_194.9
    lat = np.clip(lat0 + rng.uniform(-1.6, 1.6, n) * deg, -88.5, 88.5)
    lon = lon0 + rng.uniform(-1.6, 1.6, n) * deg / np.maximum(np.cos(np.radians(lat)), 0.05)
    lon = (lon + 180.0) % 360.0 - 180.0
    return lon, lat


@settings(max_examples=10, deadline=None)
@given(
    st.integers(0, 10**6),
    st.floats(-179.9, 179.9),
    st.floats(-84.0, 84.0),
    st.floats(30_000.0, 400_000.0),
)
@example(seed=1, lon0=179.9, lat0=0.0, radius_m=120_000.0).via("antimeridian equator")
@example(seed=2, lon0=-179.95, lat0=72.0, radius_m=250_000.0).via("antimeridian high lat")
@example(seed=3, lon0=179.5, lat0=-83.5, radius_m=300_000.0).via("antimeridian + guard band south")
@example(seed=4, lon0=0.0, lat0=84.0, radius_m=400_000.0).via("guard band north, no wrap")
@example(seed=5, lon0=120.0, lat0=0.0, radius_m=30_000.0).via("plain equator control")
def test_radius_join_wrap_parity_bruteforce(spark, seed, lon0, lat0, radius_m):
    """radius_join must return EXACTLY the brute-force haversine pair
    set — same pairs, same distances, no duplicates — for clusters
    straddling the antimeridian and reaching into the polar guard band."""
    from gfp_gdal_spark.operators.joins import radius_join

    rng = np.random.default_rng(seed)
    llon, llat = _scatter(rng, lon0, lat0, radius_m, 14)
    rlon, rlat = _scatter(rng, lon0, lat0, radius_m, 26)
    l = spark.createDataFrame(
        pd.DataFrame({"lid": range(14), "q_lon": llon, "q_lat": llat})
    )
    r = spark.createDataFrame(
        pd.DataFrame({"rid": range(26), "lon_c": rlon, "lat_c": rlat})
    )
    # brute force over all 14 x 26 pairs
    d = _haversine_np(llon[:, None], llat[:, None], rlon[None, :], rlat[None, :])
    want = {
        (i, j): d[i, j]
        for i in range(14)
        for j in range(26)
        if d[i, j] <= radius_m
    }
    dlat_deg = radius_m * (180.0 / (np.pi * 6_371_008.8)) * 1.0001
    max_lat = min(max(np.abs(llat).max(), np.abs(rlat).max()), 89.0)
    if dlat_deg >= 90.0 - max_lat:
        with pytest.raises(ValueError, match="pole"):
            radius_join(l, r, radius_m).collect()
        return
    rows = radius_join(l, r, radius_m).collect()
    got = {(row["lid"], row["rid"]): row["dist_m"] for row in rows}
    assert len(rows) == len(got), "duplicate pairs emitted"
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-6)


def test_radius_join_pole_guard_raises(spark):
    """A radius that bridges the pole cap above the data's max |lat|
    must fail loud (the lon/lat lattice cannot cover a pole cap)."""
    from gfp_gdal_spark.operators.joins import radius_join

    l = spark.createDataFrame(
        pd.DataFrame({"lid": [0], "q_lon": [10.0], "q_lat": [88.9]})
    )
    r = spark.createDataFrame(
        pd.DataFrame({"rid": [0], "lon_c": [12.0], "lat_c": [88.95]})
    )
    with pytest.raises(ValueError, match="pole"):
        radius_join(l, r, 150_000.0).collect()


def test_asof_bucketed_hot_key_plan_and_partition_bound(spark):
    """The bucketed asof path's scale claim, checked in the plan and in
    the data: with bucket_width set, the carry-forward Window must
    partition on (by, _bkt) — never on the bare hot key — and the
    largest (by, _bkt) window partition on a synthetic one-key firehose
    must stay ~n_rows/n_buckets, not n_rows."""
    import re

    from gfp_gdal_spark.operators.temporal import asof_join

    n, width, span = 40_000, 25.0, 10_000.0  # one hot key, 400 buckets
    rows = spark.range(n).select(
        F.lit("HOTKEY").alias("k"),
        (F.col("id") % int(span)).cast("double").alias("t"),
        F.col("id").alias("lid"),
    )
    quotes = spark.range(500).select(
        F.lit("HOTKEY").alias("k"),
        (F.col("id") * (span / 500)).cast("double").alias("t"),
        F.col("id").cast("double").alias("v"),
    )
    out = asof_join(rows, quotes, on="t", by="k", bucket_width=width)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window over the event stream must include _bkt in its
    # partition spec; a Window partitioned on the bare key alone is
    # the single-partition-sort trap (the cascade window over
    # O(#buckets) rows per key is the one legitimate exception —
    # identified by its _bkt_eff ordering column). Spark prints specs
    # as windowspecdefinition(part..., order ASC/DESC..., frame).
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs, "no Window nodes found in the physical plan"
    checked = 0
    for spec in specs:
        toks = [t.strip() for t in spec.split(",")]
        part = [t for t in toks if "ASC" not in t and "DESC" not in t and "frame" not in t]
        order = [t for t in toks if "ASC" in t or "DESC" in t]
        if any("_bkt_eff" in t for t in order):
            continue  # the O(#buckets)-row carry-in cascade
        assert any("_bkt" in t for t in part), f"Window partitions on {part!r} only"
        checked += 1
    assert checked >= 2  # carry-forward window + per-bucket last-row window
    # empirical bound: max rows in any (k, _bkt) partition of the
    # unioned stream is (n + n_quotes) / n_buckets, far below n
    per_bucket = (
        rows.select("k", "t").unionByName(quotes.select("k", "t"))
        .groupBy("k", F.floor(F.col("t") / width).alias("b"))
        .count()
        .agg(F.max("count").alias("mx"))
        .first()
        .mx
    )
    assert per_bucket <= (n + 500) / (span / width) * 1.5
    assert per_bucket < n / 100
    # and the output is still the exact asof answer
    base = asof_join(rows, quotes, on="t", by="k")
    assert out.select("lid", "v").exceptAll(base.select("lid", "v")).count() == 0
    assert base.select("lid", "v").exceptAll(out.select("lid", "v")).count() == 0


def test_interval_join_random_parity(spark):
    """interval_join vs a numpy brute-force overlap matrix: random
    interval sets across several bin widths (canonical-bin dedup must
    emit every overlapping pair exactly once — including intervals
    spanning many bins, zero-length intervals, and negative coords)."""
    from gfp_gdal_spark.operators.temporal import interval_join

    rng = np.random.default_rng(4)
    nl, nr = 80, 120
    l_lo = rng.uniform(-500, 500, nl)
    l_hi = l_lo + rng.choice([0.0, 1.0, 30.0, 400.0], nl) * rng.uniform(0.0, 1.0, nl)
    r_lo = rng.uniform(-500, 500, nr)
    r_hi = r_lo + rng.choice([0.0, 2.0, 50.0, 300.0], nr) * rng.uniform(0.0, 1.0, nr)
    want = {
        (i, j)
        for i in range(nl)
        for j in range(nr)
        if l_lo[i] <= r_hi[j] and r_lo[j] <= l_hi[i]
    }
    l = spark.createDataFrame(
        pd.DataFrame({"lid": range(nl), "l_lo": l_lo, "l_hi": l_hi})
    )
    r = spark.createDataFrame(
        pd.DataFrame({"rid": range(nr), "r_lo": r_lo, "r_hi": r_hi})
    )
    for w in (7.0, 100.0, 5000.0):
        rows = interval_join(
            l, r, bin_width=w, l_lo="l_lo", l_hi="l_hi", r_lo="r_lo", r_hi="r_hi"
        ).collect()
        got = [(row["lid"], row["rid"]) for row in rows]
        assert len(got) == len(set(got)), f"duplicate pairs at width {w}"
        assert set(got) == want, f"width {w}"


def test_range_join_random_parity(spark):
    """range_join (points-in-intervals) vs the brute-force containment
    matrix across bin widths, with zero-length intervals, negative
    coords, and points exactly on interval bounds."""
    from gfp_gdal_spark.operators.temporal import range_join

    rng = np.random.default_rng(11)
    npts, niv = 300, 60
    v = np.round(rng.uniform(-400, 400, npts), 1)  # decimals land on bounds
    lo = np.round(rng.uniform(-400, 400, niv), 1)
    hi = lo + rng.choice([0.0, 5.0, 80.0, 300.0], niv) * rng.uniform(0, 1, niv)
    hi = np.round(hi, 1)
    pts = spark.createDataFrame(pd.DataFrame({"pid": range(npts), "v": v}))
    ivs = spark.createDataFrame(pd.DataFrame({"iid": range(niv), "lo": lo, "hi": hi}))
    want = {
        (i, j) for i in range(npts) for j in range(niv) if lo[j] <= v[i] <= hi[j]
    }
    for w in (3.0, 50.0, 2000.0):
        got = [
            (r["pid"], r["iid"])
            for r in range_join(pts, ivs, val="v", lo="lo", hi="hi", bin_width=w).collect()
        ]
        assert len(got) == len(set(got)), f"duplicates at width {w}"
        assert set(got) == want, f"width {w}"
    # half-open bounds drop the hi-equal matches
    ho = {
        (r["pid"], r["iid"])
        for r in range_join(
            pts, ivs, val="v", lo="lo", hi="hi", bin_width=50.0, how_bounds="halfopen"
        ).collect()
    }
    want_ho = {(i, j) for (i, j) in want if v[i] < hi[j]}
    assert ho == want_ho
