"""merge_lines (GEOSMergeLines analog) + connected components."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gfp_gdal_spark.operators.lines import merge_lines
from gfp_gdal_spark.plans.graph import connected_components


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7), (8, 9), (9, 10), (10, 8)],
        "src long, dst long",
    )
    out = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[5] == out[6] == 5
    assert out[8] == out[9] == out[10] == 8
    assert out[1] != out[5]


def test_merge_lines_two_chains(spark):
    # chain A: (0,0)-(1,0)-(2,0)-(3,0); chain B: (10,10)-(10,11)
    rows = [
        (0.0, 0.0, 1.0, 0.0),
        (2.0, 0.0, 1.0, 0.0),  # reversed direction on purpose
        (2.0, 0.0, 3.0, 0.0),
        (10.0, 10.0, 10.0, 11.0),
    ]
    seg = spark.createDataFrame(rows, "x1 double, y1 double, x2 double, y2 double")
    out = merge_lines(seg).collect()
    assert len(out) == 2
    by_n = {r["n_segments"]: r for r in out}
    chain = by_n[3]["points"]
    assert len(chain) == 4
    xs = [p[0] for p in chain]
    assert xs == sorted(xs) or xs == sorted(xs, reverse=True)  # ordered walk
    assert len(by_n[1]["points"]) == 2


def test_merge_lines_random_paths_reconstruct(spark):
    """Randomized reconstruction: K disjoint simple paths, segments
    emitted with random direction flips in random global order, must
    merge back into exactly the original polylines (up to reversal)."""
    import numpy as np

    rng = np.random.default_rng(42)
    paths = []
    for p in range(12):
        n = int(rng.integers(2, 30))
        # random walk with unique vertices; offset per path keeps them disjoint
        steps = rng.choice([(1, 0), (0, 1), (1, 1), (1, -1)], n - 1)
        pts = np.cumsum(np.vstack([[0, 0], steps]), axis=0).astype(float)
        # dedupe revisits (walk may self-cross): jitter y by index
        pts[:, 1] += np.arange(n) * 0.001
        pts[:, 0] += p * 1000.0
        paths.append(pts)
    rows = []
    for pts in paths:
        for i in range(len(pts) - 1):
            a, b = pts[i], pts[i + 1]
            if rng.random() < 0.5:
                a, b = b, a
            rows.append((float(a[0]), float(a[1]), float(b[0]), float(b[1])))
    rng.shuffle(rows)
    seg = spark.createDataFrame(rows, "x1 double, y1 double, x2 double, y2 double")
    out = merge_lines(seg).collect()
    assert len(out) == len(paths)
    want = {}
    for pts in paths:
        key = tuple(map(tuple, min(pts.tolist(), pts[::-1].tolist())))
        want[key] = len(pts)
    for r in out:
        got = [tuple(p) for p in r["points"]]
        key = tuple(min(got, got[::-1]))
        assert key in want, "unknown polyline"
        assert len(got) == want[key]
        assert r["n_segments"] == want[key] - 1
