"""Coverage aggregation: exact per-key union area of axis-aligned
footprints (scene/flight-strip coverage, AOI completeness, mosaic
acceptance) — the dissolve-lite the reference's OGR pipelines run as
`ogr2ogr ... -dialect sqlite "SELECT ST_Union(...)"`; here restricted
to the bbox/footprint rectangles the engine's image table carries
(input_hint: every image row IS an axis-aligned footprint), which
makes the union EXACT with no polygon-clipping library.

Algorithm (public, the classic rectangle-union sweep in its 2-D
difference-array form): per key, compress the distinct x and y edges
to a grid of at most (2m-1)^2 cells, mark each rectangle with +1/-1
corners in a difference matrix, double prefix-sum to coverage counts,
and sum cell areas where count > 0. Fully vectorized numpy per group —
two np.add.at scatters, two cumsums, one masked dot.

Scale: ONE shuffle (groupBy key). Per-key state is O(m^2) cells for m
rectangles — fail-loud capped by ``max_rects`` (default 10k -> ~400M
cells would be the runaway; real scene groups are 10s-1000s). For a
genuinely hot key, pre-shard by x-range (union area is mergeable
across disjoint x-slabs) and sum the shard areas — the asof/bm25
sharding pattern; not built in until a workload needs it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["coverage_area"]


def coverage_area(
    df: DataFrame,
    by: str,
    xmin: str = "xmin",
    ymin: str = "ymin",
    xmax: str = "xmax",
    ymax: str = "ymax",
    max_rects: int = 10_000,
) -> DataFrame:
    """Per-``by`` exact area of the UNION of axis-aligned rectangles
    -> (by, n_rects, union_area). Degenerate rectangles (zero/negative
    extent) fail loud, as does a key exceeding ``max_rects``."""
    by_t = dict(df.dtypes)[by]
    out_schema = f"{by} {by_t}, n_rects long, union_area double"
    cols = [by, xmin, ymin, xmax, ymax]

    def op(key, pdf):
        import pandas as pd

        m = len(pdf)
        if m > max_rects:
            raise ValueError(
                f"key {key[0]!r} has {m} rects > max_rects={max_rects}; "
                "pre-shard by x-range and sum shard areas"
            )
        x0 = pdf[xmin].to_numpy(np.float64)
        y0 = pdf[ymin].to_numpy(np.float64)
        x1 = pdf[xmax].to_numpy(np.float64)
        y1 = pdf[ymax].to_numpy(np.float64)
        if not ((x0 < x1).all() and (y0 < y1).all()):
            raise ValueError(f"degenerate rectangle under key {key[0]!r}")
        xs = np.unique(np.concatenate([x0, x1]))
        ys = np.unique(np.concatenate([y0, y1]))
        ix0 = np.searchsorted(xs, x0)
        ix1 = np.searchsorted(xs, x1)
        iy0 = np.searchsorted(ys, y0)
        iy1 = np.searchsorted(ys, y1)
        d = np.zeros((len(xs), len(ys)), dtype=np.int32)
        np.add.at(d, (ix0, iy0), 1)
        np.add.at(d, (ix0, iy1), -1)
        np.add.at(d, (ix1, iy0), -1)
        np.add.at(d, (ix1, iy1), 1)
        cov = d.cumsum(axis=0).cumsum(axis=1)[:-1, :-1] > 0
        area = float((np.outer(np.diff(xs), np.diff(ys)) * cov).sum())
        return pd.DataFrame({by: [key[0]], "n_rects": [m], "union_area": [area]})

    return df.select(*cols).groupBy(by).applyInPandas(op, out_schema)
