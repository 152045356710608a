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
    extent) fail loud, as does a key exceeding ``max_rects``.

    Execution: ONE collect_list aggregate (state bounded by
    ``max_rects`` rows/key) + a batched pandas UDF over the collected
    edge lists — the convex_hull_per_key shape. NOT applyInPandas:
    per-group Arrow round-trips cost ~2.5 ms/group (measured; 2000
    groups = 5 s), the batched UDF does the same work in one round
    trip per ~10k keys."""

    @F.pandas_udf("double")
    def _union(x0s, y0s, x1s, y1s):
        import pandas as pd

        out = np.empty(len(x0s), dtype=np.float64)
        for i in range(len(x0s)):
            x0 = np.asarray(x0s.iloc[i], dtype=np.float64)
            y0 = np.asarray(y0s.iloc[i], dtype=np.float64)
            x1 = np.asarray(x1s.iloc[i], dtype=np.float64)
            y1 = np.asarray(y1s.iloc[i], dtype=np.float64)
            if len(x0) > max_rects:
                raise ValueError(
                    f"{len(x0)} rects > max_rects={max_rects}; "
                    "pre-shard by x-range and sum shard areas"
                )
            if not ((x0 < x1).all() and (y0 < y1).all()):
                raise ValueError("degenerate rectangle in union group")
            xs = np.unique(np.concatenate([x0, x1]))
            ys = np.unique(np.concatenate([y0, y1]))
            d = np.zeros((len(xs), len(ys)), dtype=np.int32)
            np.add.at(d, (np.searchsorted(xs, x0), np.searchsorted(ys, y0)), 1)
            np.add.at(d, (np.searchsorted(xs, x0), np.searchsorted(ys, y1)), -1)
            np.add.at(d, (np.searchsorted(xs, x1), np.searchsorted(ys, y0)), -1)
            np.add.at(d, (np.searchsorted(xs, x1), np.searchsorted(ys, y1)), 1)
            cov = d.cumsum(axis=0).cumsum(axis=1)[:-1, :-1] > 0
            out[i] = float((np.outer(np.diff(xs), np.diff(ys)) * cov).sum())
        return pd.Series(out)

    agg = df.groupBy(by).agg(
        F.collect_list(xmin).alias("_x0"),
        F.collect_list(ymin).alias("_y0"),
        F.collect_list(xmax).alias("_x1"),
        F.collect_list(ymax).alias("_y1"),
    )
    return agg.select(
        by,
        F.size("_x0").cast("long").alias("n_rects"),
        _union("_x0", "_y0", "_x1", "_y1").alias("union_area"),
    )
