"""Line operators — the GEOSMergeLines analog (G3).

Reference (geos_nodes.cpp:234-283): build a collection of 2-point
segments and GEOSLineMerge them into polylines by joining touching
endpoints. Distributed re-expression: endpoints are quantized keys,
segments sharing an endpoint are edges of a graph, each merged
polyline is a connected component; the chain order is reconstructed per
component with a grouped pandas walk (components are small by nature —
they are single polylines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfp_gdal_spark.plans.graph import connected_components

__all__ = ["merge_lines"]


def _endpoint_key(x: str, y: str, quant: float):
    # quantized endpoint identity (GEOS merges exactly-touching nodes;
    # quantization gives float-robust identity)
    return F.concat_ws(
        ":",
        F.round(F.col(x) / quant).cast("long"),
        F.round(F.col(y) / quant).cast("long"),
    )


def merge_lines(
    segments: DataFrame,
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
    quant: float = 1e-9,
) -> DataFrame:
    """Merge touching 2-point segments into polylines.

    Input: one row per segment with endpoint columns. Output: one row
    per merged polyline: (line_id, points: array<array<double>>,
    n_segments). Segment direction is normalized during the walk, as
    GEOSLineMerge does.
    """
    seg = segments.withColumn("_sid", F.monotonically_increasing_id())
    seg = seg.withColumn("_k1", _endpoint_key(x1, y1, quant)).withColumn(
        "_k2", _endpoint_key(x2, y2, quant)
    )
    # graph: segment ids become vertices; two segments sharing an
    # endpoint key get an edge (via self-join per endpoint bucket)
    ends = seg.select(F.col("_sid"), F.explode(F.array("_k1", "_k2")).alias("_k"))
    a = ends.select(F.col("_k"), F.col("_sid").alias("src"))
    b = ends.select(F.col("_k"), F.col("_sid").alias("dst"))
    edges = a.join(b, "_k").where(F.col("src") < F.col("dst")).select("src", "dst")
    comps = connected_components(edges)
    labeled = seg.join(
        comps.withColumnRenamed("vertex", "_sid"), "_sid", "left"
    ).withColumn("component", F.coalesce("component", F.col("_sid")))

    out_schema = (
        "line_id long, chain_seq int, points array<array<double>>, n_segments int"
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        # chain the segments of ONE component into ordered polylines.
        # GEOSLineMerge emits MULTIPLE lines when a component branches
        # (an endpoint with degree >= 3): we restart the walk from any
        # remaining unused segment until every segment is consumed, so
        # no segment is silently dropped. chain_seq disambiguates the
        # chains of one component; n_segments counts THIS chain's
        # segments.
        pts = {}
        adj: dict[str, list[int]] = {}
        segs = []
        cols = zip(pdf["_k1"], pdf["_k2"], pdf[x1], pdf[y1], pdf[x2], pdf[y2])
        for i, (k1, k2, ax, ay, bx, by) in enumerate(cols):
            pts[k1] = [ax, ay]
            pts[k2] = [bx, by]
            segs.append((k1, k2))
            adj.setdefault(k1, []).append(i)
            adj.setdefault(k2, []).append(i)
        used: set[int] = set()
        chains: list[list[str]] = []
        while len(used) < len(segs):
            # prefer a degree-1 endpoint with an unused segment; else any
            start = next(
                (
                    k
                    for k, v in adj.items()
                    if len([i for i in v if i not in used]) == 1
                ),
                None,
            )
            if start is None:
                start = segs[next(i for i in range(len(segs)) if i not in used)][0]
            chain = [start]
            cur = start
            while True:
                nxt_i = next((i for i in adj.get(cur, []) if i not in used), None)
                if nxt_i is None:
                    break
                used.add(nxt_i)
                k1, k2 = segs[nxt_i]
                cur = k2 if k1 == cur else k1
                chain.append(cur)
            chains.append(chain)
        comp = int(pdf["component"].iloc[0])
        return pd.DataFrame(
            {
                "line_id": [comp] * len(chains),
                "chain_seq": list(range(len(chains))),
                "points": [[pts[k] for k in c] for c in chains],
                "n_segments": [len(c) - 1 for c in chains],
            }
        )

    return labeled.groupBy("component").applyInPandas(walk, out_schema)
