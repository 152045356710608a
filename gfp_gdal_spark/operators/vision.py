"""Detection-box operators: IoU-threshold join and per-image greedy
non-maximum suppression — the two primitives every vision training-data
pipeline runs between "model emitted boxes" and "boxes became labels"
(pseudo-label filtering, detector-vs-annotation matching, duplicate
proposal pruning). The reference's per-feature geometry nodes stop at
polygons (gdal_nodes.cpp / geos nodes); detection boxes are the image-
payload analog of its rectangle footprints, so these live beside
``bbox_join`` rather than inside it: boxes are keyed BY IMAGE (pixel
space, an equi-join key), not by a global tile grid.

Scale notes (100 TB / 10^12-image design point):

- ``iou_match_join`` is one equi-join on the image key + pure-JVM
  column algebra. Boxes-per-image is bounded (detectors emit 10^2-10^3),
  so the per-key fan-out is a small constant and the join never skews
  beyond it; AQE handles the residual. Integer pixel coordinates keep
  every area/IoU EXACT (BIGINT products), so thresholding is a
  cross-multiplied integer gate, not a float epsilon.
- ``nms_boxes`` groups by image with ONE shuffle (collect_list
  aggregate, state = boxes-per-image, fail-loud capped) and runs the
  greedy sweep vectorized per image inside a batched pandas UDF — the
  ``coverage_area`` execution shape: one Arrow round trip per ~10k
  images, never per image, never per row.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["iou_match_join", "nms_boxes"]


def _inter_union(
    l: tuple[Column, Column, Column, Column],
    r: tuple[Column, Column, Column, Column],
) -> tuple[Column, Column]:
    """(intersection_area, union_area) of two axis-aligned boxes as
    BIGINT Columns — exact for integer pixel coordinates."""
    iw = F.least(l[2], r[2]) - F.greatest(l[0], r[0])
    ih = F.least(l[3], r[3]) - F.greatest(l[1], r[1])
    inter = F.when((iw > 0) & (ih > 0), iw * ih).otherwise(F.lit(0))
    area_l = (l[2] - l[0]) * (l[3] - l[1])
    area_r = (r[2] - r[0]) * (r[3] - r[1])
    return inter, area_l + area_r - inter


def iou_match_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "image_id",
    iou_num: int = 1,
    iou_den: int = 2,
    l_cols: tuple[str, str, str, str] = ("l_x0", "l_y0", "l_x1", "l_y1"),
    r_cols: tuple[str, str, str, str] = ("r_x0", "r_y0", "r_x1", "r_y1"),
) -> DataFrame:
    """Pairs of boxes (one from each side, same image) whose IoU is
    >= iou_num/iou_den — prediction-vs-label matching. Output carries
    both sides' columns plus ``iou: double``.

    The threshold gate is the cross-multiplied INTEGER comparison
    ``inter * iou_den >= union * iou_num`` (exact for integer pixel
    coordinates; no float boundary ambiguity). The reported ``iou`` is
    the double ratio of those exact integers. Box columns are
    (x0, y0, x1, y1) with x0 < x1, y0 < y1 in pixels; coordinate column
    names must be DISTINCT across sides — fail loud otherwise.

    Plan: equi-join on ``by`` (broadcast if one side is small — leave
    that to AQE / caller's broadcast hint) + whole-stage-codegen
    arithmetic. No Python, no explode, no dedup pass.
    """
    clash = set(l_cols) & set(r_cols)
    if clash:
        raise ValueError(
            f"iou_match_join box columns collide across sides: "
            f"{sorted(clash)}; rename one side first"
        )
    if iou_den <= 0 or iou_num < 0:
        raise ValueError("iou threshold must be a non-negative rational")
    j = left.join(right, by)
    lc = tuple(F.col(c).cast("long") for c in l_cols)
    rc = tuple(F.col(c).cast("long") for c in r_cols)
    inter, union = _inter_union(lc, rc)
    keep = (union > 0) & (inter * F.lit(iou_den) >= union * F.lit(iou_num))
    return j.where(keep).withColumn(
        "iou", inter.cast("double") / union.cast("double")
    )


def nms_boxes(
    df: DataFrame,
    by: str = "image_id",
    id_col: str = "box_id",
    score: str = "score",
    cols: tuple[str, str, str, str] = ("x0", "y0", "x1", "y1"),
    iou_num: int = 1,
    iou_den: int = 2,
    max_boxes: int = 50_000,
) -> DataFrame:
    """Greedy non-maximum suppression per image -> the kept rows of
    ``df`` plus ``keep_rank`` (0-based pick order within the image).

    Classic greedy NMS (Felzenszwalb et al. / every detector head):
    repeatedly pick the highest-scoring remaining box, drop every
    remaining box whose IoU with the pick is >= iou_num/iou_den.
    DETERMINISTIC: score ties break on ascending ``id_col``, and the
    IoU gate is the exact integer cross-multiplication (integer pixel
    coordinates in, BIGINT products inside numpy).

    Execution: ONE groupBy(by) shuffle collecting (id, score, coords)
    lists — per-image state is boxes-per-image, fail-loud capped at
    ``max_boxes`` (a detector emitting more per image is a bug, not a
    workload) — then a batched pandas UDF returns the kept ids per
    image in pick order and an explode + equi-join back restores the
    original rows. The suppression sweep is O(picks x n) vectorized
    numpy per image; no per-row Python anywhere.
    """
    x0n, y0n, x1n, y1n = cols

    @F.pandas_udf("array<struct<i: long, r: int>>")
    def _nms(ids, scores, x0s, y0s, x1s, y1s):
        import pandas as pd

        out = []
        for k in range(len(ids)):
            bid = np.asarray(ids.iloc[k], dtype=np.int64)
            sc = np.asarray(scores.iloc[k], dtype=np.float64)
            if len(bid) > max_boxes:
                raise ValueError(
                    f"{len(bid)} boxes in one {by!r} group > "
                    f"max_boxes={max_boxes}"
                )
            x0 = np.asarray(x0s.iloc[k], dtype=np.int64)
            y0 = np.asarray(y0s.iloc[k], dtype=np.int64)
            x1 = np.asarray(x1s.iloc[k], dtype=np.int64)
            y1 = np.asarray(y1s.iloc[k], dtype=np.int64)
            if not ((x0 < x1).all() and (y0 < y1).all()):
                raise ValueError("degenerate box (x0>=x1 or y0>=y1)")
            # sort by (-score, id): greedy pick order with deterministic
            # tie-break; np.lexsort keys are last-significant-first
            order = np.lexsort((bid, -sc))
            x0, y0, x1, y1 = x0[order], y0[order], x1[order], y1[order]
            area = (x1 - x0) * (y1 - y0)
            alive = np.ones(len(bid), dtype=bool)
            kept = []
            for i in range(len(bid)):
                if not alive[i]:
                    continue
                kept.append(int(order[i]))
                iw = np.minimum(x1, x1[i]) - np.maximum(x0, x0[i])
                ih = np.minimum(y1, y1[i]) - np.maximum(y0, y0[i])
                inter = np.where((iw > 0) & (ih > 0), iw * ih, 0)
                union = area + area[i] - inter
                alive &= inter * iou_den < union * iou_num
            out.append(
                [{"i": int(bid[j]), "r": r} for r, j in enumerate(kept)]
            )
        return pd.Series(out)

    agg = df.groupBy(by).agg(
        F.collect_list(id_col).alias("_i"),
        F.collect_list(F.col(score).cast("double")).alias("_s"),
        F.collect_list(F.col(x0n).cast("long")).alias("_x0"),
        F.collect_list(F.col(y0n).cast("long")).alias("_y0"),
        F.collect_list(F.col(x1n).cast("long")).alias("_x1"),
        F.collect_list(F.col(y1n).cast("long")).alias("_y1"),
    )
    kept = agg.select(
        by, F.explode(_nms("_i", "_s", "_x0", "_y0", "_x1", "_y1")).alias("_k")
    ).select(
        by,
        F.col("_k.i").alias(id_col),
        F.col("_k.r").alias("keep_rank"),
    )
    return df.join(kept, [by, id_col])
