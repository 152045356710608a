"""Detection-box operators: iou_match_join / nms_boxes vs brute force."""

import numpy as np
import pandas as pd
import pytest


def _rand_boxes(rng, n, n_img, span=400):
    img = rng.integers(0, n_img, n)
    x0 = rng.integers(0, span, n)
    y0 = rng.integers(0, span, n)
    w = rng.integers(1, 120, n)
    h = rng.integers(1, 120, n)
    return pd.DataFrame(
        {
            "image_id": img,
            "box_id": np.arange(n, dtype=np.int64),
            "x0": x0,
            "y0": y0,
            "x1": x0 + w,
            "y1": y0 + h,
        }
    )


def _iou(a, b):
    iw = min(a[2], b[2]) - max(a[0], b[0])
    ih = min(a[3], b[3]) - max(a[1], b[1])
    inter = iw * ih if iw > 0 and ih > 0 else 0
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter, ua


def test_iou_match_join_bruteforce(spark):
    from gfp_gdal_spark.operators.vision import iou_match_join

    rng = np.random.default_rng(7)
    lp = _rand_boxes(rng, 150, 12)
    rp = _rand_boxes(rng, 180, 12)
    l = spark.createDataFrame(
        lp.rename(columns={c: "l_" + c for c in ("x0", "y0", "x1", "y1")})
    ).withColumnRenamed("box_id", "lid")
    r = spark.createDataFrame(
        rp.rename(columns={c: "r_" + c for c in ("x0", "y0", "x1", "y1")})
    ).withColumnRenamed("box_id", "rid")
    for num, den in ((1, 2), (1, 4), (3, 4)):
        got = {
            (row["lid"], row["rid"]): row["iou"]
            for row in iou_match_join(l, r, iou_num=num, iou_den=den).collect()
        }
        want = {}
        for _, a in lp.iterrows():
            for _, b in rp.iterrows():
                if a["image_id"] != b["image_id"]:
                    continue
                inter, ua = _iou(
                    (a["x0"], a["y0"], a["x1"], a["y1"]),
                    (b["x0"], b["y0"], b["x1"], b["y1"]),
                )
                if ua > 0 and inter * den >= ua * num:
                    want[(a["box_id"], b["box_id"])] = inter / ua
        assert set(got) == set(want), f"thr={num}/{den}"
        for k in want:
            assert got[k] == want[k]
    with pytest.raises(ValueError, match="collide"):
        iou_match_join(l, r, l_cols=("l_x0", "l_y0", "l_x1", "l_y1"),
                       r_cols=("l_x0", "r_y0", "r_x1", "r_y1"))


def _nms_ref(pdf, num, den):
    """Pure-Python greedy NMS with the operator's exact contract."""
    kept = {}
    for img, g in pdf.groupby("image_id"):
        rows = sorted(
            g.itertuples(), key=lambda t: (-t.score, t.box_id)
        )
        alive = list(rows)
        rank = 0
        while alive:
            pick = alive.pop(0)
            kept[(img, pick.box_id)] = rank
            rank += 1
            nxt = []
            for b in alive:
                inter, ua = _iou(
                    (pick.x0, pick.y0, pick.x1, pick.y1),
                    (b.x0, b.y0, b.x1, b.y1),
                )
                if inter * den < ua * num:
                    nxt.append(b)
            alive = nxt
    return kept


@pytest.mark.parametrize("seed,num,den", [(1, 1, 2), (2, 1, 4), (3, 3, 10)])
def test_nms_boxes_bruteforce(spark, seed, num, den):
    from gfp_gdal_spark.operators.vision import nms_boxes

    rng = np.random.default_rng(seed)
    pdf = _rand_boxes(rng, 300, 8)
    # integer scores with deliberate ties to exercise the id tie-break
    pdf["score"] = rng.integers(0, 12, len(pdf)).astype(float)
    df = spark.createDataFrame(pdf)
    out = nms_boxes(df, iou_num=num, iou_den=den).collect()
    got = {(row["image_id"], row["box_id"]): row["keep_rank"] for row in out}
    assert got == _nms_ref(pdf, num, den)
    # kept rows carry the original columns through
    cols = {c for c in out[0].asDict()}
    assert {"x0", "y0", "x1", "y1", "score", "keep_rank"} <= cols


def test_nms_greedy_chain(spark):
    """A suppresses B; C overlaps B (>=thr) but not A -> greedy keeps C.
    A connectivity-based dedup would drop C; greedy NMS must not."""
    from gfp_gdal_spark.operators.vision import nms_boxes

    pdf = pd.DataFrame(
        {
            "image_id": [0, 0, 0],
            "box_id": [0, 1, 2],
            # A=[0,100), B=[60,160), C=[120,220): IoU(A,B)=40/160=0.25,
            # IoU(B,C)=40/160=0.25, IoU(A,C)=0
            "x0": [0, 60, 120],
            "y0": [0, 0, 0],
            "x1": [100, 160, 220],
            "y1": [10, 10, 10],
            "score": [3.0, 2.0, 1.0],
        }
    )
    out = nms_boxes(
        spark.createDataFrame(pdf), iou_num=1, iou_den=5
    ).collect()
    got = {(r["box_id"], r["keep_rank"]) for r in out}
    assert got == {(0, 0), (2, 1)}


def test_nms_fail_loud(spark):
    from gfp_gdal_spark.operators.vision import nms_boxes

    bad = pd.DataFrame(
        {
            "image_id": [0],
            "box_id": [0],
            "x0": [5],
            "y0": [0],
            "x1": [5],
            "y1": [10],
            "score": [1.0],
        }
    )
    with pytest.raises(Exception, match="degenerate"):
        nms_boxes(spark.createDataFrame(bad)).collect()
