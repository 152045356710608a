"""Image-column operators: stats, round-trip invariant, resize, ahash,
stubbed frame sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfp_gdal_spark.kernels import codec as C
from gfp_gdal_spark.operators import multimodal as MM
from gfp_gdal_spark.sources import datagen

N = 120


@pytest.fixture(scope="module")
def images(spark):
    return datagen.images_table(spark, N, with_bytes=True).cache()


def test_image_stats_and_psnr_invariant(spark, images):
    st = MM.image_stats(images).toPandas()
    assert len(st) == N
    assert (st["psnr_roundtrip"] >= 40.0).all()  # input_hint invariant
    lossless = st[st.fmt.isin(["ppm", "png"])]
    assert (lossless["psnr_roundtrip"] == 999.0).all()  # capped inf
    assert (st["px_max"] <= 255).all() and (st["px_min"] >= 0).all()


def test_caption_preserved(spark, images):
    st = MM.image_stats(images).select("image_id", "caption")
    orig = images.select("image_id", F.col("caption").alias("caption0"))
    bad = st.join(orig, "image_id").where(F.col("caption") != F.col("caption0"))
    assert bad.isEmpty()


def test_reencode_lossless_pixel_exact(spark, images):
    ppm = images.where(F.col("fmt") == "ppm")
    rt = MM.reencode_images(MM.reencode_images(ppm, "png"), "ppm")
    a = {r["image_id"]: bytes(r["bytes"]) for r in ppm.collect()}
    b = {r["image_id"]: bytes(r["bytes"]) for r in rt.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert np.array_equal(
            C.decode_image(a[k], "ppm"), C.decode_image(b[k], "ppm")
        ), k


def test_resize(spark, images):
    out = MM.resize_images(images.limit(10), 8, 8).collect()
    for r in out:
        pix = C.decode_image(bytes(r["bytes"]), r["fmt"])
        assert pix.shape[:2] == (8, 8)


def test_ahash_deterministic_and_distinct(spark, images):
    a = MM.image_ahash(images).toPandas().set_index("image_id")["ahash"]
    b = MM.image_ahash(images).toPandas().set_index("image_id")["ahash"]
    assert a.equals(b)
    assert a.nunique() > N // 2  # patterns differ per image


def test_frame_sample_stub_raises(spark):
    vids = spark.createDataFrame(
        [("v0", bytearray(b"xxxx"))], "video_id string, bytes binary"
    )
    with pytest.raises(Exception) as ei:
        MM.decode_frame_sample(vids).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_decode_group_matches_per_image():
    pdf = datagen.images_pandas(90, with_bytes=True)
    for (fmt, w, h), idx in pdf.groupby(["fmt", "w", "h"], sort=False).indices.items():
        blobs = [bytes(b) for b in pdf["bytes"].iloc[idx]]
        grp = C.decode_group(blobs, fmt, int(w), int(h))
        for j, b in enumerate(blobs):
            assert np.array_equal(grp[j], C.decode_image(b, fmt)), (fmt, j)


def test_encode_group_bitwise_matches_per_image():
    pdf = datagen.images_pandas(90, with_bytes=True)
    for (fmt, w, h), idx in pdf.groupby(["fmt", "w", "h"], sort=False).indices.items():
        blobs = [bytes(b) for b in pdf["bytes"].iloc[idx]]
        pix = C.decode_group(blobs, fmt, int(w), int(h))
        grp = C.encode_group(pix, fmt)
        assert len(grp) == pix.shape[0]
        for j in range(pix.shape[0]):
            assert grp[j] == C.encode_image(pix[j], fmt), (fmt, j)
    # gray pnm group (decode_group returns (n,h,w) for pgm)
    gray = np.stack([C.synth_pixels(i, 16, 12, gray=True) for i in range(7)])
    for fmt in ("pgm", "png", "qnt"):
        grp = C.encode_group(gray, fmt)
        for j in range(7):
            assert grp[j] == C.encode_image(gray[j], fmt), (fmt, j)


def test_ahash_batch_matches_reference_loop():
    pdf = datagen.images_pandas(60, with_bytes=True)
    for (fmt, w, h), idx in pdf.groupby(["fmt", "w", "h"], sort=False).indices.items():
        blobs = [bytes(b) for b in pdf["bytes"].iloc[idx]]
        pix = C.decode_group(blobs, fmt, int(w), int(h))
        got = C.ahash_batch(pix)
        bits = np.arange(64, dtype=np.uint64)
        for j in range(len(blobs)):
            p = pix[j]
            g = p.mean(axis=2) if p.ndim == 3 else p.astype(np.float64)
            hh, ww = g.shape
            yi = np.minimum(np.arange(8) * hh // 8, hh - 1)
            xi = np.minimum(np.arange(8) * ww // 8, ww - 1)
            s = g[yi][:, xi]
            exp = ((s > s.mean()).astype(np.uint64).ravel() << bits).sum(dtype=np.uint64)
            assert got[j] == exp.view(np.int64).item(), (fmt, j)


def test_jvm_pnm_ahash_parity_and_plan(spark, images):
    """The JVM column ahash must agree bit-for-bit with the batched
    Python decode path on every ppm image, and its plan must contain
    zero Python eval nodes."""
    from gfp_gdal_spark.functions import imagecol as IC

    ppm = images.where(F.col("fmt") == "ppm")
    jvm = IC.with_ahash_pnm(ppm, channels=3).select("image_id", "ahash")
    plan = jvm._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInArrow" not in plan, plan
    py = MM.image_ahash(ppm, jvm_pnm=False)
    a = {r["image_id"]: r["ahash"] for r in jvm.collect()}
    b = {r["image_id"]: r["ahash"] for r in py.collect()}
    assert a == b and len(a) == ppm.count()


def test_image_ahash_dispatch_covers_all_rows(spark, images):
    out = MM.image_ahash(images).toPandas()
    assert len(out) == N and out["image_id"].nunique() == N
    py = MM.image_ahash(images, jvm_pnm=False).toPandas()
    m = out.set_index("image_id")["ahash"].sort_index()
    p = py.set_index("image_id")["ahash"].sort_index()
    assert m.equals(p)


def test_decode_ahash_stage(spark, images):
    out = MM.decode_ahash_stage(images).toPandas()
    assert len(out) == N
    ref = MM.image_ahash(images, jvm_pnm=False).toPandas().set_index("image_id")["ahash"]
    got = out.set_index("image_id")["ahash"]
    assert got.sort_index().equals(ref.sort_index())
    assert set(out.columns) == {"image_id", "w", "h", "phash", "ahash"}


def test_verify_pairs_lossless_and_lossy(spark, images):
    """north_rule invariant operator: a qnt transcode of the corpus
    passes PSNR>=40 everywhere; lossless rows are pixel_exact; the
    exact int64 sq_err matches a numpy reference per image."""
    cand = MM.reencode_images(images, "qnt")
    v = MM.verify_pairs(cand, images).toPandas().set_index("image_id")
    assert len(v) == N
    assert v["shape_match"].all() and v["caption_match"].all()
    assert v["psnr_ok"].all()  # qnt bin error is ~1.25 MSE << 6.5025
    # qnt-encoded originals re-quantize idempotently -> pixel_exact
    orig = {r["image_id"]: r for r in images.collect()}
    for iid, row in v.iterrows():
        o = orig[iid]
        p0 = C.decode_image(bytes(o["bytes"]), o["fmt"])
        p1 = C.decode_image(C.encode_image(p0, "qnt"), "qnt")
        sq = int(((p0.astype(np.int64) - p1.astype(np.int64)) ** 2).sum())
        assert int(row["sq_err"]) == sq, iid
        assert int(row["n_values"]) == p0.size, iid
        assert bool(row["pixel_exact"]) == (sq == 0), iid
        if o["fmt"] == "qnt":
            assert bool(row["pixel_exact"]), iid


def test_verify_pairs_detects_mismatches(spark, images):
    """Shape, caption and pixel divergences are each flagged: a resized
    candidate fails shape_match; a caption edit fails caption_match; a
    pixel-mangled candidate fails psnr_ok at a strict threshold."""
    small = images.limit(12)
    # shape mismatch: resize the candidate
    v1 = MM.verify_pairs(MM.resize_images(small, 8, 8), small).toPandas()
    assert (~v1["shape_match"]).all() and (~v1["psnr_ok"]).all()
    assert (v1["n_values"] == 0).all()
    # caption mismatch only
    cap = small.withColumn("caption", F.concat(F.col("caption"), F.lit("!")))
    v2 = MM.verify_pairs(cap, small).toPandas()
    assert (~v2["caption_match"]).all() and v2["psnr_ok"].all()
    assert v2["pixel_exact"].all()
    # pixel divergence: equalize mangles values; demand PSNR >= 50
    eq = MM.equalize_images(small.where(F.col("fmt") == "ppm")).withColumn(
        "caption", F.lit("x")
    )
    ref_g = small.where(F.col("fmt") == "ppm")
    v3 = MM.verify_pairs(eq, ref_g, psnr_db=50.0).toPandas()
    assert len(v3) > 0 and (~v3["psnr_ok"]).all()  # gray-vs-color leg too
