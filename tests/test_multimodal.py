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
