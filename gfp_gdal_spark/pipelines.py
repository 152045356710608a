"""The north_star pipeline, end to end [BASELINE.json].

ingest (decode + perceptual hash) -> footprint derivation -> cell
indexes (hex + s2) -> cell-bucketed point-in-polygon join vs a vector
layer -> WebMercator tile assignment -> per-tile aggregation — run
RESUMABLY: work is split into deterministic buckets, each finished
bucket commits a manifest row with metrics, and a killed job picks up
exactly the missing buckets (plans.lineage).

This is the composition a user of the reference would run in geoflow
as a flowchart (OGRLoader -> transforms -> OGRWriter); here it is a
pure function DataFrame -> DataFrame plus a bucketed runner.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfp_gdal_spark.functions.spatial import hex_cell, s2_cell, with_footprint
from gfp_gdal_spark.functions.worker_tuning import tune_worker
from gfp_gdal_spark.kernels import codec as _codec
from gfp_gdal_spark.operators import joins as J
from gfp_gdal_spark.plans import lineage as L

__all__ = ["decode_and_hash", "north_star_pipeline", "run_north_star_resumable"]

_DEC_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, phash long, "
    "ahash long, mean_px double, psnr_ok boolean"
)


def decode_and_hash(images: DataFrame) -> DataFrame:
    """Ingest boundary: decode every image's bytes, compute a
    perceptual average-hash and the round-trip PSNR>=40dB invariant
    flag (BASELINE.json input_hint). mapInArrow — the binary column
    never materializes as Python objects per row."""

    def op(batches):
        tune_worker()
        bits = np.arange(64, dtype=np.uint64)
        for b in batches:
            names = b.schema.names
            blobs = b.column(names.index("bytes"))
            fmts = b.column(names.index("fmt")).to_pylist()
            n = b.num_rows
            ah = np.zeros(n, dtype=np.uint64)
            mp = np.zeros(n)
            ok = np.zeros(n, dtype=bool)
            for i in range(n):
                fmt = fmts[i]
                pix = _codec.decode_image(blobs[i].as_py(), fmt)
                g = pix.mean(axis=2) if pix.ndim == 3 else pix.astype(np.float64)
                mp[i] = g.mean()
                h, w = g.shape
                yi = np.minimum(np.arange(8) * h // 8, h - 1)
                xi = np.minimum(np.arange(8) * w // 8, w - 1)
                s = g[yi][:, xi]
                ah[i] = ((s > s.mean()).astype(np.uint64).ravel() << bits).sum(
                    dtype=np.uint64
                )
                rt = _codec.decode_image(_codec.encode_image(pix, fmt), fmt)
                ok[i] = _codec.psnr(pix, rt) >= 40.0
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(names.index("image_id")),
                    b.column(names.index("w")),
                    b.column(names.index("h")),
                    pa.array(fmts),
                    b.column(names.index("caption")),
                    b.column(names.index("phash")),
                    pa.array(ah.view(np.int64)),
                    pa.array(mp),
                    pa.array(ok),
                ],
                names=[
                    "image_id", "w", "h", "fmt", "caption", "phash",
                    "ahash", "mean_px", "psnr_ok",
                ],
            )

    return images.mapInArrow(op, _DEC_SCHEMA)


def north_star_pipeline(
    images: DataFrame,
    vector_layer: DataFrame,
    pip_z: int = 8,
    tile_z: int = 12,
    hex_res: int = 8,
    s2_level: int = 14,
    broadcast: bool | None = True,
) -> DataFrame:
    """The full transform: images -> decoded+hashed -> footprints ->
    hex/s2 cell ids -> PiP join vs the layer -> tile assignment.
    Returns one row per (image inside polygon) with tile/cell keys."""
    dec = decode_and_hash(images)
    pts = with_footprint(dec)
    pts = pts.withColumn("hex_cell", hex_cell(F.col("lon_c"), F.col("lat_c"), hex_res))
    pts = pts.withColumn("s2_cell", s2_cell(F.col("lon_c"), F.col("lat_c"), s2_level))
    pts = pts.select(
        "image_id", "caption", "phash", "ahash", "psnr_ok",
        "lon_c", "lat_c", "hex_cell", "s2_cell",
    )
    joined = J.pip_join(pts, vector_layer, z=pip_z, broadcast=broadcast)
    return J.tile_assign(joined, z=tile_z)


def run_north_star_resumable(
    spark: SparkSession,
    images_path: str,
    vector_layer: DataFrame,
    out_path: str,
    manifest_path: str,
    n_buckets: int = 16,
    buckets_per_job: int = 4,
    fail_after: int | None = None,
    **pipeline_kw,
) -> dict:
    """Bucketed, resumable execution of the pipeline with per-bucket
    lineage + metrics (north_rule). Buckets = hash(image_id) — stable
    under any partitioning of the input."""
    images = spark.read.parquet(images_path)
    result = north_star_pipeline(images, vector_layer, **pipeline_kw)
    return L.run_bucketed(
        spark,
        result,
        out_path,
        manifest_path,
        id_col="image_id",
        n_buckets=n_buckets,
        buckets_per_job=buckets_per_job,
        fail_after=fail_after,
    )
