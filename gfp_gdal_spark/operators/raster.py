"""Raster operators — the GDALReader/GDALWriter analogs.

Reference semantics (gdal_nodes.cpp):
- GDALReader (:344-424): open raster, read band N as float32, report
  min/max stats (:385-389), and emit a gridded POINTCLOUD: one point
  per pixel at (x, y) from the geotransform with the pixel value as z
  (:409-417).
- GDALWriter (:274-342): write N single-band float32 images as one
  N-band raster; filename optionally from a string attribute
  (:289-293); geotransform from image metadata; nodata harmonized
  (:327-329).

Engine shape: an image row (input_hint schema) + footprint IS the
georeferenced raster; the geotransform is derived from the footprint
bbox and (w, h). Pixel explosion is a mapInArrow fan-out (the
multi-row flatten pattern); tile-keyed writes are partitionBy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfp_gdal_spark.functions.worker_tuning import tune_worker
from gfp_gdal_spark.kernels import codec as _codec

__all__ = [
    "raster_stats",
    "raster_to_points",
    "stack_bands",
    "write_tiles",
    "flatten_multipolygon",
]


def stack_bands(
    images: DataFrame,
    band_cols: list[str],
    fmt: str = "ppm",
    nodata: float | None = None,
    nodata_fill: float = 0.0,
    out_col: str = "bytes",
) -> DataFrame:
    """GDALWriter multiband analog (gdal_nodes.cpp:274-342): N aligned
    single-band pixel buffers per row -> ONE encoded N-band image.

    ``band_cols`` name array<double> columns of length w*h (row-major),
    all same shape — the reference's \"N single-band float32 images as
    one N-band raster\". ``nodata`` samples are replaced with the
    harmonized ``nodata_fill`` in every band (the std::replace of
    gdal_nodes.cpp:327-329). Values are clipped to 0..255 uint8 for
    the sandbox codecs (a real GTiff sink would keep float32 — format
    boundary, not engine semantics). mapInPandas; numpy stack + encode.
    """
    if fmt == "ppm" and len(band_cols) != 3:
        raise ValueError("ppm encodes exactly 3 bands; use pgm for 1")
    if fmt == "pgm" and len(band_cols) != 1:
        raise ValueError("pgm encodes exactly 1 band")

    out_fields = [f for f in images.schema.fields if f.name != out_col]
    schema_str = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema_str += f", {out_col} binary, fmt string"
    keep = [f.name for f in out_fields]

    nb = len(band_cols)

    def op(batches):
        # whole-batch shape: rows group by (w, h) — one numpy stack /
        # nodata pass / clip and ONE codec.encode_group per uniform
        # group, mirroring operators/audio._grouped; per-row Python is
        # just the band-array gather and the blob scatter (memcpy-level)
        for pdf in batches:
            blobs: list = [None] * len(pdf)
            for (w, h), idx in pdf.groupby(["w", "h"], sort=False).indices.items():
                w, h = int(w), int(h)
                stack = np.stack(
                    [
                        np.stack(
                            [np.asarray(v, dtype=np.float64) for v in pdf[c].iloc[idx]]
                        )
                        for c in band_cols
                    ],
                    axis=-1,
                ).reshape(len(idx), h, w, nb)
                if nodata is not None:
                    stack[stack == nodata] = nodata_fill
                pix = np.clip(stack, 0, 255).astype(np.uint8)
                if nb == 1:
                    pix = pix[..., 0]
                enc = _codec.encode_group(pix, fmt)
                for j, i in enumerate(idx):
                    blobs[i] = enc[j]
            out = pdf[keep].copy()
            out[out_col] = blobs
            out["fmt"] = fmt
            yield out

    return images.mapInPandas(op, schema_str)


def raster_stats(images: DataFrame, band: int = 0) -> DataFrame:
    """Per-image band min/max/mean — the GDALReader stats report
    (gdal_nodes.cpp:385-389) as a DataFrame instead of stdout."""
    schema = "image_id string, band int, px_min double, px_max double, px_mean double"

    def op(batches):
        tune_worker()
        for b in batches:
            names = b.schema.names
            blobs = b.column(names.index("bytes"))
            fmts = b.column(names.index("fmt")).to_pylist()
            n = b.num_rows
            mn, mx, me = np.zeros(n), np.zeros(n), np.zeros(n)
            for i in range(n):
                pix = _codec.decode_image(blobs[i].as_py(), fmts[i])
                ch = pix[..., band] if pix.ndim == 3 else pix
                mn[i], mx[i], me[i] = float(ch.min()), float(ch.max()), float(ch.mean())
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(names.index("image_id")),
                    pa.array(np.full(n, band, dtype=np.int32)),
                    pa.array(mn),
                    pa.array(mx),
                    pa.array(me),
                ],
                names=["image_id", "band", "px_min", "px_max", "px_mean"],
            )

    return images.mapInArrow(op, schema)


def raster_to_points(
    images: DataFrame,
    band: int = 0,
    thin_nth: int = 1,
) -> DataFrame:
    """Image -> gridded pointcloud: one row per (sampled) pixel with
    georeferenced (x, y) from the footprint-derived geotransform and
    z = pixel value (GDALReader pointcloud, gdal_nodes.cpp:409-417).

    ``thin_nth`` keeps every nth pixel (the CSVPointLoader thinning
    knob applied at the raster source — pushdown-friendly, the fan-out
    never materializes skipped pixels).

    Requires footprint columns (lon_c/lat_c/dlon/dlat) — apply
    functions.spatial.with_footprint first. Fan-out is h*w/thin_nth
    rows per image: at scale, partition the input so
    rows_out-per-task stays bounded.
    """
    schema = "image_id string, x double, y double, z double"

    def op(batches):
        tune_worker()
        for b in batches:
            names = b.schema.names
            blobs = b.column(names.index("bytes"))
            fmts = b.column(names.index("fmt")).to_pylist()
            ids = b.column(names.index("image_id")).to_pylist()
            lon_c = b.column(names.index("lon_c")).to_numpy(zero_copy_only=False)
            lat_c = b.column(names.index("lat_c")).to_numpy(zero_copy_only=False)
            dlon = b.column(names.index("dlon")).to_numpy(zero_copy_only=False)
            dlat = b.column(names.index("dlat")).to_numpy(zero_copy_only=False)
            out_id, out_x, out_y, out_z = [], [], [], []
            for i in range(b.num_rows):
                pix = _codec.decode_image(blobs[i].as_py(), fmts[i])
                ch = (pix[..., band] if pix.ndim == 3 else pix).astype(np.float64)
                h, w = ch.shape
                # geotransform: pixel (r, c) center -> lon/lat inside the
                # footprint bbox (north-up, like a GDAL geotransform)
                xs = lon_c[i] - dlon[i] + (np.arange(w) + 0.5) * (2 * dlon[i] / w)
                ys = lat_c[i] + dlat[i] - (np.arange(h) + 0.5) * (2 * dlat[i] / h)
                gx, gy = np.meshgrid(xs, ys)
                flat_x, flat_y, flat_z = gx.ravel(), gy.ravel(), ch.ravel()
                if thin_nth > 1:
                    flat_x = flat_x[::thin_nth]
                    flat_y = flat_y[::thin_nth]
                    flat_z = flat_z[::thin_nth]
                out_id.append(np.full(len(flat_x), i, dtype=np.int64))
                out_x.append(flat_x)
                out_y.append(flat_y)
                out_z.append(flat_z)
            if not out_id:
                continue
            idx = np.concatenate(out_id)
            id_arr = pa.array(np.asarray(ids, dtype=object)[idx])
            yield pa.RecordBatch.from_arrays(
                [
                    id_arr,
                    pa.array(np.concatenate(out_x)),
                    pa.array(np.concatenate(out_y)),
                    pa.array(np.concatenate(out_z)),
                ],
                names=["image_id", "x", "y", "z"],
            )

    cols = ["image_id", "bytes", "fmt", "lon_c", "lat_c", "dlon", "dlat"]
    return images.select(*cols).mapInArrow(op, schema)


def write_tiles(
    df: DataFrame,
    path: str,
    z: int = 12,
    lon: str = "lon_c",
    lat: str = "lat_c",
    mode: str = "overwrite",
) -> None:
    """Tile-keyed sink: route every row to its WebMercator z/x/y
    partition directory — the engine analog of GDALWriter's
    filename-from-attribute routing (gdal_nodes.cpp:289-293). With
    dynamic partition overwrite (session default) a re-run of one tile
    is idempotent, which is what plans.lineage leans on."""
    from gfp_gdal_spark.operators.joins import tile_assign

    out = tile_assign(df, lon=lon, lat=lat, z=z)
    (
        out.write.mode(mode)
        .partitionBy("tile_z", "tile_x", "tile_y")
        .parquet(path)
    )


def flatten_multipolygon(df: DataFrame, parts: str = "parts") -> DataFrame:
    """MultiPolygon flatten (S7, ogr_reader_node.cpp:281-291): one input
    row with an array of polygon rings -> N rows with a scalar `ring`
    column and all other attributes replicated, plus the part index
    (`part_seq`) for provenance."""
    exploded = df.select(
        "*", F.posexplode(F.col(parts)).alias("part_seq", "ring")
    ).drop(parts)
    return exploded
