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
    "downsample_tiles",
    "tile_pyramid_images",
    "mosaic_composite",
    "rasterize_zones",
    "reproject_webmercator",
    "sample_raster",
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


def downsample_tiles(
    tiles: DataFrame,
    fill: int = 0,
    tile_z: str = "tile_z",
    tile_x: str = "tile_x",
    tile_y: str = "tile_y",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """ONE image-pyramid level: tiles at zoom z -> parent tiles at
    z-1, with actual pixel content (the serving-pyramid builder that
    `tile_rollup` does for counts). Each parent assembles its <=4
    children into a 2w x 2h mosaic (slippy quadrant (x&1, y&1); y&1=1
    is the SOUTH row, matching WebMercator y-down), missing quadrants
    filled with ``fill``, then 2x2 mean-pools back to w x h
    (np.rint half-to-even, clipped to uint8).

    Plan: children shuffle ONCE to their parent key
    (groupBy + collect_list of <=4 blobs — bounded fan-in, so the agg
    state per key is 4 tiles no matter the corpus size), then a
    mapInPandas pass does ALL pixel work whole-batch: per uniform
    (fmt, w, h) group one decode_group, FOUR vectorized quadrant
    placements (children of the same quadrant land in one fancy-index
    assignment), one reshape-mean pool, one encode_group. Per-child
    Python is only the dict gather off the collect_list structs
    (memcpy-level, same as stack_bands' band gather).

    Fail-loud: mixed (fmt, w, h) within a parent, duplicate quadrant
    (duplicate child coords), or odd tile dims raise. Tile shape comes
    from the input_hint ``w``/``h`` columns (no header probing).
    Iterate levels with ``tile_pyramid_images``.
    """
    child = tiles.select(
        (F.col(tile_z) - 1).cast("int").alias("_pz"),
        F.shiftright(F.col(tile_x).cast("long"), 1).alias("_px"),
        F.shiftright(F.col(tile_y).cast("long"), 1).alias("_py"),
        (F.col(tile_x).cast("long") % 2).cast("int").alias("_qx"),
        (F.col(tile_y).cast("long") % 2).cast("int").alias("_qy"),
        F.col("w").cast("int").alias("_w"),
        F.col("h").cast("int").alias("_h"),
        F.col(bytes_col).alias("_b"),
        F.col(fmt_col).alias("_f"),
    )
    g = child.groupBy("_pz", "_px", "_py").agg(
        F.collect_list(F.struct("_qx", "_qy", "_w", "_h", "_b", "_f")).alias("_ch")
    )
    schema = (
        f"{tile_z} int, {tile_x} long, {tile_y} long, "
        f"w int, h int, {bytes_col} binary, {fmt_col} string"
    )

    def op(batches):
        tune_worker()
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # gather children flat: parent idx, quadrant, blob, fmt
            p_idx: list[int] = []
            qxs: list[int] = []
            qys: list[int] = []
            blobs: list[bytes] = []
            fmts: list[str] = []
            shapes: list[tuple] = []
            # negative tile coords: Spark % keeps the sign, so an ODD
            # negative x gives quadrant -1, but an EVEN negative x
            # gives quadrant 0 and would silently place pixels under a
            # wrong (negative) parent. shiftright of ANY negative long
            # is negative, so the parent coords catch every case —
            # slippy z/x/y tiles are non-negative by definition.
            if (pdf["_px"].to_numpy() < 0).any() or (
                pdf["_py"].to_numpy() < 0
            ).any():
                raise ValueError(
                    "negative tile coordinates — slippy z/x/y tiles "
                    "must be non-negative"
                )
            for i, ch in enumerate(pdf["_ch"]):
                seen = set()
                for c in ch:
                    # the parent-coordinate sign guard above already
                    # rejected every negative input, so quadrants here
                    # are always in {0,1}x{0,1}
                    q = (c["_qx"], c["_qy"])
                    if q in seen:
                        raise ValueError(
                            f"duplicate child quadrant {q} under parent "
                            f"{(pdf['_pz'].iat[i], pdf['_px'].iat[i], pdf['_py'].iat[i])}"
                        )
                    seen.add(q)
                    p_idx.append(i)
                    qxs.append(c["_qx"])
                    qys.append(c["_qy"])
                    blobs.append(c["_b"])
                    fmts.append(c["_f"])
                    shapes.append((c["_w"], c["_h"]))
            # uniform (fmt, w, h) groups; parent shape = child shape
            par_shape: dict[int, tuple] = {}
            for i, f, (w, h) in zip(p_idx, fmts, shapes):
                key = (f, int(w), int(h))
                if par_shape.setdefault(i, key) != key:
                    raise ValueError(
                        f"mixed child (fmt, w, h) under one parent: "
                        f"{par_shape[i]} vs {key}"
                    )
            import collections

            groups: dict[tuple, list[int]] = collections.defaultdict(list)
            for i, key in par_shape.items():
                groups[key].append(i)
            out_w = np.zeros(n, dtype=np.int32)
            out_h = np.zeros(n, dtype=np.int32)
            out_b: list = [None] * n
            out_f: list = [None] * n
            child_of = collections.defaultdict(list)
            for ci, i in enumerate(p_idx):
                child_of[i].append(ci)
            for (f, w, h), parents in groups.items():
                if w % 2 or h % 2:
                    raise ValueError(f"tile dims must be even, got {(w, h)}")
                cis = [ci for i in parents for ci in child_of[i]]
                pix = _codec.decode_group([blobs[ci] for ci in cis], f, w, h)
                nch = 3 if pix.ndim == 4 else 1
                m = len(parents)
                pos = {i: j for j, i in enumerate(parents)}
                canvas = np.full(
                    (m, 2 * h, 2 * w) + ((3,) if nch == 3 else ()),
                    fill,
                    dtype=np.float64,
                )
                cq = np.array([[qys[ci], qxs[ci], pos[p_idx[ci]]] for ci in cis])
                for qy in (0, 1):
                    for qx in (0, 1):
                        sel = (cq[:, 0] == qy) & (cq[:, 1] == qx)
                        if not sel.any():
                            continue
                        canvas[
                            cq[sel, 2],
                            qy * h : (qy + 1) * h,
                            qx * w : (qx + 1) * w,
                        ] = pix[np.flatnonzero(sel)]
                pooled = canvas.reshape(
                    (m, h, 2, w, 2) + ((3,) if nch == 3 else ())
                ).mean(axis=(2, 4))
                enc = _codec.encode_group(
                    np.clip(np.rint(pooled), 0, 255).astype(np.uint8), f
                )
                for j, i in enumerate(parents):
                    out_b[i] = enc[j]
                    out_f[i] = f
                    out_w[i] = w
                    out_h[i] = h
            import pandas as pd

            yield pd.DataFrame(
                {
                    tile_z: pdf["_pz"].astype("int32"),
                    tile_x: pdf["_px"].astype("int64"),
                    tile_y: pdf["_py"].astype("int64"),
                    "w": out_w,
                    "h": out_h,
                    bytes_col: out_b,
                    fmt_col: out_f,
                }
            )

    return g.mapInPandas(op, schema)


def tile_pyramid_images(tiles: DataFrame, z_from: int, z_to: int, **kw) -> DataFrame:
    """Full image pyramid z_from -> z_to (exclusive of the input
    level): repeatedly ``downsample_tiles`` and union the levels.
    Each level is one shuffle over an input 4x smaller than the last —
    total cost ~4/3 of the base level, the standard pyramid bound."""
    if z_to >= z_from:
        raise ValueError(f"z_to must be < z_from, got {z_from} -> {z_to}")
    levels = []
    cur = tiles
    for _ in range(z_from - z_to):
        cur = downsample_tiles(cur, **kw)
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def mosaic_composite(
    tiles: DataFrame,
    priority: str,
    nodata: int = 0,
    max_layers: int = 8,
    tile_x: str = "tile_x",
    tile_y: str = "tile_y",
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Per-tile mosaic compositing: N overlapping images of the SAME
    tile -> one image, each pixel taken from the highest-``priority``
    layer whose pixel != ``nodata`` (the cloud-mask / freshest-scene
    composite every imagery pipeline runs after tiling). Pixels nodata
    in EVERY kept layer stay nodata.

    Scale shape: a per-tile window ranks layers by (priority DESC,
    id ASC) and keeps only ``max_layers`` BEFORE anything heavy —  the
    per-tile shuffle and Python-side state are bounded by max_layers
    regardless of how many scenes pile on a hot tile (the same
    bounded-fan-in idea as downsample_tiles' 4 quadrants). Then one
    groupBy collects the kept layers and a mapInPandas pass does all
    pixel work whole-batch per uniform (fmt, w, h) group: one
    decode_group over every layer in the batch, one vectorized
    first-valid-layer argmax over a rank-ordered padded tensor, one
    encode_group. Fail-loud on mixed child (fmt, w, h) within a tile.
    """
    from pyspark.sql import Window

    if not 0 <= int(nodata) <= 255:
        # the decoded pixel dtype is uint8 — an out-of-range nodata
        # would wrap in the np.full fill AND in the != comparison,
        # silently corrupting the valid-pixel mask
        raise ValueError(f"nodata must be a uint8 value (0..255): {nodata!r}")
    d = (
        tiles.select(
            F.col(tile_x).cast("long").alias("_tx"),
            F.col(tile_y).cast("long").alias("_ty"),
            F.col(priority).alias("_p"),
            F.col(id_col).alias("_iid"),
            F.col("w").cast("int").alias("_w"),
            F.col("h").cast("int").alias("_h"),
            F.col(bytes_col).alias("_b"),
            F.col(fmt_col).alias("_f"),
        )
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("_tx", "_ty").orderBy(
                F.col("_p").desc(), F.col("_iid").asc()
            )
        ))
        .where(F.col("_rn") <= max_layers)
    )
    g = d.groupBy("_tx", "_ty").agg(
        F.collect_list(F.struct("_rn", "_w", "_h", "_b", "_f")).alias("_ly"),
        F.count(F.lit(1)).alias("_nl"),
    )
    schema = (
        f"{tile_x} long, {tile_y} long, n_layers int, "
        f"w int, h int, {bytes_col} binary, {fmt_col} string"
    )
    nd = nodata

    def op(batches):
        import collections

        import pandas as pd

        tune_worker()
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            tile_shape: dict[int, tuple] = {}
            flat = []  # (tile_idx, rank, blob)
            for i, ly in enumerate(pdf["_ly"]):
                for c in ly:
                    key = (c["_f"], int(c["_w"]), int(c["_h"]))
                    if tile_shape.setdefault(i, key) != key:
                        raise ValueError(
                            f"mixed layer (fmt, w, h) within one tile: "
                            f"{tile_shape[i]} vs {key}"
                        )
                    flat.append((i, int(c["_rn"]), c["_b"]))
            groups: dict[tuple, list[int]] = collections.defaultdict(list)
            for i, key in tile_shape.items():
                groups[key].append(i)
            lay_of = collections.defaultdict(list)
            for j, (i, rn, b) in enumerate(flat):
                lay_of[i].append(j)
            out_b: list = [None] * n
            out_f: list = [None] * n
            out_w = np.zeros(n, dtype=np.int32)
            out_h = np.zeros(n, dtype=np.int32)
            for (f, w, h), tidx in groups.items():
                js = [j for i in tidx for j in lay_of[i]]
                pix = _codec.decode_group([flat[j][2] for j in js], f, w, h)
                nch = 3 if pix.ndim == 4 else 1
                L = max(len(lay_of[i]) for i in tidx)
                m = len(tidx)
                pos = {i: t for t, i in enumerate(tidx)}
                tensor = np.full(
                    (m, L, h, w) + ((3,) if nch == 3 else ()), nd, dtype=pix.dtype
                )
                for jj, j in enumerate(js):
                    i, rn, _ = flat[j]
                    tensor[pos[i], rn - 1] = pix[jj]
                valid = (
                    (tensor != nd).any(axis=-1) if nch == 3 else (tensor != nd)
                )  # (m, L, h, w)
                first = valid.argmax(axis=1)  # first valid layer (0 if none)
                idx = first[:, None, :, :]
                if nch == 3:
                    comp = np.take_along_axis(
                        tensor, idx[..., None], axis=1
                    )[:, 0]
                else:
                    comp = np.take_along_axis(tensor, idx, axis=1)[:, 0]
                enc = _codec.encode_group(comp.astype(np.uint8), f)
                for t, i in enumerate(tidx):
                    out_b[i] = enc[t]
                    out_f[i] = f
                    out_w[i] = w
                    out_h[i] = h
            yield pd.DataFrame(
                {
                    tile_x: pdf["_tx"].astype("int64"),
                    tile_y: pdf["_ty"].astype("int64"),
                    "n_layers": pdf["_nl"].astype("int32"),
                    "w": out_w,
                    "h": out_h,
                    bytes_col: out_b,
                    fmt_col: out_f,
                }
            )

    return g.mapInPandas(op, schema)


def rasterize_zones(
    frames: DataFrame,
    zones: DataFrame,
    value: str,
    key: str = "image_id",
    bbox_cols: tuple[str, str, str, str] = ("min_lon", "min_lat", "max_lon", "max_lat"),
    nodata: int = 0,
    fmt: str = "pgm",
    **pip_kwargs,
) -> DataFrame:
    """Vector -> raster burning (the `gdal_rasterize` analog, closing
    the raster<->vector bridge in BOTH directions beside
    map_algebra.zonal_stats): for each output frame (a georeferenced
    w x h grid over its bbox, north-up), every pixel whose CENTER
    falls strictly inside a zone polygon is burned with that zone's
    ``value`` (overlapping zones -> the MINIMUM value, a deterministic
    painter's rule); all other pixels stay ``nodata``.

    Plan — every stage is a certified primitive:
    1. pixel centers: one explode per frame (w*h rows, the exact
       inverse of raster_to_points' geotransform — bounded per task
       like any tile fan-out);
    2. the cell-bucketed ``pip_join`` against the zone layer
       (broadcast/shuffle/salting knobs pass through ``pip_kwargs``) —
       never all-pairs;
    3. one (frame, pixel) min-value agg, then one per-frame
       collect_list of the BURNED pixels only (sparse: collect size =
       burned count <= w*h, not the dense grid);
    4. a mapInPandas pass scatters all burned pixels of a uniform
       (w, h) group into the dense canvas with ONE fancy-index
       assignment and encodes via ``codec.encode_group``.

    Returns (key, w, h, n_burned, val_sum, bytes, fmt); ``val_sum``
    sums the burned integer values JVM-side (exact).
    """
    mnx, mny, mxx, mxy = bbox_cols
    w_c, h_c = F.col("w").cast("int"), F.col("h").cast("int")
    fr = frames.select(
        F.col(key).alias("_k"),
        F.col(mnx).cast("double").alias("_x0"),
        F.col(mny).cast("double").alias("_y0"),
        F.col(mxx).cast("double").alias("_x1"),
        F.col(mxy).cast("double").alias("_y1"),
        w_c.alias("_w"),
        h_c.alias("_h"),
    )
    g = (
        fr.withColumn("_r", F.explode(F.sequence(F.lit(0), F.col("_h") - 1)))
        .withColumn("_c", F.explode(F.sequence(F.lit(0), F.col("_w") - 1)))
    )
    centers = g.select(
        "_k",
        "_w",
        "_h",
        (F.col("_r") * F.col("_w") + F.col("_c")).alias("_pix"),
        (
            F.col("_x0")
            + (F.col("_c").cast("double") + 0.5)
            * (F.col("_x1") - F.col("_x0"))
            / F.col("_w").cast("double")
        ).alias("lon_c"),
        (
            F.col("_y1")
            - (F.col("_r").cast("double") + 0.5)
            * (F.col("_y1") - F.col("_y0"))
            / F.col("_h").cast("double")
        ).alias("lat_c"),
    )
    from gfp_gdal_spark.operators.joins import pip_join, ring_bbox_cols

    # pre-filter the zone layer to the frames' union bbox BEFORE the
    # pip_join replicates it over cover cells (guide-§3.2 shape: shrink
    # the build side first). A zone whose bbox misses every frame
    # cannot contain any pixel center, so the burned output is
    # identical; the win is a proportionally smaller broadcast/shuffle
    # build when the frame set covers a fraction of the layer extent
    # (the common tiling-job case). One cheap scalar agg over frames.
    ext = fr.agg(
        F.min("_x0").alias("x0"), F.min("_y0").alias("y0"),
        F.max("_x1").alias("x1"), F.max("_y1").alias("y1"),
    ).first()
    if ext and ext.x0 is not None:
        ring_col = pip_kwargs.get("ring", "ring")
        zb = ring_bbox_cols(zones, ring_col)
        zones = zb.where(
            (F.col("min_lon") <= F.lit(ext.x1)) & (F.col("max_lon") >= F.lit(ext.x0))
            & (F.col("min_lat") <= F.lit(ext.y1)) & (F.col("max_lat") >= F.lit(ext.y0))
        ).drop("min_lon", "min_lat", "max_lon", "max_lat")

    hit = pip_join(centers, zones, **pip_kwargs)
    burned = hit.groupBy("_k", "_w", "_h", "_pix").agg(
        F.min(F.col(value)).alias("_v")
    )
    agg = burned.groupBy("_k", "_w", "_h").agg(
        F.count(F.lit(1)).alias("n_burned"),
        F.sum(F.col("_v").cast("long")).alias("val_sum"),
        F.collect_list(F.struct("_pix", "_v")).alias("_px"),
    )
    # frames with zero burned pixels still emit an (all-nodata) raster
    agg = fr.select("_k", "_w", "_h").join(agg, ["_k", "_w", "_h"], "left")
    schema = (
        f"{key} string, w int, h int, n_burned long, val_sum long, "
        f"bytes binary, fmt string"
    )
    nd = nodata
    out_fmt = fmt

    def op(batches):
        import collections

        import pandas as pd

        tune_worker()
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            groups = collections.defaultdict(list)
            for i in range(n):
                groups[(int(pdf["_w"].iat[i]), int(pdf["_h"].iat[i]))].append(i)
            out_b: list = [None] * n
            for (w, h), idxs in groups.items():
                m = len(idxs)
                canvas = np.full((m, h * w), nd, dtype=np.float64)
                ri, pi, vi = [], [], []
                for j, i in enumerate(idxs):
                    px = pdf["_px"].iat[i]
                    if px is None:
                        continue
                    for cell in px:
                        ri.append(j)
                        pi.append(cell["_pix"])
                        vi.append(cell["_v"])
                if ri:
                    canvas[np.asarray(ri), np.asarray(pi)] = np.asarray(
                        vi, dtype=np.float64
                    )
                pix = np.clip(canvas, 0, 255).astype(np.uint8).reshape(m, h, w)
                enc = _codec.encode_group(pix, out_fmt)
                for j, i in enumerate(idxs):
                    out_b[i] = enc[j]
            yield pd.DataFrame(
                {
                    key: pdf["_k"].astype(str),
                    "w": pdf["_w"].astype("int32"),
                    "h": pdf["_h"].astype("int32"),
                    "n_burned": pdf["n_burned"].fillna(0).astype("int64"),
                    "val_sum": pdf["val_sum"].fillna(0).astype("int64"),
                    "bytes": out_b,
                    "fmt": out_fmt,
                }
            )

    return agg.mapInPandas(op, schema)


def reproject_webmercator(
    images: DataFrame,
    h_out: int | None = None,
) -> DataFrame:
    """Raster warp (the `gdalwarp` analog, nearest-neighbor): each
    footprint raster — a grid REGULAR IN LON/LAT over its bbox (the
    raster_to_points geotransform) — is resampled onto a grid regular
    in WEBMERCATOR METERS over the same bbox.

    Geometry: WebMercator x is LINEAR in longitude, so columns map
    1:1 and the warp reduces to a pure ROW remap — target row j sits
    at y = y_top - (j+0.5)*(y_top-y_bot)/h_out meters, inverted to
    phi = 2*atan(exp(y/R)) - pi/2 (Snyder 1987 eq. 7-4), then to the
    nearest source row. Wholly vectorized: one (n, h_out) index
    matrix per uniform (fmt, w, h) group, one fancy-gather, one
    encode_group — no per-image Python.

    Requires footprint columns (lon_c/lat_c/dlon/dlat — apply
    functions.spatial.with_footprint). ``h_out`` defaults to the
    source height. Latitudes must be Mercator-valid (|lat| < 85.05);
    out-of-range footprints raise.
    """
    schema = "image_id string, w int, h int, bytes binary, fmt string"
    R = 6378137.0

    def op(batches):
        tune_worker()
        for b in batches:
            if b.num_rows == 0:
                continue
            ids, blobs, groups = _codec.group_by_shape(b)
            names = b.schema.names
            lat_c = b.column(names.index("lat_c")).to_numpy(zero_copy_only=False)
            dlat = b.column(names.index("dlat")).to_numpy(zero_copy_only=False)
            out_id: list = []
            out_w: list = []
            out_h: list = []
            out_b: list = []
            out_f: list = []
            for (f, w, h), idxs in groups.items():
                ho = h_out or h
                m = len(idxs)
                la = lat_c[idxs]
                dl = dlat[idxs]
                top = la + dl
                bot = la - dl
                if np.any(np.abs(top) >= 85.06) or np.any(np.abs(bot) >= 85.06):
                    raise ValueError(
                        "footprint latitude outside WebMercator validity "
                        "(|lat| < 85.05)"
                    )
                ytop = R * np.log(np.tan(np.pi / 4 + np.radians(top) / 2))
                ybot = R * np.log(np.tan(np.pi / 4 + np.radians(bot) / 2))
                j = np.arange(ho) + 0.5
                y = ytop[:, None] - j[None, :] * (ytop - ybot)[:, None] / ho
                phi = np.degrees(2 * np.arctan(np.exp(y / R)) - np.pi / 2)
                # source row from the lon/lat geotransform (north-up)
                src = np.floor(
                    (top[:, None] - phi) / (2 * dl)[:, None] * h
                ).astype(np.int64)
                src = np.clip(src, 0, h - 1)
                pix = _codec.decode_group([blobs[i].as_py() for i in idxs], f, w, h)
                warped = pix[np.arange(m)[:, None], src]
                enc = _codec.encode_group(np.ascontiguousarray(warped), f)
                for t, i in enumerate(idxs):
                    out_id.append(ids[i])
                    out_w.append(w)
                    out_h.append(ho)
                    out_b.append(enc[t])
                    out_f.append(f)
            import pandas as pd

            yield pa.RecordBatch.from_pandas(
                pd.DataFrame(
                    {
                        "image_id": out_id,
                        "w": np.asarray(out_w, dtype=np.int32),
                        "h": np.asarray(out_h, dtype=np.int32),
                        "bytes": out_b,
                        "fmt": out_f,
                    }
                ),
                preserve_index=False,
            )

    cols = ["image_id", "bytes", "fmt", "w", "h", "lon_c", "lat_c", "dlon", "dlat"]
    return images.select(*cols).mapInArrow(op, schema)


def sample_raster(
    requests: DataFrame,
    images: DataFrame,
    band: int = 0,
    pid_col: str = "pid",
) -> DataFrame:
    """Point queries against the raster table (the `gdallocationinfo`
    analog, the point-probe complement of raster_to_points' full
    fan-out): ``requests`` rows (``pid_col``, image_id, px_r, px_c)
    name the pixels to read; each image is decoded ONCE no matter how
    many probes land on it and only the requested pixels materialize.
    Locate stage (lon/lat -> image_id, px_r, px_c) is the certified
    footprint-join machinery (`pip_join`/`bbox_join` + the inverse
    geotransform) — this operator is the decode+gather leg.

    Out-of-bounds probes fail loud (input gating, the K9 rule), they
    do not clamp.

    Scale: ONE shuffle (requests groupBy image_id, map-side-combined
    collect_list) + an image_id equi-join that AQE broadcasts when
    the probed-image set is small; decode is whole-batch per uniform
    (fmt, w, h) group (codec.decode_group), gather is one fancy-index
    — no per-probe Python. Probe lists are bounded per image by
    construction (a probe set ~ the image's pixel count should use
    raster_to_points instead).
    """
    reqs = requests.groupBy("image_id").agg(
        F.collect_list(
            F.struct(
                F.col(pid_col).cast("long").alias("pid"),
                F.col("px_r").cast("int").alias("r"),
                F.col("px_c").cast("int").alias("c"),
            )
        ).alias("_reqs")
    )
    joined = images.select("image_id", "bytes", "fmt", "w", "h").join(
        reqs, "image_id"
    )
    schema = f"{pid_col} long, image_id string, px_r int, px_c int, val double"

    def op(batches):
        import pandas as pd

        tune_worker()
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for (fmt, w, h), idx in pdf.groupby(
                ["fmt", "w", "h"], sort=False
            ).indices.items():
                w, h = int(w), int(h)
                sub = pdf.iloc[idx]
                pix = _codec.decode_group(
                    [bytes(b) for b in sub["bytes"]], str(fmt), w, h
                )
                ch = pix[..., band] if pix.ndim == 4 else pix
                counts = np.array([len(r) for r in sub["_reqs"]], dtype=np.int64)
                if counts.sum() == 0:
                    continue
                flat = np.concatenate([np.asarray(
                    [(q["pid"], q["r"], q["c"]) for q in r], dtype=np.int64
                ).reshape(-1, 3) for r in sub["_reqs"] if len(r)])
                img_ix = np.repeat(
                    np.arange(len(sub), dtype=np.int64), counts
                )
                rr, cc = flat[:, 1], flat[:, 2]
                if (rr < 0).any() or (rr >= h).any() or (cc < 0).any() or (cc >= w).any():
                    bad = flat[(rr < 0) | (rr >= h) | (cc < 0) | (cc >= w)][0]
                    raise ValueError(
                        f"probe out of bounds: pid={bad[0]} (r={bad[1]}, "
                        f"c={bad[2]}) vs {h}x{w}"
                    )
                vals = ch[img_ix, rr, cc].astype(np.float64)
                outs.append(
                    pd.DataFrame(
                        {
                            pid_col: flat[:, 0],
                            "image_id": np.asarray(sub["image_id"])[img_ix],
                            "px_r": rr.astype(np.int32),
                            "px_c": cc.astype(np.int32),
                            "val": vals,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return joined.mapInPandas(op, schema)
