"""Multimodal (image bytes) operators over the input_hint table.

The raster boundary of the reference (GDALReader band->float32 buffer,
gdal_nodes.cpp:396-403; GDALWriter re-encode, :296-341) becomes: a
binary `bytes` column decoded per Arrow batch inside mapInPandas,
numpy transforms, re-encode. The image libraries that aren't in this
container (JPEG etc.) are stubbed behind NotImplementedError with the
Spark-side plumbing (schema, batching, partitioning) real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfp_gdal_spark.kernels import codec as _codec

__all__ = [
    "image_stats",
    "reencode_images",
    "resize_images",
    "image_ahash",
    "decode_frame_sample",
]

_STATS_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, "
    "mean_r double, mean_g double, mean_b double, px_min int, px_max int, psnr_roundtrip double"
)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode every image, emit per-image pixel stats + round-trip PSNR
    (decode -> re-encode -> decode). The engine analog of GDALReader's
    band min/max report (gdal_nodes.cpp:385-389), plus the
    PSNR>=40dB invariant of BASELINE.json input_hint."""

    def op(batches):
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"],
                "w": pdf["w"],
                "h": pdf["h"],
                "fmt": pdf["fmt"],
                "caption": pdf["caption"],
                "mean_r": np.zeros(n), "mean_g": np.zeros(n), "mean_b": np.zeros(n),
                "px_min": np.zeros(n, np.int32), "px_max": np.zeros(n, np.int32),
                "psnr_roundtrip": np.zeros(n),
            }
            for i, (blob, fmt) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                pix = _codec.decode_image(bytes(blob), fmt)
                rgb = pix if pix.ndim == 3 else np.stack([pix] * 3, axis=-1)
                out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = rgb.mean(axis=(0, 1))
                out["px_min"][i], out["px_max"][i] = int(pix.min()), int(pix.max())
                rt = _codec.decode_image(_codec.encode_image(pix, fmt), fmt)
                out["psnr_roundtrip"][i] = min(_codec.psnr(pix, rt), 999.0)
            yield pd.DataFrame(out)

    return images.mapInPandas(op, _STATS_SCHEMA)


def reencode_images(images: DataFrame, to_fmt: str) -> DataFrame:
    """Transcode bytes to ``to_fmt`` (GDALWriter analog): decode with
    the row's fmt, encode with the target, preserving metadata."""

    def op(batches):
        for pdf in batches:
            blobs = [
                _codec.encode_image(_codec.decode_image(bytes(b), f), to_fmt)
                for b, f in zip(pdf["bytes"], pdf["fmt"])
            ]
            out = pdf.copy()
            out["bytes"] = blobs
            out["fmt"] = to_fmt
            yield out

    return images.mapInPandas(op, images.schema)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure numpy index sampling) + re-encode.
    Lossless formats stay pixel-exact under identity resize."""

    def op(batches):
        for pdf in batches:
            blobs, ws, hs = [], [], []
            for b, f in zip(pdf["bytes"], pdf["fmt"]):
                pix = _codec.decode_image(bytes(b), f)
                h, w = pix.shape[:2]
                yi = np.minimum((np.arange(out_h) * h // out_h), h - 1)
                xi = np.minimum((np.arange(out_w) * w // out_w), w - 1)
                res = pix[yi][:, xi]
                blobs.append(_codec.encode_image(res, f))
                ws.append(out_w)
                hs.append(out_h)
            out = pdf.copy()
            out["bytes"], out["w"], out["h"] = blobs, ws, hs
            yield out

    return images.mapInPandas(op, images.schema)


def image_ahash(images: DataFrame) -> DataFrame:
    """64-bit average-hash (8x8 mean threshold) per image — a real,
    deterministic perceptual hash computed from pixels (vs the table's
    synthetic `phash` fixture column)."""
    schema = "image_id string, ahash long"

    def op(batches):
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.uint64)
            for i, (b, f) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                pix = _codec.decode_image(bytes(b), f)
                g = pix.mean(axis=2) if pix.ndim == 3 else pix.astype(np.float64)
                h, w = g.shape
                yi = np.minimum(np.arange(8) * h // 8, h - 1)
                xi = np.minimum(np.arange(8) * w // 8, w - 1)
                s = g[yi][:, xi]
                bits = (s > s.mean()).astype(np.uint64).ravel()
                out[i] = (bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
            yield pd.DataFrame({"image_id": pdf["image_id"], "ahash": out.view(np.int64)})

    return images.mapInPandas(op, schema)


def decode_frame_sample(videos: DataFrame, every_nth: int = 30) -> DataFrame:
    """Video frame sampling — STUB. The container has no video codec
    libraries; the Spark-side plumbing (binary column in, exploded
    frame rows out) is the contract. Raises NotImplementedError when
    executed on real bytes."""
    schema = "video_id string, frame_idx int, frame_bytes binary"

    def op(batches):
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "video decode requires an external codec library (not in sandbox); "
                    "plug a decode(bytes)->frames function into this mapInPandas op"
                )
            yield pd.DataFrame({"video_id": [], "frame_idx": [], "frame_bytes": []})

    return videos.mapInPandas(op, schema)
