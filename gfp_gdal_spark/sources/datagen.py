"""Deterministic synthetic data generators (FIXTURES.md contract).

The `images` table (BASELINE.json input_hint schema) is generated
DISTRIBUTED — ``spark.range(N)`` + ``mapInPandas`` so 500k-row bench
tables never materialize on the driver — with a fully deterministic
per-row rule (seed-free: every value is a function of the row id), so
any two runs and any partitioning produce identical rows.

Schema: image_id:string, bytes:binary, w:int, h:int, fmt:string,
        caption:string, phash:long
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gfp_gdal_spark.kernels import codec as _codec

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)

_WS = [16, 32, 64]
_HS = [16, 24, 48]
_FMTS = ["ppm", "png", "qnt"]
_HOT_LON, _HOT_LAT = 4.9, 52.37  # skew fixture: 1 in 97 rows pinned here


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Public splitmix64 mix function, vectorized on uint64."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _phash_for(ids: np.ndarray) -> np.ndarray:
    ph = splitmix64(ids.astype(np.uint64))
    hot = (ids % 97) == 0
    if hot.any():
        # pin hot rows' footprint center to (_HOT_LON, _HOT_LAT):
        # invert the footprint contract lon_c/lat_c -> phash halves
        lo = np.uint64(int((_HOT_LON + 180.0) / 360.0 * 2**32))
        hi = np.uint64(int((_HOT_LAT + 85.0) / 170.0 * 2**32))
        ph = np.where(hot, (hi << np.uint64(32)) | lo, ph)
    return ph.view(np.int64)


def _gen_batch(ids: np.ndarray, with_bytes: bool) -> pd.DataFrame:
    w = np.array([_WS[i % 3] for i in ids], dtype=np.int32)
    h = np.array([_HS[i % 3] for i in ids], dtype=np.int32)
    fmt = [_FMTS[i % 3] for i in ids]
    blobs = None
    if with_bytes:
        blobs = [
            _codec.encode_image(_codec.synth_pixels(int(i), int(wi), int(hi)), f)
            for i, wi, hi, f in zip(ids, w, h, fmt)
        ]
    return pd.DataFrame(
        {
            "image_id": [f"img{i:08d}" for i in ids],
            "bytes": blobs if with_bytes else [b""] * len(ids),
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": [f"synthetic scene {i} tags:{i % 7},{i % 13}" for i in ids],
            "phash": _phash_for(ids),
        }
    )


def images_table(spark: SparkSession, n: int, with_bytes: bool = True) -> DataFrame:
    """Distributed deterministic images table of n rows."""
    parts = max(min(n // 2000, 256), spark.sparkContext.defaultParallelism)

    def gen(it):
        for pdf in it:
            yield _gen_batch(pdf["id"].to_numpy(), with_bytes)

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, IMAGES_SCHEMA)


def images_pandas(n: int, with_bytes: bool = True) -> pd.DataFrame:
    """Driver-side variant for unit tests / DuckDB oracles (small n)."""
    return _gen_batch(np.arange(n, dtype=np.int64), with_bytes)


# ---------------------------------------------------------------------------
# vector_layer fixture (FIXTURES.md §2): polygon layer for PiP joins —
# the analog of an OGRLoader-ingested layer (ogr_reader_node.cpp:124-309).
# ---------------------------------------------------------------------------

VECTOR_SCHEMA = (
    "polygon_id long, ring array<array<double>>, holes array<array<array<double>>>, "
    "name string, category string, valid_from date"
)
_CATS = ["residential", "industrial", "water", "park"]


def vector_layer_pandas(m: int, seed: int = 42) -> pd.DataFrame:
    """m seeded polygons: regular k-gons (k cycles 3..8) + rects on a
    coarse grid over the image lon/lat domain; 20% get one CW hole."""
    rng = np.random.default_rng(seed)
    grid = int(np.ceil(np.sqrt(m)))
    rows = []
    for j in range(m):
        gx, gy = j % grid, j // grid
        cx = -180.0 + (gx + 0.5) * 360.0 / grid + rng.uniform(-0.1, 0.1)
        cy = -85.0 + (gy + 0.5) * 170.0 / grid + rng.uniform(-0.1, 0.1)
        rad = rng.uniform(0.5, 3.0) * 180.0 / grid
        if j % 2 == 0:
            k = 3 + (j % 6)
            ang = rng.uniform(0, 2 * np.pi) + np.arange(k) * 2 * np.pi / k
            ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        else:
            ring = np.array(
                [[cx - rad, cy - rad], [cx + rad, cy - rad], [cx + rad, cy + rad], [cx - rad, cy + rad]]
            )
        holes = None
        if j % 5 == 0:
            hr = rad * 0.3
            holes = [  # CW (reference hole canon, ogr_reader_node.cpp:101-119)
                [[cx - hr, cy - hr], [cx - hr, cy + hr], [cx + hr, cy + hr], [cx + hr, cy - hr]]
            ]
        rows.append(
            {
                "polygon_id": j,
                "ring": ring.tolist(),
                "holes": holes,
                "name": f"zone_{j}",
                "category": _CATS[j % 4],
                "valid_from": pd.Timestamp("2020-01-01") + pd.Timedelta(days=j),
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["valid_from"] = pdf["valid_from"].dt.date
    return pdf


def vector_layer(spark: SparkSession, m: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(vector_layer_pandas(m, seed), schema=VECTOR_SCHEMA)


def vector_layer_zones_pandas(m: int, seed: int = 42, max_radius_deg: float = 2.0) -> pd.DataFrame:
    """Realistic zone-scale polygon layer for benchmarks: city-sized
    k-gons (radius <= max_radius_deg), mostly non-overlapping. The grid
    fixture above intentionally over-covers the globe (radius up to 3x
    its grid pitch) to stress overlap handling; THIS layer models the
    actual workload shape of a zones table at planet scale."""
    rng = np.random.default_rng(seed)
    rows = []
    for j in range(m):
        cx = rng.uniform(-178.0, 178.0)
        cy = rng.uniform(-83.0, 83.0)
        rad = rng.uniform(0.2, max_radius_deg)
        k = 3 + (j % 6)
        ang = rng.uniform(0, 2 * np.pi) + np.arange(k) * 2 * np.pi / k
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        holes = None
        if j % 5 == 0:
            hr = rad * 0.3
            holes = [
                [[cx - hr, cy - hr], [cx - hr, cy + hr], [cx + hr, cy + hr], [cx + hr, cy - hr]]
            ]
        rows.append(
            {
                "polygon_id": j,
                "ring": ring.tolist(),
                "holes": holes,
                "name": f"zone_{j}",
                "category": _CATS[j % 4],
                "valid_from": (pd.Timestamp("2020-01-01") + pd.Timedelta(days=j)).date(),
            }
        )
    return pd.DataFrame(rows)


def vector_layer_zones(spark: SparkSession, m: int, seed: int = 42, max_radius_deg: float = 2.0) -> DataFrame:
    return spark.createDataFrame(
        vector_layer_zones_pandas(m, seed, max_radius_deg), schema=VECTOR_SCHEMA
    )


# ---------------------------------------------------------------------------
# audio fixture: WAV PCM clips with typed metadata (the audio leg of the
# multimodal boundary; closed-form per-key signal — kernels/wavcodec.py)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, n_samples int, sample_rate int, "
    "n_channels int, caption string"
)


def _gen_audio_batch(ids: np.ndarray, with_bytes: bool = True) -> pd.DataFrame:
    from gfp_gdal_spark.kernels import wavcodec as W

    # whole-class synthesis: ids fall into 10 (n_samples, channels)
    # classes (key%5 x key%2); each class synthesizes ONE signal tensor
    # and group-encodes it — no per-clip Python loop (same batching
    # rule as the image/audio operators themselves)
    ids = np.asarray(ids, dtype=np.int64)
    blobs: list[bytes] = [b""] * len(ids)
    ns = (4000 + (ids % 5) * 2000).astype(np.int32)
    ch = (1 + (ids % 2)).astype(np.int32)
    if with_bytes:
        cls = (ids % 5) * 2 + (ids % 2)
        for c in np.unique(cls):
            idx = np.flatnonzero(cls == c)
            s0, rate = W.synth_audio(int(ids[idx[0]]))
            group = np.broadcast_to(s0, (len(idx),) + s0.shape)
            enc = W.encode_wav_group(group, rate)
            for j, i in enumerate(idx):
                blobs[i] = enc[j]
    return pd.DataFrame(
        {
            "audio_id": [f"aud{i:08d}" for i in ids],
            "bytes": blobs,
            "n_samples": np.array(ns, dtype=np.int32),
            "sample_rate": np.full(len(ids), 8000, dtype=np.int32),
            "n_channels": np.array(ch, dtype=np.int32),
            "caption": [f"synthetic tone {i} key:{i % 5}" for i in ids],
        }
    )


def audio_table(spark: SparkSession, n: int, with_bytes: bool = True) -> DataFrame:
    """Distributed deterministic audio table of n rows."""
    parts = max(min(n // 2000, 256), spark.sparkContext.defaultParallelism)

    def gen(it):
        for pdf in it:
            yield _gen_audio_batch(pdf["id"].to_numpy(), with_bytes)

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, AUDIO_SCHEMA)


def audio_pandas(n: int, with_bytes: bool = True) -> pd.DataFrame:
    return _gen_audio_batch(np.arange(n, dtype=np.int64), with_bytes)
