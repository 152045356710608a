"""Pure-JVM Column expressions over raw image bytes.

Fixed-layout formats (binary PNM: P6/P5) allow direct indexed pixel
access on the `bytes` binary column — `substring`+`hex`+`conv` read
exactly the 64 sampled pixels of the perceptual average-hash without
decoding the image and without any Python worker. This is the engine's
"column pruning for pixels": a 100 TB scan whose downstream only needs
the 8x8 ahash reads 192 bytes per image, not w*h*3, and the whole plan
stays inside whole-stage codegen (plan-asserted: tests/test_plans.py).

Compressed formats (png/qnt) cannot skip the zlib stream and take the
batched Python path (kernels/codec.decode_group). Reference parity:
the decode boundary is GDALReader's band read (gdal_nodes.cpp:396-403);
the reference always fully decodes — sampling directly off the scan is
the Spark-first improvement.

Expression-budget note: the 64 sample expressions are materialized ONCE
into an array column by the caller (`with_ahash_pnm`), and the mean /
bit-packing steps reference that named column. Catalyst's
CollapseProject will not inline a non-cheap projection referenced more
than once, so the analyzed tree stays ~1.7k nodes (the k=8 k-ring
lesson: a 4k-node tree costs ~50s of analysis).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pnm_gray_samples_col", "ahash_from_samples", "with_ahash_pnm"]

# bit weights 1<<k as signed longs (1<<63 wraps to Long.MIN_VALUE)
_BIT_WEIGHTS = [(1 << k) if k < 63 else -(1 << 63) for k in range(64)]


def pnm_gray_samples_col(data: Column, w: Column, h: Column, channels: int = 3) -> Column:
    """array<double> of the 64 grays ((r+g+b)/3, row-major 8x8 grid)
    sampled straight off binary P6/P5 bytes. Sample (ky,kx) reads the
    pixel at (floor(ky*h/8), floor(kx*w/8)); the raster offset is
    length(bytes) - w*h*channels (the PNM header is everything before
    the raster)."""
    hdr = F.length(data) - w * h * F.lit(channels) + F.lit(1)  # 1-based pos of raster[0]
    grays = []
    for ky in range(8):
        for kx in range(8):
            yi = F.least(F.floor(F.lit(ky) * h / F.lit(8)).cast("long"), (h - 1).cast("long"))
            xi = F.least(F.floor(F.lit(kx) * w / F.lit(8)).cast("long"), (w - 1).cast("long"))
            off = hdr + (yi * w + xi) * F.lit(channels)
            if channels == 3:
                v = F.conv(F.hex(F.substring(data, off, 3)), 16, 10).cast("long")
                gray = (
                    F.shiftright(v, 16).bitwiseAND(F.lit(255))
                    + F.shiftright(v, 8).bitwiseAND(F.lit(255))
                    + v.bitwiseAND(F.lit(255))
                ).cast("double") / 3.0
            else:
                gray = F.conv(F.hex(F.substring(data, off, 1)), 16, 10).cast("double")
            grays.append(gray)
    return F.array(*grays)


def ahash_from_samples(samples: Column) -> Column:
    """64-bit average-hash from an array<double> of 64 grays: bit k set
    iff samples[k] > mean(samples). Bit-identical to
    kernels.codec.ahash_batch away from exact-tie samples."""
    mu = F.aggregate(samples, F.lit(0.0), lambda a, x: a + x) / F.lit(64.0)
    weights = F.array(*[F.lit(wt).cast("long") for wt in _BIT_WEIGHTS])
    bits = F.zip_with(
        samples,
        weights,
        lambda g, wt: F.when(g > mu, wt).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x))


def with_ahash_pnm(
    df: DataFrame,
    out: str = "ahash",
    data: str = "bytes",
    w: str = "w",
    h: str = "h",
    channels: int = 3,
) -> DataFrame:
    """df + `out` long column: JVM-only ahash for binary-PNM rows.

    Staged as two projections so the 64-substring array is built once
    (see module docstring); the result plan has zero Python nodes."""
    samples = pnm_gray_samples_col(F.col(data), F.col(w), F.col(h), channels)
    tmp = f"__pnm_samples_{out}"
    staged = df.withColumn(tmp, samples)
    # reference the materialized array column; aggregate/zip_with are
    # interpreted HOFs but run over a 64-element array (~us/row)
    return staged.withColumn(out, ahash_from_samples(F.col(tmp))).drop(tmp)
