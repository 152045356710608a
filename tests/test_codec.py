"""Image codec tests: lossless exactness, lossy PSNR>=40dB (the
BASELINE.json input_hint per-row invariant), determinism."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfp_gdal_spark.kernels import codec as C


@pytest.mark.parametrize("fmt", ["ppm", "png"])
@pytest.mark.parametrize("i,w,h", [(0, 16, 16), (7, 33, 17), (123, 64, 48)])
def test_lossless_roundtrip_rgb(fmt, i, w, h):
    pix = C.synth_pixels(i, w, h)
    out = C.decode_image(C.encode_image(pix, fmt), fmt)
    assert np.array_equal(out, pix)


@pytest.mark.parametrize("fmt", ["pgm", "png"])
def test_lossless_roundtrip_gray(fmt):
    pix = C.synth_pixels(5, 21, 13, gray=True)
    out = C.decode_image(C.encode_image(pix, fmt), fmt)
    assert np.array_equal(out, pix)


def test_qnt_psnr_at_least_40():
    for i in range(20):
        pix = C.synth_pixels(i, 32, 24)
        out = C.decode_image(C.encode_image(pix, "qnt"), "qnt")
        assert C.psnr(pix, out) >= 40.0
        assert out.shape == pix.shape


@given(st.integers(0, 10_000))
@settings(max_examples=25, deadline=None)
def test_synth_deterministic(i):
    a = C.synth_pixels(i, 16, 16)
    b = C.synth_pixels(i, 16, 16)
    assert np.array_equal(a, b)


def test_qnt_worst_case_psnr():
    """Adversarial input (uniform noise) still clears 40dB with 6-bit
    quantization (max per-pixel error 2 -> PSNR >= 10*log10(255^2/4))."""
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    out = C.decode_image(C.encode_image(pix, "qnt"), "qnt")
    assert np.abs(out.astype(int) - pix.astype(int)).max() <= 2
    assert C.psnr(pix, out) >= 40.0


def test_png_handles_nontrivial_sizes():
    pix = C.synth_pixels(3, 1, 1)
    assert np.array_equal(C.decode_image(C.encode_image(pix, "png"), "png"), pix)


def test_pnm_header_parse_with_comment():
    pix = C.synth_pixels(1, 4, 3)
    raw = C.encode_image(pix, "ppm")
    # inject a comment line after the magic (PNM spec allows it)
    patched = b"P6\n# a comment\n" + raw[3:]
    assert np.array_equal(C.decode_image(patched, "ppm"), pix)


def test_png_decode_all_filter_types():
    """Our encoder emits filter 0 only, but EXTERNAL pngs use Sub/Up/
    Average/Paeth — build one per spec and decode; decode_group must
    take its per-image fallback for filtered scanlines and agree."""
    import struct
    import zlib

    from gfp_gdal_spark.kernels import codec as C

    pix = C.synth_pixels(3, 9, 8)  # (8, 9, 3) rgb
    h, w, nch = pix.shape
    bpp = nch
    raw = pix.reshape(h, w * nch).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))

    lines = []
    for y in range(h):
        f = [0, 1, 2, 3, 4][y % 5]
        cur = raw[y]
        prior = raw[y - 1] if y > 0 else np.zeros_like(cur)
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prior
        elif f == 3:
            enc = cur - ((left + prior) >> 1)
        else:
            enc = cur - paeth(left, prior, ul)
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        C._PNG_SIG
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + C._chunk(b"IEND", b"")
    )
    got = C.decode_image(blob, "png")
    assert np.array_equal(got, pix)
    # grouped decode detects the non-zero filters and falls back
    grp = C.decode_group([blob, blob], "png", w, h)
    assert grp.shape == (2, h, w, 3)
    assert np.array_equal(grp[0], pix) and np.array_equal(grp[1], pix)
