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
