"""Image codecs in pure numpy + stdlib zlib (no Pillow/GDAL in sandbox).

The engine's analog of the reference's raster IO boundary
(GDALReader/GDALWriter, gdal_nodes.cpp:274-342,344-424): images live
in DataFrames as an opaque ``bytes`` binary column plus typed metadata
(w, h, fmt) — exactly the BASELINE.json input_hint schema — and these
codecs are the decode/encode kernels the pandas UDFs call per Arrow
batch.

Formats:
- ``ppm``  — binary P6 RGB, lossless.
- ``pgm``  — binary P5 gray, lossless.
- ``png``  — 8-bit RGB or gray, zlib stdlib; encoder emits filter 0,
             decoder handles all five standard filters (public PNG spec).
- ``qnt``  — our simple lossy format: 6-bit channel quantization +
             zlib. Exercises the PSNR>=40dB invariant path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_image", "decode_image", "psnr", "synth_pixels"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PPM / PGM
# ---------------------------------------------------------------------------

def _encode_pnm(pix: np.ndarray) -> bytes:
    gray = pix.ndim == 2 or pix.shape[2] == 1
    h, w = pix.shape[:2]
    magic = b"P5" if gray else b"P6"
    header = b"%s\n%d %d\n255\n" % (magic, w, h)
    return header + np.ascontiguousarray(pix, dtype=np.uint8).tobytes()


def _decode_pnm(data: bytes) -> np.ndarray:
    # header: magic, whitespace-separated w h maxval, single whitespace, raster
    fields: list[bytes] = []
    i = 2  # past magic
    while len(fields) < 3:
        while data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while data[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while not data[j : j + 1].isspace():
            j += 1
        fields.append(data[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h = int(fields[0]), int(fields[1])
    raster = np.frombuffer(data, dtype=np.uint8, offset=i)
    if data[:2] == b"P5":
        return raster[: w * h].reshape(h, w)
    return raster[: w * h * 3].reshape(h, w, 3)


# ---------------------------------------------------------------------------
# PNG (public spec; 8-bit gray / RGB only)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _encode_png(pix: np.ndarray) -> bytes:
    gray = pix.ndim == 2
    h, w = pix.shape[:2]
    color_type = 0 if gray else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = pix.reshape(h, -1).astype(np.uint8)
    raw = np.empty((h, rows.shape[1] + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = rows
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    rows = raw.reshape(h, stride + 1)
    if not rows[:, 0].any():  # all filter-0 scanlines (our encoder's output)
        return np.ascontiguousarray(rows[:, 1:])
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if f == 0:
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        else:  # Sub / Average / Paeth need left-neighbor scan
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:
                    line[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    line[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (cur[x] + pred) & 0xFF
        out[y] = line.astype(np.uint8)
    return out


def _decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a png"
    i = 8
    idat = b""
    w = h = color_type = 0
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and color_type in (0, 2), "only 8-bit gray/RGB"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + length
    nch = 1 if color_type == 0 else 3
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    out = _png_unfilter(raw, h, w * nch, nch)
    return out.reshape(h, w) if nch == 1 else out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# QNT — our lossy format: 6-bit quantization, zlib. header: QNT1 w h nch
# ---------------------------------------------------------------------------

def _encode_qnt(pix: np.ndarray) -> bytes:
    gray = pix.ndim == 2
    h, w = pix.shape[:2]
    nch = 1 if gray else pix.shape[2]
    q = (np.ascontiguousarray(pix, dtype=np.uint8) >> 2).astype(np.uint8)
    return b"QNT1" + struct.pack(">IIB", w, h, nch) + zlib.compress(q.tobytes(), 6)


def _decode_qnt(data: bytes) -> np.ndarray:
    assert data[:4] == b"QNT1"
    w, h, nch = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    # reconstruct at bin center: v*4 + 2 (max error 2 -> PSNR ~ 44 dB worst case)
    pix = (q.astype(np.uint16) * 4 + 2).clip(0, 255).astype(np.uint8)
    return pix.reshape(h, w) if nch == 1 else pix.reshape(h, w, nch)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def encode_image(pix: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm" or fmt == "pgm":
        return _encode_pnm(pix)
    if fmt == "png":
        return _encode_png(pix)
    if fmt == "qnt":
        return _encode_qnt(pix)
    raise ValueError(f"unknown image fmt: {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt in ("ppm", "pgm"):
        return _decode_pnm(data)
    if fmt == "png":
        return _decode_png(data)
    if fmt == "qnt":
        return _decode_qnt(data)
    raise ValueError(f"unknown image fmt: {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def synth_pixels(i: int, w: int, h: int, gray: bool = False) -> np.ndarray:
    """Deterministic per-image pattern (FIXTURES.md §1): gradient +
    per-image sinusoid keyed by i. Pure numpy, seed-free."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (xx / max(w - 1, 1) * 127.0) + (yy / max(h - 1, 1) * 64.0)
    wave = 64.0 * np.sin((xx + yy) * (0.1 + (i % 17) * 0.03) + i * 0.7)
    g = np.clip(base + wave + 32.0, 0, 255).astype(np.uint8)
    if gray:
        return g
    r = np.clip(base * 0.5 + wave + (i % 29) * 4.0, 0, 255).astype(np.uint8)
    b = np.clip(255.0 - base + 0.5 * wave, 0, 255).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)
