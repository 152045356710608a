"""WAV (RIFF PCM int16) codec in pure numpy + struct — the audio leg
of the multimodal boundary (BASELINE.json treats media as opaque
binary + typed metadata; images got codec.py, audio gets this).

Unlike video (sandbox has no codec library — operators.multimodal
keeps an injectable stub), PCM WAV is a trivial container, so the
audio path is REAL end-to-end: encode/decode are bit-exact inverses,
and the grouped decode mirrors codec.decode_group's whole-batch shape
(one frombuffer + reshape per uniform group, no per-row Python).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_wav",
    "encode_wav_group",
    "decode_wav",
    "decode_wav_group",
    "synth_audio",
]


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples (n,) mono or (n, ch) interleaved -> RIFF/WAVE PCM.
    Bit-exact inverse of decode_wav."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    payload = np.ascontiguousarray(s).tobytes()
    byterate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byterate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_group(samples: np.ndarray, rate: int) -> list[bytes]:
    """Whole-batch encode of a uniform (n, n_samples, ch) int16 tensor:
    the 44-byte header is identical across the group, so per-clip work
    is ONE group-wide tobytes + a bytes slice (the encode mirror of
    decode_wav_group; same no-per-row-Python rule as codec.encode_group).
    Bitwise-identical to [encode_wav(samples[i], rate) for i]."""
    n, ns, ch = samples.shape
    payload_sz = ns * ch * 2
    byterate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byterate, ch * 2, 16)
    head = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", payload_sz)
    )
    header = b"RIFF" + struct.pack("<I", len(head) + payload_sz) + head
    raw = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    return [header + raw[i * payload_sz : (i + 1) * payload_sz] for i in range(n)]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM int16 -> (samples (n, ch) int16, rate). Walks the
    chunk list (external wavs may carry LIST/fact chunks before data)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a wav"
    i, rate, ch = 12, None, None
    payload = None
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        (ln,) = struct.unpack("<I", data[i + 4 : i + 8])
        if tag == b"fmt ":
            audio_fmt, ch, rate = struct.unpack("<HHI", data[i + 8 : i + 16])
            (bits,) = struct.unpack("<H", data[i + 22 : i + 24])
            assert audio_fmt == 1 and bits == 16, "only PCM int16"
        elif tag == b"data":
            payload = data[i + 8 : i + 8 + ln]
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
    assert rate is not None and payload is not None, "missing fmt/data chunk"
    s = np.frombuffer(payload, dtype="<i2")
    return s.reshape(-1, ch), int(rate)


def decode_wav_group(blobs: list[bytes], n_samples: int, ch: int) -> np.ndarray:
    """Whole-batch decode of a UNIFORM (n_samples, ch, engine-encoded)
    group -> (n, n_samples, ch) int16: the 44-byte header is fixed for
    a uniform group, so the group decodes with ONE frombuffer+reshape
    (same scale shape as codec.decode_group for fixed-layout images).
    Falls back to per-blob decode_wav if any blob length differs
    (foreign chunk layout)."""
    n = len(blobs)
    sz = 44 + n_samples * ch * 2
    if all(len(b) == sz for b in blobs):
        flat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(n, sz)
        return (
            np.ascontiguousarray(flat[:, 44:])
            .view("<i2")
            .reshape(n, n_samples, ch)
        )
    out = np.empty((n, n_samples, ch), dtype=np.int16)
    for i, b in enumerate(blobs):
        s, _ = decode_wav(b)
        out[i] = s
    return out


def synth_audio(key: int, rate: int = 8000) -> tuple[np.ndarray, int]:
    """Deterministic closed-form test signal per key (the audio analog
    of codec.synth_pixels): a sine at rate/8 Hz — period 8 samples, so
    the sample grid HITS the +-1 peaks exactly — with amplitude
    0.5 + (key%5)*0.1, n = 4000 + (key%5)*2000 samples, stereo on odd
    keys (second channel at half amplitude). peak, n_samples, and
    channel count are therefore exact integer functions of the key —
    the driver oracle's closed form."""
    n = 4000 + (key % 5) * 2000
    amp = 0.5 + (key % 5) * 0.1
    t = np.arange(n)
    wave = np.sin(2.0 * np.pi * t / 8.0)
    ch1 = np.round(32767.0 * amp * wave).astype(np.int16)
    if key % 2 == 1:
        ch2 = np.round(32767.0 * amp * 0.5 * wave).astype(np.int16)
        return np.stack([ch1, ch2], axis=1), rate
    return ch1[:, None], rate
