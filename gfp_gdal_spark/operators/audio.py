"""Audio operators over opaque WAV binary columns + typed metadata —
the audio leg of the multimodal boundary (images: operators.multimodal;
video: injectable-stub plumbing; audio is REAL end-to-end because PCM
WAV needs no external codec — kernels/wavcodec.py).

Scale shape mirrors the image pipeline's round-3/4 lessons: rows group
by uniform (n_samples, n_channels) inside each Arrow batch and decode
whole-batch (one frombuffer+reshape per group for engine-encoded
blobs); every per-sample computation is a vectorized numpy pass over
the group tensor — no per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gfp_gdal_spark.kernels import wavcodec as W

__all__ = [
    "audio_stats",
    "resample_audio",
    "audio_fingerprint",
]

_STATS_SCHEMA = (
    "audio_id string, n_samples int, sample_rate int, n_channels int, "
    "duration_s double, peak int, rms double, zero_crossings long, "
    "roundtrip_ok boolean"
)


def _grouped(pdf: pd.DataFrame):
    """Yield (n_samples, ch, rate, idx, tensor) per uniform group.

    sample_rate is part of the group key: every consumer below applies
    ONE rate to the whole group (resample's source rate, stats'
    duration), so two clips with equal (n_samples, n_channels) but
    different rates must never share a group — 1s@8kHz and 2s@4kHz
    would otherwise silently resample with the wrong source rate."""
    for (ns, ch, rate), idx in pdf.groupby(
        ["n_samples", "n_channels", "sample_rate"], sort=False
    ).indices.items():
        blobs = [bytes(b) for b in pdf["bytes"].iloc[idx]]
        yield int(ns), int(ch), int(rate), idx, W.decode_wav_group(
            blobs, int(ns), int(ch)
        )


def audio_stats(audios: DataFrame) -> DataFrame:
    """Decode every clip, emit duration / peak / RMS / zero-crossing
    stats and the encode-decode round-trip invariant flag (PCM is
    lossless, so roundtrip_ok must be True for engine-encoded rows —
    the audio twin of the image PSNR>=40 gate)."""

    def op(batches):
        for pdf in batches:
            n = len(pdf)
            peak = np.zeros(n, dtype=np.int32)
            rms = np.zeros(n)
            zc = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            for ns, ch, rate, idx, s in _grouped(pdf):
                x = s.astype(np.float64)
                peak[idx] = np.abs(s).max(axis=(1, 2))
                rms[idx] = np.sqrt((x**2).mean(axis=(1, 2)))
                # sign changes on channel 0 (strict zero samples break a run)
                c0 = np.sign(x[:, :, 0])
                zc[idx] = (np.diff(c0, axis=1) != 0).sum(axis=1)
                rt = W.decode_wav_group(W.encode_wav_group(s, rate), ns, ch)
                ok[idx] = (rt == s).all(axis=(1, 2))
            out = pdf[
                ["audio_id", "n_samples", "sample_rate", "n_channels"]
            ].copy()
            out["duration_s"] = pdf["n_samples"] / pdf["sample_rate"]
            out["peak"] = peak
            out["rms"] = rms
            out["zero_crossings"] = zc
            out["roundtrip_ok"] = ok
            yield out

    return audios.mapInPandas(op, _STATS_SCHEMA)


def resample_audio(audios: DataFrame, out_rate: int) -> DataFrame:
    """Linear-interpolation resample to ``out_rate`` + re-encode
    (nearest-sample at the grid ends). Whole-group vectorized: one
    interpolation index array per uniform group."""

    def op(batches):
        for pdf in batches:
            blobs: list[bytes | None] = [None] * len(pdf)
            nsamp = np.zeros(len(pdf), dtype=np.int32)
            for ns, ch, rate, idx, s in _grouped(pdf):
                m = max(int(round(ns * out_rate / rate)), 1)
                pos = np.minimum(np.arange(m) * rate / out_rate, ns - 1)
                i0 = np.floor(pos).astype(np.int64)
                i1 = np.minimum(i0 + 1, ns - 1)
                frac = (pos - i0)[None, :, None]
                x = s.astype(np.float64)
                res = np.round(
                    x[:, i0] * (1.0 - frac) + x[:, i1] * frac
                ).astype(np.int16)
                enc = W.encode_wav_group(res, out_rate)
                for j, i in enumerate(idx):
                    blobs[i] = enc[j]
                nsamp[idx] = m
            out = pdf.copy()
            out["bytes"] = blobs
            out["n_samples"] = nsamp
            out["sample_rate"] = np.int32(out_rate)
            yield out

    return audios.mapInPandas(op, audios.schema)


def audio_fingerprint(audios: DataFrame, n_bands: int = 16, frame: int = 1024) -> DataFrame:
    """64-bit spectral fingerprint per clip: frame the signal (channel
    mean), rFFT magnitude per frame (one batched FFT per group), mean
    energy in ``n_bands`` log-spaced bands, one sign bit per band
    comparing each band to the next (band-energy CONTOUR — gain-robust,
    noise-gated at 1e-4 of the clip's peak band so near-silent ties
    don't flip under quantization noise), packed little-endian and
    repeated to 64 bits. Deterministic; the audio analog of the image
    ahash."""

    def op(batches):
        for pdf in batches:
            fps = np.zeros(len(pdf), dtype=np.int64)
            for ns, ch, _rate, idx, s in _grouped(pdf):
                # clips shorter than `frame` analyze as one whole-clip
                # frame (zero-length reshape would raise otherwise)
                fr = min(frame, ns)
                x = s.astype(np.float64).mean(axis=2)  # channel mean
                nf = max(ns // fr, 1)
                xf = x[:, : nf * fr].reshape(x.shape[0], nf, fr)
                mag = np.abs(np.fft.rfft(xf, axis=2))  # (g, nf, fr//2+1)
                if mag.shape[2] < 3:
                    # <2 usable bins -> no contour; fingerprint 0
                    fps[idx] = 0
                    continue
                edges = np.unique(
                    np.geomspace(1, mag.shape[2] - 1, n_bands + 1).astype(int)
                )
                bands = np.stack(
                    [
                        mag[:, :, a:b].mean(axis=2)
                        for a, b in zip(edges[:-1], edges[1:])
                    ],
                    axis=2,
                ).mean(axis=1)  # (g, n_bands_eff) clip-mean band energy
                gate = 1e-4 * bands.max(axis=1, keepdims=True)
                bits = (bands[:, :-1] > bands[:, 1:] + gate).astype(np.uint64)
                k = bits.shape[1]
                if k == 0:  # band edges collapsed to a single band
                    fps[idx] = 0
                    continue
                reps = int(np.ceil(64 / k))
                full = np.tile(bits, (1, reps))[:, :64]
                fps[idx] = (
                    (full << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
                ).view(np.int64)
            yield pdf[["audio_id"]].assign(fingerprint=fps)

    return audios.mapInPandas(op, "audio_id string, fingerprint long")
