"""Audio multimodal leg: wav codec kernels + Spark operators."""

import numpy as np
import pytest

from gfp_gdal_spark.kernels import wavcodec as W
from gfp_gdal_spark.operators.audio import audio_fingerprint, audio_stats, resample_audio
from gfp_gdal_spark.sources import datagen


@pytest.fixture(scope="module")
def clips(spark):
    return datagen.audio_table(spark, 60).cache()


def test_wav_roundtrip_bitexact():
    rng = np.random.default_rng(0)
    for ch in (1, 2):
        s = rng.integers(-32768, 32767, size=(5000, ch), dtype=np.int16)
        blob = W.encode_wav(s, 16000)
        s2, r = W.decode_wav(blob)
        assert r == 16000 and np.array_equal(s, s2)


def test_wav_decode_foreign_chunk_layout():
    """External wavs may carry extra chunks before data — the chunk
    walker must skip them (and honor odd-length word alignment)."""
    import struct

    s = np.arange(-100, 100, dtype=np.int16)[:, None]
    blob = W.encode_wav(s, 8000)
    fmt_chunk = blob[12:36]  # 'fmt ' + len + 16 bytes
    data_chunk = blob[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len + pad
    body = b"WAVE" + fmt_chunk + extra + data_chunk
    foreign = b"RIFF" + struct.pack("<I", len(body)) + body
    s2, r = W.decode_wav(foreign)
    assert r == 8000 and np.array_equal(s, s2)


def test_encode_group_bitwise_matches_per_clip():
    rng = np.random.default_rng(1)
    s = rng.integers(-1000, 1000, size=(7, 300, 2), dtype=np.int16)
    grp = W.encode_wav_group(s, 44100)
    for i in range(7):
        assert grp[i] == W.encode_wav(s[i], 44100)
    back = W.decode_wav_group(grp, 300, 2)
    assert np.array_equal(back, s)


def test_audio_stats_matches_numpy(spark, clips):
    rows = {r["audio_id"]: r for r in audio_stats(clips).collect()}
    pdf = datagen.audio_pandas(60)
    for _, src in pdf.iloc[:10].iterrows():
        s, rate = W.decode_wav(bytes(src["bytes"]))
        r = rows[src["audio_id"]]
        assert r["peak"] == int(np.abs(s).max())
        assert r["rms"] == pytest.approx(
            float(np.sqrt((s.astype(np.float64) ** 2).mean())), rel=1e-12
        )
        assert r["roundtrip_ok"]
        assert r["duration_s"] == s.shape[0] / rate


def test_resample_preserves_duration_and_decodes(spark, clips):
    out = resample_audio(clips, out_rate=4000).collect()
    for r in out[:8]:
        s, rate = W.decode_wav(bytes(r["bytes"]))
        assert rate == 4000
        assert s.shape[0] == r["n_samples"]
        # half the rate -> half the samples (inputs are 8 kHz)
        assert abs(s.shape[0] * 2 - (4000 + (int(r["audio_id"][3:]) % 5) * 2000)) <= 2


def test_fingerprint_deterministic_and_gain_invariant(spark, clips):
    f1 = {r["audio_id"]: r["fingerprint"] for r in audio_fingerprint(clips).collect()}
    f2 = {r["audio_id"]: r["fingerprint"] for r in audio_fingerprint(clips).collect()}
    assert f1 == f2
    # gain invariance: halving amplitude (never clips — clipping would
    # genuinely add harmonics) must not change the contour bits
    import pandas as pd

    pdf = datagen.audio_pandas(6)
    louder = []
    for _, row in pdf.iterrows():
        s, rate = W.decode_wav(bytes(row["bytes"]))
        s2 = (s.astype(np.int32) // 2).astype(np.int16)
        louder.append(
            {
                "audio_id": row["audio_id"],
                "bytes": W.encode_wav(s2, rate),
                "n_samples": row["n_samples"],
                "sample_rate": row["sample_rate"],
                "n_channels": row["n_channels"],
                "caption": row["caption"],
            }
        )
    ldf = spark.createDataFrame(pd.DataFrame(louder), schema=datagen.AUDIO_SCHEMA)
    fl = {r["audio_id"]: r["fingerprint"] for r in audio_fingerprint(ldf).collect()}
    for k in fl:
        assert fl[k] == f1[k], "fingerprint not gain-invariant"


def test_mixed_rate_group_resamples_each_clip_correctly(spark):
    """Two clips with identical (n_samples, n_channels) but DIFFERENT
    sample rates must not share a decode group: resampling to 8 kHz
    keeps the 8 kHz clip as-is and halves the 16 kHz clip (ADVICE r4)."""
    import pandas as pd

    s = np.arange(-2000, 2000, dtype=np.int16)[:, None]  # 4000 samples
    rows = [
        {"audio_id": "slow", "bytes": W.encode_wav(s, 8000), "n_samples": 4000,
         "sample_rate": 8000, "n_channels": 1, "caption": ""},
        {"audio_id": "fast", "bytes": W.encode_wav(s, 16000), "n_samples": 4000,
         "sample_rate": 16000, "n_channels": 1, "caption": ""},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=datagen.AUDIO_SCHEMA)
    out = {r["audio_id"]: r for r in resample_audio(df, out_rate=8000).collect()}
    assert out["slow"]["n_samples"] == 4000
    assert out["fast"]["n_samples"] == 2000
    slow, _ = W.decode_wav(bytes(out["slow"]["bytes"]))
    fast, _ = W.decode_wav(bytes(out["fast"]["bytes"]))
    assert np.array_equal(slow, s)  # identity resample is exact
    assert np.array_equal(fast[:, 0], s[::2, 0])  # integer-stride decimation


def test_fingerprint_short_and_degenerate_clips(spark):
    """Clips shorter than the frame (reshape crash) and clips so short
    the band edges collapse (k=0 division) must both return a row, not
    raise (ADVICE r4)."""
    import pandas as pd

    rows = []
    for name, n in (("short", 700), ("tiny", 3), ("one", 1)):
        s = np.round(
            1000 * np.sin(2 * np.pi * np.arange(n) / 8.0)
        ).astype(np.int16)[:, None]
        rows.append(
            {"audio_id": name, "bytes": W.encode_wav(s, 8000), "n_samples": n,
             "sample_rate": 8000, "n_channels": 1, "caption": ""}
        )
    df = spark.createDataFrame(pd.DataFrame(rows), schema=datagen.AUDIO_SCHEMA)
    fps = {r["audio_id"]: r["fingerprint"] for r in audio_fingerprint(df).collect()}
    assert set(fps) == {"short", "tiny", "one"}
    assert fps["short"] != 0  # 700 samples still yields a real contour
    assert fps["tiny"] == 0 and fps["one"] == 0  # degenerate -> sentinel 0


def test_fingerprint_class_literals_match_operator(spark):
    """The AUDIO_FP_CLASSES literals baked into the driver oracle must
    equal what audio_fingerprint actually computes for the band-peak
    construction — recomputed here so drift fails CI, not the driver."""
    import pandas as pd

    import __spark_entry__ as E

    rows = []
    for key in range(15):  # covers every (key%5, key%3) class
        n = 4096
        amp = 0.4 + (key % 3) * 0.2
        period = 2 ** (2 + key % 5)
        wave = np.round(
            32767.0 * amp * np.sin(2.0 * np.pi * np.arange(n) / period)
        ).astype(np.int16)[:, None]
        rows.append(
            {"audio_id": str(key), "bytes": W.encode_wav(wave, 8000),
             "n_samples": n, "sample_rate": 8000, "n_channels": 1, "caption": ""}
        )
    df = spark.createDataFrame(pd.DataFrame(rows), schema=datagen.AUDIO_SCHEMA)
    got = {int(r["audio_id"]): r["fingerprint"] for r in audio_fingerprint(df).collect()}
    for key, fp in got.items():
        assert fp == E.AUDIO_FP_CLASSES[key % 5], f"key {key}"
