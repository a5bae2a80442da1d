"""WAV codec + audio feature stages (pipelines/audio.py — stdlib
struct/numpy, no torchaudio)."""

import struct

import numpy as np
import pytest

from python_graphblas_ray.pipelines.audio import (
    AudioDecoder,
    AudioFeatures,
    audio_features,
    decode_audio,
    wav_decode,
    wav_encode,
)
from python_graphblas_ray.pipelines.multimodal import media_table


def test_roundtrip_int16_mono():
    rng = np.random.default_rng(0)
    v = rng.integers(-32767, 32768, 500).astype(np.int16)
    x, rate = wav_decode(wav_encode(v, rate=8000))
    assert rate == 8000 and x.shape == (500, 1)
    assert np.array_equal(np.round(x[:, 0] * 32767).astype(np.int16), v)


def test_roundtrip_float_stereo():
    rng = np.random.default_rng(1)
    f = rng.uniform(-1, 1, (300, 2))
    x, rate = wav_decode(wav_encode(f, rate=44100))
    assert rate == 44100 and x.shape == (300, 2)
    assert np.allclose(x, np.round(np.clip(f, -1, 1) * 32767) / 32767.0,
                       atol=1e-9)


def test_decode_8bit_and_chunk_skip():
    # hand-build an 8-bit PCM file with an extra chunk before data
    v8 = np.array([0, 64, 128, 192, 255], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 1000, 1000, 1, 8)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    data = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + junk
            + b"data" + struct.pack("<I", len(v8)) + v8.tobytes())
    x, rate = wav_decode(data)
    assert rate == 1000
    assert np.allclose(x[:, 0], (v8.astype(np.float64) - 128) / 128.0)
    # decoded 8-bit PCM stays inside the documented [-1, 1] range
    # (sample 0 maps to exactly -1.0, not -1.0079)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_decode_errors():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"OggS" + b"\x00" * 40)
    fmt = struct.pack("<HHIIHH", 85, 1, 1000, 1000, 1, 16)  # mp3 tag
    bad = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="compression"):
        wav_decode(bad)


def test_actor_pipeline_features(ray_session):
    """decode_audio -> audio_features actor stages vs numpy oracle:
    a pure 1 kHz-ish tone's centroid lands near its frequency."""
    import ray

    rate, n = 16000, 2048
    t = np.arange(n) / rate
    ids = np.arange(4, dtype=np.int64)
    tones = {int(i): np.sin(2 * np.pi * (500 + 250 * int(i)) * t)
             for i in ids}
    tab = media_table(ids, [wav_encode(tones[int(i)], rate=rate)
                            for i in ids], media_type="audio")
    out = audio_features(decode_audio(
        ray.data.from_arrow(tab), batch_size=2))
    rows = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        for mid, r, zc, dur, ce in zip(
                b["media_id"].to_pylist(), b["rms"].to_pylist(),
                b["zero_crossings"].to_pylist(),
                b["duration_s"].to_pylist(),
                b["spectral_centroid_hz"].to_pylist()):
            rows[mid] = (r, zc, dur, ce)
    for i in ids:
        f = 500 + 250 * int(i)
        r, zc, dur, ce = rows[int(i)]
        assert abs(r - 1 / np.sqrt(2)) < 0.01       # sine RMS
        assert abs(dur - n / rate) < 1e-9
        assert abs(zc - 2 * f * n / rate) <= 4      # 2f crossings/sec
        assert abs(ce - f) < 60                      # centroid ≈ tone


def test_decoder_batch_table_shape():
    v = np.array([100, -100, 200], dtype=np.int16)
    tab = media_table([7], [wav_encode(v, rate=4000)],
                      media_type="audio")
    out = AudioDecoder()(tab)
    assert out["n_samples"].to_pylist() == [3]
    assert out["rate"].to_pylist() == [4000]
    feats = AudioFeatures()(out)
    assert feats["media_id"].to_pylist() == [7]
