"""Minimal REAL WAV (RIFF PCM) codec + audio feature stages — stdlib
only, no torchaudio/ffmpeg.

The storage subset a data pipeline meets for raw audio payloads:
PCM 16-bit signed and 8-bit unsigned, mono or interleaved multi-channel,
standard RIFF/WAVE ``fmt ``+``data`` chunk layout (extra chunks are
skipped). Encode writes canonical 16-bit PCM — byte-deterministic.

Feature extraction is vectorized numpy over the whole batch: RMS
energy, zero-crossing rate, duration, and an FFT spectral centroid —
the actor-pool ``map_batches`` stages the multimodal brief asks for,
with REAL math end-to-end (the video frame decoder remains the only
codec stub in the package; ffmpeg genuinely isn't in this container).

Clean-room implementation of the public RIFF/WAVE layout (multimedia
programming interface spec, 1991); no reference-repo counterpart —
this is new surface the brief's multimodal requirement adds.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16/float array → 16-bit PCM WAV bytes.
    Floats are clipped from [-1, 1]; output is byte-deterministic."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if x.dtype != np.int16:
        x = np.clip(np.asarray(x, dtype=np.float64), -1.0, 1.0)
        x = np.round(x * 32767.0).astype(np.int16)
    data = x.reshape(-1).tobytes()  # interleaved frames
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    return (b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def wav_decode(data: bytes):
    """WAV bytes → ``(samples float64 (n, channels) in [-1, 1], rate)``.
    PCM 16-bit signed / 8-bit unsigned; non-audio chunks skipped."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(data)
    fmt = None
    raw = None
    while pos + 8 <= n:
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise ValueError(
                    f"WAV: compression format {audio_fmt} unsupported "
                    "(PCM only)")
            if bits not in (8, 16):
                raise ValueError(f"WAV: {bits}-bit PCM unsupported")
            fmt = (ch, rate, bits)
        elif tag == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV: missing fmt/data chunk")
    ch, rate, bits = fmt
    if bits == 16:
        x = np.frombuffer(raw[:len(raw) // (2 * ch) * 2 * ch],
                          dtype="<i2").astype(np.float64) / 32767.0
    else:
        # /128 keeps unsigned 8-bit PCM inside the documented [-1, 1]
        # (sample 0 → -1.0; /127 would give -1.0079 and overflow int16
        # on a round(x*32767) re-quantize)
        x = (np.frombuffer(raw[:len(raw) // ch * ch], dtype=np.uint8)
             .astype(np.float64) - 128.0) / 128.0
    return x.reshape(-1, ch), rate


class AudioDecoder:
    """Actor-pool stage: WAV ``media`` bytes → per-row sample stats +
    the mono-mixed sample column (``list<double>``). Setup-free but
    kept as a callable class for the house actor-stage shape (a real
    model-based featurizer slots into ``__init__``)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, nsamp, mono = [], [], []
        for p in batch["media"].to_pylist():
            x, rate = wav_decode(p)
            m = x.mean(axis=1)
            rates.append(rate)
            nsamp.append(len(m))
            mono.append(m)
        return pa.table({
            "media_id": batch["media_id"],
            "samples": pa.array([m.tolist() for m in mono],
                                type=pa.list_(pa.float64())),
            "rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(nsamp, pa.int64()),
        })


class AudioFeatures:
    """Vectorized features over decoded mono samples: RMS energy,
    zero-crossing count, duration, FFT spectral centroid (Hz)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"]
        rates = batch["rate"].to_numpy(zero_copy_only=False)
        rms, zc, dur, cent = [], [], [], []
        for m, rate in zip(batch["samples"].to_pylist(), rates):
            x = np.asarray(m, dtype=np.float64)
            n = max(len(x), 1)
            rms.append(float(np.sqrt((x * x).sum() / n)))
            zc.append(int((np.signbit(x[1:]) != np.signbit(x[:-1]))
                          .sum()) if len(x) > 1 else 0)
            dur.append(n / float(rate))
            if len(x):
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), d=1.0 / float(rate))
                tot = spec.sum()
                cent.append(float((spec * freqs).sum() / tot)
                            if tot > 0 else 0.0)
            else:
                cent.append(0.0)
        return pa.table({
            "media_id": ids,
            "rms": pa.array(rms, pa.float64()),
            "zero_crossings": pa.array(zc, pa.int64()),
            "duration_s": pa.array(dur, pa.float64()),
            "spectral_centroid_hz": pa.array(cent, pa.float64()),
        })


def decode_audio(media_ds, concurrency=2, batch_size=32):
    """Actor pool over binary WAV payloads (batch size small — binary
    payloads dominate memory, the multimodal sizing note)."""
    return media_ds.map_batches(
        AudioDecoder, batch_format="pyarrow",
        concurrency=(1, concurrency), batch_size=batch_size)


def audio_features(decoded_ds, concurrency=2, batch_size=64):
    return decoded_ds.map_batches(
        AudioFeatures, batch_format="pyarrow",
        concurrency=(1, concurrency), batch_size=batch_size)
