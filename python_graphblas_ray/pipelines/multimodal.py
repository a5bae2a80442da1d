"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages. IMAGE decode is REAL: the stdlib-zlib PNG codec in
``pipelines/png.py`` (mode ``PNG``, the default — no PIL needed, no
stub); PIL is used instead when present AND the payload is not PNG.
``DETERMINISTIC_FAKE`` remains for plumbing tests that want payloads
without real pixels. Video frame decode stays a clearly-marked stub
(ffmpeg genuinely absent from this container).

Schema convention for a media table:
    (media_id:int64, media:binary, media_type:string,
     meta:struct<width:int32, height:int32, duration_ms:int32>)

Batch-size note (scale): binary payloads dominate memory — callers size
``batch_size`` so batch_bytes × concurrency fits the worker heap (e.g.
~4 MB images → batch_size≈32 at 8 concurrent actors on a 16 GB worker).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

DETERMINISTIC_FAKE = "fake"
PNG = "png"
#: Back-compat alias: STRICT used to raise NotImplementedError without
#: PIL; the stdlib PNG codec made the real path unconditional.
STRICT = PNG


def media_table(media_ids, payloads, media_type="image") -> pa.Table:
    ids = np.asarray(media_ids, dtype=np.int64)
    meta = pa.array(
        [{"width": 4, "height": 4, "duration_ms": 0} for _ in ids],
        type=pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("duration_ms", pa.int32())]))
    return pa.table({
        "media_id": ids,
        "media": pa.array(list(payloads), type=pa.binary()),
        "media_type": pa.array([media_type] * len(ids), type=pa.string()),
        "meta": meta,
    })


def _fake_pixels(data: bytes, h=4, w=4) -> np.ndarray:
    """Deterministic stand-in decode: FNV-1a stream over the payload fills
    an (h, w, 3) uint8 block. Stable across processes."""
    acc = 0xCBF29CE484222325
    out = np.empty(h * w * 3, dtype=np.uint8)
    i = 0
    for b in data if data else b"\x00":
        acc ^= b
        acc = (acc * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    for j in range(h * w * 3):
        acc = (acc * 6364136223846793005 + 1442695040888963407) & (
            (1 << 64) - 1)
        out[i] = (acc >> 33) & 0xFF
        i += 1
    return out.reshape(h, w, 3)


class ImageDecoder:
    """Actor-pool stage: decode ``media`` bytes → pixel tensor flattened
    into a ``list<uint8>`` column (+ per-row shape columns).

    mode=PNG (default): the REAL stdlib-zlib PNG codec
    (:mod:`.png` — grey/RGB/RGBA, all five filters); PIL handles
    non-PNG payloads when installed, otherwise they raise ValueError.
    Decoded images keep their NATIVE size (resize is the separate
    ``ImageResizer`` stage); ``out_hw`` only applies to FAKE mode.
    mode=DETERMINISTIC_FAKE: the hash decode for plumbing tests.
    """

    def __init__(self, mode=PNG, out_hw=(4, 4)):
        self.mode = mode
        self.h, self.w = out_hw

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .png import _SIG, png_decode

        payloads = batch["media"].to_pylist()
        if self.mode == PNG:
            pix = []
            for p in payloads:
                if p[:8] == _SIG or not _HAVE_PIL:
                    pix.append(png_decode(p))
                else:  # pragma: no cover - PIL absent in this container
                    import io
                    pix.append(np.asarray(
                        Image.open(io.BytesIO(p)).convert("RGB"),
                        dtype=np.uint8))
        else:
            pix = [_fake_pixels(p, self.h, self.w) for p in payloads]
        flat = [p.ravel().tolist() for p in pix]
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pa.array(flat, type=pa.list_(pa.uint8())),
            "height": pa.array([p.shape[0] for p in pix], pa.int32()),
            "width": pa.array([p.shape[1] for p in pix], pa.int32()),
        })


class ImageFeatures:
    """Feature extraction over decoded pixels: per-channel mean/std —
    vectorized numpy over the reassembled (N, H, W, 3) tensor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["height"][0].as_py()
        w = batch["width"][0].as_py()
        pix = np.stack([np.asarray(p, dtype=np.float64).reshape(h, w, 3)
                        for p in batch["pixels"].to_pylist()])
        mean = pix.mean(axis=(1, 2))
        std = pix.std(axis=(1, 2))
        return pa.table({
            "media_id": batch["media_id"],
            "feat_mean": pa.array(mean.tolist(),
                                  type=pa.list_(pa.float64())),
            "feat_std": pa.array(std.tolist(), type=pa.list_(pa.float64())),
        })


class ImageResizer:
    """Resize decoded pixel tensors to ``out_hw`` — REAL math (not a
    codec stub): vectorized nearest-neighbor gather on the whole batch
    tensor at once. Index grids are built once per actor in
    ``__init__`` for the common fixed-input-size path and rebuilt only
    when a batch's (h, w) differs."""

    def __init__(self, out_hw=(8, 8), in_hw=None):
        self.oh, self.ow = out_hw
        self._grid_for = None
        self._rows = self._cols = None
        if in_hw is not None:
            self._build(*in_hw)

    def _build(self, h, w):
        # pixel-center nearest neighbor: src = floor((i + 0.5) * in/out)
        self._rows = np.minimum(
            ((np.arange(self.oh) + 0.5) * h / self.oh).astype(np.int64),
            h - 1)
        self._cols = np.minimum(
            ((np.arange(self.ow) + 0.5) * w / self.ow).astype(np.int64),
            w - 1)
        self._grid_for = (h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["height"][0].as_py()
        w = batch["width"][0].as_py()
        if self._grid_for != (h, w):
            self._build(h, w)
        pix = np.stack([np.asarray(p, dtype=np.uint8).reshape(h, w, 3)
                        for p in batch["pixels"].to_pylist()])
        out = pix[:, self._rows][:, :, self._cols]  # (N, oh, ow, 3)
        flat = out.reshape(len(pix), -1).tolist()
        n = len(flat)
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pa.array(flat, type=pa.list_(pa.uint8())),
            "height": pa.array([self.oh] * n, pa.int32()),
            "width": pa.array([self.ow] * n, pa.int32()),
        })


class FrameSampler:
    """Video frame sampling stub: treats the payload as a concatenation of
    fixed-size fake frames and emits every ``stride``-th frame id — real
    ffmpeg decode is NotImplemented in this container (STRICT mode)."""

    def __init__(self, mode=DETERMINISTIC_FAKE, frame_bytes=64, stride=2):
        if mode != DETERMINISTIC_FAKE:
            raise NotImplementedError(
                "video decode requires ffmpeg, not available here")
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        payloads = batch["media"].to_pylist()
        out_id, out_frame = [], []
        for mid, p in zip(ids, payloads):
            nframes = max(1, len(p) // self.frame_bytes)
            for f in range(0, nframes, self.stride):
                out_id.append(mid)
                out_frame.append(f)
        return pa.table({"media_id": np.array(out_id, dtype=np.int64),
                         "frame_idx": np.array(out_frame, dtype=np.int64)})


def _bound(cls, **kw):
    """Bake constructor kwargs into a subclass so the actor pool needs
    NO fn_constructor_kwargs — Ray puts those in the object store and
    logs an actor-restart hazard (ray#53727) on every pool; baked-in
    kwargs ride the serialized class instead."""
    class _B(cls):
        def __init__(self):
            super().__init__(**kw)

    _B.__name__ = cls.__name__
    _B.__qualname__ = cls.__qualname__
    return _B


def decode_images(media_ds, concurrency=2, batch_size=32,
                  mode=PNG):
    """Actor pool: small batches (binary payloads), setup once per actor."""
    return media_ds.map_batches(
        _bound(ImageDecoder, mode=mode),
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=batch_size)


def image_features(decoded_ds, concurrency=2, batch_size=64):
    return decoded_ds.map_batches(ImageFeatures, batch_format="pyarrow",
                                  concurrency=(1, concurrency),
                                  batch_size=batch_size)


def resize_images(decoded_ds, out_hw=(8, 8), concurrency=2,
                  batch_size=64):
    return decoded_ds.map_batches(
        _bound(ImageResizer, out_hw=out_hw),
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=batch_size)


def sample_frames(media_ds, concurrency=2, batch_size=16, stride=2):
    return media_ds.map_batches(
        _bound(FrameSampler, stride=stride),
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=batch_size)
