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


def _pack_pixel_rows(pix_list) -> tuple:
    """Pixel tensors → one contiguous uint8 buffer + int32 offsets,
    wrapped zero-copy with ``pa.ListArray.from_arrays`` — no per-pixel
    Python ints (the r4 ``tolist`` path was one Python object per
    pixel). Returns ``(ListArray, heights, widths)``."""
    n = len(pix_list)
    sizes = np.fromiter((p.size for p in pix_list), dtype=np.int64,
                        count=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    flat = (np.concatenate([p.reshape(-1) for p in pix_list])
            if n else np.empty(0, dtype=np.uint8))
    arr = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()),
        pa.array(flat, type=pa.uint8()))
    h = np.fromiter((p.shape[0] for p in pix_list), dtype=np.int32,
                    count=n)
    w = np.fromiter((p.shape[1] for p in pix_list), dtype=np.int32,
                    count=n)
    return arr, h, w


def _pixels_np(batch: pa.Table) -> tuple:
    """Zero-copy (values:uint8, offsets:int64) view of the ``pixels``
    list column."""
    col = batch["pixels"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = np.asarray(col.values)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return vals, offs


def _shape_groups(vals, offs, hcol, wcol):
    """Yield ``(h, w, row_indices, (k,h,w,3) uint8 tensor)`` per DISTINCT
    per-row shape. Grouping by (height, width) — not just pixel count —
    means a batch mixing e.g. 16x12 and 12x16 rows resizes each with the
    right geometry (ADVICE r4: row-0 shape silently misapplied). The
    uniform-and-contiguous fast path is a single zero-copy reshape."""
    n = len(hcol)
    keys = hcol.astype(np.int64) * (np.int64(1) << np.int64(32)) + \
        wcol.astype(np.int64)
    for key in np.unique(keys):
        idxs = np.nonzero(keys == key)[0]
        h = int(key >> 32)
        w = int(key & 0xFFFFFFFF)
        sz = h * w * 3
        if len(idxs) == n and bool((offs[1:] - offs[:-1] == sz).all()):
            grp = vals[offs[0]:offs[-1]].reshape(n, h, w, 3)
        else:
            gather = (offs[idxs][:, None]
                      + np.arange(sz, dtype=np.int64)[None, :]).reshape(-1)
            grp = vals[gather].reshape(len(idxs), h, w, 3)
        yield h, w, idxs, grp


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
        pixels, h, w = _pack_pixel_rows(pix)
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pixels,
            "height": pa.array(h, pa.int32()),
            "width": pa.array(w, pa.int32()),
        })


class ImageFeatures:
    """Feature extraction over decoded pixels: per-channel mean/std —
    vectorized numpy per (h, w) shape group (zero-copy reshape of the
    list-column buffer when the batch is uniform)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hcol = batch["height"].to_numpy(zero_copy_only=False)
        wcol = batch["width"].to_numpy(zero_copy_only=False)
        vals, offs = _pixels_np(batch)
        n = batch.num_rows
        mean = np.empty((n, 3), dtype=np.float64)
        std = np.empty((n, 3), dtype=np.float64)
        for _h, _w, idxs, grp in _shape_groups(vals, offs, hcol, wcol):
            g = grp.astype(np.float64)
            mean[idxs] = g.mean(axis=(1, 2))
            std[idxs] = g.std(axis=(1, 2))
        return pa.table({
            "media_id": batch["media_id"],
            "feat_mean": pa.array(mean.tolist(),
                                  type=pa.list_(pa.float64())),
            "feat_std": pa.array(std.tolist(), type=pa.list_(pa.float64())),
        })


class ImageResizer:
    """Resize decoded pixel tensors to ``out_hw`` — REAL math (not a
    codec stub): vectorized nearest-neighbor gather per (h, w) shape
    group (mixed-shape batches each get the right geometry; uniform
    batches reshape the list buffer zero-copy). Index grids are cached
    per input shape across batches on the actor."""

    def __init__(self, out_hw=(8, 8), in_hw=None):
        self.oh, self.ow = out_hw
        self._grids = {}
        if in_hw is not None:
            self._grid(*in_hw)

    def _grid(self, h, w):
        g = self._grids.get((h, w))
        if g is None:
            # pixel-center nearest neighbor: src = floor((i+0.5)*in/out)
            rows = np.minimum(
                ((np.arange(self.oh) + 0.5) * h / self.oh).astype(np.int64),
                h - 1)
            cols = np.minimum(
                ((np.arange(self.ow) + 0.5) * w / self.ow).astype(np.int64),
                w - 1)
            g = self._grids[(h, w)] = (rows, cols)
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        hcol = batch["height"].to_numpy(zero_copy_only=False)
        wcol = batch["width"].to_numpy(zero_copy_only=False)
        vals, offs = _pixels_np(batch)
        n = batch.num_rows
        per_row = self.oh * self.ow * 3
        out = np.empty((n, per_row), dtype=np.uint8)
        for h, w, idxs, grp in _shape_groups(vals, offs, hcol, wcol):
            rows, cols = self._grid(h, w)
            out[idxs] = grp[:, rows][:, :, cols].reshape(len(idxs), -1)
        pixels = pa.ListArray.from_arrays(
            pa.array((np.arange(n + 1, dtype=np.int64)
                      * per_row).astype(np.int32), type=pa.int32()),
            pa.array(out.reshape(-1), type=pa.uint8()))
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pixels,
            "height": pa.array(np.full(n, self.oh, dtype=np.int32),
                               pa.int32()),
            "width": pa.array(np.full(n, self.ow, dtype=np.int32),
                              pa.int32()),
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
