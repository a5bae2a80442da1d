"""PNG codec conformance (pipelines/png.py — stdlib zlib, no PIL).

Round-trips for all supported color types, all five scanline filters
against a naive per-pixel reference unfilter, malformed-input errors,
and the end-to-end decode→resize actor pipeline against a numpy oracle.
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from python_graphblas_ray.pipelines.png import (
    _SIG,
    _chunk,
    _unfilter,
    png_decode,
    png_encode,
)


def _naive_unfilter(raw, h, w, ch):
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.int64)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        f = rows[y, 0]
        line = rows[y, 1:].astype(np.int64)
        for x in range(stride):
            a = out[y, x - ch] if x >= ch else 0
            b = out[y - 1, x] if y > 0 else 0
            c = out[y - 1, x - ch] if (y > 0 and x >= ch) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else c)
            out[y, x] = (line[x] + pred) & 0xFF
    return out.reshape(h, w, ch).astype(np.uint8)


def test_roundtrip_rgb_grey_rgba():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 9, 3)).astype(np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)
    g = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    assert np.array_equal(png_decode(png_encode(g)),
                          np.repeat(g[:, :, None], 3, axis=2))
    a = rng.integers(0, 256, (6, 4, 4)).astype(np.uint8)
    assert np.array_equal(png_decode(png_encode(a)), a[:, :, :3])
    # 1x1 degenerate
    one = np.array([[[7, 8, 9]]], dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(one)), one)


def test_unfilter_all_filters_vs_naive():
    rng = np.random.default_rng(4)
    for h, w, ch in ((6, 5, 3), (4, 3, 1), (3, 4, 4)):
        for _ in range(10):
            filt = rng.integers(0, 5, h)
            raw = np.concatenate(
                [np.concatenate([[f], rng.integers(0, 256, w * ch)])
                 for f in filt]).astype(np.uint8)
            got = _unfilter(raw.copy(), h, w, ch)
            want = _naive_unfilter(raw, h, w, ch)
            assert np.array_equal(got, want), (h, w, ch, filt)


def test_decode_foreign_filtered_png():
    """A full PNG whose rows use every filter type (as a foreign
    encoder would emit) decodes exactly."""
    rng = np.random.default_rng(9)
    pix = rng.integers(0, 256, (8, 6, 3)).astype(np.uint8)
    h, w, ch = pix.shape
    stride = w * ch
    flat = pix.reshape(h, stride).astype(np.int64)
    rows = []
    for y, f in enumerate([0, 1, 2, 3, 4, 4, 3, 1]):
        line = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = flat[y, x - ch] if x >= ch else 0
            b = flat[y - 1, x] if y > 0 else 0
            c = flat[y - 1, x - ch] if (y > 0 and x >= ch) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else c)
            line[x] = (flat[y, x] - pred) & 0xFF
        rows.append(np.concatenate([[f], line]))
    raw = np.concatenate(rows).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert np.array_equal(png_decode(data), pix)


def test_decode_multi_idat():
    """IDAT may be split across chunks — one zlib stream."""
    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    data = png_encode(img)
    # split the single IDAT into two chunks
    i = data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", data[i:i + 4])
    body = data[i + 8:i + 8 + length]
    pre, post = data[:i], data[i + 12 + length:]
    half = length // 2
    rebuilt = (pre + _chunk(b"IDAT", body[:half])
               + _chunk(b"IDAT", body[half:]) + post)
    assert np.array_equal(png_decode(rebuilt), img)


def test_decode_errors():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + b"\x00" * 20)
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(png_encode(img))
    # flip interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12 = byte
    # 28 is the interlace field)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = _SIG + _chunk(b"IHDR", ihdr) + bytes(data[33:])
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(bad)
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad16 = _SIG + _chunk(b"IHDR", ihdr16) + bytes(data[33:])
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(bad16)


def test_decode_resize_pipeline_vs_numpy(ray_session):
    """End-to-end: PNG payloads → decode actor pool → NN resize →
    exact numpy oracle (the docs_image_resize driver-row shape)."""
    import ray

    from python_graphblas_ray.pipelines.multimodal import (
        decode_images, media_table, resize_images)

    H, W, OH, OW = 16, 12, 8, 8
    ids = np.arange(10, dtype=np.int64) * 3 + 1
    y = np.arange(H)[:, None, None]
    x = np.arange(W)[None, :, None]
    c = np.arange(3)[None, None, :]
    imgs = {int(d): ((int(d) * 7 + y * 131 + x * 17 + c * 29)
                     % 256).astype(np.uint8) for d in ids}
    t = media_table(ids, [png_encode(imgs[int(d)]) for d in ids])
    out = resize_images(
        decode_images(ray.data.from_arrow(t), batch_size=4),
        out_hw=(OH, OW))
    rows = np.minimum(((np.arange(OH) + 0.5) * H / OH).astype(int),
                      H - 1)
    cols = np.minimum(((np.arange(OW) + 0.5) * W / OW).astype(int),
                      W - 1)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        for mid, px in zip(b["media_id"].to_pylist(),
                           b["pixels"].to_pylist()):
            got[mid] = np.asarray(px, dtype=np.uint8)
    for d in ids:
        want = imgs[int(d)][rows][:, cols].ravel()
        assert np.array_equal(got[int(d)], want), d
