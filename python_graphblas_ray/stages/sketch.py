"""Approximate distinct-count sketching (HyperLogLog) — grouped
``approx_distinct`` for training-data pipelines (e.g. distinct users per
event type over 100 TB of events without a distinct shuffle).

The sketch is the classic public HLL: hash each value to 64 bits, use
``p`` bits as the register index, count leading zeros of the rest; the
register keeps the max. Registers merge with elementwise max — exactly
Ray's partial/merge aggregate shape: per-batch partial registers per
key (one ``map_batches``), one small groupby over (key, register-blob)
rows, bias-corrected estimate in the finalize step. Standard error ≈
1.04/√(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(arr: np.ndarray) -> np.ndarray:
    """splitmix64 over int64/uint64 input values."""
    with np.errstate(over="ignore"):
        x = (arr.astype(np.uint64) +
             np.uint64(0x9E3779B97F4A7C15))
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_any(col: pa.Array) -> np.ndarray:
    """64-bit hashes for an Arrow column (ints fast path; strings via
    FNV-1a python loop — acceptable; values are usually ids)."""
    t = col.type
    if pa.types.is_integer(t):
        return _hash64(col.to_numpy(zero_copy_only=False))
    out = np.empty(len(col), dtype=np.uint64)
    for i, s in enumerate(col.to_pylist()):
        h = 0xCBF29CE484222325
        for b in str(s).encode("utf-8"):
            h ^= b
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Max leading-zero-count register array (size 2^p) for one group."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rank = leading zeros of `rest` + 1 (capped at 64 - p + 1)
    nbits = 64 - p
    rank = np.full(len(hashes), nbits + 1, dtype=np.int64)
    nz = rest != 0
    if nz.any():
        # leading zeros via float log2 is unsafe; use bit scan loop over
        # 64 shifts? vectorized: 63 - floor(log2(rest)) using the
        # exponent trick on uint64 -> float64 is exact for top bit
        top = np.zeros(len(hashes), dtype=np.int64)
        r = rest[nz]
        # binary search for highest set bit, vectorized in 6 steps
        hb = np.zeros(len(r), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            hb[mask] += shift
            r = np.where(mask, r >> np.uint64(shift), r)
        top[nz] = hb
        rank[nz] = 63 - top[nz] + 1
        rank = np.minimum(rank, nbits + 1)
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with small-range correction."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting
    return float(est)


def hll_distinct(ds, keys, value_col, p=12):
    """Grouped approximate distinct count: one partial-registers
    ``map_batches`` (rows = one register blob per key per batch), one
    groupby merging blobs with elementwise max, finalize to the
    estimate. Returns ``(keys..., approx_distinct:int64)``."""
    keys = list(keys)
    m = 1 << p

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({**{k: batch[k] for k in keys},
                             "__regs": pa.array([], pa.binary())})
        h = _hash_any(batch[value_col])
        kcols = [batch[k].to_pylist() for k in keys]
        combo = list(zip(*kcols)) if keys else [()] * batch.num_rows
        uniq = {}
        for i, c in enumerate(combo):
            uniq.setdefault(c, []).append(i)
        out_keys = {k: [] for k in keys}
        blobs = []
        for c, idxs in uniq.items():
            for kn, kv in zip(keys, c):
                out_keys[kn].append(kv)
            blobs.append(_registers(h[np.array(idxs)], p).tobytes())
        cols = {k: pa.array(v) for k, v in out_keys.items()}
        cols["__regs"] = pa.array(blobs, pa.binary())
        return pa.table(cols)

    part = ds.select_columns(keys + [value_col]).map_batches(
        partials, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.int8)
        for blob in group["__regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.int8))
        cols = {k: group[k].slice(0, 1) for k in keys}
        cols["approx_distinct"] = pa.array(
            [int(round(_estimate(regs)))], pa.int64())
        return pa.table(cols)

    return part.groupby(keys).map_groups(merge, batch_format="pyarrow")
