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
    """64-bit hashes for an Arrow column (ints fast path; strings via the
    vectorized per-byte-position FNV-1a from the dedup stage — one numpy
    pass per byte position over the DISTINCT strings). Nulls hash as 0
    (ints) / "" (strings) — to_numpy would otherwise produce NaN codes
    that crash the downstream fancy-indexing."""
    import pyarrow.compute as pc
    t = col.type
    if pa.types.is_integer(t):
        if col.null_count:
            col = pc.fill_null(col, 0)
        return _hash64(col.to_numpy(zero_copy_only=False))
    from ..pipelines.dedup import _fnv1a_str_vec
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        col = col.cast(pa.string()) if not isinstance(col, pa.ChunkedArray) \
            else pa.chunked_array([c.cast(pa.string()) for c in col.chunks])
    if col.null_count:
        col = pc.fill_null(col, "")
    return _fnv1a_str_vec(col)


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


def _rank_of(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, leading-zero rank) per hash — the vectorized core
    of ``_registers`` shared by the grouped batch kernel."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    nbits = 64 - p
    rank = np.full(len(hashes), nbits + 1, dtype=np.int64)
    nz = rest != 0
    if nz.any():
        r = rest[nz]
        hb = np.zeros(len(r), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            hb[mask] += shift
            r = np.where(mask, r >> np.uint64(shift), r)
        rank[nz] = np.minimum(63 - hb + 1, nbits + 1)
    return idx, rank


def _estimate_rows(regs2d: np.ndarray) -> np.ndarray:
    """Bias-corrected HLL estimates for a (groups × m) register matrix —
    one vectorized pass across all groups (linear-counting correction
    applied row-wise where it triggers)."""
    m = regs2d.shape[1]
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs2d.astype(np.float64)), axis=1)
    zeros = (regs2d == 0).sum(axis=1)
    lin = zeros > 0
    small = (est <= 2.5 * m) & lin
    with np.errstate(divide="ignore"):
        est[small] = m * np.log(m / zeros[small])
    return est


def hll_distinct(ds, keys, value_col, p=12,
                 driver_merge_threshold=4_000_000):
    """Grouped approximate distinct count: one partial-registers
    ``map_batches`` (rows = one register blob per key per batch, built by
    a single ``np.maximum.at`` scatter into a groups×m matrix — no
    per-group Python), then a merge of the partial blobs: lexsorted
    driver pass with ``np.maximum.reduceat`` when the partial stream is
    small (bounded by #keys × #blocks), distributed ``map_groups``
    beyond that. Returns ``(keys..., approx_distinct:int64)``."""
    keys = list(keys)
    m = 1 << p

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({**{k: batch[k] for k in keys},
                             "__regs": pa.array([], pa.binary())})
        h = _hash_any(batch[value_col])
        ridx, rank = _rank_of(h, p)
        # group rows by key combo via Arrow dictionary-encode (struct for
        # multi-key) — integer codes, no Python tuples
        if keys:
            if len(keys) == 1:
                enc = batch[keys[0]].combine_chunks().dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(
                    np.int64)
                uniq_keys = {keys[0]: enc.dictionary}
            else:
                sa = pa.StructArray.from_arrays(
                    [batch[k].combine_chunks() for k in keys], names=keys)
                enc = sa.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(
                    np.int64)
                uniq_keys = {k: enc.dictionary.field(k) for k in keys}
            g = int(codes.max()) + 1
        else:
            codes = np.zeros(batch.num_rows, dtype=np.int64)
            uniq_keys = {}
            g = 1
        regs2d = np.zeros((g, m), dtype=np.int8)
        np.maximum.at(regs2d, (codes, ridx), rank.astype(np.int8))
        cols = {k: v for k, v in uniq_keys.items()}
        cols["__regs"] = pa.array([row.tobytes() for row in regs2d],
                                  pa.binary())
        return pa.table(cols)

    part = ds.select_columns(keys + [value_col]).map_batches(
        partials, batch_format="pyarrow")

    import ray.data

    mat = part.materialize()
    if 0 < mat.count() <= driver_merge_threshold:
        t = pa.concat_tables(
            [b for b in mat.iter_batches(batch_format="pyarrow",
                                         batch_size=1 << 20) if b.num_rows],
            promote_options="permissive")
        n = t.num_rows
        regs = np.frombuffer(
            b"".join(t["__regs"].to_pylist()), dtype=np.int8
        ).reshape(n, m)
        karrs = [t[k].to_numpy(zero_copy_only=False) for k in keys]
        if not karrs:
            order = np.arange(n)
            starts = np.array([0])
        else:
            order = (np.argsort(karrs[0], kind="stable") if len(karrs) == 1
                     else np.lexsort(tuple(reversed(karrs))))
            sk = [k[order] for k in karrs]
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for k in sk:
                change[1:] |= k[1:] != k[:-1]
            starts = np.flatnonzero(change)
        merged = np.maximum.reduceat(regs[order], starts, axis=0)
        est = np.rint(_estimate_rows(merged)).astype(np.int64)
        cols = ({k: sk[i][starts] for i, k in enumerate(keys)}
                if keys else {})
        cols["approx_distinct"] = est
        return ray.data.from_arrow(pa.table(cols))

    def merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.int8)
        for blob in group["__regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.int8))
        cols = {k: group[k].slice(0, 1) for k in keys}
        cols["approx_distinct"] = pa.array(
            [int(round(_estimate(regs)))], pa.int64())
        return pa.table(cols)

    return mat.groupby(keys).map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Misra-Gries / SpaceSaving heavy hitters
# ---------------------------------------------------------------------------

def _mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries compression of an exact (keys, counts) partial down to
    ≤ k entries: subtract the (|keys|-k)-th largest count from everything
    and drop non-positive rows (the classic batched decrement step —
    vectorized, equivalent to len(keys)-k decrement rounds)."""
    if len(keys) <= k:
        return keys, counts
    # threshold = the count that must be fully decremented away so that
    # at most k survive
    thr = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    new = counts - thr
    keep = new > 0
    return keys[keep], new[keep]


class _MGPartial:
    """Per-batch combiner: exact batch counts compressed to ≤ k rows.
    Merging MG summaries (sum counts, compress) keeps the standard
    guarantee: est(x) ≤ true(x) ≤ est(x) + N/k over the whole stream."""

    def __init__(self, col, k):
        self.col = col
        self.k = int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        enc = arr.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx[idx >= 0],
                          minlength=len(enc.dictionary)).astype(np.int64)
        keys = enc.dictionary
        kk, cc = _mg_compress(np.arange(len(keys)), cnt, self.k)
        return pa.table({self.col: keys.take(pa.array(kk)),
                         "mg_count": cc})


def heavy_hitters(ds, col, k=64, concurrency=4):
    """Misra-Gries / SpaceSaving top-k heavy hitters over ``col``:
    per-batch exact counts compressed to ≤ k rows (vectorized batched
    decrement), partials merged by a (k × blocks)-bounded grouped sum +
    one final driver compression — the corpus itself is never shuffled.

    Guarantee: every key with true frequency > N/k survives, and each
    reported count is within N/k below its true count. When ``k`` ≥ the
    column's distinct-count the result is EXACT (the compression never
    fires) — which is how the SQL oracle checks it at test scale.

    Returns a pyarrow Table ``(col, mg_count)`` sorted by count desc,
    at most k rows."""
    from .reduce import grouped_agg

    partials = ds.map_batches(
        _MGPartial, fn_constructor_kwargs=dict(col=col, k=k),
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=8192)
    merged = grouped_agg(partials, [col], [("mg_count", "sum", "mg_count")])

    def compress_block(batch: pa.Table) -> pa.Table:
        # distinct survivors can still number k × #input-blocks; one more
        # MG pass per merged block bounds what reaches the driver at
        # k × #merged-blocks (the final driver compress stays exact in
        # the same N/k-mergeability sense)
        cnt = batch["mg_count"].to_numpy(zero_copy_only=False)
        kk, cc = _mg_compress(np.arange(len(batch)), cnt, k)
        out = batch.take(pa.array(kk))
        return out.set_column(out.schema.get_field_index("mg_count"),
                              "mg_count", pa.array(cc))

    merged = merged.map_batches(compress_block, batch_format="pyarrow",
                                batch_size=1 << 16)
    batches = [b for b in merged.iter_batches(batch_format="pyarrow",
                                              batch_size=None)
               if b.num_rows]
    if not batches:  # legitimately-empty stream → no heavy hitters
        sch = ds.schema()
        ctype = (dict(zip(sch.names, sch.types)).get(col, pa.string())
                 if sch is not None else pa.string())
        return pa.table({col: pa.array([], ctype),
                         "mg_count": pa.array([], pa.int64())})
    t = pa.concat_tables(batches)
    cnt = t["mg_count"].to_numpy(zero_copy_only=False)
    kk, cc = _mg_compress(np.arange(len(t)), cnt, k)
    order = np.argsort(-cc, kind="stable")
    out = t.take(pa.array(kk[order]))
    return out.set_column(out.schema.get_field_index("mg_count"),
                          "mg_count", pa.array(cc[order]))


# ---------------------------------------------------------------------------
# Bloom filter (broadcast-compressed membership, no false negatives)
# ---------------------------------------------------------------------------

def _bloom_positions(values: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(values), k) bit positions via k independent splitmix64
    streams (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    cols = [(_hash64(v ^ np.uint64(0xA5A5A5A5 * (i + 1))) %
             np.uint64(m_bits)) for i in range(k)]
    return np.stack(cols, axis=1)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    word = (pos >> np.uint64(6)).astype(np.int64)
    np.bitwise_or.at(bits, word.ravel(),
                     np.uint64(1) << (pos.ravel() & np.uint64(63)))


def bloom_build(ds, col, m_bits=None, k=4, n_hint=None):
    """Distributed Bloom filter over a uint64/int64 column: each block
    emits ONE m/64-word bitmap partial, the driver ORs them (associative
    — a tree reduce at larger block counts). ``m_bits`` defaults to 16
    bits per (hinted or counted) distinct value, power-of-two rounded:
    k=4 → ~0.24% false-positive rate; false NEGATIVES are impossible,
    which is what makes the filter safe as an exactness-preserving
    prefilter (positives get verified, negatives are definitively
    absent). Returns ``(bits: uint64[m/64], m_bits, k)``."""
    if m_bits is None:
        n = int(n_hint) if n_hint is not None else int(ds.count())
        m_bits = 1 << max(10, int(np.ceil(np.log2(max(16 * n, 1)))))
    nwords = m_bits // 64

    def block_bitmap(batch: pa.Table) -> pa.Table:
        bits = np.zeros(nwords, dtype=np.uint64)
        vals = batch[col].to_numpy(zero_copy_only=False)
        if len(vals):
            _set_bits(bits, _bloom_positions(vals, m_bits, k))
        return pa.table({"bits": [bits.view(np.int64)]})

    out = np.zeros(nwords, dtype=np.uint64)
    for b in ds.map_batches(block_bitmap, batch_format="pyarrow",
                            batch_size=1 << 18).iter_batches(
                                batch_format="pyarrow", batch_size=None):
        col_arr = b["bits"]
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        flat = col_arr.flatten().to_numpy(
            zero_copy_only=False).view(np.uint64)
        out |= np.bitwise_or.reduce(flat.reshape(-1, nwords), axis=0)
    return out, m_bits, k


def bloom_contains(bits: np.ndarray, m_bits: int, k: int,
                   values: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True = possibly present (verify),
    False = DEFINITELY absent."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(values, m_bits, k)
    word = (pos >> np.uint64(6)).astype(np.int64)
    got = (bits[word] >> (pos & np.uint64(63))) & np.uint64(1)
    return got.all(axis=1)


# ---------------------------------------------------------------------------
# mergeable quantile sketch (multi-level KLL-style compactor)
# ---------------------------------------------------------------------------

class _KLL:
    """Multi-level compactor (Karnin-Lang-Liberty shape): level h holds
    items of weight 2^h; when a level exceeds ``cap`` it is sorted and
    every other item promoted one level up (weight doubles; an odd
    leftover stays behind), so TOTAL WEIGHT IS CONSERVED exactly and a
    compaction at level h perturbs any rank by at most 2^h — the error
    grows with log(n/cap), not with the number of merges (the
    single-level "double everything" shortcut compounds weights and is
    wrong)."""

    def __init__(self, cap=2048):
        self.cap = int(cap)
        self.levels = [np.array([], dtype=np.float64)]

    def add(self, vals: np.ndarray, level: int = 0):
        while len(self.levels) <= level:
            self.levels.append(np.array([], dtype=np.float64))
        self.levels[level] = np.concatenate([self.levels[level], vals])
        h = level
        while h < len(self.levels) and len(self.levels[h]) > self.cap:
            buf = np.sort(self.levels[h], kind="stable")
            odd = len(buf) % 2
            promote = buf[odd::2]  # deterministic: keep odd leftover low
            self.levels[h] = buf[:odd]
            if h + 1 == len(self.levels):
                self.levels.append(np.array([], dtype=np.float64))
            self.levels[h + 1] = np.concatenate(
                [self.levels[h + 1], promote])
            h += 1

    def items(self):
        vals = np.concatenate(self.levels) if self.levels else \
            np.array([], dtype=np.float64)
        wts = np.concatenate(
            [np.full(len(b), float(1 << h))
             for h, b in enumerate(self.levels)]) if self.levels else \
            np.array([], dtype=np.float64)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]


class _QuantilePartial:
    """Per-batch combiner: the batch's values folded through a local
    KLL compactor, emitted as (value, weight=2^level) rows — weights are
    exact powers of two, so the driver can re-insert each row at its
    level and mergeability is exact."""

    def __init__(self, col, cap):
        self.col = col
        self.cap = int(cap)

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = batch[self.col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[~np.isnan(v)]
        k = _KLL(self.cap)
        k.add(v)
        vals, wts = k.items()
        return pa.table({"v": vals, "w": wts})


def quantile_sketch(ds, col, cap=2048, concurrency=4):
    """Mergeable distributed quantile sketch (multi-level KLL
    compactors): per-batch compacted (value, weight) samples re-inserted
    level-by-level into one driver compactor. Total weight is conserved
    EXACTLY; when ``cap`` ≥ the column's row count no compaction ever
    fires and the sketch is EXACT (the SQL-oracle regime at test scale);
    at 100 TB the fixed ``cap`` bounds every buffer at cap × log(n/cap)
    items while rank error stays O(n · log(n/cap) / cap).

    Returns ``(values: float64[m], weights: float64[m], total: float)``
    sorted by value."""
    partials = ds.map_batches(
        _QuantilePartial, fn_constructor_kwargs=dict(col=col, cap=cap),
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=8192)
    k = _KLL(cap)
    for b in partials.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        vals = b["v"].to_numpy(zero_copy_only=False)
        wts = b["w"].to_numpy(zero_copy_only=False)
        for h in np.unique(np.log2(wts).astype(np.int64)):
            k.add(vals[wts == float(1 << h)], level=int(h))
    vals, wts = k.items()
    return vals, wts, float(wts.sum())


def quantile_query(vals: np.ndarray, wts: np.ndarray, total: float,
                   qs) -> np.ndarray:
    """Quantile estimates from a sketch: the smallest value whose
    cumulative weight reaches q·total (discrete/lower quantile — matches
    DuckDB ``quantile_disc`` in the exact regime)."""
    if len(vals) == 0:
        return np.full(len(list(qs)), np.nan)
    cum = np.cumsum(wts)
    out = []
    for q in qs:
        target = q * total
        idx = int(np.searchsorted(cum, target, side="left"))
        out.append(vals[min(idx, len(vals) - 1)])
    return np.asarray(out)


# ---- Count-Min sketch (Cormode & Muthukrishnan 2005) -----------------


def _cms_buckets(values: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) bucket indices: bucket(x, r) = splitmix64(u64(x) +
    r·2³²) % width — the same per-row 2³² salt offset the MinHash
    permutations use, so an external oracle replays it from the shared
    splitmix64 stages."""
    with np.errstate(over="ignore"):
        v = values.astype(np.int64).view(np.uint64)
        salts = (np.arange(depth, dtype=np.uint64) << np.uint64(32))
        return (_hash64(v[None, :] + salts[:, None])
                % np.uint64(width)).astype(np.int64)


def cms_build(ds, col, width=128, depth=4):
    """Distributed Count-Min frequency sketch over an integer column:
    each block emits ONE depth×width int64 counter partial (a single
    ``bincount`` over packed (row, bucket) codes — no per-row Python);
    the driver SUMS the O(num_blocks) partials (associative — a tree
    reduce at larger block counts). O(depth·width) memory regardless of
    stream length; estimates overcount only (never undercount), with
    error ≤ 2·N/width at probability 1 − 2⁻ᵈᵉᵖᵗʰ. Returns the
    ``(depth, width)`` counter matrix."""

    def block_counts(batch: pa.Table) -> pa.Table:
        cnt = np.zeros(depth * width, dtype=np.int64)
        vals = batch[col].to_numpy(zero_copy_only=False)
        if len(vals):
            b = _cms_buckets(vals, width, depth)
            rows = np.arange(depth, dtype=np.int64)[:, None] * width
            cnt = np.bincount((b + rows).reshape(-1),
                              minlength=depth * width).astype(np.int64)
        return pa.table({"c": [cnt]})

    out = np.zeros(depth * width, dtype=np.int64)
    for b in ds.map_batches(block_counts, batch_format="pyarrow",
                            batch_size=1 << 18).iter_batches(
                                batch_format="pyarrow", batch_size=None):
        c = b["c"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        flat = c.flatten().to_numpy(zero_copy_only=False)
        out += flat.reshape(-1, depth * width).sum(axis=0)
    return out.reshape(depth, width)


def cms_estimate(counters: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point-query the sketch: est(x) = min over rows of the row's
    bucket counter — vectorized over the whole query array."""
    depth, width = counters.shape
    b = _cms_buckets(np.asarray(values), width, depth)
    return counters[np.arange(depth)[:, None], b].min(axis=0)


# ---- AMS / tug-of-war second-moment (F2) sketch ----------------------
# (Alon, Matias & Szegedy 1996)


def _ams_signs(values: np.ndarray, depth: int) -> np.ndarray:
    """(depth, n) ±1 signs: sign(x, r) = 2·(splitmix64(u64(x) + r·2³²)
    mod 2) − 1 — the same per-row 2³² salt offset the CMS buckets use,
    so an external oracle replays every sign from the shared splitmix64
    stages."""
    with np.errstate(over="ignore"):
        v = values.astype(np.int64).view(np.uint64)
        salts = (np.arange(depth, dtype=np.uint64) << np.uint64(32))
        h = _hash64(v[None, :] + salts[:, None])
        return ((h & np.uint64(1)).astype(np.int64) * 2 - 1)


def ams_f2_build(ds, col, depth=5):
    """Distributed AMS (tug-of-war) sketch of the stream's second
    frequency moment F₂ = Σ_x f(x)² (= self-join size, the classic
    join-size / skew estimator): each block emits ONE depth-vector of
    ±1 sign sums (a single matmul-free reduction — signs summed per
    row), the driver ADDS the partials (associative, any order —
    integer arithmetic, so the merged sums are EXACT regardless of
    block boundaries). O(depth) memory for any stream length. Returns
    the int64 sign-sum vector ``s`` with E[s_r²] = F₂."""

    def block_sums(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        s = (np.zeros(depth, dtype=np.int64) if not len(vals)
             else _ams_signs(vals, depth).sum(axis=1))
        return pa.table({"s": [s]})

    out = np.zeros(depth, dtype=np.int64)
    for b in ds.map_batches(block_sums, batch_format="pyarrow",
                            batch_size=1 << 18).iter_batches(
                                batch_format="pyarrow", batch_size=None):
        c = b["s"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        flat = c.flatten().to_numpy(zero_copy_only=False)
        out += flat.reshape(-1, depth).sum(axis=0)
    return out


def ams_f2_estimate(sums: np.ndarray) -> int:
    """Median of the per-row squared sign sums (depth odd → the median
    IS one of the exact integer squares; variance-bounded estimator of
    F₂ with relative error O(1/√depth) per Alon-Matias-Szegedy)."""
    sq = np.sort(np.asarray(sums, dtype=np.int64) ** 2)
    return int(sq[len(sq) // 2])
