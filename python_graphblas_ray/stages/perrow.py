"""Per-row operators — the SuiteSparse ``.ss`` extras (SURVEY.md §2.6).

Reference surface: ``ss.scan`` (``core/ss/matrix.py:3689``, recipe
``core/ss/prefix_scan.py:12-183``), ``ss.selectk`` (``:3806``),
``ss.compactify`` (``:3869``), ``ss.sort`` (``:3983``), ``ss.split/concat``
(``:280,:362``), ``ss.flatten/reshape`` (``:3706,:3732``).

Ray Data mapping: operations that need a WHOLE row in one place run over
ONE hash-exchange keyed by row (``stages.exchange`` map-side split), then
a single VECTORIZED pass per partition across all of its rows at once —
lexsort by (row, ...), segment boundaries, rank-in-segment / log-depth
doubling scans. No per-row Python call anywhere (``groupby.map_groups``
is one interpreter call per row — untenable at 10⁹ rows). The scale
contract is the same as every other row-keyed shuffle in the engine:
rows (even hub rows) fit a worker. ``split`` / ``concat`` / ``flatten``
/ ``reshape`` are pure ``map_batches`` index arithmetic — no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import GBMatrix

from .reduce import _MONOID_UFUNC as _SCAN_UFUNC  # shared monoid→ufunc map
from .reduce import segments as _segments  # shared boundary kernel


def _empty_like(t: pa.Table, key: str, other: str) -> pa.Table:
    return pa.table({key: t[key].slice(0, 0), other: t[other].slice(0, 0),
                     "val": t["val"].slice(0, 0)})


def row_scan(A: GBMatrix, op: str = "plus", order: str = "rowwise"
             ) -> GBMatrix:
    """Prefix scan within each row in dst order (``ss.scan`` rowwise), or
    within each column in src order (``order="columnwise"``). Reference
    recipe (``core/ss/prefix_scan.py``) is a log-depth mxm ladder; here
    one hash-exchange co-locates each row, then a Hillis–Steele doubling
    scan runs vectorized across EVERY segment of the partition at once
    (log(max row length) numpy rounds, any associative ufunc)."""
    ufunc = _SCAN_UFUNC[op]
    key, other = (("src", "dst") if order == "rowwise"
                  else ("dst", "src"))
    from .exchange import hash_exchange_apply

    def scan_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_like(t, key, other)
        kv = t[key].to_numpy(zero_copy_only=False)
        o = t[other].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        srt = np.lexsort((o, kv))
        kv, o, out = kv[srt], o[srt], val[srt].copy()
        _, _, seg_pos = _segments(kv)
        d = 1
        max_pos = int(seg_pos.max()) if len(seg_pos) else 0
        while d <= max_pos:
            valid = seg_pos >= d
            idx = np.flatnonzero(valid)
            out[idx] = ufunc(out[idx], out[idx - d])
            d *= 2
        return pa.table({key: kv, other: o, "val": out})

    return A._wrap(hash_exchange_apply(A.ds, key, scan_part))


def _knuth32_draw(src: np.ndarray, dst: np.ndarray, ncols: int,
                  seed: int) -> np.ndarray:
    """Deterministic per-entry uniform draw for ``how="random"``: the
    house Knuth multiplicative hash of the packed entry key
    ``src·ncols + dst + seed`` — chosen over splitmix64 because it is
    ONE plain-SQL expression
    ``((key % 4294967296) * 2654435761) % 4294967296`` (the
    ``sampling.knuth32`` contract), so a DuckDB oracle can replay the
    "random" pick exactly. Equal-probability per entry, seeded,
    partition-count-invariant (pure function of the entry key).

    SQL-twin range note: in DuckDB the product must be computed in
    HUGEINT — write ``(CAST(key % 4294967296 AS HUGEINT) * 2654435761)
    % 4294967296`` — because BIGINT overflows (errors, not wraps) once
    ``key % 2^32`` exceeds ~3.47e9; the engine side wraps in uint64 and
    needs no cast. With the HUGEINT cast the replay holds for ALL
    32-bit keys; the plain-BIGINT form is only safe below that bound."""
    key = (src.astype(np.uint64) * np.uint64(ncols)
           + dst.astype(np.uint64) + np.uint64(seed))
    with np.errstate(over="ignore"):
        return ((key % np.uint64(2**32)) * np.uint64(2654435761)
                ) % np.uint64(2**32)


def _rank_select(t: pa.Table, how: str, k, compactify: bool,
                 ncols: int = 0, seed: int = 0, reverse: bool = False,
                 asindex: bool = False) -> pa.Table:
    """Shared selectk/compactify kernel: lexsort by (row, <order>), rank
    within segment, keep by rank — all rows of the partition at once."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    val = t["val"].to_numpy(zero_copy_only=False)
    if how in ("first", "last"):
        srt = np.lexsort((dst, src))
    elif how == "smallest":
        srt = np.lexsort((dst, val, src))
    elif how == "largest":
        # no value negation (breaks BOOL, wraps unsigned): ascending val
        # with dst DESC ties, then rank from the segment END — order
        # becomes (val desc, dst asc)
        srt = np.lexsort((-dst, val, src))
    elif how == "random":
        # reference ``ss.selectk/compactify`` ``how="random"``
        # (core/ss/matrix.py:3806,:3869): equal-probability k-subset
        # per row, WITHOUT replacement — here rank-by-seeded-hash,
        # (draw, dst) ties so the pick is total-ordered and replayable
        srt = np.lexsort((dst, _knuth32_draw(src, dst, ncols, seed),
                          src))
    else:
        raise ValueError(how)
    s_src, s_dst, s_val = src[srt], dst[srt], val[srt]
    starts, sizes, seg_pos = _segments(s_src)
    seg_len = np.repeat(sizes, sizes)
    if how == "largest":
        seg_pos = seg_len - 1 - seg_pos  # rank in (val desc, dst asc)
    if k is None:
        keep = np.ones(len(s_src), dtype=bool)
        new_dst = seg_pos
    elif how == "last":
        keep = seg_pos >= seg_len - k
        new_dst = seg_pos - np.maximum(seg_len - k, 0)
    else:
        keep = seg_pos < k
        new_dst = seg_pos
    out_dst = new_dst[keep].astype(np.int64)
    if compactify and reverse:
        # reference compactify(reverse=True): positions flip within the
        # KEPT set of each row (kept = min(row length, k))
        kept = (seg_len[keep] if k is None
                else np.minimum(seg_len[keep], k))
        out_dst = kept - 1 - out_dst
    out_val = s_val[keep]
    if compactify and asindex:
        # reference compactify(asindex=True): the value is the ORIGINAL
        # column index of the chosen entry
        out_val = s_dst[keep].astype(np.int64)
    return pa.table({"src": s_src[keep],
                     "dst": (out_dst if compactify else s_dst[keep]),
                     "val": out_val})


def row_selectk(A: GBMatrix, how: str, k: int, seed: int = 0) -> GBMatrix:
    """Keep k entries per row (``ss.selectk``): ``first``/``last`` by
    column position, ``smallest``/``largest`` by value, ``random`` an
    equal-probability seeded k-subset (deterministic — see
    :func:`_knuth32_draw`; the reference's ``how="random"`` at
    ``core/ss/matrix.py:3806``)."""
    from .exchange import hash_exchange_apply

    nc = int(A.ncols)

    def pick_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_like(t, "src", "dst")
        return _rank_select(t, how, k, compactify=False,
                            ncols=nc, seed=seed)

    return A._wrap(hash_exchange_apply(A.ds, "src", pick_part))


def row_compactify(A: GBMatrix, how: str = "first", k: int | None = None,
                   seed: int = 0, reverse: bool = False,
                   asindex: bool = False) -> GBMatrix:
    """``ss.compactify``: per-row selectk + re-index surviving entries to
    columns 0..k-1 (order defined by ``how``; ``random`` ranks by the
    seeded draw — the reference's "chosen values may not be ordered
    randomly", ``core/ss/matrix.py:3869``). ``reverse`` flips positions
    within each row's kept set; ``asindex`` returns the ORIGINAL column
    index as the value (both per the reference signature)."""
    from .exchange import hash_exchange_apply

    nc_in = int(A.ncols)

    def pick_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_like(t, "src", "dst")
        return _rank_select(t, how, k, compactify=True,
                            ncols=nc_in, seed=seed, reverse=reverse,
                            asindex=asindex)

    ncols = A.ncols if k is None else min(k, A.ncols)
    out = A._wrap(hash_exchange_apply(A.ds, "src", pick_part))
    out.ncols = ncols
    return out


def row_sort(A: GBMatrix, ascending: bool = True) -> GBMatrix:
    """``ss.sort`` per row: values sorted within each row; output column j
    holds the j-th smallest (largest) value of the row (ties keep dst
    order — deterministic)."""
    from .exchange import hash_exchange_apply

    def sort_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_like(t, "src", "dst")
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        if ascending:
            srt = np.lexsort((dst, val, src))
            s_src, s_val = src[srt], val[srt]
            _, _, seg_pos = _segments(s_src)
        else:
            # descending without negating val (BOOL/unsigned-safe):
            # ascending sort with dst DESC ties, rank from segment end
            srt = np.lexsort((-dst, val, src))
            s_src, s_val = src[srt], val[srt]
            _, sizes, seg_pos = _segments(s_src)
            seg_pos = np.repeat(sizes, sizes) - 1 - seg_pos
        return pa.table({"src": s_src, "dst": seg_pos.astype(np.int64),
                         "val": s_val})

    return A._wrap(hash_exchange_apply(A.ds, "src", sort_part))


def split(A: GBMatrix, row_chunks, col_chunks) -> list:
    """``ss.split``: tile into a 2-D grid of submatrices. Row/col chunk
    sizes (lists summing to nrows/ncols). Pure filters + reposition — no
    shuffle; each tile is a lazy view over the same edge Dataset."""
    r_bounds = np.concatenate([[0], np.cumsum(row_chunks)])
    c_bounds = np.concatenate([[0], np.cumsum(col_chunks)])
    tiles = []
    for ri in range(len(row_chunks)):
        row = []
        for ci in range(len(col_chunks)):
            r0, r1 = int(r_bounds[ri]), int(r_bounds[ri + 1])
            c0, c1 = int(c_bounds[ci]), int(c_bounds[ci + 1])

            def cut(batch: pa.Table, r0=r0, r1=r1, c0=c0, c1=c1
                    ) -> pa.Table:
                r = batch["src"].to_numpy(zero_copy_only=False)
                c = batch["dst"].to_numpy(zero_copy_only=False)
                keep = (r >= r0) & (r < r1) & (c >= c0) & (c < c1)
                return pa.table({
                    "src": r[keep] - r0, "dst": c[keep] - c0,
                    "val": batch["val"].to_numpy(
                        zero_copy_only=False)[keep]})

            row.append(GBMatrix(
                A.ds.map_batches(cut, batch_format="pyarrow"),
                r1 - r0, c1 - c0, A.dtype))
        tiles.append(row)
    return tiles


def concat(tiles) -> GBMatrix:
    """``ss.concat``: reassemble a 2-D grid of tiles (inverse of split)."""
    row_heights = [row[0].nrows for row in tiles]
    col_widths = [t.ncols for t in tiles[0]]
    r_off = np.concatenate([[0], np.cumsum(row_heights)])
    c_off = np.concatenate([[0], np.cumsum(col_widths)])
    parts = []
    for ri, row in enumerate(tiles):
        for ci, t in enumerate(row):
            ro, co = int(r_off[ri]), int(c_off[ci])

            def shift(batch: pa.Table, ro=ro, co=co) -> pa.Table:
                return pa.table({
                    "src": batch["src"].to_numpy(
                        zero_copy_only=False) + ro,
                    "dst": batch["dst"].to_numpy(
                        zero_copy_only=False) + co,
                    "val": batch["val"]})

            parts.append(t.ds.map_batches(shift, batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return GBMatrix(ds, int(r_off[-1]), int(c_off[-1]),
                    tiles[0][0].dtype)


def flatten(A: GBMatrix, order: str = "rowwise"):
    """``ss.flatten``: matrix → vector by row- (or col-) major
    linearization. Pure index arithmetic."""
    from ..core import GBVector

    nc, nr = A.ncols, A.nrows

    def kern(batch: pa.Table) -> pa.Table:
        r = batch["src"].to_numpy(zero_copy_only=False)
        c = batch["dst"].to_numpy(zero_copy_only=False)
        vid = r * nc + c if order == "rowwise" else c * nr + r
        return pa.table({"vid": vid, "val": batch["val"]})

    return GBVector(A.ds.map_batches(kern, batch_format="pyarrow"),
                    A.nrows * A.ncols, A.dtype)


def reshape(A: GBMatrix, nrows: int, ncols: int, order: str = "rowwise"
            ) -> GBMatrix:
    """``ss.reshape``: relayout to a new shape with the same nvals."""
    if nrows * ncols != A.nrows * A.ncols:
        raise ValueError("reshape must preserve nrows*ncols")
    old_nc, old_nr = A.ncols, A.nrows

    def kern(batch: pa.Table) -> pa.Table:
        r = batch["src"].to_numpy(zero_copy_only=False)
        c = batch["dst"].to_numpy(zero_copy_only=False)
        lin = r * old_nc + c if order == "rowwise" else c * old_nr + r
        if order == "rowwise":
            return pa.table({"src": lin // ncols, "dst": lin % ncols,
                             "val": batch["val"]})
        return pa.table({"src": lin % nrows, "dst": lin // nrows,
                         "val": batch["val"]})

    return GBMatrix(A.ds.map_batches(kern, batch_format="pyarrow"),
                    nrows, ncols, A.dtype)


def vector_scan(v, op: str = "plus"):
    """Global prefix scan over a GBVector's PRESENT entries in index
    order (reference ``Vector.ss.scan``, ``core/ss/prefix_scan.py`` —
    there a log-depth mxm ladder; here the classic two-pass distributed
    scan): ONE range sort by index, a parallel per-block reduce, an
    O(#blocks) exclusive prefix on the driver, then a parallel per-block
    local scan + offset. Any associative monoid ufunc.

    Returns a new GBVector of the same size."""
    import ray

    from ..core import GBVector

    ufunc = _SCAN_UFUNC[op]
    blocks = v.ds.sort("vid").materialize().to_arrow_refs()

    @ray.remote
    def block_total(ref):
        t = ref if isinstance(ref, pa.Table) else ref
        vals = t["val"].to_numpy(zero_copy_only=False)
        return ufunc.reduce(vals) if len(vals) else None

    @ray.remote
    def block_scan(ref, offset):
        t = ref
        if t.num_rows == 0:
            return t
        vals = t["val"].to_numpy(zero_copy_only=False).copy()
        out = ufunc.accumulate(vals)
        if offset is not None:
            out = ufunc(offset, out)
        return pa.table({"vid": t["vid"], "val": out})

    totals = ray.get([block_total.remote(r) for r in blocks])
    # exclusive prefix over block totals (None = empty block)
    offsets = []
    run = None
    for tot in totals:
        offsets.append(run)
        if tot is not None:
            run = tot if run is None else ufunc(run, tot)
    out_refs = [block_scan.remote(r, off)
                for r, off in zip(blocks, offsets)]
    import ray.data

    ds = ray.data.from_arrow_refs(out_refs)
    return GBVector(ds, v.size, v.dtype)


def _vector_pick_order(vid, val, how, seed):
    """lexsort order array for vector selectk ranking (deterministic
    ties): first/last by index, smallest/largest by (value, index),
    random by the seeded knuth32 draw of the index — the same
    SQL-replayable draw as the matrix ``how="random"``."""
    if how == "first":
        return np.argsort(vid, kind="stable")
    if how == "last":
        return np.argsort(-vid, kind="stable")
    if how == "smallest":
        return np.lexsort((vid, val))
    if how == "largest":
        return np.lexsort((vid, -val))
    if how == "random":
        key = vid.astype(np.uint64) + np.uint64(seed)
        with np.errstate(over="ignore"):
            draw = ((key % np.uint64(2**32)) * np.uint64(2654435761)
                    ) % np.uint64(2**32)
        return np.lexsort((vid, draw))
    raise ValueError(how)


def vector_selectk(v, how: str, k: int, seed: int = 0):
    """``Vector.ss.selectk`` (reference ``core/ss/vector.py:1403``):
    keep (up to) k of the vector's present entries — ``first``/``last``
    by index, ``smallest``/``largest`` by value (deterministic
    (value, index) ties where the reference allows any), ``random`` an
    equal-probability seeded k-subset via the knuth32 draw of the
    index (SQL-replayable — the matrix ``how="random"`` contract).

    Scale shape: the global winner set is contained in the union of
    per-block winners, so each block cuts to its local top-k
    (vectorized) and ONLY ≤ k·#blocks candidate rows reach the driver
    for the final cut — the vector itself never does."""
    from ..core import GBVector

    kk = int(k)
    if kk < 0:
        raise ValueError("negative k is not allowed")

    def block_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "vid" not in t.column_names:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64())})
        vid = t["vid"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        order = _vector_pick_order(vid, val, how, seed)[:kk]
        return pa.table({"vid": vid[order], "val": val[order]})

    tabs = [b for b in v.ds.map_batches(
        block_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None) if b.num_rows]
    if tabs:
        t = pa.concat_tables(tabs, promote_options="permissive")
        vid = t["vid"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        order = _vector_pick_order(vid, val, how, seed)[:kk]
        vid, val = vid[order], val[order]
    else:
        vid = np.array([], dtype=np.int64)
        val = np.array([], dtype=np.float64)
    return GBVector.from_coo(vid, val, size=v.size)


def vector_compactify(v, how: str = "first", k: int | None = None,
                      seed: int = 0, reverse: bool = False,
                      asindex: bool = False):
    """``Vector.ss.compactify`` (reference ``core/ss/vector.py:1468``
    family): selectk then re-index the survivors to 0..k−1 in the pick
    order (``first`` keeps index order; ``largest`` descending value;
    ``random`` the draw order — "chosen values may not be ordered
    randomly"). Returns a GBVector of size k (or nvals when k=None)."""
    from ..core import GBVector

    picked = vector_selectk(v, how, v.size if k is None else k,
                            seed=seed)
    vid, val = picked.to_coo()
    order = _vector_pick_order(np.asarray(vid), np.asarray(val), how,
                               seed)
    if reverse:
        order = order[::-1]
    out_val = (np.asarray(vid)[order].astype(np.int64) if asindex
               else np.asarray(val)[order])
    # Size follows the reference exactly: k when given (including k=0 —
    # a genuine size-0 vector, NOT padded to 1), else the survivor count.
    size = len(vid) if k is None else int(k)
    return GBVector.from_coo(np.arange(len(order), dtype=np.int64),
                             out_val, size=size)


def vector_sort(v, ascending: bool = True, values: bool = True,
                permutation: bool = True):
    """``Vector.ss.sort`` (reference ``core/ss/vector.py`` GxB sort):
    sorted values compacted to indices 0..nvals−1 (like ``compactify``)
    plus the permutation vector of ORIGINAL indices, ties by original
    index (reference ``binary.lt``/``gt`` with index tie-break).

    Scale shape: ONE range sort of the present entries by
    (value, index), then an O(#blocks) driver prefix over block sizes
    assigns each block its global rank offset (the two-pass
    ``vector_scan`` posture) — per-entry work stays in the blocks.
    Returns ``(values GBVector | None, permutation GBVector | None)``
    of size ``v.size``."""
    import ray
    import ray.data

    from ..core import GBVector

    if not values and not permutation:
        return None, None
    mat = v.ds.sort(["val", "vid"],
                    descending=[not ascending, False]).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def block_len(t):
        return t.num_rows

    counts = ray.get([block_len.remote(r) for r in refs])
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    @ray.remote
    def emit(t, off):
        if t.num_rows == 0 or "vid" not in t.column_names:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64()),
                             "perm": pa.array([], pa.int64())})
        rank = np.arange(off, off + t.num_rows, dtype=np.int64)
        return pa.table({"vid": rank, "val": t["val"],
                         "perm": t["vid"].cast(pa.int64())})

    out = ray.data.from_arrow_refs(
        [emit.remote(r, int(o)) for r, o in zip(refs, offs[:-1])])
    vals = perm = None
    if values:
        vals = GBVector(out.select_columns(["vid", "val"]),
                        v.size, v.dtype)
    if permutation:
        def pcols(batch: pa.Table) -> pa.Table:
            return pa.table({"vid": batch["vid"],
                             "val": batch["perm"]})
        perm = GBVector(out.map_batches(pcols, batch_format="pyarrow"),
                        v.size, "int64")
    return vals, perm


def vector_split(v, chunks) -> list:
    """``Vector.ss.split``: tile into contiguous index-range chunks
    (sizes summing to ``v.size``) — pure filters + re-base, no shuffle;
    each chunk is a lazy view over the same Dataset."""
    from ..core import GBVector

    bounds = np.concatenate([[0], np.cumsum(chunks)])
    if int(bounds[-1]) != v.size:
        raise ValueError("chunks must sum to the vector size")
    out = []
    for i in range(len(chunks)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])

        def cut(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
            vid = batch["vid"].to_numpy(zero_copy_only=False)
            keep = (vid >= lo) & (vid < hi)
            return pa.table({"vid": vid[keep] - lo,
                             "val": batch["val"].to_numpy(
                                 zero_copy_only=False)[keep]})

        out.append(GBVector(v.ds.map_batches(cut,
                                             batch_format="pyarrow"),
                            hi - lo, v.dtype))
    return out


def vector_concat(tiles):
    """``Vector.ss.concat``: reassemble index-range chunks (inverse of
    :func:`vector_split`)."""
    from ..core import GBVector

    offs = np.concatenate([[0], np.cumsum([t.size for t in tiles])])
    parts = []
    for i, t in enumerate(tiles):
        off = int(offs[i])

        def shift(batch: pa.Table, off=off) -> pa.Table:
            return pa.table({"vid": batch["vid"].to_numpy(
                zero_copy_only=False) + off, "val": batch["val"]})

        parts.append(t.ds.map_batches(shift, batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return GBVector(ds, int(offs[-1]), tiles[0].dtype)
