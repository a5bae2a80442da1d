"""Per-row operators — the SuiteSparse ``.ss`` extras (SURVEY.md §2.6).

Reference surface: ``ss.scan`` (``core/ss/matrix.py:3689``, recipe
``core/ss/prefix_scan.py:12-183``), ``ss.selectk`` (``:3806``),
``ss.compactify`` (``:3869``), ``ss.sort`` (``:3983``), ``ss.split/concat``
(``:280,:362``), ``ss.flatten/reshape`` (``:3706,:3732``).

Ray Data mapping: operations that need a WHOLE row in one place run as
``groupby(src).map_groups`` — one co-locating shuffle keyed by row, then
vectorized numpy per group. The scale contract is the same as every other
row-keyed shuffle in the engine: rows (even hub rows) fit a worker;
edge-balanced dst-partitioning upstream keeps groups whole. ``split`` /
``concat`` / ``flatten`` / ``reshape`` are pure ``map_batches`` index
arithmetic — no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import GBMatrix

_SCAN_UFUNC = {
    "plus": np.add, "times": np.multiply, "min": np.minimum,
    "max": np.maximum,
}


def row_scan(A: GBMatrix, op: str = "plus", order: str = "rowwise"
             ) -> GBMatrix:
    """Prefix scan within each row in dst order (``ss.scan`` rowwise), or
    within each column in src order (``order="columnwise"``) — reference
    recipe does log-depth mxm against shift matrices; here each group
    scans locally after one co-location shuffle."""
    ufunc = _SCAN_UFUNC[op]
    key, other = (("src", "dst") if order == "rowwise"
                  else ("dst", "src"))

    def scan(group: pa.Table) -> pa.Table:
        o = group[other].to_numpy(zero_copy_only=False)
        val = group["val"].to_numpy(zero_copy_only=False)
        srt = np.argsort(o, kind="stable")
        out = ufunc.accumulate(val[srt])
        return pa.table({key: group[key], other: o[srt], "val": out})

    return A._wrap(A.ds.groupby(key).map_groups(
        scan, batch_format="pyarrow"))


def row_selectk(A: GBMatrix, how: str, k: int) -> GBMatrix:
    """Keep k entries per row (``ss.selectk``): ``first``/``last`` by
    column position, ``smallest``/``largest`` by value."""

    def pick(group: pa.Table) -> pa.Table:
        dst = group["dst"].to_numpy(zero_copy_only=False)
        val = group["val"].to_numpy(zero_copy_only=False)
        if how == "first":
            sel = np.argsort(dst, kind="stable")[:k]
        elif how == "last":
            sel = np.argsort(dst, kind="stable")[-k:]
        elif how == "smallest":
            sel = np.lexsort((dst, val))[:k]
        elif how == "largest":
            sel = np.lexsort((dst, -val))[:k]
        else:
            raise ValueError(how)
        return pa.table({"src": group["src"].take(pa.array(sel)),
                         "dst": dst[sel], "val": val[sel]})

    return A._wrap(A.ds.groupby("src").map_groups(
        pick, batch_format="pyarrow"))


def row_compactify(A: GBMatrix, how: str = "first", k: int | None = None
                   ) -> GBMatrix:
    """``ss.compactify``: per-row selectk + re-index surviving entries to
    columns 0..k-1 (order defined by ``how``)."""

    def pick(group: pa.Table) -> pa.Table:
        dst = group["dst"].to_numpy(zero_copy_only=False)
        val = group["val"].to_numpy(zero_copy_only=False)
        kk = len(dst) if k is None else k
        if how == "first":
            sel = np.argsort(dst, kind="stable")[:kk]
        elif how == "last":
            sel = np.argsort(dst, kind="stable")[::-1][:kk][::-1]
        elif how == "smallest":
            sel = np.lexsort((dst, val))[:kk]
        elif how == "largest":
            sel = np.lexsort((dst, -val))[:kk]
        else:
            raise ValueError(how)
        return pa.table({
            "src": group["src"].take(pa.array(sel)),
            "dst": np.arange(len(sel), dtype=np.int64),
            "val": val[sel]})

    ncols = A.ncols if k is None else min(k, A.ncols)
    out = A._wrap(A.ds.groupby("src").map_groups(
        pick, batch_format="pyarrow"))
    out.ncols = ncols
    return out


def row_sort(A: GBMatrix, ascending: bool = True) -> GBMatrix:
    """``ss.sort`` per row: values sorted within each row; output column j
    holds the j-th smallest (largest) value of the row (ties keep dst
    order — deterministic)."""

    def srt(group: pa.Table) -> pa.Table:
        dst = group["dst"].to_numpy(zero_copy_only=False)
        val = group["val"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, val if ascending else -val))
        return pa.table({
            "src": group["src"],
            "dst": np.arange(len(order), dtype=np.int64),
            "val": val[order]})

    return A._wrap(A.ds.groupby("src").map_groups(
        srt, batch_format="pyarrow"))


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
