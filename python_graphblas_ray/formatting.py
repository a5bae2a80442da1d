"""Rich ``repr`` formatting for containers and masks — the Ray-native
analog of reference ``graphblas/core/formatting.py`` (whose exact
strings are suitesparse-backend-specific: the reference's own
``tests/test_formatting.py`` skips on any other backend). Layout parity
is kept — a pandas header block (quoted name as the index header,
``nvals/nrows/ncols/dtype/format`` columns), a full-width dash rule,
then the value grid with blanks for missing entries and ``...``
row/column elision past the display limits — while the ``format``
column reports this engine's storage (``raydata``) instead of a
suitesparse layout code.

Distributed-safe: only the DISPLAYED row/column window is ever fetched
from the Dataset (one streaming filtered scan per repr); a 10¹²-vertex
matrix reprs by moving at most ``MAX_ROWS × MAX_COLUMNS`` cells plus a
streaming ``count()`` for ``nvals``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: display window (reference uses pandas display options; fixed here so
#: goldens are stable). An axis longer than the limit shows the first
#: ``limit // 2`` and last ``limit // 2`` labels around a ``...``.
MAX_ROWS = 20
MAX_COLUMNS = 20

_STORAGE = "raydata"


def _axis_labels(n, limit):
    """Displayed labels for an axis of length n (None = no elision)."""
    if n <= limit:
        return np.arange(n), None
    half = limit // 2
    head = np.arange(half)
    tail = np.arange(n - half, n)
    return np.concatenate([head, tail]), half


def _fmt_value(v, dtype_str):
    if v is None:
        return ""
    if dtype_str == "bool" or isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    try:
        if np.issubdtype(np.dtype(dtype_str), np.integer):
            return str(int(v))
    except TypeError:  # UDT / record dtypes: plain str
        pass
    return str(v)


def _fetch_cells(ds, key_cols, keep_sets):
    """One streaming filtered scan: rows whose EVERY key is in its
    displayed set (the only data a repr moves off the Dataset)."""
    sets = {c: np.asarray(sorted(s), dtype=np.int64)
            for c, s in keep_sets.items()}

    def filt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keep = np.ones(batch.num_rows, dtype=bool)
        for c, allowed in sets.items():
            keep &= np.isin(
                batch[c].to_numpy(zero_copy_only=False), allowed)
        return batch.filter(pa.array(keep))

    out = []
    for b in ds.map_batches(filt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            out.append(b)
    if not out:
        return {c: np.array([], dtype=np.int64) for c in key_cols}, \
            np.array([])
    t = pa.concat_tables(out, promote_options="permissive")
    keys = {c: t[c].to_numpy(zero_copy_only=False) for c in key_cols}
    return keys, t["val"].to_numpy(zero_copy_only=False)


def _header_block(name, type_lines, info):
    """Reference header: the quoted name overlays the index-column gap
    of the pandas column-header line; the container type is the index
    label of the value row; extra type lines (mask reprs) ride between
    them."""
    df = pd.DataFrame(info, index=[type_lines[-1]])
    lines = df.to_string().split("\n")
    qname = f'"{name}"'
    hdr = lines[0]
    pad = len(hdr) - len(hdr.lstrip())  # index-column width
    hdr = qname + hdr[len(qname):] if len(qname) <= pad \
        else qname + hdr[pad:]
    out = [hdr]
    if len(type_lines) > 1:
        out += list(type_lines[:-1])
    out += lines[1:]
    return out


def _grid_df(rows_shown, cols_shown, row_gap, col_gap, cells,
             index_label=None):
    """The value grid as a pandas DataFrame of strings, with ``...``
    elision rows/columns spliced in at the gap positions."""
    row_labels = [str(r) for r in rows_shown]
    col_labels = [str(c) for c in cols_shown]
    data = [[cells.get((r, c), "") for c in cols_shown]
            for r in rows_shown]
    if col_gap is not None:
        for row in data:
            row.insert(col_gap, "...")
        col_labels.insert(col_gap, "...")
    if row_gap is not None:
        data.insert(row_gap, ["..."] * len(col_labels))
        row_labels.insert(row_gap, "...")
    df = pd.DataFrame(data, index=row_labels, columns=col_labels)
    if index_label is not None:
        df = df.T
        df.index.name = index_label
        df = df.T
    return df


def matrix_repr(A, name=None, type_lines=("gb.Matrix",),
                value_of=None):
    """Reference-layout Matrix repr (``core/formatting.py:378``
    ``format_matrix``): header block, dash rule, displayed-window
    grid. ``value_of``: optional transform of the fetched values (mask
    reprs map them to 0/1)."""
    name = name if name is not None else getattr(A, "name", "") or "M"
    from .functions.dtypes import lookup_dtype

    nvals = A.nvals
    info = {"nvals": [nvals], "nrows": [A.nrows], "ncols": [A.ncols],
            "dtype": [lookup_dtype(A.dtype).name],
            "format": [_STORAGE]}
    head = _header_block(name, type_lines, info)
    rows_shown, row_gap = _axis_labels(A.nrows, MAX_ROWS)
    cols_shown, col_gap = _axis_labels(A.ncols, MAX_COLUMNS)
    rk, ck = A._key_cols
    keys, vals = _fetch_cells(
        A.ds, (rk, ck),
        {rk: set(rows_shown.tolist()), ck: set(cols_shown.tolist())})
    cells = {}
    for r, c, v in zip(keys[rk], keys[ck], vals.tolist()):
        v = value_of(v) if value_of is not None else v
        cells[(int(r), int(c))] = _fmt_value(v, A.dtype)
    grid = _grid_df(rows_shown.tolist(), cols_shown.tolist(),
                    row_gap, col_gap, cells)
    body = grid.to_string()
    width = max(len(ln) for ln in head + body.split("\n"))
    return "\n".join(head) + "\n" + "-" * width + "\n" + body


def vector_repr(v, name=None, type_lines=("gb.Vector",),
                value_of=None):
    """Reference-layout Vector repr (one ``index``/``value`` row pair,
    ``core/formatting.py:446`` ``format_vector``)."""
    name = name if name is not None else getattr(v, "name", "") or "v"
    from .functions.dtypes import lookup_dtype

    info = {"nvals": [v.nvals], "size": [v.size],
            "dtype": [lookup_dtype(v.dtype).name],
            "format": [_STORAGE]}
    head = _header_block(name, type_lines, info)
    idx_shown, gap = _axis_labels(v.size, MAX_COLUMNS)
    keys, vals = _fetch_cells(v.ds, (v._key_cols[0],),
                              {v._key_cols[0]: set(idx_shown.tolist())})
    cells = {}
    for i, val in zip(keys[v._key_cols[0]], vals.tolist()):
        val = value_of(val) if value_of is not None else val
        cells[(0, int(i))] = _fmt_value(val, v.dtype)
    grid = _grid_df([0], idx_shown.tolist(), None, gap, cells)
    grid.index = ["value"]
    body = grid.T
    body.index.name = "index"
    body = body.T.to_string()
    width = max(len(ln) for ln in head + body.split("\n"))
    return "\n".join(head) + "\n" + "-" * width + "\n" + body


def scalar_repr(s, name=None, type_lines=("gb.Scalar",)):
    """Reference-layout Scalar repr (``core/formatting.py:510``)."""
    name = name if name is not None else getattr(s, "name", "") or "s"
    from .functions.dtypes import lookup_dtype

    return "\n".join(_header_block(
        name, type_lines,
        {"value": [s.value], "dtype": [lookup_dtype(s.dtype).name]}))


def mask_repr(m):
    """Mask repr (reference ``core/formatting.py:such masks render the
    parent grid mapped to 0/1``): three-line type block, applied
    entries as 1."""
    from .core import GBVector

    kind = ("StructuralMask" if m.structure else "ValueMask")
    if m.complement:
        kind = "Complemented" + kind
    parent = m.parent
    suffix = (".S" if m.structure else ".V")
    pre = "~" if m.complement else ""
    if m.structure:
        # reference: stored entries render 1 (0 when complemented)
        def val_of(v, _c=m.complement):
            return 0 if _c else 1
    else:
        def val_of(v, _c=m.complement):
            return int(bool(v)) ^ int(_c)
    if isinstance(parent, GBVector):
        return vector_repr(parent, name=f"{pre}v{suffix}",
                           type_lines=(kind, "of gb.Vector"),
                           value_of=val_of)
    return matrix_repr(parent, name=f"{pre}M{suffix}",
                       type_lines=(kind, "of gb.Matrix"),
                       value_of=val_of)
