"""MatrixMarket file source/sink (reference ``graphblas/io/_matrixmarket.py:8,:98``
``mmread``/``mmwrite`` — there via scipy / fast_matrix_market; this
container has neither, so the parser is self-written numpy).

Small files (< ``driver_parse_limit`` bytes — the reference's conformance
fixtures) parse driver-side in one pass. Larger files parse distributed:
``ray.data.read_text`` streams the body and each batch parses
vectorized; the header/dims are read driver-side so every task knows
what to skip. Supports ``coordinate``/``array`` formats,
``real``/``integer``/``pattern`` fields, ``general``/``symmetric``/
``skew-symmetric`` symmetry.

``mmwrite``: driver-side (fixtures are small); big matrices belong in
Parquet (``GBMatrix.ds.write_parquet``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..core import GBMatrix


def _parse_header(path: str):
    kind = field = symmetry = None
    shape = None
    with open(path, "rb") as f:
        for raw in f:
            line = raw.decode("utf-8", "replace").strip()
            if line.startswith("%%MatrixMarket"):
                parts = line.split()
                kind, field, symmetry = parts[2], parts[3], parts[4]
                continue
            if line.startswith("%") or not line:
                continue
            dims = line.split()
            if kind == "coordinate":
                shape = (int(dims[0]), int(dims[1]), int(dims[2]))
            else:
                shape = (int(dims[0]), int(dims[1]), None)
            break
    if kind is None or shape is None:
        raise ValueError(f"not a MatrixMarket file: {path}")
    return kind, field, symmetry, shape


def _entries_to_table(r, c, v, symmetry) -> pa.Table:
    """1-based COO entries → 0-based edge table, expanding symmetry."""
    r = np.asarray(r, dtype=np.int64) - 1
    c = np.asarray(c, dtype=np.int64) - 1
    v = np.asarray(v, dtype=np.float64)
    if symmetry in ("symmetric", "skew-symmetric"):
        off = r != c
        mirrored = -v[off] if symmetry == "skew-symmetric" else v[off]
        return pa.table({"src": np.concatenate([r, c[off]]),
                         "dst": np.concatenate([c, r[off]]),
                         "val": np.concatenate([v, mirrored])})
    return pa.table({"src": r, "dst": c, "val": v})


def _parse_lines(lines, pattern: bool):
    """Vectorized-ish parse of entry lines → (r, c, v) 1-based arrays."""
    rs, cs, vs = [], [], []
    for s in lines:
        parts = s.split()
        rs.append(int(parts[0]))
        cs.append(int(parts[1]))
        vs.append(1.0 if pattern or len(parts) < 3 else float(parts[2]))
    return (np.array(rs, dtype=np.int64), np.array(cs, dtype=np.int64),
            np.array(vs, dtype=np.float64))


def mmread(path: str, parallelism: int = 8,
           driver_parse_limit: int = 64 << 20) -> GBMatrix:
    """Parse a MatrixMarket file into a GBMatrix."""
    kind, field, symmetry, (nr, nc, nnz) = _parse_header(path)
    pattern = field == "pattern"

    if kind == "array":
        # dense column-major value listing — small by construction
        vals = []
        body = 0
        with open(path) as f:
            for line in f:
                s = line.strip()
                if s.startswith("%") or not s:
                    continue
                body += 1
                if body == 1:
                    continue  # dims line
                vals.append(float(s))
        vals = np.array(vals, dtype=np.float64)
        if symmetry in ("symmetric", "skew-symmetric"):
            # Spec-conformant files list only the lower triangle
            # column-major: n(n+1)/2 values (skew: strictly-lower,
            # n(n-1)/2). Scatter into the triangle, then mirror.
            n = nr
            skew = symmetry == "skew-symmetric"
            expect = n * (n - 1) // 2 if skew else n * (n + 1) // 2
            if len(vals) == expect:
                start = 1 if skew else 0  # first stored row of column j
                rows = np.concatenate(
                    [np.arange(j + start, n) for j in range(n)]
                    or [np.array([], np.int64)]).astype(np.int64)
                cols = np.concatenate(
                    [np.full(n - j - start, j) for j in range(n)]
                    or [np.array([], np.int64)]).astype(np.int64)
                arr = np.zeros((n, n), dtype=np.float64)
                arr[rows, cols] = vals
                if skew:
                    arr = arr - arr.T
                else:
                    arr = arr + arr.T - np.diag(np.diag(arr))
            elif len(vals) == nr * nc:
                # lenient: a (non-conformant) full listing — trust it
                arr = vals.reshape((nc, nr)).T
            else:
                raise ValueError(
                    f"{symmetry} array file: expected {expect} "
                    f"(triangular) or {nr * nc} (full) values, "
                    f"got {len(vals)}")
        else:
            arr = vals.reshape((nc, nr)).T
        return GBMatrix.from_dense(arr)

    if os.path.getsize(path) <= driver_parse_limit:
        entry_lines = []
        body = 0
        with open(path) as f:
            for line in f:
                s = line.strip()
                if s.startswith("%") or not s:
                    continue
                body += 1
                if body == 1:
                    continue  # dims line
                entry_lines.append(s)
        r, c, v = _parse_lines(entry_lines, pattern)
        t = _entries_to_table(r, c, v, symmetry)
        import ray.data

        return GBMatrix(ray.data.from_arrow(t), nr, nc, "float64")

    # Distributed body parse. The dims line is skipped BY POSITION, not by
    # value-matching (a data entry may legitimately equal the dims triple):
    # exactly one batch contains the %%MatrixMarket banner (byte 0 of the
    # file → first read_text block), and the dims line is the first
    # non-comment line after it. Assumes the comment header fits in one
    # block (always true for spec-sized headers).
    import ray.data

    lines = ray.data.read_text(path, override_num_blocks=parallelism)

    def parse(batch: pa.Table) -> pa.Table:
        keep = []
        saw_banner = dropped_dims = False
        for s in batch["text"].to_pylist():
            s = s.strip()
            if s.startswith("%%MatrixMarket"):
                saw_banner = True
                continue
            if not s or s.startswith("%"):
                continue
            if saw_banner and not dropped_dims:
                dropped_dims = True  # the dims line
                continue
            keep.append(s)
        r, c, v = _parse_lines(keep, pattern)
        return _entries_to_table(r, c, v, symmetry)

    return GBMatrix(lines.map_batches(parse, batch_format="pyarrow"),
                    nr, nc, "float64")


def mmwrite(path: str, A: GBMatrix, comment: str = "", field=None) -> str:
    """Write a GBMatrix as MatrixMarket coordinate/general (driver-side;
    intended for small conformance fixtures)."""
    r, c, v = A.to_coo(sort=True)
    is_int = np.issubdtype(np.asarray(v).dtype, np.integer)
    field = field or ("integer" if is_int else "real")
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} general\n")
        if comment:
            f.write(f"%{comment}\n")
        f.write(f"{A.nrows} {A.ncols} {len(r)}\n")
        for i, j, x in zip(r, c, v):
            if field == "pattern":
                f.write(f"{i + 1} {j + 1}\n")
            elif field == "integer":
                f.write(f"{i + 1} {j + 1} {int(x)}\n")
            else:
                f.write(f"{i + 1} {j + 1} {x!r}\n")
    return path
