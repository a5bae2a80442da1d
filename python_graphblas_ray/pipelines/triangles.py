"""Triangle counting — the north-star masked-mxm formula (SURVEY §2.7):

    L = tril(A);  C = L.mxm(L, plus_pair, mask=L.S);  triangles = sum(C)

(reference select ``matrix.py:2534``, masked mxm ``matrix.py:2294`` +
``core/mask.py``). The mask is pushed INTO the mxm pipeline as a semi-join
before aggregation (``core.GBMatrix.mxm``), so candidate wedges are pruned
before the groupby — the fusion the reference gets from the C descriptor.

Input contract: undirected simple graph — symmetric, no self-loops. Use
``simple_undirected`` to normalize a raw directed edge table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import GBMatrix
from ..functions.monoids import monoid, semiring


def simple_undirected(edges_ds, n):
    """Directed edge table → simple undirected GBMatrix: symmetrize, drop
    self-loops, dedup (iso value 1)."""

    def norm(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "src": np.concatenate([s, d]),
            "dst": np.concatenate([d, s]),
            "val": np.ones(2 * len(s), dtype=np.float64),
        })

    ds = edges_ds.map_batches(norm, batch_format="pyarrow")
    return GBMatrix.from_dataset(ds, n, n).dedup("min")


def triangle_count(A: GBMatrix) -> int:
    """Masked plus_pair mxm over the lower triangle; exact count."""
    L = A.select("tril", thunk=-1)  # strict lower triangle
    C = L.mxm(L, semiring.plus_pair, mask=L.S)
    s = C.reduce_scalar(monoid.plus)
    return int(s.value) if s.value is not None else 0


def triangle_count_numpy(src, dst, n) -> int:
    """Dense oracle (small graphs only)."""
    A = np.zeros((n, n), dtype=np.int64)
    A[src, dst] = 1
    A[dst, src] = 1
    np.fill_diagonal(A, 0)
    return int(np.trace(A @ A @ A) // 6)
