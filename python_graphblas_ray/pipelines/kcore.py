"""k-core and k-truss — composed from the engine's own kernels, the way
`graphblas-algorithms` builds on the reference (README.md:19-20): degree
reductions + select filters (k-core peel) and masked plus_pair mxm
(k-truss edge support), iterated to fixpoint.

Both operate on a simple undirected graph (symmetric edge table, no
self-loops — use ``triangles.simple_undirected``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..core import GBMatrix


def _degrees(A: GBMatrix) -> np.ndarray:
    """Dense degree array via the rowwise reduction kernel."""
    idx, vals = A.reduce_rowwise("plus").to_coo()
    out = np.zeros(A.nrows, dtype=np.int64)
    out[idx] = vals.astype(np.int64)
    return out


def k_core(A: GBMatrix, k: int) -> GBMatrix:
    """The maximal subgraph where every vertex has degree ≥ k: iterative
    peel — drop vertices below k, recompute degrees, repeat to fixpoint.
    Each round is one degree reduction + one broadcast semi-join filter
    (no driver-side edge materialization)."""
    cur = A
    cur_nnz = cur.nvals
    while cur_nnz:
        deg = _degrees(cur)
        keep = deg >= k
        if not keep.any():
            return cur.clear()  # fully peeled
        keep_ids = ray.put(np.flatnonzero(keep).astype(np.int64))

        def filt(batch: pa.Table) -> pa.Table:
            ids = ray.get(keep_ids)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            ok = (np.isin(s, ids)) & (np.isin(d, ids))
            return batch.filter(pa.array(ok))

        nxt = cur._wrap(cur.ds.map_batches(filt, batch_format="pyarrow"))
        nxt.ds = nxt.ds.materialize()
        nxt_nnz = nxt.nvals
        if nxt_nnz == cur_nnz:  # no edge removed → fixpoint
            return nxt
        cur, cur_nnz = nxt, nxt_nnz
    return cur


def core_number(A: GBMatrix) -> np.ndarray:
    """Core number per vertex: largest k such that the vertex belongs to
    the k-core. Driver loop of k-core peels (k = 1, 2, ... until empty)."""
    out = np.zeros(A.nrows, dtype=np.int64)
    cur = A
    k = 1
    while True:
        cur = k_core(cur, k)
        deg = _degrees(cur)
        members = deg >= k
        if not members.any():
            break
        out[members] = k
        k += 1
    return out


def k_truss(A: GBMatrix, k: int, max_iter: int = 100) -> GBMatrix:
    """The maximal subgraph where every edge is in ≥ k-2 triangles:
    iterate support = plus_pair mxm masked to the edge set (the triangle
    north-star kernel), drop edges under support, repeat to fixpoint.
    Reference formula family: ``C<A.S> = A ⊕.⊗ A (plus_pair)``."""
    from ..functions.monoids import semiring

    need = k - 2
    if need <= 0:
        # the 2-truss (and below) is the graph unchanged — the masked
        # plus_pair mxm emits NO entry for triangle-free edges, so the
        # select would wrongly drop them
        return A
    cur = A
    for _ in range(max_iter):
        support = cur.mxm(cur, semiring.plus_pair, mask=cur.S)
        keep = support.select(">=", float(need))
        keep.ds = keep.ds.materialize()
        if keep.nvals == cur.nvals:
            return keep
        cur = keep
        if cur.nvals == 0:
            return cur
    return cur


# -- single-process oracles ------------------------------------------------

def k_core_numpy(src, dst, n, k):
    deg_mask = np.ones(n, dtype=bool)
    s, d = np.asarray(src), np.asarray(dst)
    while True:
        keep_e = deg_mask[s] & deg_mask[d]
        deg = np.bincount(s[keep_e], minlength=n)
        new_mask = deg_mask & (deg >= k)
        if (new_mask == deg_mask).all():
            return new_mask
        deg_mask = new_mask


def k_truss_numpy(src, dst, n, k):
    """Dense oracle (small graphs)."""
    Adj = np.zeros((n, n), dtype=np.int64)
    Adj[src, dst] = 1
    while True:
        sup = (Adj @ Adj) * Adj
        keep = (sup >= k - 2) & (Adj > 0)
        if (keep == (Adj > 0)).all():
            return keep
        Adj = keep.astype(np.int64)
