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


def k_truss_broadcast(A: GBMatrix, k: int, max_iter: int = 100,
                      num_tasks: int = 32,
                      wedge_chunk: int = 4_000_000) -> GBMatrix:
    """k-truss fast path: broadcast packed strict-upper edge set, iterate
    (per-edge support via distributed wedge-membership counting → peel)
    with NO per-iteration shuffle — the same small-side-broadcast
    contract as ``triangles.triangle_count_broadcast`` (8 bytes/edge;
    beyond node memory use :func:`k_truss`, the all-shuffle masked-mxm
    path). Output is identical to :func:`k_truss`: the surviving
    symmetric edges valued by their final triangle support.
    """
    import ray
    import ray.data

    need = k - 2
    if need <= 0:
        return A  # 2-truss identity (same short-circuit as k_truss)

    # ONE streaming collect of the distinct strict-upper packed edge set
    chunks = []
    for b in A.ds.iter_batches(batch_format="pyarrow",
                               batch_size=1 << 20):
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        chunks.append(np.unique((lo << np.int64(32)) | hi))
    K = (np.unique(np.concatenate(chunks)) if chunks
         else np.array([], dtype=np.int64))
    del chunks

    sup = np.array([], dtype=np.int64)
    for _ in range(max_iter):
        if len(K) == 0:
            break
        ii = (K >> np.int64(32)).astype(np.int64)
        jj = (K & np.int64(0xFFFFFFFF)).astype(np.int64)
        n = int(max(ii.max(), jj.max())) + 1
        # full undirected CSR from the strict-upper set (driver,
        # vectorized — bounded by the broadcast contract)
        fs = np.concatenate([ii, jj])
        fd = np.concatenate([jj, ii])
        order = np.lexsort((fd, fs))
        fs, fd = fs[order], fd[order]
        ip = np.zeros(n + 1, dtype=np.int64)
        np.add.at(ip, fs + 1, 1)
        np.cumsum(ip, out=ip)
        ref = ray.put((K, ip, fd))

        def support(batch: pa.Table) -> pa.Table:
            Kb, ipb, idx = ray.get(ref)
            e = batch["id"].to_numpy(zero_copy_only=False)
            i = (Kb[e] >> np.int64(32)).astype(np.int64)
            j = (Kb[e] & np.int64(0xFFFFFFFF)).astype(np.int64)
            out = np.zeros(len(e), dtype=np.int64)
            deg = ipb[j + 1] - ipb[j]
            csum = np.concatenate([[0], np.cumsum(deg)])
            pos = 0
            while pos < len(i):
                end = int(np.searchsorted(csum, csum[pos] + wedge_chunk,
                                          "right"))
                end = max(end - 1, pos + 1)
                sl = slice(pos, end)
                d_sl = deg[sl]
                nw = int(d_sl.sum())
                if nw:
                    rep_i = np.repeat(i[sl], d_sl)
                    starts = ipb[j[sl]]
                    offs = np.arange(nw) - np.repeat(
                        csum[pos:end] - csum[pos], d_sl)
                    kk = idx[np.repeat(starts, d_sl) + offs]
                    lo = np.minimum(rep_i, kk)
                    hi = np.maximum(rep_i, kk)
                    packed = (lo << np.int64(32)) | hi
                    p = np.minimum(np.searchsorted(Kb, packed),
                                   len(Kb) - 1)
                    hit = ((Kb[p] == packed) & (kk != rep_i))
                    eid = np.repeat(np.arange(end - pos), d_sl)
                    np.add.at(out, np.arange(pos, end)[eid],
                              hit.astype(np.int64))
                pos = end
            return pa.table({"edge": e, "sup": out})

        sup = np.zeros(len(K), dtype=np.int64)
        parts = ray.data.range(
            len(K), override_num_blocks=num_tasks).map_batches(
            support, batch_format="pyarrow", batch_size=1 << 18)
        for b in parts.iter_batches(batch_format="pyarrow"):
            sup[b["edge"].to_numpy(zero_copy_only=False)] = (
                b["sup"].to_numpy(zero_copy_only=False))
        keep = sup >= need
        if keep.all():
            break
        K = K[keep]
        sup = sup[keep]

    # symmetric (src, dst, val=support) — same output as k_truss
    ii = (K >> np.int64(32)).astype(np.int64)
    jj = (K & np.int64(0xFFFFFFFF)).astype(np.int64)
    t = pa.table({
        "src": np.concatenate([ii, jj]),
        "dst": np.concatenate([jj, ii]),
        "val": np.concatenate([sup, sup]).astype(np.float64)})
    ds = ray.data.from_arrow(t)
    return GBMatrix(ds, A.nrows, A.ncols, np.float64)


def k_truss_auto(A: GBMatrix, k: int, max_iter: int = 100,
                 broadcast_limit: int = 100_000_000) -> GBMatrix:
    """Route by size: broadcast wedge kernel while the edge set fits the
    driver/object store comfortably, all-shuffle masked mxm beyond."""
    if A.nvals <= broadcast_limit:
        return k_truss_broadcast(A, k, max_iter=max_iter)
    return k_truss(A, k, max_iter=max_iter)
