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


def triangle_count_broadcast(edges_ds, num_tasks=32,
                             wedge_chunk=4_000_000) -> int:
    """Fast exact triangle count: broadcast packed strict-upper edge set +
    CSR, fan out edge ranges, per-task vectorized wedge-membership count.

    Same formula as the masked mxm (``L.mxm(L, plus_pair, mask=L.S)`` →
    reduce) but fused into ONE ``map_batches`` pass with ZERO shuffles:
    tri = Σ_{(i,j), i<j} |{k ∈ N⁺(j) : (i,k) ∈ E}| — each triangle
    i<j<k counted exactly once via its longest-index wedge.

    Input: raw directed edge Dataset (src, dst[, val]); symmetrization,
    self-loop drop and dedup all happen on the packed key set (np.unique).

    Scale contract: the packed edge KEY SET is broadcast (8 bytes/edge —
    ~8 GB per 10^9 undirected edges), the same small-side-broadcast rule
    the masked-mxm mask uses; beyond node memory use ``triangle_count``
    (all-shuffle mxm path). Vertex ids must fit 32 bits (pack i<<32|j).
    """
    import ray
    import ray.data

    # 1. streaming collect of the distinct strict-upper packed edge set
    chunks = []
    for b in edges_ds.iter_batches(batch_format="pyarrow",
                                   batch_size=1 << 20):
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        chunks.append(np.unique((lo << np.int64(32)) | hi))
    if not chunks:
        return 0
    K = np.unique(np.concatenate(chunks))
    del chunks
    ii = (K >> np.int64(32)).astype(np.int64)
    jj = (K & np.int64(0xFFFFFFFF)).astype(np.int64)
    n = int(max(ii.max() if len(ii) else 0, jj.max() if len(jj) else 0)) + 1
    # 2. forward-CSR over i (K sorted ⇒ jj sorted within each i)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, ii + 1, 1)
    np.cumsum(indptr, out=indptr)
    ref = ray.put((K, indptr, jj))

    def count(batch: pa.Table) -> pa.Table:
        Kb, ip, idx = ray.get(ref)
        lo_r = batch["id"].to_numpy(zero_copy_only=False)
        i = (Kb[lo_r] >> np.int64(32)).astype(np.int64)
        j = (Kb[lo_r] & np.int64(0xFFFFFFFF)).astype(np.int64)
        total = 0
        # wedge expansion in bounded chunks: k ∈ N⁺(j), test (i,k) ∈ K
        deg = ip[j + 1] - ip[j]
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
                starts = ip[j[sl]]
                # flat ranges [starts, starts+deg): vectorized ragged gather
                offs = np.arange(nw) - np.repeat(
                    csum[pos:end] - csum[pos], d_sl)
                kk = idx[np.repeat(starts, d_sl) + offs]
                packed = (rep_i << np.int64(32)) | kk
                p = np.searchsorted(Kb, packed)
                p = np.minimum(p, len(Kb) - 1)
                total += int((Kb[p] == packed).sum())
            pos = end
        return pa.table({"partial": np.array([total], dtype=np.int64)})

    parts = ray.data.range(len(K), override_num_blocks=num_tasks) \
        .map_batches(count, batch_format="pyarrow", batch_size=1 << 18)
    return int(sum(int(b["partial"].to_numpy(zero_copy_only=False).sum())
                   for b in parts.iter_batches(batch_format="pyarrow")))


def triangle_count_numpy(src, dst, n) -> int:
    """Dense oracle (small graphs only)."""
    A = np.zeros((n, n), dtype=np.int64)
    A[src, dst] = 1
    A[dst, src] = 1
    np.fill_diagonal(A, 0)
    return int(np.trace(A @ A @ A) // 6)
