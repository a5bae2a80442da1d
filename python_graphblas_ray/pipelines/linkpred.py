"""Link prediction over the link graph: neighborhood-overlap scores.

The classic GraphBLAS recipe family (same masked-matmul shape as
triangle counting, SURVEY §2.7): common-neighbor counts are ONE
``plus_pair`` semiring matmul ``C = A @ A.T`` — C[u,v] = |N⁺(u) ∩ N⁺(v)|
over out-neighbor sets — and Jaccard / overlap scores are a cheap
per-entry finish against broadcast degrees. The reference exposes the
building blocks (``plus_pair`` semiring, ``select.triu``); the composed
operator is new engine surface.

Scale notes (100 TB rule): the matmul is the dominant cost and is
hash-partitioned by the shared-neighbor key — never all-pairs. Power-law
hubs make |N(u)∩N(v)| candidates explode exactly like hot words in
``dedup.word_jaccard_pairs``; the same guard applies (``max_degree``
drops vertices whose out-degree exceeds the cap BEFORE the matmul,
yielding degree-capped scores — document the cap when you use it).
Degrees are an O(#vertices) broadcast (``ray.put`` once, read zero-copy
per batch), co-partition them with C at larger-than-memory vertex
counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..core import GBMatrix
from ..functions.monoids import semiring as _sr
from ..stages.reduce import groupby_monoid


def _distinct_pattern(edges_ds):
    """Distinct (src, dst) pattern matrix input: duplicate edges would
    inflate plus_pair counts, so collapse them with one any-monoid
    groupby (same co-location the matmul shuffle needs anyway)."""

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["src"], "dst": batch["dst"],
                         "val": np.ones(batch.num_rows, dtype=np.int64)})

    from ..functions.monoids import monoid

    return groupby_monoid(edges_ds.map_batches(ones, batch_format="pyarrow"),
                          ["src", "dst"], "val", monoid.any)


def neighborhood_jaccard(edges_ds, n, max_degree=None, min_common=1):
    """Jaccard link-prediction scores over OUT-neighbor sets.

    For every unordered pair u < v sharing ≥ ``min_common`` out-neighbors
    (pairs sharing none never materialize — the structural sparsity of
    the plus_pair matmul): ``common = |N(u) ∩ N(v)|``,
    ``jaccard = common / (deg(u) + deg(v) - common)``.

    Returns a Dataset with columns ``(u, v, common, jaccard)``.

    ``max_degree``: optional hub guard — vertices with out-degree above
    the cap are dropped before the matmul (degree-capped scores; the
    uncapped form is quadratic in hub degree).
    """
    pat = _distinct_pattern(edges_ds)
    A = GBMatrix.from_dataset(pat, nrows=n, ncols=n)

    # out-degrees — broadcast lookup (pattern entries are 1 → count)
    deg_vec = A.reduce_rowwise("plus")
    ids, deg = deg_vec.to_coo(sort=True)
    if max_degree is not None:
        drop_ids = ids[deg > max_degree]
        if len(drop_ids):
            drop_ref = ray.put(np.sort(drop_ids))

            def prune(batch: pa.Table) -> pa.Table:
                d = ray.get(drop_ref)
                s = batch["src"].to_numpy(zero_copy_only=False)
                t = batch["dst"].to_numpy(zero_copy_only=False)
                ok = ~(np.isin(s, d) | np.isin(t, d))
                return batch.filter(pa.array(ok))

            A = GBMatrix(A.ds.map_batches(prune, batch_format="pyarrow"),
                         n, n, A.dtype)
            # re-derive degrees ON THE PRUNED PATTERN: a survivor whose
            # edges into dropped hubs were removed must use its capped
            # degree, or its Jaccard denominator mixes two graphs
            ids, deg = A.reduce_rowwise("plus").to_coo(sort=True)

    # C[u,v] = |N(u) ∩ N(v)| for u < v (strict upper triangle)
    C = A.mxm(A.T, _sr.plus_pair).select("triu", 1)
    if min_common > 1:
        C = C.select(">=", min_common)

    deg_ref = ray.put((ids, deg.astype(np.float64)))

    def finish(batch: pa.Table) -> pa.Table:
        u = batch["src"].to_numpy(zero_copy_only=False)
        v = batch["dst"].to_numpy(zero_copy_only=False)
        c = batch["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        dids, dvals = ray.get(deg_ref)
        du = dvals[np.searchsorted(dids, u)]
        dv = dvals[np.searchsorted(dids, v)]
        return pa.table({"u": u, "v": v,
                         "common": c.astype(np.int64),
                         "jaccard": c / (du + dv - c)})

    return C.ds.map_batches(finish, batch_format="pyarrow")


def neighborhood_jaccard_numpy(src, dst, n, min_common=1):
    """Single-process oracle: brute-force out-neighbor-set Jaccard."""
    pairs = {}
    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        adj[int(s)].add(int(d))
    for u in range(n):
        for v in range(u + 1, n):
            c = len(adj[u] & adj[v])
            if c >= min_common and c > 0:
                pairs[(u, v)] = (c, c / (len(adj[u]) + len(adj[v]) - c))
    return pairs
