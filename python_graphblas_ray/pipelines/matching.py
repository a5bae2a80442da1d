"""Maximal matching — the deterministic Luby-style rounds the reference's
GraphBLAS recipes express with min-reductions (the edge-level sibling of
``maximal_independent_set``, reference recipe shape
``/root/reference/graphblas/semiring`` min family).

Per round over the live (u < v) edge set, with a STATIC injective edge
priority (knuth32 of the packed key ``u·n + v`` — collision-free, so the
result is fully deterministic and plain-SQL reproducible):

1. ``vmin[x] = min`` priority over edges incident to x — ONE
   ``groupby_monoid`` exchange over the exploded endpoint stream (the
   per-batch combiner shrinks it to ≤ one row per vertex per block).
2. An edge is matched iff its priority equals BOTH endpoints' minima
   (a local minimum can't lose at either end — classic Israeli–Itai /
   Luby step). Matched-vertex mask broadcast via ``ray.put``; the edge
   filter is vectorized inside ``map_batches``.
3. Edges touching a matched vertex die; repeat until the edge set is
   empty (O(log n) rounds in expectation).

Driver state is two O(n) vectors per round (the repo's standard
vertex-vector budget); edges stream and never gather.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.monoids import monoid
from ..stages.reduce import groupby_monoid


def _knuth32_packed(u: np.ndarray, v: np.ndarray, n: int) -> np.ndarray:
    return ((u * n + v) * 2654435761) % 4294967296


def maximal_matching(edges_ds, n, max_rounds=None):
    """Deterministic maximal matching of the simple undirected graph.

    Returns ``(u int64[], v int64[], round int64[])`` — the matched
    pairs (u < v) with the round each was selected in. The result is a
    matching (no two pairs share a vertex) and maximal (every edge of
    the graph touches a matched vertex); both invariants are
    pytest-enforced.
    """
    from .triangles import simple_undirected

    A = simple_undirected(edges_ds, n)
    live = A.select("triu", 1).ds.materialize()  # (u < v) distinct pairs

    def prio(batch: pa.Table) -> pa.Table:
        u = batch["src"].to_numpy(zero_copy_only=False)
        v = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"u": u, "v": v,
                         "p": _knuth32_packed(u, v, n)})

    live = live.map_batches(prio, batch_format="pyarrow").materialize()
    out_u, out_v, out_r = [], [], []
    rnd = 0
    while live.count() > 0:
        rnd += 1
        if max_rounds is not None and rnd > max_rounds:
            break

        def explode(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            p = batch["p"].to_numpy(zero_copy_only=False)
            return pa.table({"vid": np.concatenate([u, v]),
                             "p": np.concatenate([p, p])})

        vmin = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        for b in groupby_monoid(
                live.map_batches(explode, batch_format="pyarrow"),
                ["vid"], "p", monoid.min).iter_batches(
                batch_format="pyarrow"):
            vmin[b["vid"].to_numpy(zero_copy_only=False)] = \
                b["p"].to_numpy(zero_copy_only=False)
        vmin_ref = ray.put(vmin)

        def pick(batch: pa.Table) -> pa.Table:
            m = ray.get(vmin_ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            p = batch["p"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((p == m[u]) & (p == m[v])))

        matched = pa.concat_tables(
            list(live.map_batches(pick, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")) or
            [pa.table({"u": pa.array([], pa.int64()),
                       "v": pa.array([], pa.int64()),
                       "p": pa.array([], pa.int64())})],
            promote_options="permissive")
        if len(matched) == 0:  # pragma: no cover — local minima always exist
            raise RuntimeError("matching made no progress")
        mu = matched["u"].to_numpy(zero_copy_only=False)
        mv = matched["v"].to_numpy(zero_copy_only=False)
        out_u.append(mu)
        out_v.append(mv)
        out_r.append(np.full(len(mu), rnd, dtype=np.int64))

        dead = np.zeros(n, dtype=bool)
        dead[mu] = True
        dead[mv] = True
        dead_ref = ray.put(dead)

        def drop(batch: pa.Table) -> pa.Table:
            m = ray.get(dead_ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~m[u] & ~m[v]))

        live = live.map_batches(drop, batch_format="pyarrow").materialize()

    if not out_u:
        z = np.array([], dtype=np.int64)
        return z, z, z
    return (np.concatenate(out_u), np.concatenate(out_v),
            np.concatenate(out_r))


def maximal_matching_numpy(src, dst, n):
    """Single-process oracle: identical rounds on dense arrays."""
    s, d = np.asarray(src), np.asarray(dst)
    keep = s != d
    packed = np.unique(np.minimum(s[keep], d[keep]) * n
                       + np.maximum(s[keep], d[keep]))
    u, v = packed // n, packed % n
    p = _knuth32_packed(u, v, n)
    out = []
    rnd = 0
    while len(u):
        rnd += 1
        vmin = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(vmin, u, p)
        np.minimum.at(vmin, v, p)
        sel = (p == vmin[u]) & (p == vmin[v])
        out.append((u[sel], v[sel], np.full(int(sel.sum()), rnd)))
        dead = np.zeros(n, dtype=bool)
        dead[u[sel]] = True
        dead[v[sel]] = True
        alive = ~dead[u] & ~dead[v]
        u, v, p = u[alive], v[alive], p[alive]
    if not out:
        z = np.array([], dtype=np.int64)
        return z, z, z
    return (np.concatenate([o[0] for o in out]),
            np.concatenate([o[1] for o in out]),
            np.concatenate([o[2] for o in out]))
