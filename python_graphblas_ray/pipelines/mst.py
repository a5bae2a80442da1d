"""Minimum spanning forest — distributed Borůvka (1926; the GraphBLAS-
shaped MST: every round is one data-parallel min-reduction over the
edge stream, O(log n) rounds total).

Semantics: the input edge stream is an UNDIRECTED weighted multigraph;
``undirected_weights`` first collapses it to canonical simple-graph
rows ``(a < b, w)`` (one bounded grouped-sum exchange — the same
dedup-aggregate posture as ``contract_graph``). Borůvka then repeats:

1. every component picks its minimum incident cross-component edge
   under the STRICT total order ``(w, a, b)`` — ties cannot occur, so
   the minimum spanning forest is unique and any correct MST algorithm
   (the pytest oracle runs Kruskal) returns the identical edge set;
2. picked edges join the forest and their components merge (min-label
   connected components with pointer-jump compression).

Scale shape: the edge stream is never shuffled after the initial
canonicalization — each round is ONE ``map_batches`` pass emitting a
per-component candidate minimum per block (≤ 2·#components rows per
block, lexsort + segment-first, no per-edge Python), which the driver
merges the same way. Component labels are a per-vertex int64 array
broadcast once per round via ``ray.put`` — the same per-vertex-state
posture as the superstep engine's pinned vectors; past ~1e9 vertices
the hooking step itself moves into the engine's pointer-jumping
supersteps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..stages.reduce import grouped_agg


def undirected_weights(edges_ds, n):
    """(src, dst, val) multigraph rows → canonical undirected simple
    graph ``(a < b, w = Σ val)``; self-loops dropped."""

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        v = batch["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = s != d
        s, d, v = s[keep], d[keep], v[keep]
        return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d),
                         "w": v})

    rows = edges_ds.map_batches(canon, batch_format="pyarrow")
    return grouped_agg(rows, ["a", "b"], [("w", "sum", "w")])


def _cc_labels(n: int, eu: np.ndarray, ev: np.ndarray) -> np.ndarray:
    """Min-label connected components over a small edge list (driver
    side, all-vectorized): min-propagate + pointer-jump until fixpoint.
    """
    lab = np.arange(n, dtype=np.int64)
    while True:
        nxt = lab.copy()
        if len(eu):
            np.minimum.at(nxt, eu, lab[ev])
            np.minimum.at(nxt, ev, lab[eu])
        nxt = np.minimum(nxt, nxt[nxt])  # pointer jump halves tree depth
        if np.array_equal(nxt, lab):
            return lab
        lab = nxt


def mst_boruvka(edges_ds, n, max_rounds=None):
    """Minimum spanning forest of the undirected weighted graph.

    ``edges_ds``: canonical ``(a, b, w)`` rows (see
    ``undirected_weights``). Returns ``(forest, comp)`` where
    ``forest`` is a list of ``(round, a, b, w)`` numpy column tuples
    flattened into one dict of arrays, and ``comp`` is the final
    per-vertex component label array.
    """
    rounds = int(max_rounds) if max_rounds else max(
        1, int(np.ceil(np.log2(max(n, 2)))))
    comp = np.arange(n, dtype=np.int64)
    out_r, out_a, out_b, out_w = [], [], [], []

    for r in range(1, rounds + 1):
        cref = ray.put(comp)

        def cand(batch: pa.Table, _cref=cref) -> pa.Table:
            import ray as _r
            cp = _r.get(_cref)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            ca, cb = cp[a], cp[b]
            m = ca != cb
            a, b, w, ca, cb = a[m], b[m], w[m], ca[m], cb[m]
            c = np.concatenate([ca, cb])
            aa = np.concatenate([a, a])
            bb = np.concatenate([b, b])
            ww = np.concatenate([w, w])
            # per-component lexicographic min under (w, a, b): sort by
            # (c, w, a, b), keep the first row of each c-segment
            order = np.lexsort((bb, aa, ww, c))
            c, aa, bb, ww = c[order], aa[order], bb[order], ww[order]
            first = np.ones(len(c), dtype=bool)
            first[1:] = c[1:] != c[:-1]
            return pa.table({"c": c[first], "w": ww[first],
                             "a": aa[first], "b": bb[first]})

        parts = []
        for t in edges_ds.map_batches(
                cand, batch_format="pyarrow",
                batch_size=1 << 18).iter_batches(
                    batch_format="pyarrow", batch_size=None):
            if t.num_rows:
                parts.append(t)
        if not parts:
            break
        t = pa.concat_tables(parts)
        c = t["c"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, w, c))
        c, w, a, b = c[order], w[order], a[order], b[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        w, a, b = w[first], a[first], b[first]
        # two components may pick the same edge — dedupe on (a, b)
        key = a * np.int64(n) + b
        _, uniq = np.unique(key, return_index=True)
        a, b, w = a[uniq], b[uniq], w[uniq]
        out_r.append(np.full(len(a), r, dtype=np.int64))
        out_a.append(a)
        out_b.append(b)
        out_w.append(w)
        # hook + compress: new labels = CC of the accumulated forest
        # (Borůvka invariant: the component partition after round r IS
        # the connectivity of all edges selected so far)
        comp = _cc_labels(n, np.concatenate(out_a), np.concatenate(out_b))
    cat = (lambda xs: np.concatenate(xs) if xs
           else np.array([], dtype=np.int64))
    return {"r": cat(out_r), "a": cat(out_a), "b": cat(out_b),
            "w": (np.concatenate(out_w) if out_w
                  else np.array([], dtype=np.float64))}, comp


def mst_kruskal_numpy(a, b, w, n):
    """Driver-side Kruskal oracle under the same (w, a, b) strict total
    order — the forest is unique, so this must equal Borůvka's output
    edge set exactly."""
    order = np.lexsort((b, a, w))
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keep = []
    for i in order:
        ra, rb = find(int(a[i])), find(int(b[i]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            keep.append(i)
    keep = np.array(sorted(keep), dtype=np.int64)
    return a[keep], b[keep], w[keep]
