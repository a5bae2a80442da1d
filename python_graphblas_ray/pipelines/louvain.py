"""Louvain community detection — the reference's Louvain notebook
(``notebooks/Louvain.ipynb``: ``AdjMatrix.optimize_communities`` +
``louvain_levels``) re-expressed as distributed edge-table passes.

The reference optimizes one vertex at a time in random order (its
notebook lists several "common solutions" per graph); a distributed
engine can't serialize vertex visits, so this is the standard
synchronized parallel variant (Grappolo-style): each inner step, HALF
the vertices (alternating id parity) greedily move to the neighboring
community with the best modularity gain, simultaneously. Parity
alternation breaks the two-vertex swap cycles that full synchronous
moves oscillate on; ties break to the smallest community id, so runs
are deterministic. Conformance target is the notebook's CONTRACT —
modularity strictly increases level to level, the graph contracts, the
final partition's modularity lands in the notebook's published range —
not its visit-order-dependent exact labels.

Scale shape (100 TB rule): each inner step is ONE vectorized map over
the edge table (community lookup via a broadcast ``ray.put`` array)
into a combiner-backed ``groupby_monoid`` on (vertex, community) — the
k_i_in weights — then ONE hash-exchange by vertex with a vectorized
lexsort-argmax per partition. No per-vertex Python anywhere. Community
/ degree vectors are O(n) driver arrays (house style of
``pipelines/algorithms.py``); at vertex counts beyond driver memory the
same kernels co-partition those vectors with the exchange instead.
Levels after the first run on the CONTRACTED graph (communities ×
communities), which is orders of magnitude smaller.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.monoids import monoid
from ..stages.exchange import hash_exchange_apply
from ..stages.reduce import groupby_monoid


def _degrees_and_total(edges_ds, n):
    """Weighted degree vector ki (row sums of the symmetric adjacency)
    and 2m (total weight). One streaming pass."""
    ki = np.zeros(n, dtype=np.float64)
    for b in edges_ds.iter_batches(batch_format="pyarrow",
                                   batch_size=1 << 20):
        s = b["src"].to_numpy(zero_copy_only=False)
        w = b["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        np.add.at(ki, s, w)
    return ki, float(ki.sum())


def _modularity(edges_ds, comm, ki, two_m, resolution=1.0):
    """Q = Σ_in/2m − res·Σ_c (σ_c/2m)² over the symmetric edge table."""
    if two_m == 0:
        return 0.0
    comm_ref = ray.put(comm)

    def inw(batch: pa.Table) -> pa.Table:
        c = ray.get(comm_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"w": [float(w[c[s] == c[d]].sum())]})

    in_w = sum(b["w"].to_numpy(zero_copy_only=False).sum()
               for b in edges_ds.map_batches(
                   inw, batch_format="pyarrow").iter_batches(
                   batch_format="pyarrow"))
    sigma = np.bincount(comm, weights=ki, minlength=len(ki))
    return float(in_w / two_m
                 - resolution * np.sum((sigma / two_m) ** 2))


def _local_moves(edges_ds, n, ki, two_m, max_inner=20, resolution=1.0,
                 num_partitions=None):
    """Parity-alternating synchronized local-move phase. Returns the
    community vector (not relabeled)."""
    comm = np.arange(n, dtype=np.int64)
    if two_m == 0:
        return comm
    ki_ref = ray.put(ki)
    for it in range(max_inner):
        comm_ref = ray.put(comm)
        sigma = np.bincount(comm, weights=ki, minlength=n)
        sig_ref = ray.put(sigma)
        parity = it % 2

        def to_comm(batch: pa.Table) -> pa.Table:
            c = ray.get(comm_ref)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            w = (batch["val"].to_numpy(zero_copy_only=False)
                 .astype(np.float64))
            keep = s != d  # self-loops don't vote on moves
            return pa.table({"i": s[keep], "c": c[d[keep]],
                             "w": w[keep]})

        kin = groupby_monoid(edges_ds.map_batches(
            to_comm, batch_format="pyarrow"), ["i", "c"], "w",
            monoid.plus)

        def pick(table: pa.Table) -> pa.Table:
            if table.num_rows == 0:
                return pa.table({"vid": pa.array([], type=pa.int64()),
                                 "new": pa.array([], type=pa.int64())})
            cm = ray.get(comm_ref)
            sg = ray.get(sig_ref)
            kv = ray.get(ki_ref)
            i = table["i"].to_numpy(zero_copy_only=False)
            c = table["c"].to_numpy(zero_copy_only=False)
            kw = table["w"].to_numpy(zero_copy_only=False)
            stay = cm[i] == c
            # gain of being in c (σ excludes i itself when c is its own)
            sig_adj = sg[c] - np.where(stay, kv[i], 0.0)
            score = kw - resolution * kv[i] * sig_adj / two_m
            order = np.lexsort((c, -score, i))
            ii, cc, sc = i[order], c[order], score[order]
            first = np.ones(len(ii), dtype=bool)
            first[1:] = ii[1:] != ii[:-1]
            vid, best_c, best_s = ii[first], cc[first], sc[first]
            # stay score per vertex: its (i, cur) row if present, else
            # a zero-k_i_in stay at its current community
            cur = cm[vid]
            stay_s = -resolution * kv[vid] * (sg[cur] - kv[vid]) / two_m
            srows = stay
            if srows.any():
                pos = np.searchsorted(vid, i[srows])
                stay_s[pos] = score[srows]
            move = ((best_s > stay_s + 1e-12) & (best_c != cur)
                    & ((vid & 1) == parity))
            return pa.table({"vid": vid,
                             "new": np.where(move, best_c, cur)})

        new_comm = comm.copy()
        for b in hash_exchange_apply(
                kin, "i", pick,
                num_partitions=num_partitions).iter_batches(
                batch_format="pyarrow"):
            new_comm[b["vid"].to_numpy(zero_copy_only=False)] = (
                b["new"].to_numpy(zero_copy_only=False))
        if np.array_equal(new_comm, comm):
            if parity == 1:
                break  # neither parity class can improve
            comm = new_comm
            continue
        comm = new_comm
    return comm


def _contract(edges_ds, comm):
    """Edge table contracted onto communities (relabeled 0..k-1):
    (comm[src], comm[dst], Σw). Returns (new_edges_ds, k, mapping)."""
    uniq, dense = np.unique(comm, return_inverse=True)
    mapping = dense.astype(np.int64)
    map_ref = ray.put(mapping)

    def remap(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"src": m[s], "dst": m[d], "val": w})

    contracted = groupby_monoid(
        edges_ds.map_batches(remap, batch_format="pyarrow"),
        ["src", "dst"], "val", monoid.plus)
    return contracted.materialize(), len(uniq), mapping


def louvain(edges_ds, n, max_levels=10, max_inner=20, resolution=1.0,
            num_partitions=None):
    """Multi-level Louvain over a SYMMETRIC weighted edge table
    (``src, dst, val`` with both directions present, à la
    ``triangles.simple_undirected`` — weights allowed).

    Returns ``(community: int64[n] — final community per original
    vertex, relabeled dense, and levels: list of dicts with
    ``n_communities`` / ``modularity`` per completed level)``.
    """
    assignment = np.arange(n, dtype=np.int64)  # original vertex → comm
    cur_edges, cur_n = edges_ds, n
    levels = []
    for _ in range(max_levels):
        ki, two_m = _degrees_and_total(cur_edges, cur_n)
        comm = _local_moves(cur_edges, cur_n, ki, two_m,
                            max_inner=max_inner, resolution=resolution,
                            num_partitions=num_partitions)
        cur_edges, k, mapping = _contract(cur_edges, comm)
        # mapping[v] is vertex v's dense community (it already encodes
        # comm), so composing onto original vertices is one gather
        assignment = mapping[assignment]
        ki2, two_m2 = _degrees_and_total(cur_edges, k)
        q = _modularity(cur_edges, np.arange(k, dtype=np.int64), ki2,
                        two_m2, resolution)
        levels.append({"n_communities": int(k), "modularity": q})
        if k >= cur_n:  # no contraction → converged
            break
        cur_n = k
    return assignment, levels


def louvain_numpy(src, dst, n, max_levels=10, max_inner=20,
                  resolution=1.0):
    """Single-process oracle: same synchronized parity-alternating
    variant over a dense adjacency (small graphs)."""
    A = np.zeros((n, n), dtype=np.float64)
    np.add.at(A, (np.asarray(src), np.asarray(dst)), 1.0)
    A = np.maximum(A, A.T)  # symmetric simple view
    np.fill_diagonal(A, 0.0)
    assignment = np.arange(n, dtype=np.int64)
    levels = []
    cur = A
    while len(levels) < max_levels:
        m = cur.shape[0]
        ki = cur.sum(axis=1)
        two_m = ki.sum()
        comm = np.arange(m, dtype=np.int64)
        if two_m > 0:
            for it in range(max_inner):
                sigma = np.bincount(comm, weights=ki, minlength=m)
                new = comm.copy()
                for v in range(it % 2, m, 2):
                    if ki[v] == 0:
                        continue
                    nb = np.nonzero(cur[v])[0]
                    nb = nb[nb != v]  # self-loops don't vote on moves
                    kin = np.bincount(comm[nb], weights=cur[v][nb],
                                      minlength=m)
                    cand = np.nonzero(kin)[0]
                    cand = np.union1d(cand, [comm[v]])
                    sig_adj = sigma[cand] - np.where(
                        cand == comm[v], ki[v], 0.0)
                    sc = (kin[cand]
                          - resolution * ki[v] * sig_adj / two_m)
                    best = cand[np.lexsort((cand, -sc))[0]]
                    stay = sc[cand == comm[v]][0]
                    if (sc[cand == best][0] > stay + 1e-12
                            and best != comm[v]):
                        new[v] = best
                if np.array_equal(new, comm) and it % 2 == 1:
                    break
                comm = new
        uniq, dense = np.unique(comm, return_inverse=True)
        k = len(uniq)
        nxt = np.zeros((k, k), dtype=np.float64)
        np.add.at(nxt, (dense[np.repeat(np.arange(m), m)],
                        dense[np.tile(np.arange(m), m)]),
                  cur.ravel())
        assignment = dense[assignment]
        ki2 = nxt.sum(axis=1)
        t2 = ki2.sum()
        diag_in = np.trace(nxt)
        q = (0.0 if t2 == 0 else
             float(diag_in / t2
                   - resolution * np.sum((ki2 / t2) ** 2)))
        levels.append({"n_communities": int(k), "modularity": q})
        if k >= m:
            break
        cur = nxt
    return assignment, levels


def modularity(edges_ds, labels, n, resolution=1.0):
    """Public modularity of an arbitrary vertex labeling over a
    SYMMETRIC weighted edge table (the quality metric behind Louvain,
    exposed standalone so any partition — LPA, components, a domain
    mapping — can be scored): ``Q = Σ_in/2m − res·Σ_c (σ_c/2m)²``.
    One broadcast of the label vector + one streaming pass for the
    intra-community weight; degrees come from the same pass machinery
    Louvain uses. Returns a float."""
    labels = np.asarray(labels, dtype=np.int64)
    ki, two_m = _degrees_and_total(edges_ds, n)
    return _modularity(edges_ds, labels, ki, two_m,
                       resolution=resolution)


def conductance(edges_ds, labels, n, k=None):
    """Per-community conductance of an arbitrary vertex labeling over a
    SYMMETRIC edge table — the cut-quality twin of :func:`modularity`
    (how leaky each community is): ``φ(c) = cut(c) / min(vol(c),
    2m − vol(c))`` where ``vol`` is the community's total degree and
    ``cut`` the number of (directed-symmetric) edges leaving it.

    Scale shape: ONE streaming ``map_batches`` pass over the edge
    stream; each block contributes a single k×k label-pair bincount
    partial (k = number of communities — tiny), driver-summed.
    The corpus-size edge table never shuffles. Counts are INTEGERS, φ
    is one IEEE divide — bit-exact against a SQL twin, no grain.

    Returns an Arrow table ``(comm, cut, vol, phi)`` for non-empty
    communities in ascending id (``phi = 0.0`` for a community with no
    volume complement, matching the degenerate-single-community case).
    """
    labels = np.asarray(labels, dtype=np.int64)
    if k is None:
        k = int(labels.max()) + 1 if len(labels) else 0
    if k == 0:
        return pa.table({"comm": pa.array([], pa.int64()),
                         "cut": pa.array([], pa.int64()),
                         "vol": pa.array([], pa.int64()),
                         "phi": pa.array([], pa.float64())})
    lab_ref = ray.put(labels)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pa.table({"m": pa.array([], pa.int64())})
        lab = ray.get(lab_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        m = np.bincount(lab[s] * k + lab[d], minlength=k * k)
        return pa.table({"m": m.astype(np.int64)})

    M = np.zeros(k * k, dtype=np.int64)
    for b in edges_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if b.num_rows:  # a batch may stack several blocks' partials
            M += b["m"].to_numpy(zero_copy_only=False) \
                .reshape(-1, k * k).sum(axis=0)
    M = M.reshape(k, k)
    vol = M.sum(axis=1)
    cut = vol - np.diag(M)
    two_m = int(vol.sum())
    keep = vol > 0
    comm = np.flatnonzero(keep).astype(np.int64)
    v, c = vol[keep], cut[keep]
    denom = np.minimum(v, two_m - v)
    phi = np.where(denom > 0, c / np.maximum(denom, 1).astype(np.float64),
                   0.0)
    return pa.table({"comm": comm, "cut": c.astype(np.int64),
                     "vol": v.astype(np.int64), "phi": phi})
