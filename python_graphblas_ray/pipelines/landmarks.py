"""Landmark (pivot) distance sketches — approximate shortest-path
queries over the web graph.

The classic web-scale distance-oracle construction (Goldberg et al.'s
ALT / landmark family; Potamias et al. 2009 "Fast shortest path
distance estimation in large networks"): pick a small set of landmark
vertices, compute exact BFS distances between every vertex and every
landmark ONCE, then answer arbitrary s→t distance queries in O(L) from
the triangle inequality — ``d(s,t) ≤ min_l d(s,l) + d(l,t)`` — without
touching the graph again. This is how distance features are served at
10¹²-vertex scale, where per-query BFS is impossible.

Engine shape: ALL landmark BFS trees run in ONE fixpoint. Each vertex
carries a uint64 bitset register (bit ``l`` = reached from
``landmarks[l]``), iterated through the same vectorized
``register_step`` reduceat kernel ANF uses (⊕ = bitwise OR over the
pinned CSC blocks) — L ≤ 64 sources cost the same supersteps as one,
instead of L sequential ``bfs_level`` runs. Newly-set bits at round t
have distance exactly t (BFS level = shortest path on unweighted
edges). Driver state is the n-word register vector plus the n×L int32
distance matrix — O(n·L); the per-round dense register broadcast shares
ANF's scale notes (the fused in-actor form à la ``anf_inactor`` is the
10¹²-vertex path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def landmark_distances(engine, landmarks, tmax=None):
    """Exact BFS distances FROM each landmark (along edge direction,
    matching ``bfs_level``) for all n vertices, batched through the
    bitset register fixpoint described in the module docstring.

    Returns ``dist`` int32[n, L]: ``dist[v, l]`` = d(landmarks[l] → v),
    ``-1`` where unreached; ``dist[landmarks[l], l] == 0``."""
    landmarks = np.asarray(landmarks, dtype=np.int64)
    L = len(landmarks)
    if L > 64:
        raise ValueError("one uint64 bitset register: at most 64 "
                         "landmarks per pass (run multiple passes)")
    n = engine.n
    regs = np.zeros((n, 1), dtype=np.uint64)
    bits = np.uint64(1) << np.arange(L, dtype=np.uint64)
    np.bitwise_or.at(regs[:, 0], landmarks, bits)
    dist = np.full((n, L), -1, dtype=np.int32)
    dist[landmarks, np.arange(L)] = 0
    lanes = np.arange(L, dtype=np.uint64)
    t = 0
    tmax = int(tmax) if tmax is not None else n
    while t < tmax:
        t += 1
        stepped = engine.register_step(regs, op="or")
        merged = np.bitwise_or(regs[:, 0], stepped[:, 0])
        fresh = np.bitwise_and(merged, np.bitwise_not(regs[:, 0]))
        rows = np.nonzero(fresh)[0]
        if not len(rows):
            break
        # expand the fresh bits to (rows, lane) index pairs — one
        # vectorized test per landmark lane, no per-vertex Python
        hit = ((fresh[rows, None] >> lanes[None, :])
               & np.uint64(1)).astype(bool)
        r_idx, l_idx = np.nonzero(hit)
        dist[rows[r_idx], l_idx] = t
        regs[:, 0] = merged
    return dist


def landmark_sketch(engine, landmarks, tmax=None):
    """Both directions of the landmark oracle: ``dist_from[v, l]`` =
    d(landmark_l → v) on this engine, and ``dist_to[v, l]`` =
    d(v → landmark_l) via one reverse pass over the actor-derived
    transposed engine (``SuperstepEngine.transposed()`` — reversed-edge
    exchange, no second build). Returns ``(dist_to, dist_from)``."""
    dist_from = landmark_distances(engine, landmarks, tmax)
    eng_t = engine.transposed()
    try:
        dist_to = landmark_distances(eng_t, landmarks, tmax)
    finally:
        eng_t.shutdown()
    return dist_to, dist_from


def estimate_distance(dist_to, dist_from, s, t):
    """Triangle-inequality upper bound for d(s→t): the landmark routing
    ``min_l d(s→l) + d(l→t)`` over landmarks reachable from both sides.
    ``s``/``t`` are int arrays (vectorized query batch); returns
    int32[-1 where no landmark connects the pair]. Exact whenever a
    shortest s→t path passes through a landmark (in particular when s
    or t IS a landmark)."""
    s = np.atleast_1d(np.asarray(s, dtype=np.int64))
    t = np.atleast_1d(np.asarray(t, dtype=np.int64))
    a = dist_to[s].astype(np.int64)      # (m, L) d(s -> l)
    b = dist_from[t].astype(np.int64)    # (m, L) d(l -> t)
    ok = (a >= 0) & (b >= 0)
    total = np.where(ok, a + b, np.iinfo(np.int64).max)
    est = total.min(axis=1)
    return np.where(est == np.iinfo(np.int64).max, -1,
                    est).astype(np.int32)


def distances_table(dist, landmarks):
    """Long-form pyarrow Table ``(lm, vid, dist)`` of the REACHED
    (landmark, vertex) pairs — the oracle-checkable export."""
    landmarks = np.asarray(landmarks, dtype=np.int64)
    vids, lanes = np.nonzero(dist >= 0)
    return pa.table({
        "lm": landmarks[lanes],
        "vid": vids.astype(np.int64),
        "dist": dist[vids, lanes].astype(np.int64),
    })
