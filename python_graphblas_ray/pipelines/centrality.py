"""Betweenness centrality (Brandes) over the superstep engine — the
level-synchronous push/pull formulation LAGraph ships as
``LAGraph_VertexCentrality_Betweenness``: forward BFS waves accumulate
shortest-path counts σ; a backward sweep by descending level accumulates
dependencies δ. Exact for the given source set; sampling sources is the
standard approximation at scale.

Engine mapping: the forward wave is ``spmv_masked("plus_second", σ,
frontier)`` on the FORWARD engine (sum of σ over in-edges from the
frontier); the backward wave needs out-edge sums, i.e. the same kernel on
an engine built over the REVERSED edge table. Both engines pin their CSR
blocks once and serve every (source, level) step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.superstep import SuperstepEngine


def reverse_edges(edges_ds):
    def swap(batch: pa.Table) -> pa.Table:
        cols = {"src": batch["dst"], "dst": batch["src"]}
        if "val" in batch.column_names:
            cols["val"] = batch["val"]
        return pa.table(cols)

    return edges_ds.map_batches(swap, batch_format="pyarrow")


def betweenness(engine_fwd: SuperstepEngine, engine_rev: SuperstepEngine,
                sources) -> np.ndarray:
    """Betweenness over directed edges for the given source set.

    ``engine_fwd``: built on (src, dst) — aggregates into dst over
    in-edges. ``engine_rev``: built on the reversed table — aggregates
    into src over out-edges. Returns the (unnormalized) centrality
    vector; divide by len(sources)/n for the sampled estimate.
    """
    n = engine_fwd.n
    bc = np.zeros(n)
    for s in np.asarray(sources, dtype=np.int64):
        # ---- forward: levels + path counts σ ----
        sigma = np.zeros(n)
        sigma[s] = 1.0
        level = np.full(n, -1, dtype=np.int64)
        level[s] = 0
        frontier = np.zeros(n, dtype=bool)
        frontier[s] = True
        frontiers = [frontier.copy()]
        lvl = 0
        while True:
            # Σ σ[u] over in-edges (u, v) with u in the frontier
            pushed = engine_fwd.spmv_masked("plus_second", sigma, frontier)
            new = (pushed > 0) & (level < 0)
            if not new.any():
                break
            lvl += 1
            level[new] = lvl
            sigma[new] = pushed[new]
            frontier = new
            frontiers.append(frontier.copy())

        # ---- backward: dependency accumulation δ ----
        delta = np.zeros(n)
        inv_sigma = np.where(sigma > 0, 1.0 / np.maximum(sigma, 1e-300),
                             0.0)
        for back in range(len(frontiers) - 1, 0, -1):
            wave = frontiers[back]          # vertices at level `back`
            prev = frontiers[back - 1]      # their predecessors' level
            x = np.where(wave, (1.0 + delta) * inv_sigma, 0.0)
            # Σ over out-edges (v, w) with w at level `back`:
            # reversed engine aggregates into src
            pulled = engine_rev.spmv_masked("plus_second", x, wave)
            delta[prev] += sigma[prev] * pulled[prev]
        bc += delta
        bc[s] -= delta[s]  # source excluded from its own accumulation
    return bc


def betweenness_numpy(src, dst, n, sources) -> np.ndarray:
    """Single-process Brandes oracle (adjacency lists)."""
    import collections

    adj = collections.defaultdict(list)
    for u, v in zip(src, dst):
        adj[int(u)].append(int(v))
    bc = np.zeros(n)
    for s in sources:
        sigma = np.zeros(n)
        sigma[s] = 1.0
        dist = np.full(n, -1, dtype=np.int64)
        dist[s] = 0
        order = [s]
        queue = collections.deque([s])
        preds = collections.defaultdict(list)
        while queue:
            u = queue.popleft()
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    queue.append(w)
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = np.zeros(n)
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc
