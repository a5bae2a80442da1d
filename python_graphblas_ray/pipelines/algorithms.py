"""Graph algorithms over the superstep engine.

Each driver loop replicates the reference's recipe EXACTLY (superstep
count and convergence semantics must match — SURVEY.md §2.7):

- ``pagerank``   — ``pagerank_3f`` from ``notebooks/Pagerank Demo.ipynb``
  (LAGraph_pagerank3f): no dangling redistribution, ``rdiff = sum|t-r|``,
  stop when ``rdiff <= tol`` checked at loop top.
- ``connected_components`` — ``fastSV`` from ``notebooks/Connected
  Components -- FastSV.ipynb``: min_second hooking, shortcutting,
  grandparent gather ``gp = f[f]``.
- ``bfs_level``  — ``notebooks/Example B.1 -- Level BFS.ipynb``:
  ``q<(~v.S)> << any_pair(A.T @ q)``.
- ``sssp``       — ``docs/getting_started/primer.rst:210-250``:
  ``v(min) << min_plus(A.T @ v)`` to fixpoint.
- ``label_propagation`` — synchronous LPA with deterministic min-label
  tie-break (``notebooks/Louvain.ipynb`` family; exactness contract).

The O(E) work per superstep runs in the pinned partition actors
(``state/superstep.py``); the O(V) vector updates are vectorized numpy on
the driver, standing in for a range-partitioned vertex dataset (each slice
maps 1:1 to a partition at scale; see superstep.py scale notes).

Edge-table conventions: edge (src, dst) = link src→dst; the engine's
``spmv`` aggregates into ``dst`` reading the vector at ``src`` — exactly
``A.T @ x`` in reference orientation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.checkpoint import CheckpointManager, SuperstepMetrics
from ..state.superstep import SuperstepEngine


def symmetrize(edges_ds):
    """A ∪ A.T (undirected view) — union of the edge table with its swap.
    The union is a MULTISET here (reciprocal pairs / self-loops appear
    twice); ``build_engine(undirected=True)`` passes ``dedupe=True`` so
    the pinned actors collapse duplicates — required for LPA's mode
    counts (min/lor kernels are idempotent and wouldn't care)."""

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "dst": batch["src"],
                         "val": batch["val"]})

    return edges_ds.union(edges_ds.map_batches(swap, batch_format="pyarrow"))


def build_engine(edges_ds, n, num_partitions=None, weighted=False,
                 undirected=False, **engine_kwargs):
    """``engine_kwargs`` pass through to ``SuperstepEngine`` (e.g.
    ``partition_mode="scan"``, ``hub_split_factor=...``). All algorithm
    kernels — including LPA's mode, which count-merges sparse partials
    across split hub partitions — are hub-split-safe.

    ``num_partitions=None`` (and an unset ``hub_split_factor``) read
    the global :mod:`~python_graphblas_ray.config` defaults."""
    from .._config import config

    if num_partitions is None:
        num_partitions = config["num_partitions"]
    if (config["hub_split_factor"] is not None
            and "hub_split_factor" not in engine_kwargs):
        engine_kwargs["hub_split_factor"] = config["hub_split_factor"]
    if undirected:
        edges_ds = symmetrize(edges_ds)
        engine_kwargs.setdefault("dedupe", True)
    return SuperstepEngine(edges_ds, n, num_partitions=num_partitions,
                           weighted=weighted, **engine_kwargs)


def pagerank(engine: SuperstepEngine, damping=0.85, itermax=100, tol=1e-4,
             checkpoint: CheckpointManager | None = None,
             checkpoint_every=10, metrics: SuperstepMetrics | None = None,
             personalization=None, weighted=False, dangling=None):
    """LAGraph pagerank_3f (reference notebook, FP64 here).

    Returns ``(r, iters, metrics)``; ``iters`` matches the reference's
    returned ``i`` (number of completed update supersteps).

    Per iteration: ``w = t/d_scaled`` on vertices with out-degree (dangling
    vertices contribute nothing — ewise_mult intersection semantics),
    ``r = teleport + A.T@w (plus_second)``, ``rdiff = sum|t - r|``.

    ``personalization``: optional per-vertex teleport distribution
    (sums to 1) — personalized PageRank; ``None`` = uniform 1/n.

    ``weighted=True``: transition probability proportional to edge
    weight — normalize by the weighted OUT-STRENGTH and push through a
    ``plus_times`` spmv (engine must be built with ``weighted=True``);
    with unit weights this is numerically identical to the unweighted
    recipe.

    ``dangling="redistribute"``: classic (networkx/Google-matrix)
    semantics — each iteration the damped rank mass sitting on
    out-degree-0 vertices is spread over the teleport distribution
    (``r += damping·Σ t[dangling] · p``), equivalent to giving every
    dangling vertex uniform out-edges; rank then sums to 1 each
    iteration. Default ``None`` keeps the LAGraph-3f drop semantics
    (mass on dangling vertices leaks). One extra O(n) driver term, no
    engine change.
    """
    n = engine.n
    metrics = metrics or SuperstepMetrics()
    if dangling not in (None, "redistribute"):
        raise ValueError(f"unknown dangling mode: {dangling!r}")
    if personalization is not None:
        p = np.asarray(personalization, dtype=np.float64)
        teleport = (1.0 - damping) * p
    else:
        teleport = (1.0 - damping) / n
    spmv_kind = "plus_times" if weighted else "plus_second"
    d_out = (engine.out_strengths() if weighted
             else engine.out_degrees()).astype(np.float64)
    has_out = d_out > 0
    d_scaled = np.where(has_out, d_out / damping, 1.0)
    p_vec = None
    if dangling == "redistribute":
        p_vec = (p if personalization is not None
                 else np.full(n, 1.0 / n))

    start_iter = 0
    r = (p.copy() if personalization is not None
         else np.full(n, 1.0 / n))
    rdiff = 1.0  # "first iteration is always done"
    if checkpoint is not None:
        latest = checkpoint.latest()
        if latest is not None:
            it, manifest = latest
            vecs, _ = checkpoint.load(it)
            r = vecs["r"]
            rdiff = manifest["metrics"].get("rdiff", 1.0)
            start_iter = it + 1

    i = start_iter
    for i in range(start_iter, itermax):
        if rdiff <= tol:
            break
        t = r
        w = np.where(has_out, t / d_scaled, 0.0)
        r = engine.spmv(spmv_kind, w) + teleport
        if p_vec is not None:
            r = r + damping * float(t[~has_out].sum()) * p_vec
        rdiff = float(np.abs(t - r).sum())
        metrics.record(i, algorithm="pagerank", rdiff=rdiff,
                       edges=engine.num_edges)
        if checkpoint is not None and (i + 1) % checkpoint_every == 0:
            checkpoint.save(i, {"r": r}, metrics={"rdiff": rdiff},
                            lineage=[{"superstep": i,
                                      "partitions": engine.partition_stats}])
    return r, i, metrics


def pagerank_numpy(src, dst, n, damping=0.85, itermax=100, tol=1e-4,
                   dtype=np.float64, personalization=None, w=None,
                   dangling=None):
    """Single-process oracle — the same recipe in pure numpy (plays the
    role of running the reference's pagerank_3f; tests assert allclose
    1e-6 AND identical superstep count). ``w``: edge weights for the
    weighted variant (out-strength normalization + weighted push);
    ``dangling="redistribute"`` mirrors the classic-semantics mode."""
    d_out = (np.bincount(src, weights=w, minlength=n).astype(dtype)
             if w is not None
             else np.bincount(src, minlength=n).astype(dtype))
    has_out = d_out > 0
    d_scaled = np.where(has_out, d_out / dtype(damping), 1.0)
    if personalization is not None:
        p = np.asarray(personalization, dtype=dtype)
        teleport = (1.0 - damping) * p
        r = p.copy()
    else:
        teleport = (1.0 - damping) / n
        r = np.full(n, 1.0 / n, dtype=dtype)
    p_vec = None
    if dangling == "redistribute":
        p_vec = (np.asarray(personalization, dtype=dtype)
                 if personalization is not None
                 else np.full(n, 1.0 / n, dtype=dtype))
    rdiff = 1.0
    i = 0
    for i in range(itermax):
        if rdiff <= tol:
            break
        t = r
        x = np.where(has_out, t / d_scaled, 0.0)
        push = x[src] if w is None else w * x[src]
        r = np.bincount(dst, weights=push, minlength=n).astype(dtype) \
            + teleport
        if p_vec is not None:
            r = r + dtype(damping) * t[~has_out].sum() * p_vec
        rdiff = float(np.abs(t - r).sum())
    return r, i


def connected_components(engine: SuperstepEngine,
                         metrics: SuperstepMetrics | None = None,
                         checkpoint: CheckpointManager | None = None,
                         checkpoint_every=5):
    """FastSV exact min-label components (engine must be built with
    ``undirected=True``). Returns ``(f, supersteps, metrics)`` where
    ``f[i]`` = smallest vertex id in i's component.

    ``checkpoint``: per-partition Parquet snapshots of the (f, gp)
    state every ``checkpoint_every`` supersteps; a restarted run
    resumes from the latest snapshot (same protocol as
    :func:`pagerank`)."""
    n = engine.n
    metrics = metrics or SuperstepMetrics()
    f = np.arange(n, dtype=np.int64)
    gp = f.copy()
    gp_dup = gp.copy()
    it = 0
    if checkpoint is not None:
        latest = checkpoint.latest()
        if latest is not None:
            ck_it, _ = latest
            vecs, _ = checkpoint.load(ck_it)
            f = vecs["f"].astype(np.int64)
            gp = vecs["gp"].astype(np.int64)
            gp_dup = vecs["gp_dup"].astype(np.int64)
            it = ck_it + 1
    while True:
        # Step 1: hooking — mngp = min_second(A @ gp)
        mngp = engine.spmv("min_second", gp.astype(np.float64))
        present = np.isfinite(mngp)
        mngp_i = np.where(present, mngp, np.inf)
        f = np.minimum(f, np.where(present, mngp_i, np.inf)).astype(np.int64)
        # Step 2: shortcutting — f = min(f | gp)
        f = np.minimum(f, gp)
        # Step 3: grandparents — gp = f[f]
        gp = f[f]
        changed = bool(np.any(gp != gp_dup))
        metrics.record(it, algorithm="fastsv", changed=changed,
                       components=int(len(np.unique(gp))))
        gp_dup = gp.copy()
        if checkpoint is not None and (it + 1) % checkpoint_every == 0:
            checkpoint.save(
                it, {"f": f, "gp": gp, "gp_dup": gp_dup},
                metrics={"changed": changed},
                lineage=[{"superstep": it,
                          "partitions": engine.partition_stats}])
        it += 1
        if not changed:
            break
    return f, it, metrics


def connected_components_numpy(src, dst, n):
    """Single-process FastSV oracle (same recipe, symmetrized input)."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    f = np.arange(n, dtype=np.int64)
    gp = f.copy()
    gp_dup = gp.copy()
    while True:
        mngp = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mngp, s, gp[d])
        f = np.minimum(f, mngp)
        f = np.minimum(f, gp)
        gp = f[f]
        if not np.any(gp != gp_dup):
            break
        gp_dup = gp.copy()
    return f


def bfs_level(engine: SuperstepEngine, source: int,
              metrics: SuperstepMetrics | None = None):
    """Level BFS along edge direction (reference Example B.1). Returns
    int64 levels, -1 = unreached."""
    n = engine.n
    metrics = metrics or SuperstepMetrics()
    v = np.full(n, -1, dtype=np.int64)
    v[source] = 0
    q = np.zeros(n, dtype=bool)
    q[source] = True
    level = 1
    while q.any():
        # frontier-masked push: only edges whose src is in the frontier
        # are touched (work ∝ frontier out-edges, not E per level)
        reached = engine.spmv_masked("plus_second",
                                     q.astype(np.float64), q)
        q = (reached > 0) & (v < 0)  # q<(~v.S)> masked push
        v[q] = level
        metrics.record(level, algorithm="bfs", frontier=int(q.sum()))
        level += 1
    return v, metrics


def bfs_parent(engine: SuperstepEngine, source: int,
               metrics: SuperstepMetrics | None = None):
    """Parent BFS (reference ``notebooks/Example B.3 -- Parent BFS.ipynb``
    — the ``min_secondi`` semiring recipe): each vertex discovered at
    level L gets as parent the SMALLEST id among its level-(L-1)
    in-neighbors (deterministic). ``parent[source] = source``; -1 =
    unreached. The ``min_secondi`` reduce is expressed as ``min_second``
    over the identity vector (x[u] = u)."""
    n = engine.n
    metrics = metrics or SuperstepMetrics()
    parent = np.full(n, -1, dtype=np.int64)
    parent[source] = source
    q = np.zeros(n, dtype=bool)
    q[source] = True
    ids = np.arange(n, dtype=np.float64)
    level = 1
    while q.any():
        cand = engine.spmv_masked("min_second", ids, q)
        q = np.isfinite(cand) & (parent < 0)
        parent[q] = cand[q].astype(np.int64)
        metrics.record(level, algorithm="bfs_parent",
                       frontier=int(q.sum()))
        level += 1
    return parent, metrics


def bfs_parent_numpy(src, dst, n, source):
    """Single-process oracle for the same deterministic parent BFS."""
    parent = np.full(n, -1, dtype=np.int64)
    parent[source] = source
    q = np.zeros(n, dtype=bool)
    q[source] = True
    src = np.asarray(src)
    dst = np.asarray(dst)
    while q.any():
        sel = q[src]
        cand = np.full(n, n, dtype=np.int64)
        np.minimum.at(cand, dst[sel], src[sel])
        q = (cand < n) & (parent < 0)
        parent[q] = cand[q]
    return parent


def sssp(engine: SuperstepEngine, source: int,
         metrics: SuperstepMetrics | None = None, itermax=None):
    """Bellman-Ford fixpoint of ``v(min) << min_plus(A.T @ v)`` (reference
    primer.rst:210-250). Engine must be built with ``weighted=True``.
    Returns float64 distances, inf = unreachable."""
    n = engine.n
    metrics = metrics or SuperstepMetrics()
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    active = np.zeros(n, dtype=bool)
    active[source] = True
    it = 0
    itermax = itermax or n
    while it < itermax and active.any():
        # delta relaxation: only out-edges of vertices whose distance
        # improved last round can improve anything this round
        nd = engine.spmv_masked("min_plus", dist, active)
        new = np.minimum(dist, nd)
        active = new < dist
        metrics.record(it, algorithm="sssp",
                       settled=int(np.isfinite(new).sum()))
        dist = new
        it += 1
    return dist, metrics


def label_propagation(engine: SuperstepEngine, itermax=100,
                      metrics: SuperstepMetrics | None = None,
                      checkpoint: CheckpointManager | None = None,
                      checkpoint_every=5):
    """Synchronous LPA, deterministic: each vertex takes the most frequent
    neighbor label, ties → smallest label; keeps its own when it has no
    neighbors. Stops when labels stop changing. Engine must be undirected.
    Returns ``(labels, iters, metrics)``.

    ``checkpoint``: label-vector snapshots + resume, same protocol as
    :func:`pagerank` / :func:`connected_components`."""
    n = engine.n
    metrics = metrics or SuperstepMetrics()
    labels = np.arange(n, dtype=np.int64)
    start = 0
    if checkpoint is not None:
        latest = checkpoint.latest()
        if latest is not None:
            ck_it, _ = latest
            vecs, _ = checkpoint.load(ck_it)
            labels = vecs["labels"].astype(np.int64)
            start = ck_it + 1
    it = start
    for it in range(start, itermax):
        mode = engine.mode(labels)
        new = np.where(mode >= 0, mode, labels)
        changed = bool(np.any(new != labels))
        metrics.record(it, algorithm="lpa",
                       distinct=int(len(np.unique(new))))
        labels = new
        if checkpoint is not None and (it + 1) % checkpoint_every == 0:
            checkpoint.save(
                it, {"labels": labels},
                metrics={"changed": changed},
                lineage=[{"superstep": it,
                          "partitions": engine.partition_stats}])
        if not changed:
            break
    return labels, it + 1, metrics


def label_propagation_numpy(src, dst, n, itermax=100):
    """Single-process oracle for the same deterministic synchronous LPA
    (symmetrized, SET-union semantics: reciprocal pairs vote once)."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    packed = np.unique(s * np.int64(n) + d)
    s, d = packed // n, packed % n
    labels = np.arange(n, dtype=np.int64)
    for _ in range(itermax):
        lab = labels[s]
        packed = (d.astype(np.int64) << np.int64(31)) | lab
        uniq, counts = np.unique(packed, return_counts=True)
        ud = uniq >> np.int64(31)
        ul = uniq & np.int64((1 << 31) - 1)
        order = np.lexsort((ul, -counts, ud))
        ud_s = ud[order]
        first = np.empty(len(ud_s), dtype=bool)
        mode = np.full(n, -1, dtype=np.int64)
        if len(ud_s):
            first[0] = True
            first[1:] = ud_s[1:] != ud_s[:-1]
            mode[ud_s[first]] = ul[order][first]
        new = np.where(mode >= 0, mode, labels)
        if not np.any(new != labels):
            return new
        labels = new
    return labels


def hits(engine: SuperstepEngine, engine_t: SuperstepEngine | None = None,
         itermax=100, tol=1e-8,
         metrics: SuperstepMetrics | None = None):
    """HITS hubs & authorities (Kleinberg power iteration, 2-norm
    normalized): ``a = normalize(A.T @ h)``, ``h = normalize(A @ a)``,
    stop when ``max|h - h_prev| <= tol`` checked after the update.

    Runs on a PAIR of pinned engines — this engine computes ``A.T @ x``
    (its spmv aggregates into dst); ``engine_t`` computes ``A @ x`` and
    is derived actor-side via ``engine.transposed()`` when not supplied
    (reversed-edge exchange reusing the directed partitioning — no
    second build). Per iteration: two spmv supersteps, O(n) driver
    vector math — identical distribution shape to ``pagerank``.

    Returns ``(hubs, authorities, iters, metrics)``.
    """
    metrics = metrics or SuperstepMetrics()
    own_t = engine_t is None
    if own_t:
        engine_t = engine.transposed()
    n = engine.n
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    it = 0
    try:
        for it in range(itermax):
            a = engine.spmv("plus_second", h)
            norm = np.linalg.norm(a)
            if norm > 0:
                a /= norm
            h_new = engine_t.spmv("plus_second", a)
            norm = np.linalg.norm(h_new)
            if norm > 0:
                h_new /= norm
            delta = float(np.abs(h_new - h).max())
            h = h_new
            metrics.record(it, algorithm="hits", delta=delta,
                           edges=engine.num_edges)
            if delta <= tol:
                break
    finally:
        if own_t:
            engine_t.shutdown()
    return h, a, it + 1, metrics


def hits_numpy(src, dst, n, itermax=100, tol=1e-8):
    """Single-process oracle replicating ``hits`` exactly (same update
    order, normalization, and stop check — iteration counts must
    match)."""
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    it = 0
    for it in range(itermax):
        a = np.bincount(dst, weights=h[src], minlength=n)
        norm = np.linalg.norm(a)
        if norm > 0:
            a /= norm
        h_new = np.bincount(src, weights=a[dst], minlength=n)
        norm = np.linalg.norm(h_new)
        if norm > 0:
            h_new /= norm
        delta = float(np.abs(h_new - h).max())
        h = h_new
        if delta <= tol:
            break
    return h, a, it + 1


def hits_fixed(engine: SuperstepEngine,
               engine_t: SuperstepEngine | None = None, iters=3):
    """Fixed-iteration HITS with normalization ONLY at the end.

    ``h₀ = 1``; k-th iteration: ``a = A.T @ h`` then ``h = A @ a``
    (plus_second spmv on the engine pair, like :func:`hits`), with NO
    per-iteration normalization — so every intermediate value is an
    exact-integer path count (doubles stay exact below 2⁵³; at 512
    vertices / ~10⁵ edges three iterations peak around 10¹³). The single
    final L2 normalization is the only float division, which is what
    makes the operator SQL-reproducible to the driver's 8-decimal grain
    — the per-iteration-normalized variant (:func:`hits`) stays the
    convergence-checked rows-only query.

    Returns ``(hubs, authorities)``; both L2-normalized.
    """
    own_t = engine_t is None
    if own_t:
        engine_t = engine.transposed()
    n = engine.n
    h = np.ones(n)
    a = np.zeros(n)
    try:
        for _ in range(iters):
            a = engine.spmv("plus_second", h)
            h = engine_t.spmv("plus_second", a)
    finally:
        if own_t:
            engine_t.shutdown()
    nh, na = np.linalg.norm(h), np.linalg.norm(a)
    return (h / nh if nh > 0 else h), (a / na if na > 0 else a)


def hits_fixed_numpy(src, dst, n, iters=3):
    """Single-process oracle replicating :func:`hits_fixed` exactly."""
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.bincount(dst, weights=h[src], minlength=n)
        h = np.bincount(src, weights=a[dst], minlength=n)
    nh, na = np.linalg.norm(h), np.linalg.norm(a)
    return (h / nh if nh > 0 else h), (a / na if na > 0 else a)


def salsa_fixed(engine: SuperstepEngine,
                engine_t: SuperstepEngine | None = None, iters=3):
    """SALSA (Lempel–Moran 2001), fixed iterations: HITS with the
    mutual-reinforcement sums degree-normalized, i.e. a random walk on
    the hub–authority bipartite graph instead of raw path counting —
    authority ``a(i) = Σ_{(j,i)∈E} h(j)/outdeg(j)``, hub
    ``h(j) = Σ_{(j,i)∈E} a(i)/indeg(i)`` (multigraph: parallel edges
    contribute multiply, degrees count them). The normalization damps
    the tightly-knit-community effect that makes raw HITS topic-drift.

    Same engine-pair shape as :func:`hits_fixed`: two plus_second spmv
    supersteps per iteration, O(n) driver scaling; ``h₀ = 1``, no
    intermediate normalization (mass is conserved by the stochastic
    scaling, so values stay O(n)), one final L2 normalization — which
    keeps the operator SQL-reproducible at the 8-decimal grain.

    Returns ``(hubs, authorities)``; both L2-normalized.
    """
    own_t = engine_t is None
    if own_t:
        engine_t = engine.transposed()
    n = engine.n
    d_out = engine.out_degrees().astype(np.float64)
    d_in = engine.spmv("plus_second", np.ones(n))  # multigraph in-degree
    inv_out = np.where(d_out > 0, 1.0 / d_out, 0.0)
    inv_in = np.where(d_in > 0, 1.0 / d_in, 0.0)
    h = np.ones(n)
    a = np.zeros(n)
    try:
        for _ in range(iters):
            a = engine.spmv("plus_second", h * inv_out)
            h = engine_t.spmv("plus_second", a * inv_in)
    finally:
        if own_t:
            engine_t.shutdown()
    nh, na = np.linalg.norm(h), np.linalg.norm(a)
    return (h / nh if nh > 0 else h), (a / na if na > 0 else a)


def salsa_fixed_numpy(src, dst, n, iters=3):
    """Single-process oracle replicating :func:`salsa_fixed` exactly."""
    d_out = np.bincount(src, minlength=n).astype(np.float64)
    d_in = np.bincount(dst, minlength=n).astype(np.float64)
    inv_out = np.where(d_out > 0, 1.0 / d_out, 0.0)
    inv_in = np.where(d_in > 0, 1.0 / d_in, 0.0)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.bincount(dst, weights=(h * inv_out)[src], minlength=n)
        h = np.bincount(src, weights=(a * inv_in)[dst], minlength=n)
    nh, na = np.linalg.norm(h), np.linalg.norm(a)
    return (h / nh if nh > 0 else h), (a / na if na > 0 else a)


def eigenvector_centrality(engine: SuperstepEngine, itermax=100,
                           tol=1e-8, weighted=False,
                           metrics: SuperstepMetrics | None = None):
    """Eigenvector centrality over IN-edges (power iteration on
    ``A.T``): ``x = normalize_2(A.T @ x)``, stop when
    ``max|x - x_prev| <= tol``. One spmv superstep + O(n) driver math
    per iteration — pagerank's distribution shape exactly.
    Returns ``(x, iters, metrics)``."""
    metrics = metrics or SuperstepMetrics()
    n = engine.n
    sr = "plus_times" if weighted else "plus_second"
    x = np.full(n, 1.0 / np.sqrt(n))
    it = 0
    for it in range(itermax):
        nxt = engine.spmv(sr, x)
        norm = np.linalg.norm(nxt)
        if norm > 0:
            nxt /= norm
        delta = float(np.abs(nxt - x).max())
        x = nxt
        metrics.record(it, algorithm="eigenvector", delta=delta,
                       edges=engine.num_edges)
        if delta <= tol:
            break
    return x, it + 1, metrics


def eigenvector_centrality_numpy(src, dst, n, itermax=100, tol=1e-8,
                                 w=None):
    """Oracle replicating ``eigenvector_centrality`` exactly."""
    x = np.full(n, 1.0 / np.sqrt(n))
    it = 0
    for it in range(itermax):
        vals = x[src] if w is None else w * x[src]
        nxt = np.bincount(dst, weights=vals, minlength=n)
        norm = np.linalg.norm(nxt)
        if norm > 0:
            nxt /= norm
        delta = float(np.abs(nxt - x).max())
        x = nxt
        if delta <= tol:
            break
    return x, it + 1


def katz_centrality(engine: SuperstepEngine, alpha=0.1, beta=1.0,
                    itermax=100, tol=1e-8, weighted=False,
                    metrics: SuperstepMetrics | None = None):
    """Katz centrality over IN-edges: ``x = alpha * (A.T @ x) + beta``
    to fixpoint (``max|x - x_prev| <= tol``); converges for
    ``alpha < 1/λ_max``. Returns ``(x, iters, metrics)``."""
    metrics = metrics or SuperstepMetrics()
    n = engine.n
    sr = "plus_times" if weighted else "plus_second"
    x = np.zeros(n)
    it = 0
    for it in range(itermax):
        nxt = alpha * engine.spmv(sr, x) + beta
        delta = float(np.abs(nxt - x).max())
        x = nxt
        metrics.record(it, algorithm="katz", delta=delta,
                       edges=engine.num_edges)
        if delta <= tol:
            break
    return x, it + 1, metrics


def katz_centrality_numpy(src, dst, n, alpha=0.1, beta=1.0,
                          itermax=100, tol=1e-8, w=None):
    """Oracle replicating ``katz_centrality`` exactly."""
    x = np.zeros(n)
    it = 0
    for it in range(itermax):
        vals = x[src] if w is None else w * x[src]
        nxt = alpha * np.bincount(dst, weights=vals, minlength=n) + beta
        delta = float(np.abs(nxt - x).max())
        x = nxt
        if delta <= tol:
            break
    return x, it + 1


def _min_reach(engine: SuperstepEngine, active, metrics, tag):
    """min-label fixpoint restricted to the active subgraph: ``lab[v]`` =
    smallest ACTIVE vertex id with an all-active directed path to ``v``
    (including ``v`` itself). Inactive vertices hold +inf so nothing
    propagates into or through them — one ``min_second`` spmv superstep
    per iteration, O(n) driver mask, fixpoint in ≤ active-diameter
    iterations (labels are monotone non-increasing)."""
    n = engine.n
    lab = np.where(active, np.arange(n, dtype=np.float64), np.inf)
    it = 0
    while True:
        y = engine.spmv("min_second", lab)
        y = np.minimum(lab, y)
        y[~active] = np.inf
        it += 1
        if np.array_equal(y, lab):
            break
        lab = y
    metrics.record(it, algorithm=f"scc_{tag}", edges=engine.num_edges)
    return lab


def scc(engine: SuperstepEngine, engine_t: SuperstepEngine | None = None,
        metrics: SuperstepMetrics | None = None):
    """Strongly connected components by forward/backward min-label
    peeling (the coloring / FW-BW family — Orzan 2004, Slota et al.
    2014 — expressed as GraphBLAS-style min_second iterations; the
    reference covers components only for the undirected case, so this
    extends the §2.7 algorithm set).

    Each outer round, over the still-active subgraph:

    - ``F[v]`` = min active id that reaches ``v`` (forward min-label
      fixpoint on this engine, which aggregates src→dst);
    - ``B[v]`` = min active id that ``v`` reaches (same fixpoint on the
      transposed engine);
    - every vertex with ``F == B`` is assigned component id ``F[v]``
      and retired. ``F[v] == B[v] == r`` means ``r`` and ``v`` are
      mutually reachable, and since anything reaching ``v`` also
      reaches its whole SCC (and vice versa), the entire SCC shares
      (F, B) and is retired atomically with id = its smallest member.

    At least the SCC of the smallest active id retires every round
    (its F and B are both itself), so rounds ≤ #SCCs — worst case a
    directed path; 2-3 rounds on web-shaped graphs where the giant
    SCC plus tendril peel dominates. Per round: two min-label
    fixpoints of spmv supersteps + O(n) driver masks (house style:
    edges stay pinned in the actors, the driver touches only n-vectors).

    ``engine_t`` (the ``A @ x`` direction) is derived actor-side via
    ``engine.transposed()`` when not supplied — reversed-edge exchange
    reusing the directed partitioning, no second build.

    Returns ``(comp, rounds, metrics)`` with ``comp[v]`` = smallest
    vertex id in v's SCC (singletons map to themselves, matching the
    transitive-closure oracle)."""
    metrics = metrics or SuperstepMetrics()
    own_t = engine_t is None
    if own_t:
        engine_t = engine.transposed()
    n = engine.n
    comp = np.arange(n, dtype=np.int64)  # isolated/singleton default
    active = np.ones(n, dtype=bool)
    rounds = 0
    try:
        while active.any():
            F = _min_reach(engine, active, metrics, "fwd")
            B = _min_reach(engine_t, active, metrics, "bwd")
            assign = active & (F == B)
            comp[assign] = F[assign].astype(np.int64)
            active &= ~assign
            rounds += 1
    finally:
        if own_t:
            engine_t.shutdown()
    return comp, rounds, metrics


def scc_numpy(src, dst, n):
    """Single-process oracle replicating ``scc`` exactly (same peeling
    rounds and min-label fixpoints)."""
    comp = np.arange(n, dtype=np.int64)
    active = np.ones(n, dtype=bool)

    def min_reach(s, d):
        lab = np.where(active, np.arange(n, dtype=np.float64), np.inf)
        while True:
            y = np.full(n, np.inf)
            np.minimum.at(y, d, lab[s])
            y = np.minimum(lab, y)
            y[~active] = np.inf
            if np.array_equal(y, lab):
                return lab
            lab = y

    while active.any():
        F = min_reach(src, dst)
        B = min_reach(dst, src)
        assign = active & (F == B)
        comp[assign] = F[assign].astype(np.int64)
        active &= ~assign
    return comp


def _reach_mask(engine: SuperstepEngine, seed: np.ndarray) -> np.ndarray:
    """Boolean reachability fixpoint: all vertices with a directed path
    FROM the seed set along this engine's aggregation direction
    (src→dst; run on ``transposed()`` for "reaches the seed"). Seeds are
    included. One lor_second spmv per level."""
    r = seed.copy()
    while True:
        new = r | engine.spmv("lor_second", r)
        if (new == r).all():
            return r
        r = new


BOWTIE_PARTS = ("core", "in", "out", "tube", "tendril", "disc")


def bowtie(engine: SuperstepEngine,
           engine_t: SuperstepEngine | None = None,
           metrics: SuperstepMetrics | None = None):
    """Bow-tie decomposition of a directed web graph (Broder et al.
    2000, "Graph structure in the Web" — THE Common-Crawl-scale
    structural analysis): partition every vertex into

    - ``core`` — the largest SCC (smallest component id on ties);
    - ``in``  — reaches the core but is outside it;
    - ``out`` — reachable from the core but outside it;
    - ``tube``    — on an IN→OUT path that bypasses the core;
    - ``tendril`` — hanging off IN (reachable from IN) or leading into
      OUT (reaches OUT), but neither core-connected nor a tube;
    - ``disc`` — everything else (disconnected from the bow-tie).

    Composition of already-scale-shaped pieces over the pinned engine
    pair: one :func:`scc` run + four boolean reachability fixpoints
    (lor_second supersteps), O(n) driver masks only.

    Returns ``(parts, comp)``: ``parts`` a length-n array of the part
    names above, ``comp`` the SCC labels.
    """
    metrics = metrics or SuperstepMetrics()
    own_t = engine_t is None
    if own_t:
        engine_t = engine.transposed()
    n = engine.n
    try:
        comp, _, _ = scc(engine, engine_t, metrics=metrics)
        ids, cnt = np.unique(comp, return_counts=True)
        core_id = int(ids[np.argmax(cnt)])  # ties → smallest id
        core = comp == core_id
        fwd = _reach_mask(engine, core)     # reachable from core
        bwd = _reach_mask(engine_t, core)   # reaching core
        vin = bwd & ~core
        vout = fwd & ~core
        from_in = _reach_mask(engine, vin) if vin.any() else vin
        to_out = _reach_mask(engine_t, vout) if vout.any() else vout
        rest = ~(core | vin | vout)
        tube = rest & from_in & to_out
        tendril = rest & ~tube & (from_in | to_out)
        codes = np.full(n, 5, dtype=np.int64)
        codes[tendril] = 4
        codes[tube] = 3
        codes[vout] = 2
        codes[vin] = 1
        codes[core] = 0
        metrics.record(0, algorithm="bowtie",
                       sizes={p: int((codes == i).sum())
                              for i, p in enumerate(BOWTIE_PARTS)})
    finally:
        if own_t:
            engine_t.shutdown()
    return np.array(BOWTIE_PARTS, dtype=object)[codes], comp


def bowtie_numpy(src, dst, n):
    """Dense oracle: transitive closure by repeated boolean squaring,
    then the same part definitions."""
    R = np.eye(n, dtype=bool)
    R[src, dst] = True
    while True:
        R2 = (R @ R) | R
        if (R2 == R).all():
            break
        R = R2
    mutual = R & R.T
    comp = np.array([int(np.flatnonzero(mutual[v])[0]) for v in range(n)])
    ids, cnt = np.unique(comp, return_counts=True)
    core_id = int(ids[np.argmax(cnt)])
    core = comp == core_id
    vin = R[:, core_id] & ~core
    vout = R[core_id, :] & ~core
    from_in = R[vin].any(axis=0) if vin.any() else np.zeros(n, bool)
    to_out = R[:, vout].any(axis=1) if vout.any() else np.zeros(n, bool)
    rest = ~(core | vin | vout)
    tube = rest & from_in & to_out
    tendril = rest & ~tube & (from_in | to_out)
    codes = np.full(n, 5, dtype=np.int64)
    codes[tendril] = 4
    codes[tube] = 3
    codes[vout] = 2
    codes[vin] = 1
    codes[core] = 0
    return np.array(BOWTIE_PARTS, dtype=object)[codes]


def _knuth32(v: np.ndarray) -> np.ndarray:
    """Deterministic 32-bit multiplicative-hash priorities (injective on
    vid < 2^32 since the multiplier is odd) — expressible in plain SQL as
    ``(vid * 2654435761) % 4294967296`` so oracles can reproduce them."""
    return (v.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)


def maximal_independent_set(engine: SuperstepEngine,
                            metrics: SuperstepMetrics | None = None,
                            active_init=None):
    """Maximal independent set — Luby's algorithm with STATIC injective
    priorities (deterministic: equals the sequential greedy MIS in
    priority order). Engine must be undirected and SIMPLE (no self-loops;
    a self-looped vertex could neither enter nor leave the active set).

    Per round, over active vertices: ``mn = min_second spmv`` of the
    priority vector (inactive = +inf) gives each vertex its smallest
    active-neighbor priority; vertices beating it (or isolated) join the
    MIS, and one ``max_second`` spmv of the selected indicator excludes
    their neighbors. Expected O(log n) rounds on random-ish priorities;
    two spmv supersteps + O(n) driver masks per round.

    ``active_init``: optional bool[n] restricting the MIS to the graph
    induced on these vertices (inactive vertices carry +inf priority so
    they never win nor block — exactly the induced-subgraph semantics
    the iterated-MIS coloring needs per color class).

    Returns ``(in_mis: bool[n], rounds, metrics)``."""
    metrics = metrics or SuperstepMetrics()
    n = engine.n
    prio = _knuth32(np.arange(n, dtype=np.int64)).astype(np.float64)
    active = (np.ones(n, dtype=bool) if active_init is None
              else np.asarray(active_init, dtype=bool).copy())
    in_mis = np.zeros(n, dtype=bool)
    rounds = 0
    while active.any():
        p = np.where(active, prio, np.inf)
        mn = engine.spmv("min_second", p)
        sel = active & (p < np.where(np.isfinite(mn), mn, np.inf))
        # isolated actives (no finite neighbor min) select themselves
        if not sel.any():
            raise ValueError(
                "MIS made no progress — graph has self-loops? "
                "maximal_independent_set requires a simple graph")
        nb_sel = engine.spmv("max_second", sel.astype(np.float64))
        in_mis |= sel
        active &= ~(sel | (np.nan_to_num(nb_sel, neginf=0.0) > 0))
        rounds += 1
        metrics.record(rounds, algorithm="mis",
                       selected=int(sel.sum()),
                       active=int(active.sum()))
    return in_mis, rounds, metrics


def maximal_independent_set_numpy(src, dst, n):
    """Single-process oracle replicating ``maximal_independent_set``
    (symmetrized input, same priorities and round structure)."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    prio = _knuth32(np.arange(n, dtype=np.int64)).astype(np.float64)
    active = np.ones(n, dtype=bool)
    in_mis = np.zeros(n, dtype=bool)
    while active.any():
        p = np.where(active, prio, np.inf)
        mn = np.full(n, np.inf)
        np.minimum.at(mn, d, p[s])
        sel = active & (p < mn)
        nb_sel = np.zeros(n, dtype=bool)
        nb_sel[d[sel[s]]] = True
        in_mis |= sel
        active &= ~(sel | nb_sel)
    return in_mis


def greedy_color(engine: SuperstepEngine,
                 metrics: SuperstepMetrics | None = None, max_colors=4096):
    """Deterministic distance-1 graph coloring by ITERATED MIS
    (Jones-Plassmann family): color k = the MIS of the graph induced on
    still-uncolored vertices, repeated until every vertex is colored.
    Produces a valid coloring (each color class is independent) with a
    deterministic color count. Engine must be undirected and simple.

    Returns ``(color: int64[n] (0-based), n_colors, metrics)``."""
    metrics = metrics or SuperstepMetrics()
    n = engine.n
    color = np.full(n, -1, dtype=np.int64)
    uncolored = np.ones(n, dtype=bool)
    k = 0
    while uncolored.any():
        if k >= max_colors:
            raise ValueError("exceeded max_colors — self-loops?")
        # one MIS pass restricted to uncolored vertices (shared kernel —
        # the bounded color_first2 oracle replays exactly these passes)
        sel, _, _ = maximal_independent_set(engine,
                                            active_init=uncolored)
        color[sel] = k
        uncolored = color < 0
        metrics.record(k, algorithm="greedy_color",
                       colored=int((color == k).sum()),
                       remaining=int(uncolored.sum()))
        k += 1
    return color, k, metrics


def greedy_color_numpy(src, dst, n, max_colors=4096):
    """Single-process oracle replicating ``greedy_color`` exactly."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    prio = _knuth32(np.arange(n, dtype=np.int64)).astype(np.float64)
    color = np.full(n, -1, dtype=np.int64)
    k = 0
    while (color < 0).any():
        active = color < 0
        while active.any():
            p = np.where(active, prio, np.inf)
            mn = np.full(n, np.inf)
            np.minimum.at(mn, d, p[s])
            sel = active & (p < mn)
            nb_sel = np.zeros(n, dtype=bool)
            nb_sel[d[sel[s]]] = True
            color[sel] = k
            active &= ~(sel | nb_sel)
        k += 1
    return color, k


def wl_refinement(engine: SuperstepEngine, n: int, rounds: int = 2):
    """1-dimensional Weisfeiler-Lehman color refinement with a
    commutative sum-hash combiner (Weisfeiler & Lehman 1968;
    Shervashidze et al., JMLR 2011 use the same iterated
    relabel-by-neighborhood scheme for graph kernels) — per-vertex
    structural fingerprints for graph-ML features and structural
    near-dup detection:

    - ``label_0(v)`` = in-degree of ``v``
    - ``label_{k+1}(v) = (splitmix64(label_k(v) + 2^32)
      + Σ_{(u,v)∈E} splitmix64(label_k(u))) mod 2^64``

    The commutative mod-2⁶⁴ sum replaces the classic sorted-multiset
    string: it needs no per-vertex sort, so each round is ONE
    ``register_step("add")`` superstep (vectorized reduceat in the
    pinned actors) plus an O(n) driver relabel — the same
    dense-broadcast correctness form as ANF; at 10¹²-vertex scale the
    labels ride the fused in-actor exchange instead (see
    ``register_step`` scale notes). The ``+2^32`` offset keeps the
    self term distinguishable from a neighbor term.

    Returns ``(deg, labels)``: uint64 in-degrees and the round-``rounds``
    uint64 fingerprints. Vertices are 1-WL-equivalent after ``rounds``
    iterations iff their fingerprints collide (up to hash collisions,
    ~2⁻⁶⁴ per pair)."""
    from ..state.superstep import _splitmix64

    ones = np.ones((n, 1), dtype=np.uint64)
    deg = engine.register_step(ones, op="add")[:, 0]
    lab = deg.copy()
    with np.errstate(over="ignore"):
        for _ in range(rounds):
            h = _splitmix64(lab)
            s = engine.register_step(h[:, None], op="add")[:, 0]
            lab = _splitmix64(lab + np.uint64(1 << 32)) + s
    return deg, lab


def wl_refinement_numpy(src, dst, n, rounds=2):
    """Single-process oracle replicating ``wl_refinement`` exactly."""
    from ..state.superstep import _splitmix64

    deg = np.bincount(dst, minlength=n).astype(np.uint64)
    lab = deg.copy()
    with np.errstate(over="ignore"):
        for _ in range(rounds):
            h = _splitmix64(lab)
            s = np.zeros(n, dtype=np.uint64)
            np.add.at(s, dst, h[src])
            lab = _splitmix64(lab + np.uint64(1 << 32)) + s
    return deg, lab


def closeness_centrality(engine: SuperstepEngine, sources=None,
                         harmonic=True,
                         metrics: SuperstepMetrics | None = None):
    """(Harmonic) closeness from a SOURCE SAMPLE — the Eppstein-Wang
    style approximation: exact per-source BFS distances, summed over a
    deterministic source subset instead of all n sources (all-pairs BFS
    is O(n·E); a fixed sample is the standard scale treatment). With
    ``sources=None`` every vertex is a source (exact — small graphs
    only).

    Harmonic form (Marchiori-Latora) handles disconnected/weak
    reachability: ``C(v) = Σ_{s ≠ v, d(s,v) < ∞} 1 / d(s→v)`` —
    distances along edge direction from each source, one
    frontier-masked BFS per source over the pinned engine (supersteps ∝
    Σ source eccentricities). Classic form (``harmonic=False``):
    ``C(v) = r(v) / Σ d(s,v)`` over the reached sample r(v) (0 when
    unreached). Values rounded to 8 decimals (oracle-stable).

    Returns ``(scores: float64[n], metrics)``."""
    metrics = metrics or SuperstepMetrics()
    if sources is None:
        sources = range(engine.n)
    # in-actor route (r4): per-source BFS AND the acc/reach folds run
    # in the actors — O(P) driver per superstep, one O(n) readout at
    # the end. Bit-identical to the former broadcast loop (integer
    # levels, same per-source fold order) — parity in
    # tests/test_fx_inactor.py.
    return engine.closeness_inactor(sources, harmonic=harmonic,
                                    metrics=metrics)


def closeness_centrality_numpy(src, dst, n, sources=None, harmonic=True):
    """Single-process oracle replicating ``closeness_centrality``."""
    if sources is None:
        sources = range(n)
    acc = np.zeros(n)
    reach = np.zeros(n, dtype=np.int64)
    for s in sources:
        lev = np.full(n, -1, dtype=np.int64)
        lev[s] = 0
        q = np.zeros(n, dtype=bool)
        q[s] = True
        level = 1
        while q.any():
            nxt = np.zeros(n, dtype=bool)
            nxt[dst[q[src]]] = True
            q = nxt & (lev < 0)
            lev[q] = level
            level += 1
        hit = lev > 0
        if harmonic:
            acc[hit] += 1.0 / lev[hit]
        else:
            acc[hit] += lev[hit]
            reach[hit] += 1
    if harmonic:
        return np.round(acc, 8) + 0.0
    return np.round(np.where(acc > 0, reach / np.maximum(acc, 1e-300),
                             0.0), 8) + 0.0


def widest_path_fixed(A, source=0, iters=4):
    """Widest (bottleneck) path widths from ``source`` over the
    ``max_min`` algebraic-path semiring (reference semiring table
    ``core/operator/semiring.py:190-218`` family): relax
    ``x ← x ⊕max (x ᵀ· A)`` with ``x₀ = {source: +∞}``; after k rounds
    ``x(v)`` = max over ≤k-hop walks of the walk's minimum edge
    capacity (the bottleneck objective is monotone under vertex
    repetition, so walks ≡ simple paths). Sparse throughout — only
    REACHED vertices ever materialize; each round is one vxm dataset
    join plus one ewise max, no dense n-vector anywhere. Returns the
    reached-entry GBVector."""
    from ..core import GBVector
    from ..functions.monoids import semiring as _sr2

    x = GBVector.from_coo([source], [np.inf], size=A.nrows)
    for _ in range(int(iters)):
        x = x.ewise_add(x.vxm(A, _sr2.max_min), "max")
    return x


def contract_graph(A, labels, k=None):
    """Quotient ("host") graph: ``C[a, b] = Σ A[i, j]`` over
    ``labels[i] = a, labels[j] = b`` — the Common-Crawl host-level
    link-graph contraction (page graph → domain graph), and the same
    operation Louvain applies between levels.

    Semantically ``S.T @ A @ S`` over plus_times for the n×k one-hot
    assignment matrix S (the GraphBLAS recipe — the parity test checks
    the two mxm's give the identical result); executed as ONE broadcast
    endpoint remap (labels ride the object store once) + the standard
    ``dedup("plus")`` hash exchange — a single shuffle bounded by the
    contracted edge count, no matmul machinery.

    Returns a k×k GBMatrix."""
    import pyarrow as pa
    import ray

    from ..core import GBMatrix

    labels = np.asarray(labels, dtype=np.int64)
    if k is None:
        k = int(labels.max()) + 1 if len(labels) else 0
    map_ref = ray.put(labels)

    def remap(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"src": m[s], "dst": m[d], "val": w})

    return GBMatrix.from_dataset(
        A.ds.map_batches(remap, batch_format="pyarrow"), k, k
    ).dedup("plus")


def approx_diameter(engine: SuperstepEngine, start=0, sweeps=2,
                    metrics: SuperstepMetrics | None = None):
    """Double-sweep diameter lower bound (the standard BFS heuristic,
    exact on trees): BFS from ``start``, then repeatedly re-BFS from the
    farthest vertex found. Each sweep is one frontier-masked BFS over
    the pinned engine. On directed graphs this bounds the directed
    eccentricity from the visited chain. Returns ``(lower_bound,
    endpoints, metrics)``."""
    metrics = metrics or SuperstepMetrics()
    best = 0
    u = int(start)
    endpoints = (u, u)
    for _ in range(max(1, sweeps)):
        # in-actor BFS (bit-parity with bfs_level)
        lev, _ = engine.bfs_level_inactor(u, metrics)
        far = int(np.argmax(lev))
        ecc = int(lev[far])
        if ecc > best:
            best, endpoints = ecc, (u, far)
        if far == u:
            break
        u = far
    return best, endpoints, metrics


def ppr_push(engine: SuperstepEngine, seeds, alpha=0.15, eps=1e-7,
             itermax=1000, metrics: SuperstepMetrics | None = None):
    """Approximate personalized PageRank by synchronous residual PUSH
    (Andersen-Chung-Lang 2006 local clustering): keep an estimate ``p``
    and residual ``r`` (seed distribution initially); each round the
    over-threshold frontier ``S = {u : r[u] > eps·max(d_out(u), 1)}``
    banks ``α·r[S]`` into ``p`` and pushes ``(1-α)·r[u]/d(u)`` along its
    OUT-edges — one FRONTIER-MASKED spmv per round, so work scales with
    edges actually touched, not graph size (the point of local push at
    10^12 documents: a seed's neighborhood, not the web). Dangling
    vertices bank ``α·r`` and drop the rest (mirrored by the oracle's
    zero-row transition). Terminates when every residual is under its
    threshold; ``p`` under-approximates the exact PPR with
    ``‖exact - p‖₁ ≤ ‖r‖₁``.

    Returns ``(p, r, rounds, metrics)``."""
    metrics = metrics or SuperstepMetrics()
    n = engine.n
    s = np.zeros(n)
    seeds = np.asarray(list(seeds) if not isinstance(seeds, np.ndarray)
                       else seeds)
    if seeds.dtype.kind in "iu":       # vertex ids → uniform over them
        s[seeds] = 1.0 / len(seeds)
    else:                              # full distribution
        s = seeds.astype(np.float64).copy()
    d = engine.out_degrees().astype(np.float64)
    p = np.zeros(n)
    r = s
    rounds = 0
    for rounds in range(1, itermax + 1):
        S = r > eps * np.maximum(d, 1.0)
        if not S.any():
            rounds -= 1
            break
        p[S] += alpha * r[S]
        x = np.where(S & (d > 0), (1.0 - alpha) * r / np.maximum(d, 1.0),
                     0.0)
        gain = engine.spmv_masked("plus_second", x, S)
        r = np.where(S, 0.0, r) + np.nan_to_num(gain, posinf=0.0)
        metrics.record(rounds, algorithm="ppr_push",
                       frontier=int(S.sum()),
                       residual=float(r.sum()))
    return p, r, rounds, metrics


def ppr_exact_numpy(src, dst, n, seeds, alpha=0.15):
    """Dense oracle: solve ``p = α·s + (1-α)·Pᵀp`` directly (row-
    stochastic P, zero rows at dangling vertices — mass absorbed,
    matching ``ppr_push``)."""
    s = np.zeros(n)
    seeds = np.asarray(list(seeds) if not isinstance(seeds, np.ndarray)
                       else seeds)
    if seeds.dtype.kind in "iu":
        s[seeds] = 1.0 / len(seeds)
    else:
        s = seeds.astype(np.float64).copy()
    P = np.zeros((n, n))
    d = np.bincount(src, minlength=n).astype(np.float64)
    np.add.at(P, (src, dst), 1.0)
    P[d > 0] /= d[d > 0, None]
    return alpha * np.linalg.solve(np.eye(n) - (1 - alpha) * P.T, s)


def trustrank(engine: SuperstepEngine, seeds, damping=0.85, itermax=100,
              tol=1e-4, **kw):
    """TrustRank (Gyöngyi–Garcia-Molina–Pedersen 2004): PageRank whose
    teleport mass is concentrated uniformly on a trusted seed set, so
    trust flows out along links and spam pages far from the seeds score
    low. Exactly :func:`pagerank` with ``personalization = uniform over
    seeds`` — same distribution shape (one spmv superstep + O(n) driver
    math per iteration over the pinned engine)."""
    p = np.zeros(engine.n)
    seeds = np.asarray(list(seeds))
    p[seeds] = 1.0 / len(seeds)
    return pagerank(engine, damping=damping, itermax=itermax, tol=tol,
                    personalization=p, **kw)


def critical_path(engine: SuperstepEngine, itermax=None,
                  metrics: SuperstepMetrics | None = None):
    """Weighted longest-path distances on a DAG (the CRITICAL PATH of a
    scheduling/dependency graph): ``dist(v) = max over in-edges (u,v) of
    dist(u) + w(u,v)``, 0 at sources. Same frontier-masked fixpoint as
    :func:`dag_layers` but through the ``max_plus`` semiring spmv, so
    edge weights ride the pinned blocks (engine must be built with
    ``weighted=True``). Raises on cycles like :func:`dag_layers`.

    Returns ``(dist float64, supersteps, metrics)``.
    """
    n = engine.n
    metrics = metrics or SuperstepMetrics()
    dist = np.zeros(n)
    active = np.ones(n, dtype=bool)
    itermax = itermax or n + 1
    it = 0
    while active.any():
        if it >= itermax:
            raise ValueError(
                f"critical_path: no fixpoint after {it} supersteps — "
                "the graph has a cycle (or raise itermax)")
        y = engine.spmv_masked("max_plus", dist, active)
        new = np.maximum(dist, y)
        active = new > dist
        metrics.record(it, algorithm="critical_path",
                       frontier=int(active.sum()),
                       max_dist=float(new.max()))
        dist = new
        it += 1
    return dist, it, metrics


def critical_path_numpy(src, dst, w, n):
    """Dense Bellman oracle of the same max-plus fixpoint."""
    dist = np.zeros(n)
    for _ in range(n + 1):
        new = dist.copy()
        np.maximum.at(new, dst, dist[src] + w)
        if (new == dist).all():
            return dist
        dist = new
    raise ValueError("cycle")


def dag_layers(engine: SuperstepEngine, itermax=None,
               metrics: SuperstepMetrics | None = None):
    """Longest-path layering (topological levels) of a DAG:
    ``layer(v) = 0`` for sources, else ``1 + max over in-edges of
    layer(u)`` — the level schedule a topological/dependency ordering
    runs in (level-synchronous Kahn layers, by longest path).

    Fixpoint of the max_second semiring over ``layer + 1``: each
    superstep is one frontier-masked spmv (only vertices whose layer
    grew last round push — work scales with touched edges, like
    :func:`sssp`'s delta relaxation), then an O(n) driver max-merge.
    Monotone non-decreasing, so the frontier mask is exact.

    Doubles as a CYCLE DETECTOR: on a cyclic graph layers grow without
    bound, so failing to reach the fixpoint within ``n`` supersteps
    (the longest possible simple path) raises ``ValueError``.

    Returns ``(layers int64, supersteps, metrics)``.
    """
    n = engine.n
    metrics = metrics or SuperstepMetrics()
    layer = np.zeros(n)
    active = np.ones(n, dtype=bool)  # round 0: every vertex proposes
    itermax = itermax or n + 1
    it = 0
    while active.any():
        if it >= itermax:
            raise ValueError(
                f"dag_layers: no fixpoint after {it} supersteps — "
                "the graph has a cycle (or raise itermax)")
        y = engine.spmv_masked("max_second", layer + 1.0, active)
        new = np.maximum(layer, y)
        active = new > layer
        metrics.record(it, algorithm="dag_layers",
                       frontier=int(active.sum()),
                       max_layer=float(new.max()))
        layer = new
        it += 1
    return layer.astype(np.int64), it, metrics


def dag_layers_numpy(src, dst, n):
    """Single-process oracle: dense Bellman iteration of the same
    max-plus fixpoint."""
    layer = np.zeros(n, dtype=np.int64)
    for _ in range(n + 1):
        new = layer.copy()
        np.maximum.at(new, dst, layer[src] + 1)
        if (new == layer).all():
            return layer
        layer = new
    raise ValueError("cycle")


def bipartite_check(engine, A_simple, comp, max_rounds=40):
    """Per-component bipartiteness / odd-cycle detection: a component
    is bipartite iff NO edge joins two vertices at equal BFS-parity
    from the component's representative (any spanning-structure parity
    works: an equal-parity edge closes an odd cycle, and an odd cycle
    forces one).

    Engine shape: dist = multi-source unit-weight ``min_plus``
    relaxation on the symmetrized engine — seeds are every component's
    min-label representative (the FastSV ``comp`` output), ALL
    components sweep in the SAME O(diameter) superstep loop (one
    ``ray.put`` broadcast per round, the PageRank posture); conflicts
    are ONE streaming pass over the simple undirected edge dataset
    against the broadcast (comp, parity) vectors — per-batch bincount
    partials, the corpus-size edge table never shuffles. Integer
    counts — bit-exact.

    ``max_rounds`` caps the sweep (mirroring a bounded recursive-SQL
    twin); vertices unreached within the cap are excluded from the
    parity check on both sides. Returns per-component
    ``(comp, n, n_conflicts)`` — bipartite ⇔ ``n_conflicts == 0``."""
    import ray

    comp = np.asarray(comp, dtype=np.int64)
    n_v = len(comp)
    reps = np.unique(comp) if n_v else np.array([], dtype=np.int64)
    x = np.full(n_v, np.inf)
    if len(reps):
        x[reps] = 0.0
    for _ in range(max_rounds):
        y = engine.spmv("min_plus", x)
        x2 = np.minimum(x, y)
        if np.array_equal(x2, x):
            break
        x = x2
    finite = np.isfinite(x)
    parity = np.zeros(n_v, dtype=np.int64)
    parity[finite] = x[finite].astype(np.int64) % 2

    ref = ray.put((comp, parity, finite))

    def conf(batch: pa.Table) -> pa.Table:
        c, p, f = ray.get(ref)
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        # each undirected edge once (the dataset is symmetric)
        keep = (s < d) & f[s] & f[d] & (p[s] == p[d])
        s = s[keep]
        cnt = np.bincount(c[s], minlength=len(c)) if len(s) else None
        if cnt is None:
            return pa.table({"comp": pa.array([], pa.int64()),
                             "nc": pa.array([], pa.int64())})
        nz = np.flatnonzero(cnt)
        return pa.table({"comp": nz.astype(np.int64),
                         "nc": cnt[nz].astype(np.int64)})

    nc = np.zeros(n_v, dtype=np.int64)
    for b in A_simple.ds.map_batches(
            conf, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
        if b.num_rows and "comp" in b.column_names:
            np.add.at(nc, b["comp"].to_numpy(zero_copy_only=False),
                      b["nc"].to_numpy(zero_copy_only=False))
    sizes = np.bincount(comp, minlength=n_v) if n_v else nc
    return pa.table({"comp": reps,
                     "n": sizes[reps].astype(np.int64),
                     "n_conflicts": nc[reps]})


def condensation_longest_path(edges_ds, comp):
    """Longest-path depth of every node in the SCC condensation DAG —
    the "critical chain" readout (how many strongly-connected layers
    deep the link graph runs; the condensation of ANY digraph is
    acyclic, so longest path is well-defined and finite).

    Engine shape: ONE streaming pass over the raw directed edge
    dataset against the broadcast SCC labels (per-batch remap +
    cross-component filter + per-batch dedup) — the corpus never
    shuffles and the driver sees at most |SCCs|² condensed pairs; the
    DP is a vectorized Bellman sweep over those pairs
    (``depth[v] = max over (u,v) of depth[u]+1``, at most #SCCs
    rounds). Integer — bit-exact.

    Returns per-SCC ``(comp, depth)`` (comp = min-vertex label)."""
    import ray

    comp = np.asarray(comp, dtype=np.int64)
    n_v = len(comp)
    reps = np.unique(comp) if n_v else np.array([], dtype=np.int64)
    ref = ray.put(comp)

    def remap(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        s = c[batch["src"].to_numpy(zero_copy_only=False).astype(
            np.int64)]
        d = c[batch["dst"].to_numpy(zero_copy_only=False).astype(
            np.int64)]
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s):
            pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        else:
            pairs = np.empty((0, 2), dtype=np.int64)
        return pa.table({"a": pairs[:, 0], "b": pairs[:, 1]})

    pairs = []
    for t in edges_ds.map_batches(remap,
                                  batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        if t.num_rows and "a" in t.column_names:
            pairs.append(np.stack(
                [t["a"].to_numpy(zero_copy_only=False),
                 t["b"].to_numpy(zero_copy_only=False)], axis=1))
    depth = np.zeros(n_v, dtype=np.int64)
    if pairs:
        e = np.unique(np.concatenate(pairs), axis=0)
        a, b = e[:, 0], e[:, 1]
        for _ in range(len(reps)):
            nd = depth.copy()
            np.maximum.at(nd, b, depth[a] + 1)
            if np.array_equal(nd, depth):
                break
            depth = nd
    return pa.table({"comp": reps, "depth": depth[reps]})
