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


def link_scores(edges_ds, n, max_degree=None, min_common=1,
                adamic_adar=True):
    """The full neighborhood-overlap score family for every unordered
    pair u < v with ≥ ``min_common`` common OUT-neighbors: ``common``,
    ``jaccard``, ``cosine`` (common/√(d(u)·d(v))), ``preferential``
    (d(u)·d(v) — evaluated on the common-neighbor support, the standard
    candidate set), and ``adamic_adar``.

    Adamic–Adar convention here (directed graphs): a shared out-neighbor
    w is weighted by ``1/ln(indeg(w))`` — w's in-degree is ≥ 2 by
    construction (both u and v point at it), so the log never hits 0.

    Two matmuls over the SAME partitioning: ``plus_pair`` for counts and
    ``plus_times`` on the column-scaled pattern ``A @ diag(1/ln indeg)``
    for the AA sums; degrees ride one broadcast. Same ``max_degree`` hub
    guard (and the same capped-scores caveat) as
    :func:`neighborhood_jaccard`.
    Returns a Dataset ``(u, v, common, jaccard, cosine, preferential,
    adamic_adar)``.

    ``adamic_adar=False`` skips the second matmul + join: the remaining
    scores are each ONE float op over exact integers (order-insensitive
    → bit-exact against a SQL oracle), whereas the AA sum's float
    accumulation order is engine-dependent.
    """
    from ..core import GBVector

    pat = _distinct_pattern(edges_ds)
    A = GBMatrix.from_dataset(pat, nrows=n, ncols=n)
    if max_degree is not None:
        ids0, deg0 = A.reduce_rowwise("plus").to_coo(sort=True)
        drop_ids = ids0[deg0 > max_degree]
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

    ids, deg = A.reduce_rowwise("plus").to_coo(sort=True)
    iids, ideg = A.reduce_columnwise("plus").to_coo(sort=True)

    # common counts (structural)
    C = A.mxm(A.T, _sr.plus_pair).select("triu", 1)
    if min_common > 1:
        C = C.select(">=", min_common)

    if adamic_adar:
        C = C.ds.materialize()  # reused as the join target below
        # AA sums: column-scale by 1/ln(indeg), plus_times against A.T
        w = np.zeros(len(iids))
        pos = ideg > 1
        w[pos] = 1.0 / np.log(ideg[pos].astype(np.float64))
        Wv = GBVector.from_coo(iids, w, size=n)
        AA = A.mxm(Wv.diag(), _sr.plus_times).mxm(A.T, _sr.plus_times) \
              .select("triu", 1)

        # co-locate the two score matrices: one hash join on (u, v)
        from ..stages.join import hash_join

        def rename_aa(batch: pa.Table) -> pa.Table:
            return pa.table({"src": batch["src"], "dst": batch["dst"],
                             "aa": batch["val"]})

        joined = hash_join(C, AA.ds.map_batches(rename_aa,
                                                batch_format="pyarrow"),
                           ("src", "dst"), how="left_outer")
    else:
        joined = C.ds
    deg_ref = ray.put((ids, deg.astype(np.float64)))

    def finish(batch: pa.Table) -> pa.Table:
        u = batch["src"].to_numpy(zero_copy_only=False)
        v = batch["dst"].to_numpy(zero_copy_only=False)
        c = batch["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        dids, dvals = ray.get(deg_ref)
        du = dvals[np.searchsorted(dids, u)]
        dv = dvals[np.searchsorted(dids, v)]
        cols = {
            "u": u, "v": v, "common": c.astype(np.int64),
            "jaccard": c / (du + dv - c),
            "cosine": c / np.sqrt(du * dv),
            "preferential": (du * dv).astype(np.int64)}
        if adamic_adar:
            aa = batch["aa"].to_numpy(zero_copy_only=False)
            cols["adamic_adar"] = np.where(
                np.isnan(aa.astype(np.float64)), 0.0, aa)
        return pa.table(cols)

    return joined.map_batches(finish, batch_format="pyarrow")


def link_scores_numpy(src, dst, n, min_common=1):
    """Single-process oracle for :func:`link_scores`."""
    adj = [set() for _ in range(n)]
    indeg = np.zeros(n)
    seen = set()
    for s, d in zip(src, dst):
        if (int(s), int(d)) not in seen:
            seen.add((int(s), int(d)))
            adj[int(s)].add(int(d))
            indeg[int(d)] += 1
    out = {}
    for u in range(n):
        for v in range(u + 1, n):
            inter = adj[u] & adj[v]
            c = len(inter)
            if c >= max(min_common, 1):
                du, dv = len(adj[u]), len(adj[v])
                aa = sum(1.0 / np.log(indeg[w]) for w in inter
                         if indeg[w] > 1)
                out[(u, v)] = (c, c / (du + dv - c),
                               c / np.sqrt(du * dv), du * dv, aa)
    return out


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


def cocitation_counts(edges_ds, n, max_degree=None, min_common=1):
    """Co-citation counts (Small 1973): ``C[u, v] = |{w : w→u and w→v}|``
    for unordered pairs u < v — the IN-neighbor-overlap dual of
    :func:`link_scores`'s common counts (which overlap OUT-neighbors,
    i.e. bibliographic coupling). On a web link graph this is "pages
    linked from the same pages" — the classic related-page signal.

    One ``plus_pair`` matmul ``A.T @ A`` + strict-``triu`` select: the
    shared CITING page w is the contraction key, so the shuffle is
    hash-partitioned by w and pairs never materialize beyond actual
    co-citations. ``max_degree`` caps the OUT-degree of citing pages
    (a hub citing k pages yields k² pairs — the same power-law guard as
    the coupling direction, applied to the transposed role).

    Returns a Dataset ``(src, dst, val)`` with ``src < dst`` and
    ``val`` = co-citation count (float, matmul dtype).
    """
    pat = _distinct_pattern(edges_ds)
    A = GBMatrix.from_dataset(pat, nrows=n, ncols=n)
    if max_degree is not None:
        ids0, deg0 = A.reduce_rowwise("plus").to_coo(sort=True)
        drop_ids = ids0[deg0 > max_degree]
        if len(drop_ids):
            drop_ref = ray.put(np.sort(drop_ids))

            def prune(batch: pa.Table) -> pa.Table:
                d = ray.get(drop_ref)
                s = batch["src"].to_numpy(zero_copy_only=False)
                ok = ~np.isin(s, d)
                return batch.filter(pa.array(ok))

            A = GBMatrix(A.ds.map_batches(prune, batch_format="pyarrow"),
                         n, n, A.dtype)
    C = A.T.mxm(A, _sr.plus_pair).select("triu", 1)
    if min_common > 1:
        C = C.select(">=", min_common)
    return C.ds


def cocitation_numpy(src, dst, n, min_common=1):
    """Single-process oracle: brute-force in-neighbor-set overlap."""
    cited_by = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        cited_by[int(d)].add(int(s))
    out = {}
    for u in range(n):
        for v in range(u + 1, n):
            c = len(cited_by[u] & cited_by[v])
            if c >= max(min_common, 1):
                out[(u, v)] = c
    return out


def reciprocity(A):
    """Directed-graph reciprocity: the fraction of (non-loop) edges whose
    reverse edge also exists — a standard link-graph shape metric (how
    mutual is the web's link structure). One ``offdiag`` select + one
    structural ``ewise_mult`` with the transpose (``pair``), i.e. the
    same hash-partitioned intersection kernel the other ewise ops use —
    the edge table is never collected.

    Returns ``(n_edges, n_reciprocal, ratio)`` as plain ints/float."""
    D = A.select("offdiag")
    n_edges = D.nvals
    n_recip = D.ewise_mult(D.T, "pair").nvals
    return n_edges, n_recip, (n_recip / n_edges if n_edges else 0.0)


def assortativity(A, n):
    """Degree assortativity (Newman 2002): the Pearson correlation of
    (out-degree(src), in-degree(dst)) over the directed edges — do hubs
    link to hubs? One structural-degree reduction per side (broadcast as
    O(n) vectors), then a single streaming pass accumulating the five
    correlation moments per batch — the edge table is never shuffled
    or collected.

    Returns the coefficient as a float (nan when degenerate)."""
    import ray

    from ..functions.aggregators import agg

    dout = A.reduce_rowwise(agg.count).to_dense(0.0)
    din = A.reduce_columnwise(agg.count).to_dense(0.0)
    ref = ray.put((dout, din))

    def moments(batch):
        do, di = ray.get(ref)
        x = do[batch["src"].to_numpy(zero_copy_only=False)]
        y = di[batch["dst"].to_numpy(zero_copy_only=False)]
        return pa.table({"n": [float(len(x))], "sx": [x.sum()],
                         "sy": [y.sum()], "sxx": [(x * x).sum()],
                         "syy": [(y * y).sum()], "sxy": [(x * y).sum()]})

    tot = {k: 0.0 for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    for b in A.ds.map_batches(moments, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow", batch_size=None):
        for k in tot:
            tot[k] += float(b[k][0].as_py())
    n_e, sx, sy = tot["n"], tot["sx"], tot["sy"]
    if n_e == 0:  # no edges — correlation undefined (oracle corr: NULL)
        return float("nan")
    cov = tot["sxy"] - sx * sy / n_e
    vx = tot["sxx"] - sx * sx / n_e
    vy = tot["syy"] - sy * sy / n_e
    if vx <= 0 or vy <= 0:
        return float("nan")
    return cov / np.sqrt(vx * vy)


def local_clustering(A_und, n):
    """Per-vertex local clustering coefficient over the simple undirected
    graph: ``c(v) = 2·tri(v) / (deg(v)·(deg(v)-1))`` (0 for deg < 2),
    with ``tri(v) = Σ_u support(v,u) / 2`` — the row sum of the per-edge
    triangle-support matrix the masked plus_pair mxm already computes
    (`A.mxm(A, plus_pair, mask=A.S)`). Pure composition of existing
    kernels; one extra rowwise reduction beyond edge support.

    Returns a pyarrow Table ``(vid, coeff)`` over all n vertices,
    rounded to 8 decimals (oracle-stable)."""
    from ..functions.monoids import semiring

    support = A_und.mxm(A_und, semiring.plus_pair, mask=A_und.S)
    tri2 = support.reduce_rowwise("plus").to_dense(0.0)  # 2·tri(v)
    from ..functions.aggregators import agg

    deg = A_und.reduce_rowwise(agg.count).to_dense(0.0)
    denom = deg * (deg - 1.0)
    coeff = np.where(denom > 0, tri2 / denom, 0.0)
    return pa.table({"vid": np.arange(n, dtype=np.int64),
                     "coeff": np.round(coeff, 8) + 0.0})


def transitivity(edges_ds, n, num_tasks=8):
    """Global clustering coefficient (transitivity) of the simple
    undirected graph: ``T = 3·triangles / wedges`` with
    ``wedges = Σ_v d(v)(d(v)-1)/2`` — the one-number closure measurement
    next to the per-vertex ``local_clustering``. Pure composition: the
    zero-shuffle broadcast triangle kernel
    (``triangles.triangle_count_broadcast``; the masked plus_pair mxm is
    the beyond-broadcast-limit form) plus one degree reduction over the
    symmetrized pattern.

    Returns a float (nan when the graph has no wedges)."""
    from ..functions.aggregators import agg
    from .triangles import simple_undirected, triangle_count_broadcast

    tri = triangle_count_broadcast(edges_ds, num_tasks=num_tasks)
    A = simple_undirected(edges_ds, n)
    deg = A.reduce_rowwise(agg.count).to_dense(0.0)
    wedges2 = float((deg * (deg - 1.0)).sum())  # = 2·wedges
    return 6.0 * tri / wedges2 if wedges2 > 0 else float("nan")


def avg_neighbor_degree(edges_ds, n):
    """Per-vertex average out-neighbor out-degree — the knn(v)
    degree-correlation curve of Pastor-Satorras et al. 2001, the
    standard web-graph hub-mixing measurement next to the scalar
    ``assortativity``. Over the distinct directed pattern P:
    ``knn(v) = mean_{u:(v,u)∈P} dout(u)`` with ``dout`` the distinct
    out-degree (0 for sinks).

    ONE ``plus_times`` spmv of P against the dense degree vector (the
    same kernel every iterative algorithm uses) + an O(n) driver
    division — the edge table is never collected.

    Returns a pyarrow Table ``(vid, val)`` for every vertex with at
    least one out-edge, 8-decimal rounded (oracle-stable)."""
    from ..core import GBVector
    from ..functions.aggregators import agg

    P = GBMatrix.from_dataset(_distinct_pattern(edges_ds), n, n)
    dout = P.reduce_rowwise(agg.count).to_dense(0.0).astype(np.float64)
    num = P.mxv(GBVector.from_dense(dout), _sr.plus_times).to_dense(0.0)
    present = dout > 0
    vids = np.nonzero(present)[0]
    return pa.table({
        "vid": vids.astype(np.int64),
        "val": np.round(num[present] / dout[present], 8) + 0.0,
    })


def rich_club(edges_ds, n, k=None):
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004): the edge
    density of the subgraph induced on "rich" vertices — those whose
    simple undirected degree exceeds ``k`` — i.e.
    ``φ(k) = 2·E_k / (n_k (n_k − 1))``. ``k=None`` uses the mean degree
    over non-isolated vertices (a deterministic, scale-free threshold).

    The degree membership mask is broadcast once (``ray.put``); E_k is
    ONE streaming membership-count pass over the symmetrized edge table
    (each undirected edge seen twice — the symmetric table cancels the
    2× in the numerator). Nothing is collected to the driver beyond the
    O(n) degree vector.

    Returns ``(k, n_k, phi)``; phi is nan when n_k < 2."""
    from ..functions.aggregators import agg
    from .triangles import simple_undirected

    A = simple_undirected(edges_ds, n)
    deg = A.reduce_rowwise(agg.count).to_dense(0.0)
    if k is None:
        nz = deg[deg > 0]
        k = float(nz.mean()) if len(nz) else 0.0
    rich = deg > k
    nk = int(rich.sum())
    if nk < 2:
        return float(k), nk, float("nan")
    ref = ray.put(rich)

    def count(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"c": [int((m[s] & m[d]).sum())]})

    tot = 0
    for b in A.ds.map_batches(count, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow", batch_size=None):
        tot += int(b["c"][0].as_py())
    return float(k), nk, tot / (nk * (nk - 1.0))


def powerlaw_alpha(edges_ds, n, degree="in"):
    """Discrete power-law exponent MLE for the degree distribution
    (Clauset-Shalizi-Newman 2009 eq. 3.7 at xmin=1):
    ``α = 1 + N / Σ_d ln(d / 0.5)`` over the ≥1 degrees of the distinct
    directed pattern — the standard "how heavy-tailed is the web graph"
    measurement (in-degree is the classic power-law case). One grouped
    degree reduction, then O(#present-vertices) driver math.

    Returns ``(alpha, n_used)``; alpha is nan when no vertex qualifies."""
    from ..functions.aggregators import agg

    P = GBMatrix.from_dataset(_distinct_pattern(edges_ds), n, n)
    red = (P.reduce_columnwise(agg.count) if degree == "in"
           else P.reduce_rowwise(agg.count))
    deg = red.to_dense(0.0)
    d = deg[deg > 0].astype(np.float64)
    if not len(d):
        return float("nan"), 0
    return 1.0 + len(d) / float(np.log(d / 0.5).sum()), int(len(d))


def attack_robustness(edges_ds, n, k_remove, num_partitions=4,
                      strategy="degree"):
    """Targeted-attack robustness (Albert-Jeong-Barabási 2000: "Error
    and attack tolerance of complex networks"): remove the ``k_remove``
    highest-degree hubs (ties by smallest vid — SQL-reproducible) from
    the simple undirected graph and measure the surviving giant
    component, the standard resilience probe of power-law webs.

    ``strategy="random"`` is the paper's ERROR-tolerance counterpart:
    remove ``k_remove`` pseudo-random present vertices instead — picked
    by smallest knuth32 hash of the vid (deterministic and plain-SQL
    reproducible, the same hash ``sampling.hash_split`` uses). Power-law
    graphs shatter under attack but barely notice random failure; the
    pair of numbers is the web-graph resilience fingerprint.

    Composition of existing scale pieces: one degree reduction → O(n)
    driver hub pick → broadcast keep-mask edge filter (one streaming
    map_batches, never collected) → pinned-engine FastSV connected
    components on the induced graph → O(n) size count.

    Returns ``(k_removed, n_kept, giant_frac)`` where ``giant_frac`` =
    largest surviving component size / kept vertices (isolated kept
    vertices count as size-1 components)."""
    from ..functions.aggregators import agg
    from .algorithms import build_engine, connected_components
    from .triangles import simple_undirected

    A = simple_undirected(edges_ds, n)
    deg = A.reduce_rowwise(agg.count).to_dense(0.0)
    present = np.nonzero(deg > 0)[0]
    if strategy == "degree":
        order = present[np.lexsort((present, -deg[present]))]
    elif strategy == "random":
        h = ((present.astype(np.uint64) % np.uint64(1 << 32))
             * np.uint64(2654435761)) % np.uint64(1 << 32)
        order = present[np.lexsort((present, h))]
    else:
        raise ValueError(f"unknown strategy: {strategy!r}")
    removed = order[:k_remove]
    keep = np.ones(n, dtype=bool)
    keep[removed] = False
    ref = ray.put(keep)

    def filt(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(m[s] & m[d]))

    induced = A.ds.map_batches(filt, batch_format="pyarrow")
    eng = build_engine(induced, n, num_partitions=num_partitions)
    try:
        f, _, _ = connected_components(eng)
    finally:
        eng.shutdown()
    _, counts = np.unique(f[keep], return_counts=True)
    n_kept = int(keep.sum())
    return len(removed), n_kept, float(counts.max()) / n_kept


def quadrilateral_count(edges_ds, n):
    """Number of 4-cycle (C4) subgraphs of the simple undirected graph —
    the bipartite-community fingerprint next to the triangle count
    (Wang et al.'s butterfly counting specialized to the unipartite
    diagonal-pair formulation): ``Q = ½ Σ_{u<v} C(u,v)·(C(u,v)−1)/2``
    with ``C = |N(u) ∩ N(v)|`` off ONE plus_pair mxm + strict-triu
    select. Each C4 {u,x,v,y} is seen exactly once from each of its two
    diagonal pairs {u,v} and {x,y}, hence the ½; chords don't matter
    (C4-as-subgraph). One matmul, one vectorized per-batch fold — no new
    exchange, no per-pair Python.

    Returns an int (exact — counts stay below 2⁵³).
    """
    from .triangles import simple_undirected

    A = simple_undirected(edges_ds, n)
    C = A.mxm(A.T, _sr.plus_pair).select("triu", 1)

    def fold(batch: pa.Table) -> pa.Table:
        c = batch["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"s": [float(np.sum(c * (c - 1.0) / 2.0))]})

    tot = 0.0
    for b in C.ds.map_batches(fold, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        tot += float(np.sum(b["s"].to_numpy(zero_copy_only=False)))
    return int(round(tot / 2.0))


def simrank(edges_ds, n, c=0.8, iters=2):
    """SimRank (Jeh-Widom 2002): two objects are similar when their
    IN-neighbors are similar — ``s(u,v) = c/(|I(u)||I(v)|) ·
    Σ_{i∈I(u), j∈I(v)} s(i,j)`` with ``s(x,x) = 1``, iterated from
    S₀ = I over the DISTINCT-edge simple graph.

    Each iteration is the engine's matmul chain — ``U = Aᵀ S A``
    (two ``plus_times`` mxms, the structural-similarity dual of
    cocitation's single ``AᵀA``) — followed by one vectorized scale
    pass ``(c·U(u,v)) / (d_u·d_v)`` against the broadcast in-degree
    vector, diagonal reset to 1. Sparse throughout: pairs with no
    common in-neighbor support never materialize.

    Returns a Dataset ``(u, v, s)`` over off-diagonal pairs ``u < v``
    (S is symmetric). Scale note: SimRank is inherently pair-dense on
    dense graphs — run it on a contracted/quotient graph (see
    ``contract_graph``) at web scale, like ``host_rank3`` does for
    PageRank.
    """
    pat = _distinct_pattern(edges_ds)

    def as_float(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["src"], "dst": batch["dst"],
                         "val": batch["val"].cast(pa.float64())})

    A = GBMatrix.from_dataset(
        pat.map_batches(as_float, batch_format="pyarrow"),
        nrows=n, ncols=n)
    ids, deg = A.reduce_columnwise("plus").to_coo(sort=True)
    dref = ray.put((ids, deg.astype(np.float64)))
    ident = ray.data.from_arrow(pa.table({
        "src": np.arange(n, dtype=np.int64),
        "dst": np.arange(n, dtype=np.int64),
        "val": np.ones(n, dtype=np.float64)}))

    S = GBMatrix.from_dataset(ident, nrows=n, ncols=n)
    off = None
    for _ in range(int(iters)):
        U = A.T.mxm(S, _sr.plus_times).mxm(A, _sr.plus_times)

        def scale(batch: pa.Table) -> pa.Table:
            u = batch["src"].to_numpy(zero_copy_only=False)
            v = batch["dst"].to_numpy(zero_copy_only=False)
            x = batch["val"].to_numpy(zero_copy_only=False)
            keep = u != v  # diagonal resets to 1 each iteration
            u, v, x = u[keep], v[keep], x[keep]
            dids, dvals = ray.get(dref)
            du = dvals[np.searchsorted(dids, u)]
            dv = dvals[np.searchsorted(dids, v)]
            # op order matches the SQL twin: (c·x) / (d_u·d_v)
            return pa.table({"src": u, "dst": v,
                             "val": c * x / (du * dv)})

        off = U.ds.map_batches(scale, batch_format="pyarrow")
        S = GBMatrix.from_dataset(off.union(ident), nrows=n, ncols=n)

    def upper(batch: pa.Table) -> pa.Table:
        u = batch["src"].to_numpy(zero_copy_only=False)
        v = batch["dst"].to_numpy(zero_copy_only=False)
        x = batch["val"].to_numpy(zero_copy_only=False)
        keep = u < v
        return pa.table({"u": u[keep], "v": v[keep], "s": x[keep]})

    seed = ray.data.from_arrow(pa.table(
        {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
         "s": pa.array([], pa.float64())}))
    if off is None:  # iters == 0
        return seed
    # union a 0-row schema'd seed: Ray's 0-row blocks skip map_batches
    # UDFs, so an empty result would otherwise lose its (u, v, s) schema
    return off.map_batches(upper, batch_format="pyarrow").union(seed)


def _degree_hist(edges_ds, n, endpoint):
    """Tiny (degree → vertex count) histogram of the simple-graph
    degree distribution over ALL ``n`` vertices (zero-degree bucket
    included) — degrees collapse to few distinct values, so the
    histogram is driver-size at any graph scale.  Returns
    ``(deg_values asc int64, counts int64)``."""
    from ..stages.reduce import grouped_agg

    deg = grouped_agg(_distinct_pattern(edges_ds), [endpoint],
                      [(endpoint, "count", "c")])
    hist = grouped_agg(deg, ["c"], [("c", "count", "k")])
    rows = [b for b in hist.iter_batches(batch_format="pyarrow",
                                         batch_size=None) if b.num_rows]
    if not rows:
        return (np.array([0], dtype=np.int64),
                np.array([n], dtype=np.int64))
    t = pa.concat_tables(rows, promote_options="permissive")
    d = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(d)
    d, k = d[order], k[order]
    zeros = n - int(k.sum())
    if zeros > 0:
        d = np.concatenate([[0], d])
        k = np.concatenate([[zeros], k])
    return d, k


def _rank2_map(d, k):
    """Doubled average ranks per degree value: ``rank2(deg) =
    2·cnt_less + cnt_eq + 1`` — INTEGER, so rank sums are exact."""
    less = np.concatenate([[0], np.cumsum(k)[:-1]])
    return 2 * less + k + 1


def degree_rank_correlation(edges_ds, n, num_partitions=None):
    """Spearman rank correlation between in-degree and out-degree over
    ALL ``n`` vertices of the simple directed graph — "are pages that
    are linked much also pages that link much?", the rank-statistics
    sibling of edgewise :func:`assortativity` (Pearson over edges).

    Determinism contract (bit-exact, NO grain): average ranks are
    carried DOUBLED (``2·cnt_less + cnt_eq + 1``) so every rank, rank
    product and partial sum is an INTEGER — exact in any merge order —
    and the final coefficient is a fixed 6-op IEEE sequence a SQL twin
    reproduces bit-for-bit.  (Int64-exact while ``4n³ < 2⁶²``; beyond
    that the partials switch to float64 and a grain applies.)

    Scale shape: degree ranks come from the driver-size degree
    HISTOGRAMS (no global sort, no dense O(n) vector); the per-vertex
    pass is ONE vertex-keyed hash exchange of the two (vertex, degree)
    tables (each |V⁺| rows, far smaller than the edge table) emitting
    O(1) integer moment partials per partition; zero-zero vertices
    (never linked, never linking) contribute in closed form."""
    import math

    import ray

    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import grouped_agg

    do, ko = _degree_hist(edges_ds, n, "src")
    di, ki = _degree_hist(edges_ds, n, "dst")
    ro, ri = _rank2_map(do, ko), _rank2_map(di, ki)
    exact = 4 * n * n * n < (1 << 62)
    sdt = np.int64 if exact else np.float64

    E = _distinct_pattern(edges_ds)
    od = grouped_agg(E, ["src"], [("src", "count", "c")])
    idg = grouped_agg(E, ["dst"], [("dst", "count", "c")])

    def tag(side):
        def f(b: pa.Table) -> pa.Table:
            v = b["src" if side == 0 else "dst"]
            return pa.table({"v": v, "c": b["c"],
                             "side": np.full(b.num_rows, side, np.int8)})
        return f

    both = od.map_batches(tag(0), batch_format="pyarrow").union(
        idg.map_batches(tag(1), batch_format="pyarrow"))

    zero = pa.table({k: pa.array([0], pa.int64()) for k in
                     ("m", "sx", "sy", "sxx", "syy", "sxy")})

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "v" not in t.column_names:
            return zero
        v = t["v"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["side"].to_numpy(zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        odeg = np.zeros(len(uv), dtype=np.int64)
        ideg = np.zeros(len(uv), dtype=np.int64)
        odeg[inv[s == 0]] = c[s == 0]
        ideg[inv[s == 1]] = c[s == 1]
        x = ro[np.searchsorted(do, odeg)].astype(sdt)
        y = ri[np.searchsorted(di, ideg)].astype(sdt)
        return pa.table({"m": [np.int64(len(uv))], "sx": [x.sum()],
                         "sy": [y.sum()], "sxx": [(x * x).sum()],
                         "syy": [(y * y).sum()], "sxy": [(x * y).sum()]})

    tot = {k: 0 for k in ("m", "sx", "sy", "sxx", "syy", "sxy")}
    for b in hash_exchange_apply(both, "v", moments,
                                 num_partitions=num_partitions) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0 or "m" not in b.column_names:
            continue
        for k in tot:
            tot[k] += b[k][0].as_py()
    # vertices with no links either way: rank2 of degree 0 on each axis
    m0 = n - tot["m"]
    x0 = int(ro[np.searchsorted(do, 0)]) if do[0] == 0 else None
    y0 = int(ri[np.searchsorted(di, 0)]) if di[0] == 0 else None
    if m0 > 0:
        tot["sx"] += m0 * x0
        tot["sy"] += m0 * y0
        tot["sxx"] += m0 * x0 * x0
        tot["syy"] += m0 * y0 * y0
        tot["sxy"] += m0 * x0 * y0
    num = n * tot["sxy"] - tot["sx"] * tot["sy"]
    dx = n * tot["sxx"] - tot["sx"] * tot["sx"]
    dy = n * tot["syy"] - tot["sy"] * tot["sy"]
    if dx <= 0 or dy <= 0:
        return float("nan")
    return float(num) / math.sqrt(float(dx) * float(dy))


def degree_gini(edges_ds, n, endpoint="src"):
    """Gini coefficient of the degree distribution over ALL ``n``
    vertices — how concentrated is linking (0 = uniform, →1 = a few
    hubs hold all edges), the standard web-graph inequality readout.

    Exact from the driver-size degree HISTOGRAM alone (no global sort:
    each degree value's run contributes ``d·(k·C₀ + k(k+1)/2)`` to the
    sorted weighted sum, which is tie-order invariant); all sums are
    Python INTEGERS, the final value is 4 fixed IEEE ops — bit-exact
    vs a SQL twin."""
    d, k = _degree_hist(edges_ds, n, endpoint)
    c0 = 0
    S = 0
    T = 0
    for dv, kv in zip(d.tolist(), k.tolist()):
        S += dv * (kv * c0 + kv * (kv + 1) // 2)
        T += dv * kv
        c0 += kv
    if T == 0:
        return 0.0
    return (2.0 * S) / float(n * T) - (float(n) + 1.0) / float(n)
