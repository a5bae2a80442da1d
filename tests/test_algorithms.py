"""Algorithm conformance: distributed engine vs single-process oracles on
the deterministic synthetic web graph (SURVEY §5 plan item 2).

PageRank: allclose 1e-6 AND identical superstep count. Components/labels/
triangles: exact.
"""

import numpy as np
import pytest
import ray
import ray.data

from python_graphblas_ray.pipelines.algorithms import (
    bfs_level,
    build_engine,
    connected_components,
    connected_components_numpy,
    label_propagation,
    label_propagation_numpy,
    pagerank,
    pagerank_numpy,
    sssp,
)
from python_graphblas_ray.pipelines.triangles import (
    simple_undirected,
    triangle_count,
    triangle_count_numpy,
)
from python_graphblas_ray.sources.pages import out_links
from python_graphblas_ray.state.checkpoint import CheckpointManager

N = 500


@pytest.fixture(scope="module")
def graph():
    src, dst = out_links(np.arange(N), N)
    # dedup directed edges
    packed = src * N + dst
    uniq = np.unique(packed)
    src, dst = uniq // N, uniq % N
    import pyarrow as pa
    w = ((src * 7 + dst * 13) % 10 + 1).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst, "val": w}))
    return src, dst, w, ds


@pytest.fixture(scope="module")
def engine(graph):
    src, dst, w, ds = graph
    eng = build_engine(ds, N, num_partitions=4)
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def undirected_engine(graph):
    src, dst, w, ds = graph
    eng = build_engine(ds, N, num_partitions=4, undirected=True)
    yield eng
    eng.shutdown()


def test_pagerank_matches_oracle(engine, graph):
    src, dst, w, ds = graph
    r, iters, metrics = pagerank(engine, tol=1e-6)
    r_np, iters_np = pagerank_numpy(src, dst, N, tol=1e-6)
    assert iters == iters_np, "superstep count must match the reference recipe"
    np.testing.assert_allclose(r, r_np, rtol=1e-6, atol=1e-12)
    assert len(metrics.records) == iters


def test_personalized_pagerank(engine, graph):
    """Personalized teleport vector: same recipe, biased restart set."""
    src, dst, w, ds = graph
    p = np.zeros(N)
    p[:10] = 0.1  # restart mass concentrated on vertices 0..9
    r, iters, _ = pagerank(engine, tol=1e-6, personalization=p)
    r_np, iters_np = pagerank_numpy(src, dst, N, tol=1e-6,
                                    personalization=p)
    assert iters == iters_np
    np.testing.assert_allclose(r, r_np, rtol=1e-6, atol=1e-12)
    # seeds hold more mass than under uniform teleport
    r_u, _, _ = pagerank(engine, tol=1e-6)
    assert r[:10].sum() > r_u[:10].sum()


def test_pagerank_inactor_matches_oracle(engine, graph):
    """In-actor PageRank (vertex state partitioned into the actors, O(P)
    driver per superstep) must be bit-for-bit the same recipe: identical
    superstep count and allclose values."""
    src, dst, w, ds = graph
    r, iters = engine.pagerank_inactor(tol=1e-6)
    r_np, iters_np = pagerank_numpy(src, dst, N, tol=1e-6)
    assert iters == iters_np
    np.testing.assert_allclose(r, r_np, rtol=1e-6, atol=1e-12)


def test_scan_partition_mode_matches_sort(graph):
    """partition_mode='scan' (no shuffle; actors range-filter the shared
    blocks) must produce the identical engine results."""
    from python_graphblas_ray.state.superstep import SuperstepEngine
    src, dst, w, ds = graph
    eng = SuperstepEngine(ds, N, num_partitions=3, partition_mode="scan")
    r, iters = eng.pagerank_inactor(tol=1e-6)
    r_np, iters_np = pagerank_numpy(src, dst, N, tol=1e-6)
    assert iters == iters_np
    np.testing.assert_allclose(r, r_np, rtol=1e-6, atol=1e-12)
    x = np.arange(N, dtype=np.float64)
    y = eng.spmv("plus_second", x)
    expect = np.bincount(dst, weights=x[src], minlength=N)
    np.testing.assert_allclose(y, expect)
    eng.shutdown()


def test_connected_components_inactor(undirected_engine, graph):
    """In-actor FastSV: exact same labels and superstep count as the
    driver loop and the numpy oracle."""
    src, dst, w, ds = graph
    f, iters = undirected_engine.connected_components_inactor()
    expect = connected_components_numpy(src, dst, N)
    np.testing.assert_array_equal(f, expect)
    f2, iters2, _ = connected_components(undirected_engine)
    assert iters == iters2


def test_hub_split_skewed_graph():
    """Power-law skew: one vertex receives ~60% of all edges. With
    hub_split_factor the oversized dst range is split across duplicate
    actors and _stitch monoid-merges their partials — results must be
    identical to the unsplit engine and the numpy oracle."""
    import pyarrow as pa
    from python_graphblas_ray.state.superstep import SuperstepEngine
    rng = np.random.default_rng(5)
    n = 200
    # 3000 edges into the hub (vertex 7), 2000 spread elsewhere
    hub_src = rng.integers(0, n, 3000)
    oth_src = rng.integers(0, n, 2000)
    oth_dst = rng.integers(0, n, 2000)
    src = np.concatenate([hub_src, oth_src]).astype(np.int64)
    dst = np.concatenate([np.full(3000, 7), oth_dst]).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst, "val": np.ones(len(src))}))
    eng = SuperstepEngine(ds, n, num_partitions=4, hub_split_factor=1.5)
    assert eng.has_hub_split, "the planted hub must trigger splitting"
    assert len(eng.actors) > 4
    x = rng.random(n)
    got = eng.spmv("plus_second", x)
    expect = np.bincount(dst, weights=x[src], minlength=n)
    np.testing.assert_allclose(got, expect)
    got_min = eng.spmv("min_second", x)
    exp_min = np.full(n, np.inf)
    np.minimum.at(exp_min, dst, x[src])
    np.testing.assert_allclose(got_min, exp_min)
    # pagerank via the monoid-merging driver loop still matches
    r, iters, _ = pagerank(eng, tol=1e-6)
    r_np, iters_np = pagerank_numpy(src, dst, n, tol=1e-6)
    assert iters == iters_np
    np.testing.assert_allclose(r, r_np, rtol=1e-6, atol=1e-12)
    # LPA mode kernel on the split engine: the sparse count-merge across
    # split hub partitions must equal a hand argmax over all in-edges
    lab0 = np.arange(n, dtype=np.int64)
    got_mode = eng.mode(lab0)
    exp_mode = np.full(n, -1, dtype=np.int64)
    packed = (dst.astype(np.int64) << np.int64(31)) | lab0[src]
    uniq, counts = np.unique(packed, return_counts=True)
    ud = uniq >> np.int64(31)
    ul = uniq & np.int64((1 << 31) - 1)
    order = np.lexsort((ul, -counts, ud))
    ud_s = ud[order]
    first = np.empty(len(ud_s), dtype=bool)
    first[0] = True
    first[1:] = ud_s[1:] != ud_s[:-1]
    exp_mode[ud_s[first]] = ul[order][first]
    np.testing.assert_array_equal(got_mode, exp_mode)
    eng.shutdown()


def test_pagerank_checkpoint_resume(engine, graph, tmp_path):
    src, dst, w, ds = graph
    ck = CheckpointManager(str(tmp_path), "pr_run", num_partitions=3)
    r_full, iters, _ = pagerank(engine, tol=1e-6, checkpoint=ck,
                                checkpoint_every=3)
    # resume from the latest checkpoint: must converge to identical result
    latest = ck.latest()
    assert latest is not None and latest[0] < iters
    r_resumed, iters2, _ = pagerank(engine, tol=1e-6, checkpoint=ck,
                                    checkpoint_every=3)
    np.testing.assert_array_equal(r_full, r_resumed)
    assert iters2 >= latest[0]


def test_cc_and_lpa_checkpoint_resume(undirected_engine, graph, tmp_path):
    """CC and LPA follow pagerank's checkpoint protocol: snapshot every
    N supersteps, resume from latest, identical final state."""
    from python_graphblas_ray.pipelines.algorithms import label_propagation

    src, dst, w, ds = graph
    ck = CheckpointManager(str(tmp_path), "cc_run", num_partitions=3)
    f_full, iters, _ = connected_components(undirected_engine,
                                            checkpoint=ck,
                                            checkpoint_every=1)
    latest = ck.latest()
    assert latest is not None and latest[0] < iters
    f_resumed, iters2, _ = connected_components(undirected_engine,
                                                checkpoint=ck,
                                                checkpoint_every=1)
    np.testing.assert_array_equal(f_full, f_resumed)
    assert iters2 >= latest[0]

    ck2 = CheckpointManager(str(tmp_path), "lpa_run", num_partitions=3)
    l_full, li, _ = label_propagation(undirected_engine, checkpoint=ck2,
                                      checkpoint_every=1)
    latest2 = ck2.latest()
    assert latest2 is not None
    l_resumed, li2, _ = label_propagation(undirected_engine,
                                          checkpoint=ck2,
                                          checkpoint_every=1)
    np.testing.assert_array_equal(l_full, l_resumed)


def test_connected_components_exact(undirected_engine, graph):
    src, dst, w, ds = graph
    f, supersteps, _ = connected_components(undirected_engine)
    f_np = connected_components_numpy(src, dst, N)
    np.testing.assert_array_equal(f, f_np)
    # every component label is the min vertex id in the component
    for lbl in np.unique(f):
        members = np.flatnonzero(f == lbl)
        assert lbl == members.min()


def test_bfs_level(engine, graph):
    src, dst, w, ds = graph
    v, _ = bfs_level(engine, source=0)
    # numpy BFS oracle along edge direction
    import collections
    adj = collections.defaultdict(list)
    for s, d in zip(src, dst):
        adj[s].append(d)
    dist = {0: 0}
    frontier = [0]
    lvl = 0
    while frontier:
        lvl += 1
        nxt = []
        for u in frontier:
            for x in adj[u]:
                if x not in dist:
                    dist[x] = lvl
                    nxt.append(x)
        frontier = nxt
    expect = np.full(N, -1, dtype=np.int64)
    for k, lv in dist.items():
        expect[k] = lv
    np.testing.assert_array_equal(v, expect)


def test_sssp(graph):
    src, dst, w, ds = graph
    eng = build_engine(ds, N, num_partitions=4, weighted=True)
    try:
        dist, _ = sssp(eng, source=0)
    finally:
        eng.shutdown()
    # Bellman-Ford oracle
    expect = np.full(N, np.inf)
    expect[0] = 0.0
    for _ in range(N):
        nd = expect[src] + w
        new = expect.copy()
        np.minimum.at(new, dst, nd)
        if np.array_equal(new, expect):
            break
        expect = new
    np.testing.assert_allclose(dist, expect)


def test_label_propagation_deterministic(undirected_engine, graph):
    src, dst, w, ds = graph
    labels, iters, _ = label_propagation(undirected_engine, itermax=20)
    expect = label_propagation_numpy(src, dst, N, itermax=20)
    np.testing.assert_array_equal(labels, expect)


def test_label_propagation_inactor(undirected_engine, graph):
    """In-actor LPA: identical labels and superstep count to the driver
    loop and the numpy oracle."""
    src, dst, w, ds = graph
    labels, iters = undirected_engine.label_propagation_inactor(itermax=20)
    expect = label_propagation_numpy(src, dst, N, itermax=20)
    np.testing.assert_array_equal(labels, expect)
    labels2, iters2, _ = label_propagation(undirected_engine, itermax=20)
    assert iters == iters2


def test_triangle_count(graph):
    src, dst, w, ds = graph
    A = simple_undirected(ds, N)
    got = triangle_count(A)
    expect = triangle_count_numpy(src, dst, N)
    assert got == expect
    assert got > 0  # sanity: the synthetic graph has triangles


def test_triangle_count_broadcast(graph):
    from python_graphblas_ray.pipelines.triangles import (
        triangle_count_broadcast)
    src, dst, w, ds = graph
    got = triangle_count_broadcast(ds, num_tasks=4)
    assert got == triangle_count_numpy(src, dst, N)


def test_small_triangle():
    import pyarrow as pa
    from python_graphblas_ray.pipelines.triangles import (
        triangle_count_broadcast)
    # K4 minus one edge has 2 triangles
    src = np.array([0, 0, 0, 1, 1], dtype=np.int64)
    dst = np.array([1, 2, 3, 2, 3], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst, "val": np.ones(5)}))
    A = simple_undirected(ds, 4)
    assert triangle_count(A) == 2
    assert triangle_count_broadcast(ds, num_tasks=2) == 2
    assert triangle_count_numpy(src, dst, 4) == 2


def test_skewed_dst_no_spurious_hub_split_flag():
    """All edges share one dst → repeated quantile boundaries produce
    duplicate EMPTY ranges; that must not trip has_hub_split (ADVICE r1)
    and the in-actor algorithms must still run."""
    import pyarrow as pa
    n = 64
    src = np.arange(1, 41, dtype=np.int64)
    dst = np.zeros(40, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst, "val": np.ones(40)}))
    eng = build_engine(ds, n, num_partitions=4,
                       sample_size=1000)  # quantiles collapse to 0
    try:
        if all(hi <= lo for lo, hi in eng.ranges[:-1]):
            assert not eng.has_hub_split
        r, iters, _ = pagerank(eng, tol=1e-8)
        assert np.argmax(r) == 0  # the sink hub gets the mass
    finally:
        eng.shutdown()


def test_bfs_parent(graph, engine):
    from python_graphblas_ray.pipelines.algorithms import (
        bfs_parent, bfs_parent_numpy)
    src, dst, w, ds = graph
    got, _ = bfs_parent(engine, source=0)
    want = bfs_parent_numpy(src, dst, N, 0)
    np.testing.assert_array_equal(got, want)
    assert got[0] == 0 and (got >= -1).all()


def test_symmetrized_engine_matches_fresh_build(engine, undirected_engine,
                                                graph):
    """Engine derived via symmetrized() (actor-side exchange, no dataset
    re-shuffle) must agree with a fresh undirected build: same total edge
    count, identical CC labels + superstep count, identical LPA labels,
    and identical min_second spmv slices."""
    src, dst, w, ds = graph
    sym = engine.symmetrized()
    try:
        assert sym.num_edges == undirected_engine.num_edges
        f1, it1 = sym.connected_components_inactor()
        f2, it2 = undirected_engine.connected_components_inactor()
        np.testing.assert_array_equal(f1, f2)
        assert it1 == it2
        l1, li1 = sym.label_propagation_inactor(itermax=20)
        l2, li2 = undirected_engine.label_propagation_inactor(itermax=20)
        np.testing.assert_array_equal(l1, l2)
        assert li1 == li2
        x = np.arange(N, dtype=np.float64) % 17
        np.testing.assert_allclose(sym.spmv("plus_second", x),
                                   undirected_engine.spmv("plus_second", x))
    finally:
        sym.shutdown()


def test_symmetrized_engine_weighted(graph):
    """Weighted derived engine carries edge weights both directions."""
    src, dst, w, ds = graph
    eng = build_engine(ds, N, num_partitions=4, weighted=True)
    ref = build_engine(ds, N, num_partitions=4, weighted=True,
                       undirected=True)
    sym = eng.symmetrized()
    try:
        x = np.linspace(0.0, 3.0, N)
        np.testing.assert_allclose(sym.spmv("min_plus", x),
                                   ref.spmv("min_plus", x))
    finally:
        sym.shutdown()
        eng.shutdown()
        ref.shutdown()


# ---------------------------------------------------------------------------
# SCC (forward/backward min-label peeling)
# ---------------------------------------------------------------------------

def _scc_brute(src, dst, n):
    """Transitive-closure oracle: comp[v] = min{u : u↔v mutually
    reachable} (boolean matrix powers — fine at test sizes)."""
    R = np.eye(n, dtype=bool)
    R[src, dst] = True
    while True:
        R2 = R | (R @ R)
        if np.array_equal(R2, R):
            break
        R = R2
    mutual = R & R.T
    return np.array([np.flatnonzero(row).min() for row in mutual],
                    dtype=np.int64)


def test_scc_numpy_matches_transitive_closure():
    from python_graphblas_ray.pipelines.algorithms import scc_numpy

    rng = np.random.default_rng(11)
    for trial in range(5):
        n = int(rng.integers(8, 40))
        m = int(rng.integers(n, 4 * n))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        got = scc_numpy(src, dst, n)
        want = _scc_brute(src, dst, n)
        np.testing.assert_array_equal(got, want)


def test_scc_cycle_plus_tail():
    """3-cycle + tail + isolated vertex: cycle collapses, rest singleton."""
    from python_graphblas_ray.pipelines.algorithms import scc_numpy

    src = np.array([0, 1, 2, 2, 3])
    dst = np.array([1, 2, 0, 3, 4])
    comp = scc_numpy(src, dst, 6)
    np.testing.assert_array_equal(comp, [0, 0, 0, 3, 4, 5])


def test_scc_engine_matches_numpy(graph, engine):
    from python_graphblas_ray.pipelines.algorithms import scc, scc_numpy

    src, dst, w, ds = graph
    comp, rounds, metrics = scc(engine)
    np.testing.assert_array_equal(comp, scc_numpy(src, dst, N))
    assert rounds >= 1
    assert any(r["algorithm"] == "scc_fwd" for r in metrics.records)


# ---------------------------------------------------------------------------
# MIS and greedy coloring (iterated MIS)
# ---------------------------------------------------------------------------

def _simple_sym(rng, n, m):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return src[keep], dst[keep]


def test_mis_numpy_is_maximal_and_independent():
    from python_graphblas_ray.pipelines.algorithms import (
        maximal_independent_set_numpy)

    rng = np.random.default_rng(3)
    for _ in range(5):
        n = int(rng.integers(10, 60))
        src, dst = _simple_sym(rng, n, int(rng.integers(n, 5 * n)))
        mis = maximal_independent_set_numpy(src, dst, n)
        s = np.concatenate([src, dst])
        d = np.concatenate([dst, src])
        # independent: no edge inside the set
        assert not np.any(mis[s] & mis[d])
        # maximal: every non-member has a member neighbor
        has_mis_nbr = np.zeros(n, dtype=bool)
        has_mis_nbr[d[mis[s]]] = True
        assert np.all(mis | has_mis_nbr)


def test_color_numpy_is_valid_coloring():
    from python_graphblas_ray.pipelines.algorithms import greedy_color_numpy

    rng = np.random.default_rng(4)
    for _ in range(5):
        n = int(rng.integers(10, 60))
        src, dst = _simple_sym(rng, n, int(rng.integers(n, 5 * n)))
        color, k = greedy_color_numpy(src, dst, n)
        assert (color >= 0).all() and color.max() + 1 == k
        s = np.concatenate([src, dst])
        d = np.concatenate([dst, src])
        assert not np.any(color[s] == color[d])


def test_mis_and_color_engine_match_numpy(graph, undirected_engine):
    from python_graphblas_ray.pipelines.algorithms import (
        greedy_color, greedy_color_numpy, maximal_independent_set,
        maximal_independent_set_numpy)

    src, dst, w, ds = graph
    mis, rounds, _ = maximal_independent_set(undirected_engine)
    np.testing.assert_array_equal(
        mis, maximal_independent_set_numpy(src, dst, N))
    assert rounds >= 1
    color, k, _ = greedy_color(undirected_engine)
    want, want_k = greedy_color_numpy(src, dst, N)
    np.testing.assert_array_equal(color, want)
    assert k == want_k


def test_closeness_engine_matches_numpy(graph, engine):
    from python_graphblas_ray.pipelines.algorithms import (
        closeness_centrality, closeness_centrality_numpy)

    src, dst, w, ds = graph
    srcs = [0, 7, 42, 99]
    got, _ = closeness_centrality(engine, sources=srcs)
    np.testing.assert_allclose(
        got, closeness_centrality_numpy(src, dst, N, sources=srcs))
    got_c, _ = closeness_centrality(engine, sources=srcs, harmonic=False)
    np.testing.assert_allclose(
        got_c, closeness_centrality_numpy(src, dst, N, sources=srcs,
                                          harmonic=False))


def test_closeness_numpy_line_graph():
    """Directed path 0→1→2→3, source 0: harmonic C = [0, 1, 1/2, 1/3]."""
    from python_graphblas_ray.pipelines.algorithms import (
        closeness_centrality_numpy)

    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    np.testing.assert_allclose(
        closeness_centrality_numpy(src, dst, 4, sources=[0]),
        [0.0, 1.0, 0.5, round(1 / 3, 8)])


def test_contract_graph_equals_mxm_recipe(graph):
    """contract_graph == S.T @ A @ S (plus_times) for the one-hot
    assignment matrix S — the GraphBLAS quotient-graph recipe."""
    from python_graphblas_ray.core import GBMatrix
    from python_graphblas_ray.functions.monoids import semiring
    from python_graphblas_ray.pipelines.algorithms import contract_graph

    src, dst, w, ds = graph
    A = GBMatrix.from_dataset(ds, N, N)
    labels = (np.arange(N, dtype=np.int64) * 7) % 16
    C = contract_graph(A, labels, k=16)
    S = GBMatrix.from_coo(np.arange(N, dtype=np.int64), labels,
                          np.ones(N), nrows=N, ncols=16)
    C2 = S.T.mxm(A.mxm(S, semiring.plus_times), semiring.plus_times)
    r1, c1, v1 = C.to_coo()
    r2, c2, v2 = C2.to_coo()
    o1 = np.lexsort((c1, r1)); o2 = np.lexsort((c2, r2))
    np.testing.assert_array_equal(r1[o1], r2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])
    np.testing.assert_allclose(v1[o1], v2[o2])


def test_approx_diameter_path_graph_exact():
    """Double sweep is exact on a path: 0→1→…→9 has diameter 9."""
    import pyarrow as pa

    from python_graphblas_ray.pipelines.algorithms import (
        approx_diameter, build_engine)

    n = 10
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    ds = ray.data.from_arrow(pa.table({
        "src": np.concatenate([src, dst]),
        "dst": np.concatenate([dst, src]),
        "val": np.ones(2 * (n - 1))}))
    eng = build_engine(ds, n, num_partitions=2)
    d, (u, v), _ = approx_diameter(eng, start=3)
    eng.shutdown()
    assert d == 9 and {u, v} <= {0, 9, 3}


def test_approx_diameter_monotone_in_sweeps(engine):
    from python_graphblas_ray.pipelines.algorithms import approx_diameter

    d1, _, _ = approx_diameter(engine, sweeps=1)
    d2, _, _ = approx_diameter(engine, sweeps=2)
    assert d2 >= d1 >= 0


def test_add_edges_incremental_equals_full_build(graph):
    """build(A) + add_edges(B) must behave exactly like build(A ∪ B):
    same edge count, same spmv, same pagerank (values AND supersteps)."""
    import pyarrow as pa

    from python_graphblas_ray.state.superstep import SuperstepEngine

    src, dst, w, ds = graph
    half = len(src) // 2
    dsA = ray.data.from_arrow(pa.table({
        "src": src[:half], "dst": dst[:half], "val": w[:half]}))
    dsB = ray.data.from_arrow(pa.table({
        "src": src[half:], "dst": dst[half:], "val": w[half:]}))
    inc = SuperstepEngine(dsA, N, num_partitions=4,
                          hub_split_factor=None)
    inc.add_edges(dsB)
    full = SuperstepEngine(ds, N, num_partitions=4,
                           hub_split_factor=None)
    assert inc.num_edges == full.num_edges
    x = np.linspace(0.0, 1.0, N)
    np.testing.assert_allclose(inc.spmv("plus_second", x),
                               full.spmv("plus_second", x))
    r1, it1 = inc.pagerank_inactor(tol=1e-8)
    r2, it2 = full.pagerank_inactor(tol=1e-8)
    assert it1 == it2
    np.testing.assert_allclose(r1, r2)
    inc.shutdown()
    full.shutdown()


def test_weighted_pagerank_matches_numpy_and_reduces_to_unweighted(graph):
    """weighted=True over the weighted engine == numpy weighted oracle
    (values + superstep count); with unit weights it reproduces the
    unweighted recipe exactly."""
    import pyarrow as pa

    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, pagerank, pagerank_numpy)

    src, dst, w, ds = graph
    eng_w = build_engine(ds, N, num_partitions=4, weighted=True)
    r, it, _ = pagerank(eng_w, tol=1e-8, weighted=True)
    want, want_it = pagerank_numpy(src, dst, N, tol=1e-8, w=w)
    assert it == want_it
    np.testing.assert_allclose(r, want, atol=1e-12)
    # unit weights ⇒ identical to the unweighted recipe
    ones = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst, "val": np.ones(len(src))}))
    eng_1 = build_engine(ones, N, num_partitions=4, weighted=True)
    r1, it1, _ = pagerank(eng_1, tol=1e-8, weighted=True)
    r0, it0 = pagerank_numpy(src, dst, N, tol=1e-8)
    assert it1 == it0
    np.testing.assert_allclose(r1, r0, atol=1e-12)
    eng_w.shutdown()
    eng_1.shutdown()


def test_ppr_push_under_approximates_exact(graph, engine):
    """ACL push: p ≤ exact PPR pointwise (monotone under-approximation),
    ‖exact − p‖₁ ≤ ‖r‖₁, and every terminal residual under threshold."""
    from python_graphblas_ray.pipelines.algorithms import (
        ppr_exact_numpy, ppr_push)

    src, dst, w, ds = graph
    seeds = [3, 77]
    p, r, rounds, _ = ppr_push(engine, seeds, alpha=0.15, eps=1e-6)
    exact = ppr_exact_numpy(src, dst, N, seeds, alpha=0.15)
    d = np.bincount(src, minlength=N).astype(float)
    assert rounds >= 1
    assert (r <= 1e-6 * np.maximum(d, 1.0) + 1e-15).all()
    assert (p <= exact + 1e-9).all()
    assert np.abs(exact - p).sum() <= r.sum() + 1e-9
    # tighter eps → closer approximation
    p2, r2, _, _ = ppr_push(engine, seeds, alpha=0.15, eps=1e-8)
    assert np.abs(exact - p2).sum() <= np.abs(exact - p).sum() + 1e-12


def test_wl_refinement_engine_matches_numpy(graph, engine):
    """1-WL sum-hash fingerprints: the register_step("add") superstep
    path (wrapping uint64 sums, hub-split merge) equals the single-
    process recipe exactly, for both the degree seed and the labels."""
    from python_graphblas_ray.pipelines.algorithms import (
        wl_refinement, wl_refinement_numpy)

    src, dst, w, ds = graph
    deg, lab = wl_refinement(engine, N, rounds=2)
    deg_np, lab_np = wl_refinement_numpy(src, dst, N, rounds=2)
    assert deg.dtype == np.uint64 and lab.dtype == np.uint64
    np.testing.assert_array_equal(deg, deg_np)
    np.testing.assert_array_equal(lab, lab_np)


def test_wl_refinement_separates_and_unifies():
    """Structural semantics: on a directed 4-cycle every vertex is
    1-WL-equivalent (one shared fingerprint); appending a pendant edge
    breaks the symmetry — and vertices at distinct distances from the
    pendant separate while the WL-equivalent pair keeps colliding."""
    from python_graphblas_ray.pipelines.algorithms import (
        wl_refinement_numpy)

    cyc = np.array([0, 1, 2, 3]), np.array([1, 2, 3, 0])
    _, lab = wl_refinement_numpy(cyc[0], cyc[1], 4, rounds=2)
    assert len(set(lab.tolist())) == 1
    # 4 -> 0 pendant in-edge: vertex 0 now has in-degree 2
    src = np.array([0, 1, 2, 3, 4])
    dst = np.array([1, 2, 3, 0, 0])
    _, lab2 = wl_refinement_numpy(src, dst, 5, rounds=2)
    assert lab2[0] != lab2[1]          # deg-2 target vs downstream
    assert lab2[1] != lab2[2]          # distance-1 vs distance-2 from 0
    assert lab2[4] != lab2[3]          # source-only pendant differs
