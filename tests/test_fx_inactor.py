"""In-actor frontier-fixpoint family parity (round-4 verdict item 1).

Every ``*_inactor`` variant must match its O(n)-driver broadcast twin
in ``pipelines/algorithms.py`` EXACTLY — values AND superstep counts —
on both unsplit and hub-split engines (hub-split results are required
bit-identical to unsplit: the leader merges are idempotent monoids).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from python_graphblas_ray.pipelines.algorithms import (
    bfs_level,
    bfs_parent,
    bipartite_check,
    build_engine,
    connected_components,
    dag_layers,
    greedy_color,
    maximal_independent_set,
    scc,
    sssp,
    widest_path_fixed,
)
from python_graphblas_ray.state.superstep import SuperstepEngine

N = 400


def _rand_graph(seed=5, m=2600, n=N):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    uniq = np.unique(src * n + dst)
    src, dst = (uniq // n).astype(np.int64), (uniq % n).astype(np.int64)
    w = ((src * 7 + dst * 13) % 10 + 1).astype(np.float64)
    return src, dst, w


@pytest.fixture(scope="module")
def graph(ray_session):
    src, dst, w = _rand_graph()
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "val": w}))
    return src, dst, w, ds


@pytest.fixture(scope="module")
def engines(graph):
    """(directed weighted, directed weighted hub-split) engines."""
    _, _, _, ds = graph
    plain = build_engine(ds, N, num_partitions=4, weighted=True,
                         hub_split_factor=0)
    split = SuperstepEngine(ds, N, num_partitions=4, weighted=True,
                            hub_split_factor=1.02)
    yield plain, split
    plain.shutdown()
    split.shutdown()


@pytest.fixture(scope="module")
def und_engines(graph):
    _, _, _, ds = graph
    plain = build_engine(ds, N, num_partitions=4, undirected=True,
                         weighted=True, hub_split_factor=0)
    yield plain
    plain.shutdown()


def _n_records(metrics, alg=None):
    if alg is None:
        return len(metrics.records)
    return sum(1 for r in metrics.records if r.get("algorithm") == alg)


def test_bfs_level_inactor_parity(engines):
    plain, split = engines
    want, m_b = bfs_level(plain, source=0)
    for eng in (plain, split):
        got, m_i = eng.bfs_level_inactor(0)
        assert np.array_equal(got, want)
        assert _n_records(m_i) == _n_records(m_b)


def test_bfs_parent_inactor_parity(engines):
    plain, split = engines
    want, m_b = bfs_parent(plain, source=0)
    for eng in (plain, split):
        got, m_i = eng.bfs_parent_inactor(0)
        assert np.array_equal(got, want)
        assert _n_records(m_i) == _n_records(m_b)


def test_sssp_inactor_parity(engines):
    plain, split = engines
    want, m_b = sssp(plain, source=0)
    for eng in (plain, split):
        got, m_i = eng.sssp_inactor(0)
        assert np.array_equal(got, want)  # bit-exact: min-only merges
        assert _n_records(m_i) == _n_records(m_b)


def test_sssp_inactor_itermax_cap(engines):
    plain, _ = engines
    want, _ = sssp(plain, source=0, itermax=3)
    got, _ = plain.sssp_inactor(0, itermax=3)
    assert np.array_equal(got, want)


def test_dag_layers_inactor_parity(ray_session):
    # DAG: only u < v edges
    src, dst, w = _rand_graph(seed=9)
    keep = src < dst
    ds = ray.data.from_arrow(pa.table({
        "src": src[keep], "dst": dst[keep], "val": w[keep]}))
    plain = build_engine(ds, N, num_partitions=4, hub_split_factor=0)
    split = SuperstepEngine(ds, N, num_partitions=4,
                            hub_split_factor=1.02)
    try:
        want, it_b, _ = dag_layers(plain)
        for eng in (plain, split):
            got, it_i, _ = eng.dag_layers_inactor()
            assert np.array_equal(got, want)
            assert it_i == it_b
    finally:
        plain.shutdown()
        split.shutdown()


def test_dag_layers_inactor_cycle_raises(engines):
    plain, _ = engines  # the random directed graph has cycles
    with pytest.raises(ValueError, match="cycle"):
        plain.dag_layers_inactor(itermax=30)


def test_widest_inactor_parity(graph, engines):
    src, dst, w, ds = graph
    plain, split = engines
    from python_graphblas_ray.core import GBMatrix

    A = GBMatrix.from_coo(src, dst, w, nrows=N, ncols=N)
    ids, vals = widest_path_fixed(A, source=0, iters=4).to_coo(sort=True)
    for eng in (plain, split):
        dense = eng.widest_inactor(0, iters=4)
        reached = np.flatnonzero(np.isfinite(dense) | (dense == np.inf))
        got_ids = np.flatnonzero(dense > -np.inf)
        assert np.array_equal(got_ids, np.asarray(ids))
        assert np.array_equal(dense[got_ids], np.asarray(vals))
        del reached


def test_mis_inactor_parity(und_engines):
    und = und_engines
    want, rounds_b, _ = maximal_independent_set(und)
    got, rounds_i, _ = und.mis_inactor()
    assert np.array_equal(got, want)
    assert rounds_i == rounds_b
    # restricted run (the greedy_color per-class shape)
    active = np.zeros(N, dtype=bool)
    active[: N // 2] = True
    w2, r2, _ = maximal_independent_set(und, active_init=active)
    g2, ri2, _ = und.mis_inactor(active_init=active)
    assert np.array_equal(g2, w2)
    assert ri2 == r2


def test_greedy_color_inactor_parity(und_engines):
    und = und_engines
    want, k_b, _ = greedy_color(und)
    got, k_i, _ = und.greedy_color_inactor()
    assert np.array_equal(got, want)
    assert k_i == k_b


def test_scc_inactor_parity(engines):
    plain, split = engines
    want, rounds_b, _ = scc(plain)
    for eng in (plain, split):
        got, rounds_i, _ = eng.scc_inactor()
        assert np.array_equal(got, want)
        assert rounds_i == rounds_b


def test_bipartite_inactor_parity(graph, und_engines):
    src, dst, w, ds = graph
    und = und_engines
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(ds, N)
    comp, _, _ = connected_components(und)
    want = bipartite_check(und, A, comp, max_rounds=40)
    got = und.bipartite_inactor(comp=comp, max_rounds=40)
    assert got.num_rows == want.num_rows
    for c in ("comp", "n", "n_conflicts"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_bipartite_inactor_reads_pinned_cc(und_engines):
    """comp=None: bipartite chains off the pinned FastSV state."""
    und = und_engines
    comp, _ = und.connected_components_inactor()
    got = und.bipartite_inactor()
    want = und.bipartite_inactor(comp=comp)
    for c in ("comp", "n", "n_conflicts"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy())


def test_hub_split_is_bit_identical_on_mis_family(graph, ray_session):
    """MIS/greedy/bipartite on a hub-split UNDIRECTED engine built from
    a pre-deduped simple input (no duplicate survivors possible) must
    bit-match the unsplit engine. The module graph's quantiles never
    actually split at factor 1.02, so a SKEWED star overlay (asserted
    ``has_hub_split``) rides the same assertions below."""
    src, dst, w, ds = graph
    plain = build_engine(ds, N, num_partitions=4, undirected=True,
                         weighted=True, hub_split_factor=0)
    split = build_engine(ds, N, num_partitions=4, undirected=True,
                         weighted=True, hub_split_factor=1.02)
    # genuinely split pair: a hub star (all edges touch vertex 0)
    s2 = np.arange(1, 400, dtype=np.int64)
    d2 = np.zeros(399, dtype=np.int64)
    ds2 = ray.data.from_arrow(pa.table(
        {"src": s2, "dst": d2, "val": np.ones(399)}))
    plain2 = build_engine(ds2, 400, num_partitions=4, undirected=True,
                          hub_split_factor=0)
    split2 = build_engine(ds2, 400, num_partitions=4, undirected=True,
                          hub_split_factor=1.02)
    assert split2.has_hub_split
    try:
        for a, b in ((plain2, split2),):
            mp, rp, _ = a.mis_inactor()
            ms, rs, _ = b.mis_inactor()
            assert np.array_equal(mp, ms) and rp == rs
            cp, kp, _ = a.greedy_color_inactor()
            cs, ks, _ = b.greedy_color_inactor()
            assert np.array_equal(cp, cs) and kp == ks
            comp_p, _ = a.connected_components_inactor()
            comp_s, _ = b.connected_components_inactor()
            assert np.array_equal(comp_p, comp_s)
    finally:
        plain2.shutdown()
        split2.shutdown()
    try:
        mp, rp, _ = plain.mis_inactor()
        ms, rs, _ = split.mis_inactor()
        assert np.array_equal(mp, ms) and rp == rs
        cp, kp, _ = plain.greedy_color_inactor()
        cs, ks, _ = split.greedy_color_inactor()
        assert np.array_equal(cp, cs) and kp == ks
        comp_p, _ = plain.connected_components_inactor()
        comp_s, _ = split.connected_components_inactor()
        assert np.array_equal(comp_p, comp_s)
        bp = plain.bipartite_inactor()
        bs = split.bipartite_inactor()
        for c in ("comp", "n", "n_conflicts"):
            assert np.array_equal(bp[c].to_numpy(), bs[c].to_numpy())
    finally:
        plain.shutdown()
        split.shutdown()


def test_closeness_inactor_parity(engines):
    """closeness_inactor == the former broadcast fold, bit-level, on
    plain AND hub-split engines (integer levels, per-source order)."""
    import numpy as np

    from python_graphblas_ray.pipelines.algorithms import bfs_level

    plain, split = engines
    sources = [0, 3, 17, 40]
    for harmonic in (True, False):
        # reference fold via the broadcast BFS
        n = plain.n
        acc = np.zeros(n)
        reach = np.zeros(n, dtype=np.int64)
        for s in sources:
            lev, _ = bfs_level(plain, s)
            hit = lev > 0
            if harmonic:
                acc[hit] += 1.0 / lev[hit]
            else:
                acc[hit] += lev[hit]
                reach[hit] += 1
        if harmonic:
            want = np.round(acc, 8) + 0.0
        else:
            want = np.round(np.where(
                acc > 0, reach / np.maximum(acc, 1e-300), 0.0), 8) + 0.0
        for eng in (plain, split):
            got, _ = eng.closeness_inactor(sources, harmonic=harmonic)
            assert np.array_equal(got, want), harmonic


def test_critical_path_inactor_parity(ray_session):
    from python_graphblas_ray.pipelines.algorithms import critical_path

    src, dst, w = _rand_graph(seed=13)
    keep = src < dst  # DAG
    ds = ray.data.from_arrow(pa.table({
        "src": src[keep], "dst": dst[keep], "val": w[keep]}))
    plain = build_engine(ds, N, num_partitions=4, weighted=True,
                         hub_split_factor=0)
    split = SuperstepEngine(ds, N, num_partitions=4, weighted=True,
                            hub_split_factor=1.02)
    try:
        want, it_b, _ = critical_path(plain)
        for eng in (plain, split):
            got, it_i, _ = eng.critical_path_inactor()
            assert np.array_equal(got, want)
            assert it_i == it_b
        with pytest.raises(ValueError, match="cycle"):
            cyc = build_engine(ray.data.from_arrow(pa.table({
                "src": src, "dst": dst, "val": w})), N,
                num_partitions=4, weighted=True, hub_split_factor=0)
            try:
                cyc.critical_path_inactor(itermax=25)
            finally:
                cyc.shutdown()
    finally:
        plain.shutdown()
        split.shutdown()


def test_bowtie_inactor_parity(engines):
    from python_graphblas_ray.pipelines.algorithms import bowtie

    plain, split = engines
    want_parts, want_comp = bowtie(plain)
    for eng in (plain, split):
        got_parts, got_comp = eng.bowtie_inactor()
        assert np.array_equal(got_comp, want_comp)
        assert list(got_parts) == list(want_parts)


def test_ppr_inactor_parity(engines):
    from python_graphblas_ray.pipelines.algorithms import ppr_push

    plain, split = engines
    want_p, want_r, rounds_b, _ = ppr_push(plain, seeds=[0, 7],
                                           eps=1e-6)
    got_p, got_r, rounds_i, _ = plain.ppr_inactor([0, 7], eps=1e-6)
    # unsplit: bit-exact (same pinned-edge sum order, exact-zero
    # inactive shares)
    assert np.array_equal(got_p, want_p)
    assert np.array_equal(got_r, want_r)
    assert rounds_i == rounds_b
    # hub-split: a split dst's gains merge subset-wise (+ in actor
    # order) — allclose, same round count
    sp_p, sp_r, rounds_s, _ = split.ppr_inactor([0, 7], eps=1e-6)
    np.testing.assert_allclose(sp_p, want_p, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(sp_r, want_r, rtol=1e-12, atol=1e-15)
    assert rounds_s == rounds_b
    # distribution-seed form
    dist = np.zeros(N)
    dist[3] = 0.75
    dist[11] = 0.25
    w2, _, r2, _ = ppr_push(plain, seeds=dist, eps=1e-6)
    g2, _, ri2, _ = plain.ppr_inactor(dist, eps=1e-6)
    assert np.array_equal(g2, w2) and ri2 == r2


def test_pagerank_inactor_weighted_personalized_parity(graph, engines):
    """Weighted (plus_times / out-strength) and personalized (teleport
    + r0 slices) pagerank_inactor vs the broadcast recipe — bit-exact
    at the tested partition counts, matching superstep counts."""
    from python_graphblas_ray.pipelines.algorithms import pagerank

    _, _, _, ds = graph
    plain, split = engines
    # weighted
    want, it_b, _ = pagerank(plain, weighted=True, itermax=40)
    for eng in (plain, split):
        got, it_i = eng.pagerank_inactor(itermax=40, weighted=True)
        assert np.array_equal(got, want)
        assert it_i == it_b
    # personalized (trustrank shape), fixed iters
    p = np.zeros(N)
    p[[0, 7, 19]] = 1.0 / 3
    want_p, itp_b, _ = pagerank(plain, personalization=p, itermax=5,
                                tol=0.0)
    for eng in (plain, split):
        got_p, itp_i = eng.pagerank_inactor(
            itermax=5, tol=0.0, personalization=p, force_iters=5)
        assert np.array_equal(got_p, want_p)
    # weighted + personalized together
    want_wp, _, _ = pagerank(plain, weighted=True, personalization=p,
                             itermax=5, tol=0.0)
    got_wp, _ = plain.pagerank_inactor(
        itermax=5, tol=0.0, weighted=True, personalization=p,
        force_iters=5)
    assert np.array_equal(got_wp, want_wp)


def test_pagerank_sub_slice_frontier_parity(graph, engines):
    """frontier="sub" (ship only the referenced w ENTRIES, recorded at
    plan build) vs the slice frontier AND the broadcast recipe — values
    BIT-IDENTICAL and superstep counts equal on plain and hub-split
    engines; weighted and personalized forms included."""
    from python_graphblas_ray.pipelines.algorithms import pagerank

    _, _, _, ds = graph
    plain, split = engines
    want, it_b, _ = pagerank(plain, weighted=True, itermax=40)
    for eng in (plain, split):
        got, it_s = eng.pagerank_inactor(itermax=40, weighted=True,
                                         frontier="sub")
        assert np.array_equal(got, want)
        assert it_s == it_b
    # personalized, fixed iters, unweighted
    p = np.zeros(N)
    p[[0, 7, 19]] = 1.0 / 3
    want_p, _, _ = pagerank(plain, personalization=p, itermax=5,
                            tol=0.0)
    for eng in (plain, split):
        got_p, _ = eng.pagerank_inactor(
            itermax=5, tol=0.0, personalization=p, force_iters=5,
            frontier="sub")
        assert np.array_equal(got_p, want_p)
    with pytest.raises(ValueError, match="frontier"):
        plain.pagerank_inactor(frontier="entries")


def test_pagerank_sub_frontier_true_hub_split_parity(hub_engine):
    """frontier="sub" on an engine that REALLY hub-splits (leader-owned
    ranges, follower edge subsets, empty quantile ranges present):
    bit-identical to the broadcast recipe with equal superstep
    counts."""
    from python_graphblas_ray.pipelines.algorithms import pagerank

    split, hub_plain, _, _, _ = hub_engine
    want, it_b, _ = pagerank(hub_plain, itermax=40)
    got, it_s = split.pagerank_inactor(itermax=40, frontier="sub")
    assert np.array_equal(got, want)
    assert it_s == it_b
    got2, it2 = split.pagerank_inactor(itermax=40)  # slice twin
    assert np.array_equal(got2, want) and it2 == it_b


def test_pagerank_sub_frontier_checkpoint_resume(graph, tmp_path):
    """The sub-slice frontier composes with actor-written checkpoints:
    run-to-10 + resume-to-convergence == uninterrupted run."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.state.checkpoint import CheckpointManager

    _, _, _, ds = graph
    eng = build_engine(ds, N, num_partitions=4, hub_split_factor=0)
    try:
        want, it_full = eng.pagerank_inactor(tol=1e-10, itermax=30,
                                             frontier="sub")
        ck = CheckpointManager(str(tmp_path), "pr_sub",
                               num_partitions=4)
        eng2 = build_engine(ds, N, num_partitions=4, hub_split_factor=0)
        eng2.pagerank_inactor(tol=1e-10, itermax=10, force_iters=10,
                              checkpoint=ck, checkpoint_every=5,
                              frontier="sub")
        eng2.shutdown()
        eng3 = build_engine(ds, N, num_partitions=4, hub_split_factor=0)
        got, it_res = eng3.pagerank_inactor(tol=1e-10, itermax=30,
                                            checkpoint=ck,
                                            frontier="sub")
        eng3.shutdown()
        assert np.array_equal(got, want)
        assert it_res == it_full
    finally:
        eng.shutdown()


def test_katz_inactor_parity(graph, engines):
    """In-actor Katz (no global norm → plain engines are BIT-identical
    to the broadcast recipe; hub-split '+'-merge is allclose 1e-12) —
    superstep counts equal everywhere."""
    from python_graphblas_ray.pipelines.algorithms import katz_centrality

    plain, split = engines
    for weighted, alpha in ((False, 0.05), (True, 0.01)):
        want, it_b, mb = katz_centrality(plain, alpha=alpha,
                                         weighted=weighted, itermax=60)
        got, it_i, mi = plain.katz_inactor(alpha=alpha,
                                           weighted=weighted,
                                           itermax=60)
        assert np.array_equal(got, want)          # bit-exact, unsplit
        assert it_i == it_b
        assert _n_records(mi, "katz_inactor") == it_i
        got_s, it_s, _ = split.katz_inactor(alpha=alpha,
                                            weighted=weighted,
                                            itermax=60)
        np.testing.assert_allclose(got_s, want, rtol=1e-12, atol=1e-14)
        assert it_s == it_b


@pytest.fixture()
def hub_engine(ray_session):
    """A GENUINELY hub-split engine: every edge points at vertex 0, so
    the edge-balanced boundaries put all mass in one range and the
    split factor duplicates it (``has_hub_split`` is True — unlike the
    module fixture's 'split' engine, which this graph never splits)."""
    n = 401
    src = np.arange(1, n, dtype=np.int64)
    dst = np.zeros(n - 1, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"src": src, "dst": dst,
         "val": np.ones(n - 1, dtype=np.float64)}))
    eng = SuperstepEngine(ds, n, num_partitions=4,
                          hub_split_factor=1.02)
    assert eng.has_hub_split
    plain = build_engine(ds, n, num_partitions=4, hub_split_factor=0)
    yield eng, plain, src, dst, n
    eng.shutdown()
    plain.shutdown()


def test_katz_inactor_true_hub_split_parity(hub_engine):
    """katz_inactor on an engine that REALLY hub-splits: the leaders'
    '+'-merge reorders the float reduction, so parity vs the broadcast
    recipe is allclose 1e-12 with equal superstep counts."""
    from python_graphblas_ray.pipelines.algorithms import katz_centrality

    split, plain, _, _, _ = hub_engine
    want, it_b, _ = katz_centrality(plain, alpha=0.05, itermax=60)
    got, it_s, _ = split.katz_inactor(alpha=0.05, itermax=60)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
    assert it_s == it_b


def test_hits_inactor_parity(graph, engines, hub_engine):
    """In-actor HITS (engine pair, fsum-merged O(P) 2-norms): allclose
    1e-12 vs the broadcast recipe with EQUAL iteration counts — the
    compensated norm merge reorders the reduction, so bitwise parity is
    not claimed (broadcast hits stays the oracle form). Hub-split
    raises with the documented message."""
    from python_graphblas_ray.pipelines.algorithms import hits

    plain, _ = engines
    want_h, want_a, it_b, _ = hits(plain, itermax=50, tol=1e-8)
    got_h, got_a, it_i, mi = plain.hits_inactor(itermax=50, tol=1e-8)
    assert it_i == it_b
    np.testing.assert_allclose(got_h, want_h, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(got_a, want_a, rtol=1e-12, atol=1e-14)
    assert _n_records(mi, "hits_inactor") == it_i
    # genuinely hub-split pair: the leader-grouped variant, same bar
    true_split, hub_plain = hub_engine[0], hub_engine[1]
    want_h2, want_a2, it2b, _ = hits(hub_plain, itermax=30, tol=1e-8)
    got_h2, got_a2, it2i, _ = true_split.hits_inactor(itermax=30,
                                                      tol=1e-8)
    assert it2i == it2b
    np.testing.assert_allclose(got_h2, want_h2, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(got_a2, want_a2, rtol=1e-12, atol=1e-14)


def test_eigenvector_inactor_parity(graph, engines, hub_engine):
    """In-actor eigenvector centrality (fsum-merged 2-norms): allclose
    1e-12 with equal iteration counts vs the broadcast recipe on plain
    AND genuinely hub-split engines; weighted form included."""
    from python_graphblas_ray.pipelines.algorithms import (
        eigenvector_centrality)

    plain, _ = engines
    for weighted in (False, True):
        want, it_b, _ = eigenvector_centrality(plain, itermax=60,
                                               weighted=weighted)
        got, it_i, mi = plain.eigenvector_inactor(itermax=60,
                                                  weighted=weighted)
        assert it_i == it_b
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
        assert _n_records(mi, "eigenvector_inactor") == it_i
    split, hub_plain, _, _, _ = hub_engine
    want_s, it_sb, _ = eigenvector_centrality(hub_plain, itermax=40)
    got_s, it_si, _ = split.eigenvector_inactor(itermax=40)
    assert it_si == it_sb
    np.testing.assert_allclose(got_s, want_s, rtol=1e-12, atol=1e-14)


def test_salsa_inactor_parity(graph, engines, hub_engine):
    """In-actor SALSA (local / group-merged reciprocal degrees, final
    fsum norms): allclose 1e-12 vs the broadcast recipe on plain AND
    genuinely hub-split engine pairs."""
    from python_graphblas_ray.pipelines.algorithms import salsa_fixed

    plain, _ = engines
    want_h, want_a = salsa_fixed(plain, iters=3)
    got_h, got_a = plain.salsa_fixed_inactor(iters=3)
    np.testing.assert_allclose(got_h, want_h, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(got_a, want_a, rtol=1e-12, atol=1e-14)
    true_split, hub_plain = hub_engine[0], hub_engine[1]
    want_h2, want_a2 = salsa_fixed(hub_plain, iters=3)
    got_h2, got_a2 = true_split.salsa_fixed_inactor(iters=3)
    np.testing.assert_allclose(got_h2, want_h2, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(got_a2, want_a2, rtol=1e-12, atol=1e-14)


def test_wl_inactor_parity(engines):
    from python_graphblas_ray.pipelines.algorithms import wl_refinement

    plain, split = engines
    want_deg, want_lab = wl_refinement(plain, N, rounds=2)
    for eng in (plain, split):
        deg, lab = eng.wl_inactor(rounds=2)
        assert np.array_equal(deg, want_deg)
        assert np.array_equal(lab, want_lab)


def test_pagerank_inactor_slice_checkpoint_resume(graph, tmp_path):
    """Per-partition (actor-written) checkpoints: interrupt after the
    iter-4 checkpoint, resume on a FRESH engine — bit-identical to the
    uninterrupted run; the checkpoint directory holds one part per
    partition; CheckpointManager.load reassembles it layout-agnostic."""
    import os

    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.state.checkpoint import CheckpointManager

    _, _, _, ds = graph
    eng = build_engine(ds, N, num_partitions=4, hub_split_factor=0)
    try:
        want, it_full = eng.pagerank_inactor(tol=1e-10, itermax=30)
        ck = CheckpointManager(str(tmp_path), "pr_in", num_partitions=4)
        # phase 1: run 10 iters with checkpoints every 5 (writes iter=4,
        # iter=9), as if the job died after
        eng2 = build_engine(ds, N, num_partitions=4, hub_split_factor=0)
        eng2.pagerank_inactor(tol=1e-10, itermax=10, force_iters=10,
                              checkpoint=ck, checkpoint_every=5)
        eng2.shutdown()
        assert ck.latest()[0] == 9
        parts = [f for f in os.listdir(ck._iter_dir(9))
                 if f.startswith("part=")]
        assert len(parts) == 4  # one slice per partition actor
        # phase 2: fresh engine resumes from iter=9 and converges
        eng3 = build_engine(ds, N, num_partitions=4, hub_split_factor=0)
        got, it_res = eng3.pagerank_inactor(tol=1e-10, itermax=30,
                                            checkpoint=ck)
        eng3.shutdown()
        assert np.array_equal(got, want)
        assert it_res == it_full
        # driver-side reassemble also works (layout-agnostic readers)
        vecs, man = ck.load(9)
        assert len(vecs["r"]) == N
    finally:
        eng.shutdown()


def test_fx_family_on_empty_edge_graph(ray_session):
    """Edgeless engine: every in-actor algorithm still bit-matches its
    broadcast twin (degenerate-scale hazard class)."""
    from python_graphblas_ray.pipelines.algorithms import (
        bowtie, build_engine, critical_path, ppr_push, wl_refinement)

    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "val": pa.array([], pa.float64())}))
    eng = build_engine(empty, 6, num_partitions=2, weighted=True,
                      hub_split_factor=0)
    try:
        d1, l1 = wl_refinement(eng, 6, rounds=2)
        d2, l2 = eng.wl_inactor(rounds=2)
        assert np.array_equal(d1, d2) and np.array_equal(l1, l2)
        p1, c1 = bowtie(eng)
        p2, c2 = eng.bowtie_inactor()
        assert list(p1) == list(p2) and np.array_equal(c1, c2)
        w1, i1, _ = critical_path(eng)
        w2, i2, _ = eng.critical_path_inactor()
        assert np.array_equal(w1, w2) and i1 == i2
        wp, wr, rb, _ = ppr_push(eng, seeds=[0], eps=1e-8)
        gp, gr, ri, _ = eng.ppr_inactor([0], eps=1e-8)
        assert np.array_equal(gp, wp) and rb == ri
    finally:
        eng.shutdown()


def test_ppr_inactor_dangling_seed(ray_session):
    """Seeds with no out-edges bank their mass — same as ppr_push."""
    from python_graphblas_ray.pipelines.algorithms import (build_engine,
                                                           ppr_push)

    ds2 = ray.data.from_arrow(pa.table({
        "src": np.array([0, 1, 2], dtype=np.int64),
        "dst": np.array([1, 2, 3], dtype=np.int64),
        "val": np.ones(3)}))
    eng = build_engine(ds2, 5, num_partitions=2, hub_split_factor=0)
    try:
        wp, wr, rb, _ = ppr_push(eng, seeds=[3, 4], eps=1e-8)
        gp, gr, ri, _ = eng.ppr_inactor([3, 4], eps=1e-8)
        assert np.array_equal(gp, wp) and np.array_equal(gr, wr)
        assert rb == ri
    finally:
        eng.shutdown()
