"""HITS, transposed-engine derivation, random-walk / neighbor sampling,
and neighborhood-Jaccard link prediction — round-2 additions beyond the
reference's algorithm set (built from its primitives: alternating-
direction spmv, plus_pair matmul, select.triu)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from python_graphblas_ray.core import GBMatrix, GBVector
from python_graphblas_ray.functions.monoids import semiring
from python_graphblas_ray.pipelines.algorithms import (
    build_engine,
    hits,
    hits_numpy,
)
from python_graphblas_ray.pipelines.linkpred import (
    neighborhood_jaccard,
    neighborhood_jaccard_numpy,
)


def _random_edges(n=200, m=1200, seed=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # distinct edges
    packed = np.unique(src * n + dst)
    return packed // n, packed % n


def _edges_ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": src, "dst": dst,
        "val": np.ones(len(src), dtype=np.float64)}))


def test_transposed_engine_is_forward_matvec():
    src, dst = _random_edges()
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    eng_t = eng.transposed()
    x = np.random.default_rng(0).random(200)
    # this engine: A.T @ x; transposed: A @ x
    expect = np.bincount(src, weights=x[dst], minlength=200)
    got = eng_t.spmv("plus_second", x)
    assert np.allclose(got, expect)
    eng_t.shutdown()
    eng.shutdown()


def test_hits_matches_numpy_oracle():
    src, dst = _random_edges()
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    h, a, iters, _ = hits(eng, itermax=60, tol=1e-10)
    h0, a0, iters0 = hits_numpy(src, dst, 200, itermax=60, tol=1e-10)
    assert iters == iters0
    assert np.allclose(h, h0, atol=1e-9)
    assert np.allclose(a, a0, atol=1e-9)
    eng.shutdown()


def test_hits_fixed_matches_numpy_and_is_integer_exact():
    from python_graphblas_ray.pipelines.algorithms import (
        hits_fixed, hits_fixed_numpy)

    src, dst = _random_edges()
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    h, a = hits_fixed(eng, iters=3)
    h0, a0 = hits_fixed_numpy(src, dst, 200, iters=3)
    # pre-normalization values are exact integers, so parity is exact
    # up to the single final float division
    assert np.allclose(h, h0, rtol=0, atol=1e-13)
    assert np.allclose(a, a0, rtol=0, atol=1e-13)
    assert abs(np.linalg.norm(h) - 1.0) < 1e-12
    assert abs(np.linalg.norm(a) - 1.0) < 1e-12
    eng.shutdown()


def test_salsa_fixed_matches_numpy_oracle():
    from python_graphblas_ray.pipelines.algorithms import (
        salsa_fixed, salsa_fixed_numpy)

    src, dst = _random_edges()
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    h, a = salsa_fixed(eng, iters=3)
    h0, a0 = salsa_fixed_numpy(src, dst, 200, iters=3)
    assert np.allclose(h, h0, rtol=0, atol=1e-12)
    assert np.allclose(a, a0, rtol=0, atol=1e-12)
    assert abs(np.linalg.norm(h) - 1.0) < 1e-12
    # degree normalization conserves mass: pre-normalization sums stay
    # O(active vertices), unlike raw HITS path counts — sanity-check by
    # recomputing one unnormalized authority step
    d_out = np.bincount(src, minlength=200).astype(float)
    a1 = np.bincount(dst, weights=np.where(d_out > 0, 1 / d_out, 0)[src],
                     minlength=200)
    assert a1.sum() <= (d_out > 0).sum() + 1e-9
    eng.shutdown()


def test_trustrank_is_seed_personalized_pagerank():
    from python_graphblas_ray.pipelines.algorithms import (
        pagerank, trustrank)

    src, dst = _random_edges()
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    seeds = [3, 7, 11]
    r, _, _ = trustrank(eng, seeds=seeds, tol=0.0, itermax=5)
    p = np.zeros(200)
    p[seeds] = 1.0 / 3
    r0, _, _ = pagerank(eng, tol=0.0, itermax=5, personalization=p)
    assert np.array_equal(r, r0)
    # trust mass concentrates near the seeds: each seed must outrank
    # the median vertex (teleport alone guarantees it)
    assert all(r[s] > np.median(r) for s in seeds)
    eng.shutdown()


def test_dag_layers_matches_numpy_and_detects_cycles():
    from python_graphblas_ray.pipelines.algorithms import (
        dag_layers, dag_layers_numpy)

    src, dst = _random_edges()
    keep = src < dst  # DAG by construction
    ds_src, ds_dst = src[keep], dst[keep]
    eng = build_engine(_edges_ds(ds_src, ds_dst), 200, num_partitions=4)
    layers, supersteps, _ = dag_layers(eng)
    expect = dag_layers_numpy(ds_src, ds_dst, 200)
    assert np.array_equal(layers, expect)
    # layering is a valid topological order: every edge goes up a level
    assert (layers[ds_dst] > layers[ds_src]).all()
    # sources (no in-edges) sit at layer 0
    assert (layers[np.setdiff1d(np.arange(200), ds_dst)] == 0).all()
    eng.shutdown()

    cyc = build_engine(_edges_ds(np.array([0, 1, 2], dtype=np.int64),
                                 np.array([1, 2, 0], dtype=np.int64)),
                       3, num_partitions=2)
    with pytest.raises(ValueError, match="cycle"):
        dag_layers(cyc)
    cyc.shutdown()


def test_critical_path_matches_numpy_and_reduces_to_layers():
    from python_graphblas_ray.pipelines.algorithms import (
        critical_path, critical_path_numpy, dag_layers)

    src, dst = _random_edges()
    keep = src < dst
    s, d = src[keep], dst[keep]
    rng = np.random.default_rng(9)
    w = rng.integers(1, 10, len(s)).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"src": s, "dst": d, "val": w}))
    eng = build_engine(ds.materialize(), 200, num_partitions=4,
                       weighted=True)
    dist, _, _ = critical_path(eng)
    assert np.array_equal(dist, critical_path_numpy(s, d, w, 200))
    # every edge is satisfied: dist(v) >= dist(u) + w(u,v)
    assert (dist[d] >= dist[s] + w - 1e-12).all()
    eng.shutdown()

    # unit weights reduce exactly to the layer numbers
    ones = ray.data.from_arrow(pa.table({
        "src": s, "dst": d, "val": np.ones(len(s))}))
    eng1 = build_engine(ones.materialize(), 200, num_partitions=4,
                        weighted=True)
    dist1, _, _ = critical_path(eng1)
    layers, _, _ = dag_layers(eng1)
    assert np.array_equal(dist1.astype(np.int64), layers)
    eng1.shutdown()


def test_bowtie_decomposition_matches_dense_oracle():
    from python_graphblas_ray.pipelines.algorithms import (
        bowtie, bowtie_numpy)

    # hand case exercising all six parts: 0<->1 core, 2->0 in,
    # 1->3 out, 2->4->3 tube, 2->5 + 6->3 tendrils, 7 disconnected
    src = np.array([0, 1, 2, 1, 2, 4, 2, 6], dtype=np.int64)
    dst = np.array([1, 0, 0, 3, 4, 3, 5, 3], dtype=np.int64)
    eng = build_engine(_edges_ds(src, dst), 8, num_partitions=2)
    parts, comp = bowtie(eng)
    assert list(parts) == ["core", "core", "in", "out", "tube",
                           "tendril", "tendril", "disc"]
    assert comp[0] == comp[1]  # the core SCC shares a label
    eng.shutdown()

    for seed in range(3):
        s, d = _random_edges(n=80, m=200, seed=seed)
        eng = build_engine(_edges_ds(s, d), 80, num_partitions=3)
        parts, _ = bowtie(eng)
        assert (parts == bowtie_numpy(s, d, 80)).all()
        eng.shutdown()


def test_cocitation_counts_match_bruteforce():
    from python_graphblas_ray.pipelines.linkpred import (
        cocitation_counts, cocitation_numpy)

    src, dst = _random_edges(n=80, m=600, seed=5)
    got = {(r["src"], r["dst"]): r["val"]
           for r in cocitation_counts(_edges_ds(src, dst), 80).take_all()}
    expect = cocitation_numpy(src, dst, 80)
    assert got.keys() == expect.keys()
    assert all(got[k] == expect[k] for k in expect)
    # co-citation is the coupling of the REVERSED graph: check duality
    from python_graphblas_ray.pipelines.linkpred import link_scores
    rev = link_scores(_edges_ds(dst, src), 80, adamic_adar=False)
    rev_common = {(r["u"], r["v"]): r["common"] for r in rev.take_all()}
    assert rev_common == {k: int(v) for k, v in expect.items()}


def test_eigenvector_and_katz_match_numpy_oracle():
    from python_graphblas_ray.pipelines.algorithms import (
        eigenvector_centrality, eigenvector_centrality_numpy,
        katz_centrality, katz_centrality_numpy)

    src, dst = _random_edges()
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    x, it, _ = eigenvector_centrality(eng, itermax=80, tol=1e-10)
    x0, it0 = eigenvector_centrality_numpy(src, dst, 200, itermax=80,
                                           tol=1e-10)
    assert it == it0
    assert np.allclose(x, x0, atol=1e-9)
    k, kit, _ = katz_centrality(eng, alpha=0.05, itermax=80, tol=1e-10)
    k0, kit0 = katz_centrality_numpy(src, dst, 200, alpha=0.05,
                                     itermax=80, tol=1e-10)
    assert kit == kit0
    assert np.allclose(k, k0, atol=1e-9)
    # katz with beta only, zero adjacency influence at alpha=0
    z, _, _ = katz_centrality(eng, alpha=0.0, beta=2.5, itermax=5)
    assert np.allclose(z, 2.5)
    eng.shutdown()


def test_random_walks_follow_real_edges_deterministically():
    src, dst = _random_edges()
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    eng_t = eng.transposed(release=True)  # walks follow OUT-edges
    starts = np.arange(0, 200, 5)
    w1 = eng_t.random_walks(starts, length=6, seed=7)
    w2 = eng_t.random_walks(starts, length=6, seed=7)
    assert np.array_equal(w1, w2)  # deterministic
    w3 = eng_t.random_walks(starts, length=6, seed=8)
    assert not np.array_equal(w1, w3)  # seed changes the walks
    edge_set = set(zip(src.tolist(), dst.tolist()))
    out_deg = np.bincount(src, minlength=200)
    for row in w1:
        for t in range(len(row) - 1):
            u, v = int(row[t]), int(row[t + 1])
            if u < 0:
                assert v < 0  # terminated walks stay terminated
            elif v < 0:
                assert out_deg[u] == 0  # only dead ends terminate
            else:
                assert (u, v) in edge_set  # every step is a real edge
    eng_t.shutdown()


def test_sample_neighbors_distinct_and_capped():
    src, dst = _random_edges()
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    eng_t = eng.transposed(release=True)
    vids = np.arange(200)
    vs, ns = eng_t.sample_neighbors(vids, k=3, seed=1)
    out_deg = np.bincount(src, minlength=200)
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(d))
    per_v = {}
    for v, nb in zip(vs.tolist(), ns.tolist()):
        assert nb in adj[v]  # sampled neighbor is real
        per_v.setdefault(v, []).append(nb)
    for v, nbs in per_v.items():
        assert len(nbs) == len(set(nbs))  # distinct
        assert len(nbs) == min(3, out_deg[v])  # exact fanout
    # vertices with degree 0 are absent
    assert set(per_v) == {int(v) for v in vids if out_deg[v] > 0}
    eng_t.shutdown()


def test_neighborhood_jaccard_vs_bruteforce_and_sql():
    src, dst = _random_edges(n=80, m=600, seed=5)
    ds = _edges_ds(src, dst)
    got = neighborhood_jaccard(ds, 80).to_pandas()
    got = got.sort_values(["u", "v"]).reset_index(drop=True)
    expect = neighborhood_jaccard_numpy(src, dst, 80)
    assert len(got) == len(expect)
    for row in got.itertuples():
        c, j = expect[(row.u, row.v)]
        assert row.common == c
        assert np.isclose(row.jaccard, j)
    # independent DuckDB formulation of the same scores
    con = duckdb.connect()
    con.register("edges", pa.table({"src": src, "dst": dst}))
    sql = con.execute("""
        WITH deg AS (SELECT src AS v, count(*) AS d FROM edges GROUP BY 1),
        c AS (SELECT a.src AS u, b.src AS v, count(*) AS common
              FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
              GROUP BY 1, 2)
        SELECT c.u, c.v, c.common,
               c.common / (du.d + dv.d - c.common) AS jaccard
        FROM c JOIN deg du ON du.v = c.u JOIN deg dv ON dv.v = c.v
        ORDER BY 1, 2""").df()
    assert len(sql) == len(got)
    assert np.array_equal(sql["u"].to_numpy(), got["u"].to_numpy())
    assert np.allclose(sql["jaccard"].to_numpy(), got["jaccard"].to_numpy())


def test_link_scores_vs_bruteforce():
    """Full score family (common/jaccard/cosine/preferential/AA) vs the
    brute-force oracle, incl. the duplicate-edge collapse."""
    from python_graphblas_ray.pipelines.linkpred import (link_scores,
                                                         link_scores_numpy)

    src, dst = _random_edges(n=60, m=500, seed=11)
    # plant duplicate edges — scores must be multiset-insensitive
    src = np.concatenate([src, src[:20]])
    dst = np.concatenate([dst, dst[:20]])
    got = link_scores(_edges_ds(src, dst), 60).to_pandas()
    got = got.sort_values(["u", "v"]).reset_index(drop=True)
    expect = link_scores_numpy(src, dst, 60)
    assert len(got) == len(expect)
    for row in got.itertuples():
        c, j, cos, pref, aa = expect[(row.u, row.v)]
        assert row.common == c
        assert np.isclose(row.jaccard, j)
        assert np.isclose(row.cosine, cos)
        assert row.preferential == pref
        assert np.isclose(row.adamic_adar, aa), (row.u, row.v)


def test_link_scores_min_common_and_hub_guard():
    from python_graphblas_ray.pipelines.linkpred import (link_scores,
                                                         link_scores_numpy)

    src, dst = _random_edges(n=50, m=400, seed=3)
    got = link_scores(_edges_ds(src, dst), 50, min_common=2).to_pandas()
    expect = {k: v for k, v in link_scores_numpy(src, dst, 50).items()
              if v[0] >= 2}
    assert len(got) == len(expect)
    assert (got["common"] >= 2).all()
    # hub guard drops the hub from the score universe
    src2 = np.concatenate([np.zeros(30, dtype=np.int64), src])
    dst2 = np.concatenate([np.arange(10, 40, dtype=np.int64), dst])
    capped = link_scores(_edges_ds(src2, dst2), 50,
                         max_degree=15).to_pandas()
    assert 0 not in set(capped["u"]).union(set(capped["v"]))


def test_neighborhood_jaccard_max_degree_guard():
    # a hub with degree 40 disappears under a cap of 10; vertex 1 ALSO
    # points into the hub, so its degree must be re-derived on the
    # pruned graph (3 → 2) — stale degrees would give 1/3, not 1/2
    src = np.concatenate([np.zeros(40, dtype=np.int64),
                          np.array([1, 1, 1, 2], dtype=np.int64)])
    dst = np.concatenate([np.arange(2, 42, dtype=np.int64),
                          np.array([0, 50, 51, 50], dtype=np.int64)])
    got = neighborhood_jaccard(_edges_ds(src, dst), 60,
                               max_degree=10).to_pandas()
    assert 0 not in set(got["u"]).union(got["v"])  # hub dropped
    # the surviving pair (1,2) shares neighbor 50: J = 1/(2+1-1)
    row = got[(got["u"] == 1) & (got["v"] == 2)].iloc[0]
    assert row["common"] == 1 and np.isclose(row["jaccard"], 0.5)


def test_symmetrized_is_set_union_not_multiset():
    """A ∪ A.T must vote each undirected edge ONCE: reciprocal pairs and
    self-loops collapse (dedupe in the derived actors), so degree-style
    sums and LPA mode counts aren't doubled."""
    src = np.array([0, 1, 2, 3, 3], dtype=np.int64)
    dst = np.array([1, 0, 1, 3, 1], dtype=np.int64)  # 0↔1 reciprocal, 3→3 loop
    eng = build_engine(_edges_ds(src, dst), 4, num_partitions=2)
    eng_u = eng.symmetrized(release=True)
    deg = eng_u.spmv("plus_second", np.ones(4))
    # undirected simple degrees (self-loop counts once): 0:{1}, 1:{0,2,3},
    # 2:{1}, 3:{1,3}
    assert deg.tolist() == [1.0, 3.0, 1.0, 2.0]
    eng_u.shutdown()

    # the dataset path (build_engine undirected=True) dedupes too, and the
    # LPA oracle shares the set-union semantics
    from python_graphblas_ray.pipelines.algorithms import (
        label_propagation, label_propagation_numpy)

    eng2 = build_engine(_edges_ds(src, dst), 4, num_partitions=2,
                        undirected=True)
    labels, _, _ = label_propagation(eng2)
    eng2.shutdown()
    assert labels.tolist() == label_propagation_numpy(src, dst, 4).tolist()


# ---------------------------------------------------------------------------
# node2vec second-order walks (rejection sampling)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def walk_engine_graph():
    src, dst = _random_edges(seed=9)
    eng = build_engine(_edges_ds(src, dst), 200, num_partitions=4)
    yield eng, src, dst, 200
    eng.shutdown()


def _edge_set(src, dst):
    return set(zip(src.tolist(), dst.tolist()))


def test_edges_exist_matches_edge_list(walk_engine_graph):
    eng, src, dst, n = walk_engine_graph
    rng = np.random.default_rng(5)
    pv = rng.integers(0, n, 200)
    cd = rng.integers(0, n, 200)
    got = eng.edges_exist(pv, cd)
    # engine aggregates into dst: N(prev) = in-neighbors = {s : (s, prev)}
    es = _edge_set(dst, src)  # (dst, src) pairs: cand ∈ in-N(prev)
    want = np.array([(int(a), int(b)) in es for a, b in zip(pv, cd)])
    np.testing.assert_array_equal(got, want)


def test_node2vec_walks_valid_and_deterministic(walk_engine_graph):
    eng, src, dst, n = walk_engine_graph
    starts = np.arange(0, n, 7, dtype=np.int64)
    w1 = eng.node2vec_walks(starts, length=6, p=0.5, q=2.0, seed=11)
    w2 = eng.node2vec_walks(starts, length=6, p=0.5, q=2.0, seed=11)
    np.testing.assert_array_equal(w1, w2)
    es = _edge_set(dst, src)  # steps follow IN-edges on this engine
    for row in w1:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert (int(a), int(b)) in es, (a, b)
    # seed changes the walks
    w3 = eng.node2vec_walks(starts, length=6, p=0.5, q=2.0, seed=12)
    assert not np.array_equal(w1, w3)


def test_node2vec_p_bias_controls_returns(walk_engine_graph):
    """Tiny p (return-heavy) must produce more immediate backtracks
    than huge p (return-averse) over many walkers."""
    eng, src, dst, n = walk_engine_graph
    starts = np.arange(n, dtype=np.int64)

    def backtracks(p):
        w = eng.node2vec_walks(starts, length=8, p=p, q=1.0, seed=3)
        bt = 0
        for row in w:
            for i in range(2, w.shape[1]):
                if row[i] >= 0 and row[i] == row[i - 2]:
                    bt += 1
        return bt

    assert backtracks(0.05) > backtracks(20.0)


# ---------------------------------------------------------------------------
# graph-shape metrics: transitivity / knn / rich club
# ---------------------------------------------------------------------------

def _sym_simple(src, dst, n):
    """Dense symmetric adjacency (no self-loops) as a numpy bool matrix."""
    A = np.zeros((n, n), dtype=bool)
    A[src, dst] = True
    A |= A.T
    np.fill_diagonal(A, False)
    return A


def test_transitivity_matches_dense_oracle():
    from python_graphblas_ray.pipelines.linkpred import transitivity

    n = 60
    src, dst = _random_edges(n=n, m=500, seed=7)
    A = _sym_simple(src, dst, n)
    tri3 = np.trace(np.linalg.matrix_power(A.astype(np.int64), 3))  # 6·tri
    deg = A.sum(1).astype(np.float64)
    expect = tri3 / (deg * (deg - 1)).sum()
    got = transitivity(_edges_ds(src, dst), n)
    assert got == pytest.approx(expect, abs=1e-12)


def test_transitivity_triangle_graph_is_one():
    from python_graphblas_ray.pipelines.linkpred import transitivity

    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 0], dtype=np.int64)
    assert transitivity(_edges_ds(src, dst), 3) == pytest.approx(1.0)


def test_avg_neighbor_degree_matches_bruteforce():
    from python_graphblas_ray.pipelines.linkpred import avg_neighbor_degree

    n = 80
    src, dst = _random_edges(n=n, m=700, seed=11)
    t = avg_neighbor_degree(_edges_ds(src, dst), n)
    dout = np.bincount(src, minlength=n).astype(np.float64)
    got = dict(zip(t["vid"].to_numpy(), t["val"].to_numpy()))
    for v in range(n):
        nb = dst[src == v]
        if len(nb) == 0:
            assert v not in got
        else:
            assert got[v] == pytest.approx(dout[nb].mean(), abs=1e-8)


def test_rich_club_matches_bruteforce():
    from python_graphblas_ray.pipelines.linkpred import rich_club

    n = 60
    src, dst = _random_edges(n=n, m=600, seed=13)
    A = _sym_simple(src, dst, n)
    deg = A.sum(1).astype(np.float64)
    kbar = deg[deg > 0].mean()
    rich = deg > kbar
    nk = int(rich.sum())
    ek2 = int(A[np.ix_(rich, rich)].sum())  # 2·E_k
    k, got_nk, phi = rich_club(_edges_ds(src, dst), n)
    assert k == pytest.approx(kbar, abs=1e-12)
    assert got_nk == nk
    assert phi == pytest.approx(ek2 / (nk * (nk - 1)), abs=1e-12)


def test_rich_club_explicit_threshold_and_degenerate():
    from python_graphblas_ray.pipelines.linkpred import rich_club

    # star graph: center degree n-1, leaves degree 1
    n = 10
    src = np.zeros(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    k, nk, phi = rich_club(_edges_ds(src, dst), n, k=1)
    assert nk == 1 and np.isnan(phi)  # only the hub is "rich"
    k2, nk2, phi2 = rich_club(_edges_ds(src, dst), n, k=0)
    assert nk2 == n  # every vertex has degree >= 1
    # star has n-1 undirected edges among the n rich vertices
    assert phi2 == pytest.approx(2 * (n - 1) / (n * (n - 1)))


def test_powerlaw_alpha_matches_direct_formula():
    from python_graphblas_ray.pipelines.linkpred import powerlaw_alpha

    n = 100
    src, dst = _random_edges(n=n, m=900, seed=17)
    a_in, n_in = powerlaw_alpha(_edges_ds(src, dst), n, degree="in")
    din = np.bincount(dst, minlength=n).astype(np.float64)
    d = din[din > 0]
    assert n_in == len(d)
    assert a_in == pytest.approx(1.0 + len(d) / np.log(d / 0.5).sum(),
                                 abs=1e-12)
    a_out, _ = powerlaw_alpha(_edges_ds(src, dst), n, degree="out")
    dout = np.bincount(src, minlength=n).astype(np.float64)
    do = dout[dout > 0]
    assert a_out == pytest.approx(1.0 + len(do) / np.log(do / 0.5).sum(),
                                  abs=1e-12)


def test_powerlaw_alpha_orders_heavier_tails_lower():
    """The xmin=1 CSN approximation is biased low on discrete data (the
    documented behavior), but it must ORDER tail heaviness correctly:
    a steeper planted exponent yields a larger estimate."""
    from python_graphblas_ray.pipelines.linkpred import powerlaw_alpha

    def planted(alpha, seed):
        rng = np.random.default_rng(seed)
        n = 3000
        support = np.arange(1, 1001, dtype=np.float64)
        p = support ** -alpha
        p /= p.sum()
        deg = rng.choice(support.astype(np.int64), size=n, p=p)
        dst = np.repeat(np.arange(n, dtype=np.int64), deg)
        # distinct (src, dst): spread synthetic sources per dst
        src = n + np.concatenate(
            [np.arange(k) for k in deg]).astype(np.int64)
        a, used = powerlaw_alpha(_edges_ds(src, dst),
                                 int(src.max()) + 1, degree="in")
        assert used == n
        return a

    a_heavy = planted(2.0, seed=23)
    a_light = planted(3.5, seed=23)
    assert a_heavy < a_light
    assert 1.0 < a_heavy < a_light < 4.0


def test_attack_robustness_matches_bruteforce():
    from python_graphblas_ray.pipelines.linkpred import attack_robustness

    n = 70
    src, dst = _random_edges(n=n, m=260, seed=29)
    A = _sym_simple(src, dst, n)
    deg = A.sum(1)
    present = np.nonzero(deg > 0)[0]
    order = present[np.lexsort((present, -deg[present]))]
    removed = set(order[:6].tolist())
    keep = np.array([v not in removed for v in range(n)])
    # brute-force components on the induced graph
    Ai = A.copy()
    Ai[~keep, :] = False
    Ai[:, ~keep] = False
    comp = -np.ones(n, dtype=np.int64)
    for v in np.nonzero(keep)[0]:
        if comp[v] >= 0:
            continue
        stack, comp[v] = [v], v
        while stack:
            u = stack.pop()
            for w in np.nonzero(Ai[u])[0]:
                if comp[w] < 0:
                    comp[w] = v
                    stack.append(w)
    _, counts = np.unique(comp[keep], return_counts=True)
    expect = counts.max() / keep.sum()
    k, n_kept, frac = attack_robustness(_edges_ds(src, dst), n,
                                        k_remove=6, num_partitions=3)
    assert k == 6
    assert n_kept == int(keep.sum())
    assert frac == pytest.approx(expect, abs=1e-12)


def test_attack_robustness_star_collapses():
    """Removing the hub of a star graph shatters it: giant fraction
    drops from ~1 to 1/(n-1)."""
    from python_graphblas_ray.pipelines.linkpred import attack_robustness

    n = 12
    src = np.zeros(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    k, n_kept, frac = attack_robustness(_edges_ds(src, dst), n,
                                        k_remove=1, num_partitions=2)
    assert (k, n_kept) == (1, n - 1)
    assert frac == pytest.approx(1.0 / (n - 1))


def test_pagerank_dangling_redistribute():
    from python_graphblas_ray.pipelines.algorithms import (
        pagerank, pagerank_numpy)

    n = 150
    src, dst = _random_edges(n=n, m=800, seed=41)
    keep = src < 120  # vertices 120..149 become dangling
    src, dst = src[keep], dst[keep]
    eng = build_engine(_edges_ds(src, dst), n, num_partitions=3)
    r, iters, _ = pagerank(eng, tol=1e-10, itermax=100,
                           dangling="redistribute")
    r0, iters0 = pagerank_numpy(src, dst, n, tol=1e-10, itermax=100,
                                dangling="redistribute")
    assert iters == iters0
    assert np.allclose(r, r0, atol=1e-12)
    # classic semantics conserve probability mass
    assert r.sum() == pytest.approx(1.0, abs=1e-9)
    # drop semantics on the same graph leak mass
    r_drop, _, _ = pagerank(eng, tol=1e-10, itermax=100)
    assert r_drop.sum() < 1.0 - 1e-3
    eng.shutdown()

    # no dangling vertices -> redistribute is a no-op
    s2, d2 = _random_edges(n=60, m=600, seed=43)
    # ensure every vertex has an out-edge
    missing = np.setdiff1d(np.arange(60), s2)
    s2 = np.concatenate([s2, missing])
    d2 = np.concatenate([d2, (missing + 1) % 60])
    eng2 = build_engine(_edges_ds(s2, d2), 60, num_partitions=2)
    ra, ia, _ = pagerank(eng2, tol=1e-8, dangling="redistribute")
    rb, ib, _ = pagerank(eng2, tol=1e-8)
    assert ia == ib
    np.testing.assert_array_equal(ra, rb)
    eng2.shutdown()

    with pytest.raises(ValueError):
        pagerank(eng2, dangling="bogus")


def test_quadrilateral_count_vs_bruteforce():
    """Q matches an O(n^4) dense enumeration of C4 subgraphs on a random
    simple graph, plus hand cases: a 4-cycle (1), K4 (3), a triangle (0)."""
    from itertools import combinations

    from python_graphblas_ray.pipelines.linkpred import quadrilateral_count

    def brute(adj, n):
        q = 0
        for quad in combinations(range(n), 4):
            # count distinct 4-cycles on these 4 vertices: each of the 3
            # pairings of the quad into two diagonal pairs gives a cycle
            # iff the 4 "side" edges exist
            a, b, c, d = quad
            for (p, r), (s, t) in (((a, c), (b, d)), ((a, b), (c, d)),
                                   ((a, d), (b, c))):
                # cycle p-s-r-t with diagonals (p,r),(s,t)
                if adj[p, s] and adj[s, r] and adj[r, t] and adj[t, p]:
                    q += 1
        return q

    rng = np.random.default_rng(7)
    n = 14
    adj = np.zeros((n, n), dtype=bool)
    for u, v in combinations(range(n), 2):
        if rng.random() < 0.3:
            adj[u, v] = adj[v, u] = True
    src, dst = np.nonzero(adj)  # symmetric, both directions
    got = quadrilateral_count(_edges_ds(src.astype(np.int64),
                                        dst.astype(np.int64)), n)
    assert got == brute(adj, n)

    # 4-cycle 0-1-2-3-0: exactly one C4
    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 0], dtype=np.int64)
    assert quadrilateral_count(_edges_ds(src, dst), 4) == 1
    # K4: 3 distinct 4-cycles
    s, d = zip(*[(u, v) for u in range(4) for v in range(4) if u != v])
    assert quadrilateral_count(
        _edges_ds(np.array(s, dtype=np.int64),
                  np.array(d, dtype=np.int64)), 4) == 3
    # triangle: none
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 0], dtype=np.int64)
    assert quadrilateral_count(_edges_ds(src, dst), 3) == 0


def test_maximal_matching_invariants_and_numpy_parity():
    """The distributed rounds equal the numpy oracle exactly, the result
    is a matching (no shared endpoints) and maximal (every graph edge
    touches a matched vertex); path + star hand cases."""
    from python_graphblas_ray.pipelines.matching import (
        maximal_matching, maximal_matching_numpy)

    rng = np.random.default_rng(23)
    n = 60
    src = rng.integers(0, n, 220).astype(np.int64)
    dst = rng.integers(0, n, 220).astype(np.int64)
    u, v, r = maximal_matching(_edges_ds(src, dst), n)
    nu, nv, nr = maximal_matching_numpy(src, dst, n)
    key = np.lexsort((v, u))
    nkey = np.lexsort((nv, nu))
    assert (u[key] == nu[nkey]).all()
    assert (v[key] == nv[nkey]).all()
    assert (r[key] == nr[nkey]).all()
    # matching: each vertex at most once
    ends = np.concatenate([u, v])
    assert len(np.unique(ends)) == len(ends)
    # maximal: every simple edge touches a matched vertex
    matched = np.zeros(n, dtype=bool)
    matched[ends] = True
    keep = src != dst
    assert (matched[src[keep]] | matched[dst[keep]]).all()

    # path 0-1-2-3: knuth32-priority local minima; result is a perfect
    # matching of the path (2 disjoint edges)
    ps = np.array([0, 1, 2], dtype=np.int64)
    pd = np.array([1, 2, 3], dtype=np.int64)
    u, v, r = maximal_matching(_edges_ds(ps, pd), 4)
    assert len(u) == 2
    assert len(np.unique(np.concatenate([u, v]))) == 4
    # star: exactly one edge can match
    ss = np.zeros(5, dtype=np.int64)
    sd = np.arange(1, 6, dtype=np.int64)
    u, v, r = maximal_matching(_edges_ds(ss, sd), 6)
    assert len(u) == 1 and (r == 1).all()
