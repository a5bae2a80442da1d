"""ANF / HyperANF neighborhood function and effective diameter — the
web-graph distance measurement (Palmer 2002; Boldi–Vigna HyperANF).
Exact bitset mode is the oracle; the HLL mode must track it within the
sketch's error bound."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from python_graphblas_ray.pipelines.algorithms import build_engine
from python_graphblas_ray.pipelines.anf import (
    effective_diameter,
    neighborhood_function,
    neighborhood_function_numpy,
)


def _random_edges(n=150, m=500, seed=11):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    return src[keep], dst[keep]


def _engine(src, dst, n, parts=3):
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst,
        "val": np.ones(len(src), dtype=np.float64)})).materialize()
    return build_engine(ds, n, num_partitions=parts)


def test_exact_anf_matches_bfs_oracle():
    src, dst = _random_edges()
    eng = _engine(src, dst, 150)
    counts, exact = neighborhood_function(eng, mode="exact")
    assert exact
    expect = neighborhood_function_numpy(src, dst, 150)
    assert np.array_equal(counts, expect)
    # N is strictly increasing up to the fixpoint and starts at n
    assert counts[0] == 150
    assert (np.diff(counts) > 0).all()
    eng.shutdown()


def test_hll_anf_tracks_exact_within_sketch_error():
    src, dst = _random_edges(n=400, m=2500, seed=2)
    eng = _engine(src, dst, 400)
    counts, _ = neighborhood_function(eng, mode="exact")
    est, exact = neighborhood_function(eng, mode="hll", b=8)
    assert not exact
    # b=8 -> 256 registers, per-ball rse ~6.5%; summed balls partially
    # cancel — 15% is a loose end-to-end bound
    rel = abs(est[-1] - counts[-1]) / counts[-1]
    assert rel < 0.15
    # register max-merge keeps estimates monotone in t
    assert (np.diff(est) >= -1e-9).all()
    eng.shutdown()


def test_effective_diameter_on_path_graph():
    # directed path 0 -> 1 -> ... -> 9: dist(u, v) = v - u for u <= v,
    # N(t) = sum over u of min(t, 9-u) + 10 self-pairs
    n = 10
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    eng = _engine(src, dst, n, parts=2)
    counts, _ = neighborhood_function(eng, mode="exact")
    expect = [sum(min(t, n - 1 - u) for u in range(n)) + n
              for t in range(n)]
    assert list(counts) == expect
    d90 = effective_diameter(eng, q=0.9, mode="exact")
    total = expect[-1]
    assert d90 == next(t for t, c in enumerate(expect)
                       if c >= 0.9 * total)
    eng.shutdown()


def test_inactor_anf_is_bit_identical_to_broadcast():
    src, dst = _random_edges()
    eng = _engine(src, dst, 150)
    for mode, rtol in (("exact", 0), ("hll", 1e-12)):
        counts, _ = neighborhood_function(eng, mode=mode, b=7)
        fused, _ = neighborhood_function(eng, mode=mode, b=7,
                                         inactor=True)
        assert len(counts) == len(fused)
        # exact: bit-identical popcounts; HLL: identical registers, the
        # per-slice partial sums differ from the whole-matrix sum only
        # by float addition order
        assert np.allclose(counts, fused, rtol=rtol, atol=0), mode
    eng.shutdown()


def test_effective_diameter_exact_matches_definition():
    src, dst = _random_edges(seed=4)
    eng = _engine(src, dst, 150)
    counts, _ = neighborhood_function(eng, mode="exact")
    d90 = effective_diameter(eng, q=0.9, mode="exact")
    assert counts[d90] >= 0.9 * counts[-1]
    assert d90 == 0 or counts[d90 - 1] < 0.9 * counts[-1]
    eng.shutdown()


def test_hyperball_exact_equals_all_sources_closeness():
    from python_graphblas_ray.pipelines.algorithms import (
        closeness_centrality_numpy)
    from python_graphblas_ray.pipelines.anf import hyperball_harmonic

    src, dst = _random_edges(n=120, m=420, seed=13)
    eng = _engine(src, dst, 120)
    scores, exact = hyperball_harmonic(eng, mode="exact")
    assert exact
    expect = closeness_centrality_numpy(src, dst, 120, harmonic=True)
    np.testing.assert_allclose(scores, expect, rtol=0, atol=1e-8)
    eng.shutdown()


def test_hyperball_hll_tracks_exact_within_sketch_error():
    from python_graphblas_ray.pipelines.anf import hyperball_harmonic

    src, dst = _random_edges(n=400, m=2600, seed=17)
    eng = _engine(src, dst, 400)
    ex, flag_e = hyperball_harmonic(eng, mode="exact")
    ap, flag_a = hyperball_harmonic(eng, mode="hll", b=7)
    assert flag_e and not flag_a
    # aggregate relative error of the total centrality mass: HLL with
    # 2^7 registers has ~9% per-counter stderr; totals average out
    assert abs(ap.sum() - ex.sum()) / ex.sum() < 0.15
    # per-vertex values correlate strongly with the exact ranking
    good = ex > 0
    r = np.corrcoef(ex[good], ap[good])[0, 1]
    assert r > 0.9
    eng.shutdown()


def test_hyperball_path_graph_hand_values():
    from python_graphblas_ray.pipelines.anf import hyperball_harmonic

    # directed path 0→1→2→3: C(v) = Σ_{u<v} 1/(v-u)
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    eng = _engine(src, dst, 4, parts=2)
    scores, _ = hyperball_harmonic(eng, mode="exact")
    expect = [0.0, 1.0, 1.0 + 0.5, 1.0 + 0.5 + 1 / 3]
    np.testing.assert_allclose(scores, np.round(expect, 8))
    eng.shutdown()


def test_eccentricity_path_graph_and_bfs_parity():
    """Path 0→1→2→3→4: ecc_in(v) = v (longest incoming chain); then a
    random graph checked against the dense BFS distance matrix."""
    from python_graphblas_ray.pipelines.anf import hyperball_eccentricity

    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 4], dtype=np.int64)
    eng = _engine(src, dst, 5)
    try:
        ecc, exact = hyperball_eccentricity(eng, mode="exact")
    finally:
        eng.shutdown()
    assert exact
    assert ecc.tolist() == [0, 1, 2, 3, 4]

    rng = np.random.default_rng(11)
    n = 40
    src = rng.integers(0, n, 160).astype(np.int64)
    dst = rng.integers(0, n, 160).astype(np.int64)
    eng = _engine(src, dst, n)
    try:
        ecc, exact = hyperball_eccentricity(eng, mode="exact")
    finally:
        eng.shutdown()
    assert exact
    # dense BFS oracle: dist[u, v] = length of shortest u→v path
    INF = n + 1
    dist = np.full((n, n), INF, dtype=np.int64)
    dist[np.arange(n), np.arange(n)] = 0
    for _ in range(n):
        cand = dist[:, src] + 1
        new = dist.copy()
        np.minimum.at(new.T, dst, cand.T)
        if (new == dist).all():
            break
        dist = new
    finite = dist <= n
    want = np.where(finite, dist, 0).max(axis=0)
    assert ecc.tolist() == want.tolist()
