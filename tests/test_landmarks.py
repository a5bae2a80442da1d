"""Landmark distance sketches: batched bitset multi-source BFS vs
per-source numpy BFS, and the triangle-inequality estimator contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from python_graphblas_ray.pipelines.algorithms import build_engine
from python_graphblas_ray.pipelines.landmarks import (distances_table,
                                                      estimate_distance,
                                                      landmark_distances,
                                                      landmark_sketch)


def _random_edges(n=120, m=700, seed=5):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    packed = np.unique(src[keep] * n + dst[keep])
    return packed // n, packed % n


def _edges_ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": src, "dst": dst,
        "val": np.ones(len(src), dtype=np.float64)}))


def _bfs_numpy(src, dst, n, source):
    lev = np.full(n, -1, dtype=np.int64)
    lev[source] = 0
    q = np.zeros(n, dtype=bool)
    q[source] = True
    level = 1
    while q.any():
        nxt = np.zeros(n, dtype=bool)
        nxt[dst[q[src]]] = True
        q = nxt & (lev < 0)
        lev[q] = level
        level += 1
    return lev


@pytest.fixture(scope="module")
def graph_and_engine():
    n = 120
    src, dst = _random_edges(n=n)
    eng = build_engine(_edges_ds(src, dst), n, num_partitions=3)
    yield src, dst, n, eng
    eng.shutdown()


def test_landmark_distances_match_per_source_bfs(graph_and_engine):
    src, dst, n, eng = graph_and_engine
    lms = [0, 3, 17, 55, 99]
    dist = landmark_distances(eng, lms)
    assert dist.shape == (n, len(lms))
    for j, lm in enumerate(lms):
        np.testing.assert_array_equal(dist[:, j],
                                      _bfs_numpy(src, dst, n, lm))


def test_landmark_sketch_reverse_direction(graph_and_engine):
    src, dst, n, eng = graph_and_engine
    lms = [2, 40]
    dist_to, dist_from = landmark_sketch(eng, lms)
    for j, lm in enumerate(lms):
        # d(v -> lm) == BFS from lm over reversed edges
        np.testing.assert_array_equal(dist_to[:, j],
                                      _bfs_numpy(dst, src, n, lm))
        np.testing.assert_array_equal(dist_from[:, j],
                                      _bfs_numpy(src, dst, n, lm))


def test_estimate_is_upper_bound_and_exact_at_landmarks(graph_and_engine):
    src, dst, n, eng = graph_and_engine
    lms = [0, 3, 17, 55, 99]
    dist_to, dist_from = landmark_sketch(eng, lms)
    rng = np.random.default_rng(9)
    s = rng.integers(0, n, 200)
    t = rng.integers(0, n, 200)
    est = estimate_distance(dist_to, dist_from, s, t)
    for si, ti, ei in zip(s, t, est):
        true = _bfs_numpy(src, dst, n, si)[ti]
        if true < 0:
            # truly unreachable pairs can never get a finite estimate
            assert ei == -1
        elif ei >= 0:
            assert ei >= true  # upper bound
    # exact when the source IS a landmark
    est_lm = estimate_distance(dist_to, dist_from,
                               np.full(n, lms[1]), np.arange(n))
    np.testing.assert_array_equal(est_lm, dist_from[:, 1])


def test_distances_table_long_form(graph_and_engine):
    _, _, n, eng = graph_and_engine
    lms = [5, 7]
    dist = landmark_distances(eng, lms)
    t = distances_table(dist, lms)
    assert t.column_names == ["lm", "vid", "dist"]
    assert len(t) == int((dist >= 0).sum())
    got = {(a, b): c for a, b, c in zip(t["lm"].to_pylist(),
                                        t["vid"].to_pylist(),
                                        t["dist"].to_pylist())}
    for j, lm in enumerate(lms):
        for v in range(n):
            if dist[v, j] >= 0:
                assert got[(lm, v)] == dist[v, j]


def test_more_than_64_landmarks_rejected(graph_and_engine):
    _, _, _, eng = graph_and_engine
    with pytest.raises(ValueError):
        landmark_distances(eng, list(range(65)))
