"""widest_path_fixed (max_min algebraic path) vs a dense numpy oracle."""

import numpy as np
import pyarrow as pa
import ray

from python_graphblas_ray.core import GBMatrix
from python_graphblas_ray.pipelines.algorithms import widest_path_fixed


def _matrix(src, dst, w, n):
    ds = ray.data.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64),
        "val": np.asarray(w, dtype=np.float64)}))
    return GBMatrix.from_dataset(ds, nrows=n, ncols=n)


def _dense_widest(src, dst, w, n, source, iters):
    C = np.full((n, n), -np.inf)
    for s, d, c in zip(src, dst, w):
        C[s, d] = max(C[s, d], c)
    x = np.full(n, -np.inf)
    x[source] = np.inf
    for _ in range(iters):
        relax = np.max(np.minimum(x[:, None], C), axis=0)
        x = np.maximum(x, relax)
    return x


def test_widest_matches_dense():
    rng = np.random.default_rng(3)
    n, m = 30, 120
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, 10, m).astype(np.float64)
    ids, vals = widest_path_fixed(_matrix(src, dst, w, n), source=0,
                                  iters=4).to_coo(sort=True)
    want = _dense_widest(src, dst, w, n, 0, 4)
    got = np.full(n, -np.inf)
    got[ids] = vals
    reach = want > -np.inf
    assert set(ids.tolist()) == set(np.flatnonzero(reach).tolist())
    assert np.array_equal(got[reach], want[reach])


def test_widest_bottleneck_semantics():
    # 0 -10-> 1 -2-> 3   vs   0 -4-> 2 -4-> 3 : the wide-then-narrow
    # route bottlenecks at 2; the balanced route wins with 4
    ids, vals = widest_path_fixed(
        _matrix([0, 1, 0, 2], [1, 3, 2, 3], [10, 2, 4, 4], 4),
        source=0, iters=3).to_coo(sort=True)
    d = dict(zip(ids.tolist(), vals.tolist()))
    assert d[3] == 4.0 and d[1] == 10.0 and d[2] == 4.0
    assert d[0] == np.inf


def test_widest_unreached_stay_absent():
    ids, _ = widest_path_fixed(_matrix([0], [1], [5.0], 4), source=0,
                               iters=4).to_coo(sort=True)
    assert set(ids.tolist()) == {0, 1}  # 2, 3 never materialize
