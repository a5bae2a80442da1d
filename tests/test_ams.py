"""AMS tug-of-war F2 sketch vs a pure-numpy twin."""

import numpy as np
import pyarrow as pa
import ray

from python_graphblas_ray.stages.sketch import (
    _ams_signs,
    ams_f2_build,
    ams_f2_estimate,
)


def _ds(vals, blocks=1):
    t = pa.table({"x": np.asarray(vals, dtype=np.int64)})
    return ray.data.from_arrow(t).repartition(blocks)


def test_ams_matches_numpy_twin():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 50, 5000)
    got = ams_f2_build(_ds(vals), "x", depth=5)
    want = _ams_signs(vals, 5).sum(axis=1)
    assert np.array_equal(got, want)


def test_ams_block_order_independent():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 1000, 20000)
    a = ams_f2_build(_ds(vals, blocks=1), "x", depth=5)
    b = ams_f2_build(_ds(vals, blocks=13), "x", depth=5)
    c = ams_f2_build(_ds(vals[::-1].copy(), blocks=7), "x", depth=5)
    assert np.array_equal(a, b) and np.array_equal(a, c)


def test_ams_estimate_tracks_f2_on_skew():
    # heavy-hitter stream: F2 dominated by the hot key; the median-of-5
    # estimate must land within the AMS variance envelope (loose 3x)
    vals = np.concatenate([np.zeros(3000, dtype=np.int64),
                           np.arange(1, 500, dtype=np.int64)])
    s = ams_f2_build(_ds(vals), "x", depth=5)
    est = ams_f2_estimate(s)
    _, cnt = np.unique(vals, return_counts=True)
    f2 = int(np.sum(cnt.astype(np.int64) ** 2))
    assert f2 / 3 <= est <= f2 * 3
    assert est == int(np.sort(s.astype(np.int64) ** 2)[2])
