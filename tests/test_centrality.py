"""Betweenness (batched Brandes over forward+reverse engines) vs the
single-process Brandes oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from python_graphblas_ray.pipelines.centrality import (
    betweenness,
    betweenness_numpy,
    reverse_edges,
)
from python_graphblas_ray.sources.pages import out_links
from python_graphblas_ray.state.superstep import SuperstepEngine

N = 150


@pytest.fixture(scope="module")
def engines():
    src, dst = out_links(np.arange(N), N)
    packed = np.unique(src * N + dst)
    src, dst = packed // N, packed % N
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst, "val": np.ones(len(src))}))
    fwd = SuperstepEngine(ds, N, num_partitions=3)
    rev = SuperstepEngine(reverse_edges(ds), N, num_partitions=3)
    yield src, dst, fwd, rev
    fwd.shutdown()
    rev.shutdown()


def test_betweenness_matches_brandes(engines):
    src, dst, fwd, rev = engines
    sources = [0, 7, 33, 90]
    got = betweenness(fwd, rev, sources)
    expect = betweenness_numpy(src, dst, N, sources)
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)
    assert got.max() > 0  # non-trivial graph


def test_betweenness_path_graph():
    # 0→1→2→3: only sources {0,1} contribute; bc(1)=2 (paths 0-2,0-3...,)
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst, "val": np.ones(3)}))
    fwd = SuperstepEngine(ds, 4, num_partitions=2)
    rev = SuperstepEngine(reverse_edges(ds), 4, num_partitions=2)
    got = betweenness(fwd, rev, [0, 1, 2, 3])
    expect = betweenness_numpy(src, dst, 4, [0, 1, 2, 3])
    np.testing.assert_allclose(got, expect)
    # hand check: vertex 1 lies on 0→2, 0→3; vertex 2 on 0→3, 1→3
    np.testing.assert_allclose(got, [0.0, 2.0, 2.0, 0.0])
    fwd.shutdown()
    rev.shutdown()
