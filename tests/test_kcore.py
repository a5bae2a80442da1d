"""k-core / core-number / k-truss vs single-process oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from python_graphblas_ray.pipelines.kcore import (
    core_number,
    k_core,
    k_core_numpy,
    k_truss,
    k_truss_numpy,
)
from python_graphblas_ray.pipelines.triangles import simple_undirected
from python_graphblas_ray.sources.pages import out_links

N = 120


@pytest.fixture(scope="module")
def G():
    src, dst = out_links(np.arange(N), N)
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst, "val": np.ones(len(src))}))
    A = simple_undirected(ds, N)
    A.ds = A.ds.materialize()
    r, c, _ = A.to_coo()
    return A, r, c


@pytest.mark.parametrize("k", [2, 3, 5])
def test_k_core(G, k):
    A, r, c = G
    sub = k_core(A, k)
    keep = k_core_numpy(r, c, N, k)
    rr, cc, _ = sub.to_coo()
    expect_edges = {(i, j) for i, j in zip(r, c) if keep[i] and keep[j]}
    assert set(zip(rr, cc)) == expect_edges
    if len(rr):
        deg = np.bincount(rr, minlength=N)
        assert deg[deg > 0].min() >= k


def test_core_number(G):
    A, r, c = G
    got = core_number(A)
    # oracle: max k whose k-core contains the vertex
    expect = np.zeros(N, dtype=np.int64)
    k = 1
    while True:
        keep = k_core_numpy(r, c, N, k)
        # membership = has degree >= k within the surviving subgraph
        sel = np.array([keep[i] for i in range(N)])
        deg = np.bincount(r[[keep[i] and keep[j]
                            for i, j in zip(r, c)]], minlength=N)
        members = sel & (deg >= k)
        if not members.any():
            break
        expect[members] = k
        k += 1
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("k", [3, 4])
def test_k_truss(G, k):
    A, r, c = G
    sub = k_truss(A, k)
    keep = k_truss_numpy(r, c, N, k)
    rr, cc, _ = sub.to_coo()
    expect_edges = {(int(i), int(j))
                    for i, j in zip(*np.nonzero(keep))}
    assert set(zip(rr.tolist(), cc.tolist())) == expect_edges


def test_k_truss_k2_is_identity(G):
    """2-truss is the graph unchanged — triangle-free edges must survive
    (ADVICE r1: masked plus_pair emits no entry for 0-support edges)."""
    A, r, c = G
    sub = k_truss(A, 2)
    assert sub.nvals == A.nvals


def test_k_truss_broadcast_matches_mxm_path():
    """The broadcast wedge-kernel fast path and the masked-mxm path must
    emit identical support-valued edge sets (the auto route's contract)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_graphblas_ray.pipelines.kcore import (k_truss,
                                                      k_truss_broadcast)
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    rng = np.random.default_rng(11)
    n, m = 50, 420
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    A = simple_undirected(ray.data.from_arrow(pa.table({
        "src": src.astype(np.int64), "dst": dst.astype(np.int64),
        "val": np.ones(m, dtype=np.float64)})), n)
    for k in (2, 3, 4, 6):
        slow = k_truss(A, k)
        fast = k_truss_broadcast(A, k)
        rs, cs, vs = slow.to_coo()
        rf, cf, vf = fast.to_coo()
        o1, o2 = np.lexsort((cs, rs)), np.lexsort((cf, rf))
        assert np.array_equal(rs[o1], rf[o2])
        assert np.array_equal(cs[o1], cf[o2])
        assert np.array_equal(vs[o1], vf[o2])
