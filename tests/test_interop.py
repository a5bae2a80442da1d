"""Ecosystem connectors (reference ``graphblas/io/_networkx.py:5,:35``,
``io/_scipy.py:8,:68``): networkx IS installed in this container, so the
bridge gets real roundtrip coverage; scipy is not, so its guard message
is asserted instead."""

import numpy as np
import pytest

from python_graphblas_ray.core import GBMatrix
from python_graphblas_ray.sources.interop import (
    from_networkx,
    from_scipy_sparse,
    to_networkx,
)

nx = pytest.importorskip("networkx")


def test_networkx_directed_roundtrip():
    A = GBMatrix.from_coo(
        np.array([0, 1, 2, 2], dtype=np.int64),
        np.array([1, 2, 0, 2], dtype=np.int64),
        np.array([1.5, 2.0, 3.0, 4.0]), nrows=3, ncols=3)
    G = to_networkx(A)
    assert G.is_directed()
    assert G[0][1]["weight"] == 1.5 and G[2][2]["weight"] == 4.0
    B = from_networkx(G, nodelist=[0, 1, 2])
    r, c, v = B.to_coo()
    ra, ca, va = A.to_coo()
    assert np.array_equal(r, ra) and np.array_equal(c, ca)
    assert np.allclose(v, va)


def test_networkx_undirected_mirrors_but_not_self_loops():
    G = nx.Graph()
    G.add_edge("a", "b", weight=2.0)
    G.add_edge("b", "b", weight=5.0)  # self-loop must appear ONCE
    A = from_networkx(G, nodelist=["a", "b"])
    r, c, v = A.to_coo()
    entries = dict(zip(zip(r.tolist(), c.tolist()), v.tolist()))
    assert entries == {(0, 1): 2.0, (1, 0): 2.0, (1, 1): 5.0}


def test_networkx_default_weight():
    G = nx.DiGraph()
    G.add_edge(0, 1)  # no weight attribute
    A = from_networkx(G, default_weight=7.0)
    _, _, v = A.to_coo()
    assert v.tolist() == [7.0]


def test_scipy_guard_message():
    try:
        import scipy  # noqa: F401
        pytest.skip("scipy present; guard not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="from_csr/from_coo"):
        from_scipy_sparse(object())
