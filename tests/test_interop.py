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


def test_pydata_sparse_guard_message():
    try:
        import sparse  # noqa: F401
        pytest.skip("sparse present; guard not reachable")
    except ImportError:
        pass
    from python_graphblas_ray.sources.interop import (
        from_pydata_sparse, to_pydata_sparse)
    with pytest.raises(ImportError, match="sparse"):
        from_pydata_sparse(object())
    with pytest.raises(ImportError, match="to_coo"):
        to_pydata_sparse(object())


def test_awkward_guard_message():
    try:
        import awkward  # noqa: F401
        pytest.skip("awkward present; guard not reachable")
    except ImportError:
        pass
    from python_graphblas_ray.sources.interop import (
        from_awkward, to_awkward)
    with pytest.raises(ImportError, match="awkward"):
        to_awkward(object())
    with pytest.raises(ImportError, match="awkward"):
        from_awkward(object())


def test_pydata_sparse_roundtrip():
    """Real roundtrip — runs wherever `sparse` is installed (skips in
    this container); semantics mirror reference io/_sparse.py."""
    sparse = pytest.importorskip("sparse")
    import numpy as np

    from python_graphblas_ray.core import GBMatrix
    from python_graphblas_ray.sources.interop import (
        from_pydata_sparse, to_pydata_sparse)

    r = np.array([0, 1, 1, 3], dtype=np.int64)
    c = np.array([2, 0, 2, 1], dtype=np.int64)
    v = np.array([1.5, 2.0, -3.0, 4.0])
    s = sparse.COO(np.asarray([r, c]), v, shape=(4, 4))
    A = from_pydata_sparse(s)
    back = to_pydata_sparse(A, format="coo")
    assert (back.coords == s.coords).all()
    assert np.allclose(back.data, s.data)
    # 1-D -> GBVector
    sv = sparse.COO(np.asarray([[0, 3]]), np.array([1.0, 2.0]),
                    shape=(5,))
    V = from_pydata_sparse(sv)
    i, vv = V.to_coo()
    assert i.tolist() == [0, 3] and vv.tolist() == [1.0, 2.0]


def test_awkward_roundtrip():
    """Real roundtrip — runs wherever `awkward` is installed (skips in
    this container); layout contract mirrors reference io/_awkward.py
    (values/indices fields + format/shape parameters)."""
    ak = pytest.importorskip("awkward")
    import numpy as np

    from python_graphblas_ray.core import GBMatrix, GBVector
    from python_graphblas_ray.sources.interop import (
        from_awkward, to_awkward)

    A = GBMatrix.from_coo(np.array([0, 1, 1, 3]), np.array([2, 0, 2, 1]),
                          np.array([1.5, 2.0, -3.0, 4.0]),
                          nrows=4, ncols=4)
    for fmt in ("csr", "csc"):
        arr = to_awkward(A, format=fmt)
        assert arr.layout.parameters["format"] == fmt
        assert arr.layout.parameters["shape"] == [4, 4]
        B = from_awkward(arr)
        assert A.isequal(B)
    V = GBVector.from_coo(np.array([1, 4]), np.array([9.0, 8.0]), size=6)
    arr = to_awkward(V)
    W = from_awkward(arr)
    assert V.isequal(W)
