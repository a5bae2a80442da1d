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


def from_pydata_sparse(s, dup_op="plus"):
    """pydata ``sparse`` array → GBVector (1-D) or GBMatrix (2-D) —
    reference ``io/_sparse.py:8`` (``from_pydata_sparse``): every input
    format funnels through ``asformat("coo")`` and rebuilds from
    coordinates; ``dup_op`` aggregates duplicate entries for formats
    that allow them (DOK/COO)."""
    try:
        import sparse
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "from_pydata_sparse requires the `sparse` library "
            "(https://sparse.pydata.org); use GBMatrix.from_coo "
            "directly") from e
    if not isinstance(s, sparse.SparseArray):
        raise TypeError("from_pydata_sparse only accepts objects from "
                        "the `sparse` library")
    if s.ndim > 2:
        raise ValueError("ndim must be <= 2")
    from ..core import GBVector

    coo = s.asformat("coo")
    if s.ndim == 1:
        return GBVector.from_coo(coo.coords[0].astype(np.int64),
                                 coo.data, size=coo.shape[0])
    return GBMatrix.from_coo(coo.coords[0].astype(np.int64),
                             coo.coords[1].astype(np.int64), coo.data,
                             nrows=coo.shape[0], ncols=coo.shape[1],
                             dup_op=dup_op)


def to_pydata_sparse(A, format: str = "coo"):
    """GBMatrix / GBVector → pydata ``sparse`` array in ``format``
    (coo/dok/gcxs) — reference ``io/_sparse.py:63``."""
    try:
        import sparse
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "to_pydata_sparse requires the `sparse` library; use "
            "A.to_coo() directly") from e
    from ..core import GBVector

    if isinstance(A, GBVector):
        i, v = A.to_coo()
        out = sparse.COO(np.asarray([i]), v, shape=(A.size,))
    else:
        r, c, v = A.to_coo()
        out = sparse.COO(np.asarray([r, c]), v,
                         shape=(A.nrows, A.ncols))
    return out.asformat(format)


def to_awkward(A, format: str | None = None):
    """GBMatrix / GBVector → awkward Array — reference
    ``io/_awkward.py:26`` (``to_awkward``): a record array with fields
    ``values`` + ``indices`` (ragged per-row lists for csr, per-column
    for csc; flat for vec) and top-level parameters ``format`` and
    ``shape``, the exact contract ``from_awkward`` documents."""
    try:
        import awkward as ak
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "to_awkward requires the `awkward` library; use "
            "A.to_csr()/to_coo() directly") from e
    from ..core import GBVector

    if isinstance(A, GBVector):
        if format is None:
            format = "vec"
        if format != "vec":
            raise ValueError(f"Invalid format for Vector: {format}")
        i, v = A.to_coo()
        ret = ak.zip({"values": v, "indices": i.astype(np.int64)},
                     depth_limit=1)
        shape = [A.size]
    else:
        if format is None:
            format = "csr"
        if format == "csr":
            indptr, cols, vals = A.to_csr()
            counts = np.diff(indptr)
            ret = ak.zip({"values": ak.unflatten(vals, counts),
                          "indices": ak.unflatten(
                              cols.astype(np.int64), counts)},
                         depth_limit=1)
        elif format == "csc":
            indptr, rows, vals = A.to_csc()
            counts = np.diff(indptr)
            ret = ak.zip({"values": ak.unflatten(vals, counts),
                          "indices": ak.unflatten(
                              rows.astype(np.int64), counts)},
                         depth_limit=1)
        else:
            raise ValueError(f"Invalid format for Matrix: {format}")
        shape = [A.nrows, A.ncols]
    ret = ak.with_parameter(ret, "format", format)
    return ak.with_parameter(ret, "shape", shape)


def from_awkward(A) -> "GBMatrix":
    """awkward Array (as produced by :func:`to_awkward`, or the
    reference's ``io/_awkward.py:123`` layout — both carry top-level
    ``format``/``shape`` parameters and ``values``/``indices`` fields)
    → GBVector or GBMatrix."""
    try:
        import awkward as ak
    except ImportError as e:  # pragma: no cover
        raise ImportError("from_awkward requires the `awkward` "
                          "library") from e
    from ..core import GBVector

    params = A.layout.parameters
    if missing := {"format", "shape"} - params.keys():
        raise ValueError(f"Missing parameters: {missing}")
    format, shape = params["format"], params["shape"]
    if len(shape) == 1:
        if format != "vec":
            raise ValueError(f"Invalid format for Vector: {format}")
        return GBVector.from_coo(
            np.asarray(ak.to_numpy(A.indices), dtype=np.int64),
            ak.to_numpy(A.values), size=shape[0])
    nrows, ncols = shape
    vals = np.asarray(ak.to_numpy(ak.flatten(A.values)))
    idx = np.asarray(ak.to_numpy(ak.flatten(A.indices)),
                     dtype=np.int64)
    counts = np.asarray(ak.to_numpy(ak.num(A.values)), dtype=np.int64)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    if format == "csr":
        return GBMatrix.from_csr(indptr, idx, vals, ncols=ncols)
    if format == "csc":
        return GBMatrix.from_csc(indptr, idx, vals, nrows=nrows)
    raise ValueError(f"Invalid format for Matrix: {format}")
