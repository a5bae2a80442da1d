"""Property-based conformance (hypothesis): random small sparse matrices /
vectors vs dense numpy oracles across semirings and elementwise ops —
the parametrized-oracle pattern of the reference's test suite
(``tests/test_numpyops.py``, ``tests/test_prefix_scan.py``)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from python_graphblas_ray.core import GBMatrix, GBVector
from python_graphblas_ray.functions.monoids import semiring

N = 7  # vertex space per example (small: each example runs Ray datasets)


@st.composite
def sparse_matrix(draw):
    nnz = draw(st.integers(0, 12))
    cells = draw(st.lists(
        st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
        min_size=nnz, max_size=nnz, unique=True))
    vals = draw(st.lists(
        st.integers(1, 9), min_size=len(cells), max_size=len(cells)))
    r = np.array([c[0] for c in cells], dtype=np.int64)
    c = np.array([c[1] for c in cells], dtype=np.int64)
    v = np.array(vals, dtype=np.float64)
    return r, c, v


@st.composite
def sparse_vector(draw):
    nnz = draw(st.integers(0, N))
    idx = draw(st.lists(st.integers(0, N - 1), min_size=nnz,
                        max_size=nnz, unique=True))
    vals = draw(st.lists(st.integers(1, 9), min_size=len(idx),
                         max_size=len(idx)))
    return (np.array(idx, dtype=np.int64),
            np.array(vals, dtype=np.float64))


def _dense_m(r, c, v):
    m = np.zeros((N, N))
    m[r, c] = v
    return m


def _mask(r, c):
    m = np.zeros((N, N), dtype=bool)
    m[r, c] = True
    return m


@settings(max_examples=12, deadline=None)
@given(sparse_matrix(), sparse_vector())
def test_mxv_semirings(mat, vec):
    r, c, v = mat
    vi, vv = vec
    A = GBMatrix.from_coo(r, c, v, nrows=N, ncols=N)
    x = GBVector.from_coo(vi, vv, size=N)
    dm = _dense_m(r, c, v)
    present_m = _mask(r, c)
    present_v = np.zeros(N, dtype=bool)
    present_v[vi] = True
    dv = np.zeros(N)
    dv[vi] = vv

    # plus_times: w[i] = Σ_j A[i,j]*x[j] over PRESENT pairs only
    idx, vals = A.mxv(x, semiring.plus_times).to_coo()
    both = present_m & present_v[None, :]
    expect = np.where(both, dm * dv[None, :], 0.0).sum(axis=1)
    has = both.any(axis=1)
    np.testing.assert_array_equal(idx, np.flatnonzero(has))
    np.testing.assert_allclose(vals, expect[has])

    # min_plus over present pairs
    idx2, vals2 = A.mxv(x, semiring.min_plus).to_coo()
    mp = np.where(both, dm + dv[None, :], np.inf).min(axis=1)
    np.testing.assert_array_equal(idx2, np.flatnonzero(has))
    np.testing.assert_allclose(vals2, mp[has])


@settings(max_examples=12, deadline=None)
@given(sparse_matrix(), sparse_matrix())
def test_ewise_add_mult(m1, m2):
    r1, c1, v1 = m1
    r2, c2, v2 = m2
    A = GBMatrix.from_coo(r1, c1, v1, nrows=N, ncols=N)
    B = GBMatrix.from_coo(r2, c2, v2, nrows=N, ncols=N)
    d1, d2 = _dense_m(r1, c1, v1), _dense_m(r2, c2, v2)
    p1, p2 = _mask(r1, c1), _mask(r2, c2)

    ra, ca, va = A.ewise_add(B, "plus").to_coo()
    expect = d1 + d2
    union = p1 | p2
    got = np.zeros((N, N))
    got[ra, ca] = va
    np.testing.assert_allclose(got[union], expect[union])
    assert len(ra) == int(union.sum())

    rm, cm, vm = A.ewise_mult(B, "times").to_coo()
    inter = p1 & p2
    got = np.zeros((N, N))
    got[rm, cm] = vm
    np.testing.assert_allclose(got[inter], (d1 * d2)[inter])
    assert len(rm) == int(inter.sum())


@settings(max_examples=12, deadline=None)
@given(sparse_matrix())
def test_mxm_plus_times_vs_dense(mat):
    r, c, v = mat
    A = GBMatrix.from_coo(r, c, v, nrows=N, ncols=N)
    d = _dense_m(r, c, v)
    rr, cc, vv = A.mxm(A, semiring.plus_times).to_coo()
    # structural result: (i,j) present iff ∃k A[i,k] & A[k,j] present
    p = _mask(r, c)
    struct = (p.astype(int) @ p.astype(int)) > 0
    got = np.zeros((N, N))
    got[rr, cc] = vv
    np.testing.assert_allclose(got[struct], (d @ d)[struct])
    assert len(rr) == int(struct.sum())


@settings(max_examples=12, deadline=None)
@given(sparse_matrix(), st.sampled_from(["plus", "min", "max"]))
def test_reductions(mat, op):
    r, c, v = mat
    A = GBMatrix.from_coo(r, c, v, nrows=N, ncols=N)
    red = {"plus": np.sum, "min": np.min, "max": np.max}[op]
    vec = A.reduce_rowwise(op)
    idx, vals = vec.to_coo()
    rows = np.unique(r)
    np.testing.assert_array_equal(idx, rows)
    for i, row in enumerate(rows):
        np.testing.assert_allclose(vals[i], red(v[r == row]))
    s = A.reduce_scalar(op)
    if len(v):
        np.testing.assert_allclose(s.value, red(v))
    else:
        assert s.is_empty
