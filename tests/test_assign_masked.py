"""Masked assign / subassign vs a dense numpy model of the GraphBLAS
spec (reference ``graphblas/core/matrix.py:3116`` ``_prep_for_assign``:
GrB_assign mask-on-C vs GxB_subassign mask-on-region, replace, accum,
complement, structural/value masks)."""

import numpy as np
import pytest
import ray.data

from python_graphblas_ray.core import GBMatrix, GBVector

NAN = np.nan


def model_assign(C, rows, cols, A, M=None, accum=None, replace=False,
                 complement=False, structure=True, subassign=False):
    """Dense oracle. C/A/M: 2-D arrays with nan = no entry. M is C-shaped
    for assign, region-shaped for subassign. Returns the expected dense
    result."""
    C = C.copy()
    present = ~np.isnan(C)
    # region update T in C coordinates (accum merge or overwrite)
    Z = C.copy()
    for bi, i in enumerate(rows):
        for bj, j in enumerate(cols):
            a = A[bi, bj] if A.ndim else float(A)
            if np.isnan(a):
                if accum is None and not np.isnan(Z[i, j]):
                    Z[i, j] = NAN  # assign w/o accum clears the region
                continue
            if accum is not None and not np.isnan(C[i, j]):
                Z[i, j] = accum(C[i, j], a)
            else:
                Z[i, j] = a
    if M is None:
        return Z
    # mask truth per C position
    def mval(i, j):
        if subassign:
            if i in rows and j in cols:
                bi, bj = list(rows).index(i), list(cols).index(j)
                v = M[bi, bj]
            else:
                return None  # outside region: mask not consulted
        else:
            v = M[i, j]
        ok = (not np.isnan(v)) if structure else (not np.isnan(v) and bool(v))
        return ok != complement
    out = np.full_like(C, NAN)
    for i in range(C.shape[0]):
        for j in range(C.shape[1]):
            m = mval(i, j)
            if m is None:  # subassign, outside region: always old C
                out[i, j] = C[i, j]
            elif m:
                out[i, j] = Z[i, j]
            else:
                out[i, j] = NAN if replace else C[i, j]
    return out


def _mat(dense):
    dense = np.asarray(dense, dtype=np.float64)
    r, c = np.nonzero(~np.isnan(dense))
    return GBMatrix.from_coo(r, c, dense[r, c],
                             nrows=dense.shape[0], ncols=dense.shape[1])


@pytest.fixture(scope="module")
def C0():
    rng = np.random.default_rng(3)
    d = rng.random((6, 6))
    d[rng.random((6, 6)) < 0.4] = NAN
    d[0, 0] = 0.0  # a stored zero (value-mask false, structure true)
    return d


@pytest.fixture(scope="module")
def Msk():
    rng = np.random.default_rng(4)
    d = rng.integers(0, 2, (6, 6)).astype(np.float64)
    d[rng.random((6, 6)) < 0.3] = NAN
    return d


ROWS = [1, 2, 4]
COLS = [0, 3, 5]


@pytest.fixture(scope="module")
def A0():
    rng = np.random.default_rng(5)
    d = rng.random((3, 3)) * 10
    d[rng.random((3, 3)) < 0.3] = NAN
    return d


def _check(got: GBMatrix, expect_dense):
    gd = got.to_dense(NAN)
    np.testing.assert_allclose(gd, expect_dense, equal_nan=True)


@pytest.mark.parametrize("replace", [False, True])
@pytest.mark.parametrize("structure", [True, False])
def test_assign_mask_on_c(C0, Msk, A0, replace, structure):
    C, M, A = _mat(C0), _mat(Msk), _mat(A0)
    mask = M.S if structure else M.V
    got = C.assign(ROWS, COLS, A, mask=mask, replace=replace)
    want = model_assign(C0, ROWS, COLS, A0, M=Msk, replace=replace,
                        structure=structure)
    _check(got, want)


@pytest.mark.parametrize("replace", [False, True])
def test_subassign_region_mask(C0, A0, replace):
    rng = np.random.default_rng(6)
    Mr = rng.integers(0, 2, (3, 3)).astype(np.float64)
    Mr[Mr == 0] = NAN  # structural-style region mask
    C, A = _mat(C0), _mat(A0)
    got = C.assign(ROWS, COLS, A, mask=_mat(Mr).S, replace=replace,
                   subassign=True)
    want = model_assign(C0, ROWS, COLS, A0, M=Mr, replace=replace,
                        structure=True, subassign=True)
    _check(got, want)


def test_assign_mask_complement(C0, Msk, A0):
    C, M, A = _mat(C0), _mat(Msk), _mat(A0)
    got = C.assign(ROWS, COLS, A, mask=~M.S)
    want = model_assign(C0, ROWS, COLS, A0, M=Msk, complement=True)
    _check(got, want)


def test_assign_mask_accum(C0, Msk, A0):
    C, M, A = _mat(C0), _mat(Msk), _mat(A0)
    got = C.assign(ROWS, COLS, A, accum="plus", mask=M.S)
    want = model_assign(C0, ROWS, COLS, A0, M=Msk,
                        accum=lambda a, b: a + b)
    _check(got, want)


def test_assign_scalar_masked(C0, Msk):
    C, M = _mat(C0), _mat(Msk)
    got = C.assign(ROWS, COLS, 7.5, mask=M.S, replace=True)
    want = model_assign(C0, ROWS, COLS, np.full((3, 3), 7.5), M=Msk,
                        replace=True)
    _check(got, want)


def test_vector_assign_masked():
    v0 = np.array([1.0, NAN, 3.0, NAN, 5.0, 6.0])
    m0 = np.array([1.0, 1.0, NAN, 1.0, NAN, 1.0])
    sel = [0, 2, 4]
    val = np.array([10.0, 20.0, 30.0])

    def vec(d):
        idx = np.flatnonzero(~np.isnan(d))
        return GBVector.from_coo(idx, d[idx], size=len(d))

    v, m = vec(v0), vec(m0)
    got = v.assign(sel, GBVector.from_coo(np.arange(3), val, size=3),
                   mask=m.S, replace=True)
    want = model_assign(v0[:, None], sel, [0],
                        val[:, None], M=m0[:, None], replace=True)
    np.testing.assert_allclose(got.to_dense(NAN), want[:, 0],
                               equal_nan=True)


def test_vector_subassign_masked():
    v0 = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    sel = [1, 3, 5]
    mr = np.array([1.0, NAN, 1.0])  # region mask
    val = np.array([10.0, 20.0, 30.0])
    idx = np.arange(6)
    v = GBVector.from_coo(idx, v0, size=6)
    mask_v = GBVector.from_coo(np.flatnonzero(~np.isnan(mr)),
                               mr[~np.isnan(mr)], size=3)
    got = v.assign(sel, GBVector.from_coo(np.arange(3), val, size=3),
                   mask=mask_v.S, replace=True, subassign=True)
    want = model_assign(v0[:, None], sel, [0], val[:, None],
                        M=mr[:, None], replace=True, subassign=True)
    np.testing.assert_allclose(got.to_dense(NAN), want[:, 0],
                               equal_nan=True)
