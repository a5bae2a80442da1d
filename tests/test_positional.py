"""Positional binary ops (firsti/firstj/secondi/secondj [+1]) and the
min/max/any positional semirings (reference
``core/operator/binary.py:470-480``, ``semiring.py:190-218``) vs dense
numpy oracles."""

import numpy as np
import pytest

from python_graphblas_ray.core import GBMatrix, GBVector
from python_graphblas_ray.functions.monoids import semiring
from python_graphblas_ray.functions.ops import binary

NAN = np.nan


def _mat(dense):
    dense = np.asarray(dense, dtype=np.float64)
    r, c = np.nonzero(~np.isnan(dense))
    return GBMatrix.from_coo(r, c, dense[r, c],
                             nrows=dense.shape[0], ncols=dense.shape[1])


@pytest.fixture(scope="module")
def AB():
    rng = np.random.default_rng(7)
    A = rng.random((8, 6))
    A[rng.random((8, 6)) < 0.5] = NAN
    B = rng.random((6, 7))
    B[rng.random((6, 7)) < 0.5] = NAN
    return A, B


def _mxm_pos_oracle(A, B, which, offset, agg):
    nr, nc = A.shape[0], B.shape[1]
    out = np.full((nr, nc), NAN)
    for i in range(nr):
        for j in range(nc):
            ks = [k for k in range(A.shape[1])
                  if not np.isnan(A[i, k]) and not np.isnan(B[k, j])]
            if not ks:
                continue
            vals = [{"firsti": i, "firstj": k,
                     "secondi": k, "secondj": j}[which] + offset
                    for k in ks]
            out[i, j] = agg(vals)
    return out


@pytest.mark.parametrize("name,agg", [
    ("min_secondi", min), ("min_firstj", min), ("max_secondj", max),
    ("min_secondi1", min),
])
def test_mxm_positional(AB, name, agg):
    A, B = AB
    sr = semiring[name]
    got = _mat(A).mxm(_mat(B), sr).to_dense(NAN)
    which = sr.binaryop.positional
    want = _mxm_pos_oracle(A, B, which, sr.binaryop.offset, agg)
    np.testing.assert_allclose(got, want, equal_nan=True)


def test_mxv_min_secondi_parent_style(AB):
    """Parent-BFS kernel shape: w = A.mxv(u, min_secondi) → per row i the
    min k over present (A[i,k], u[k]) pairs."""
    A, _ = AB
    u = np.array([1.0, NAN, 3.0, 4.0, NAN, 6.0])
    uv = GBVector.from_coo(np.flatnonzero(~np.isnan(u)),
                           u[~np.isnan(u)], size=6)
    got = _mat(A).mxv(uv, semiring.min_secondi).to_dense(NAN)
    want = np.full(A.shape[0], NAN)
    for i in range(A.shape[0]):
        ks = [k for k in range(6)
              if not np.isnan(A[i, k]) and not np.isnan(u[k])]
        if ks:
            want[i] = min(ks)
    np.testing.assert_allclose(got, want, equal_nan=True)


def test_vxm_min_secondj(AB):
    _, B = AB
    u = np.array([NAN, 2.0, 3.0, NAN, 5.0, 6.0])
    uv = GBVector.from_coo(np.flatnonzero(~np.isnan(u)),
                           u[~np.isnan(u)], size=6)
    got = uv.vxm(_mat(B), semiring.min_secondj).to_dense(NAN)
    # secondj = A's col j — so the result is j where any pair exists
    want = np.full(B.shape[1], NAN)
    for j in range(B.shape[1]):
        ks = [k for k in range(6)
              if not np.isnan(B[k, j]) and not np.isnan(u[k])]
        if ks:
            want[j] = j
    np.testing.assert_allclose(got, want, equal_nan=True)


def test_ewise_positional(AB):
    A, _ = AB
    A2 = A.copy()
    got = _mat(A).ewise_mult(_mat(A2), binary.firstj).to_dense(NAN)
    want = np.where(np.isnan(A), NAN,
                    np.broadcast_to(np.arange(A.shape[1]), A.shape))
    np.testing.assert_allclose(got, want, equal_nan=True)


def test_positional_fn_raises():
    with pytest.raises(TypeError):
        binary.firsti.fn(np.ones(3), np.ones(3))
