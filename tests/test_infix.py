"""Reference call-syntax sugar: ``C(mask, accum, replace) << expr``,
``C << expr``, and ``@`` infix (mxm/mxv/vxm/inner) — reference
``core/base.py:200-263``, ``core/expr.py:404``, ``core/infix.py``.

Each sugar form must be value-identical to the explicit method call it
desugars to, and must mutate the SAME Python object (in-place rebind)."""

import numpy as np
import pytest

from python_graphblas_ray import DimensionMismatch, GBMatrix, GBVector, binary

A_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
A_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
A_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]
V_IDX = [1, 3, 4, 6]
V_VALS = [1.0, 1.0, 2.0, 0.0]


def _mk_A():
    return GBMatrix.from_coo(A_ROWS, A_COLS, A_VALS, nrows=7, ncols=7,
                             dtype="float64")


def _mk_v():
    return GBVector.from_coo(V_IDX, V_VALS, size=7, dtype="float64")


def _mat_coo(m):
    r, c, v = m.to_coo()
    order = np.lexsort((c, r))
    return r[order], c[order], v[order]


def _assert_mat_eq(got, want):
    gr, gc, gv = _mat_coo(got)
    wr, wc, wv = _mat_coo(want)
    np.testing.assert_array_equal(gr, wr)
    np.testing.assert_array_equal(gc, wc)
    np.testing.assert_allclose(gv, wv)


def _assert_vec_eq(got, want):
    gi, gv = got.to_coo()
    wi, wv = want.to_coo()
    o, wo = np.argsort(gi), np.argsort(wi)
    np.testing.assert_array_equal(gi[o], wi[wo])
    np.testing.assert_allclose(gv[o], wv[wo])


def test_matmul_mxm():
    A = _mk_A()
    _assert_mat_eq(A @ A, A.mxm(A))


def test_matmul_mxv_vxm():
    A, v = _mk_A(), _mk_v()
    _assert_vec_eq(A @ v, A.mxv(v))
    _assert_vec_eq(v @ A, v.vxm(A))


def test_matmul_inner():
    v = _mk_v()
    got = v @ v
    assert got.value == pytest.approx(float(np.dot([1, 1, 2, 0],
                                                   [1, 1, 2, 0])))


def test_lshift_plain_replace():
    A = _mk_A()
    C = _mk_A()
    before = id(C)
    C << A.T
    assert id(C) == before
    _assert_mat_eq(C, A.T)


def test_lshift_shape_mismatch():
    C = _mk_A()
    with pytest.raises(DimensionMismatch):
        C << GBMatrix.from_coo([0], [0], [1.0], nrows=3, ncols=3)
    with pytest.raises(TypeError):
        C << 5


def test_updater_masked():
    A = _mk_A()
    L = A.select("tril")
    C = _mk_A()
    C(L.S) << A.T
    _assert_mat_eq(C, A.update(A.T, mask=L.S))


def test_updater_accum_positional():
    A = _mk_A()
    C = _mk_A()
    C(binary.plus) << A
    _assert_mat_eq(C, A.update(A, accum=binary.plus))


def test_updater_mask_accum_replace():
    A = _mk_A()
    L = A.select("tril")
    C = _mk_A()
    C(L.S, binary.plus, True) << A.T
    _assert_mat_eq(C, A.update(A.T, mask=L.S, accum=binary.plus,
                               replace=True))


def test_updater_complement_mask_vector():
    v = _mk_v()
    w = _mk_v()
    full = GBVector.from_coo(np.arange(7), np.arange(7, dtype="float64"),
                             size=7)
    expected = w.update(full, mask=v.S, complement=True)
    w(~v.S) << full
    _assert_vec_eq(w, expected)


def test_updater_rejects_double_mask():
    A = _mk_A()
    with pytest.raises(TypeError):
        A(A.S, A.S)
    with pytest.raises(TypeError):
        A(binary.plus, binary.min)


def test_namespace_surfaces():
    """gb.select / gb.op / gb.io module surfaces (reference
    graphblas/select, graphblas/op, graphblas/io __init__ namespaces)."""
    import python_graphblas_ray as g

    A = _mk_A()
    got = g.select.tril(A)
    _assert_mat_eq(got, A.select("tril"))
    got2 = g.select.valuegt(A, 3)
    _assert_mat_eq(got2, A.select(">", 3))
    # select objects accepted by A.select directly
    _assert_mat_eq(A.select(g.select.triu), A.select("triu"))

    assert g.op.plus is g.binary.plus
    assert g.op.abs is g.unary.abs
    assert g.op["min_plus"] is g.semiring.min_plus
    assert g.op.numpy.cbrt.fn is not None
    _assert_mat_eq(A.mxm(A, g.op.plus_times), A.mxm(A))

    assert callable(g.io.mmread) and callable(g.io.mmwrite)


def test_hpec_expression_call_styles():
    """HPEC2022 notebook idioms: op called ON values/expressions —
    ``unary.exp(A)``-style, ``op.first(A & B)``, ``op.positionj(B)``,
    ``indexunary.rowindex(A)``, ``monoid.min(A | B)``, and
    ``A.apply(lambda v: ...)`` raw-callable apply."""
    import numpy as np

    from python_graphblas_ray.core import GBMatrix
    from python_graphblas_ray.functions.monoids import monoid, op
    from python_graphblas_ray.functions.ops import indexunary, unary

    A = GBMatrix.from_coo(np.array([0, 1, 2]), np.array([1, 2, 0]),
                          np.array([1.0, 2.0, 3.0]), 3, 3)
    B = GBMatrix.from_coo(np.array([0, 1]), np.array([1, 2]),
                          np.array([10.0, 20.0]), 3, 3)
    # raw lambda apply (vectorized over the value array)
    r, c, v = A.apply(lambda x: x * 2).to_coo()
    assert sorted(v.tolist()) == [2.0, 4.0, 6.0]
    # unary called on a matrix
    _, _, v = unary.ainv(A).to_coo()
    assert sorted(v.tolist()) == [-3.0, -2.0, -1.0]
    # binary / monoid called on an infix pair
    _, _, v = op.first(A & B).to_coo()
    assert sorted(v.tolist()) == [1.0, 2.0]
    _, _, v = monoid.min(A | B).to_coo()
    assert sorted(v.tolist()) == [1.0, 2.0, 3.0]
    # positional / index unary called on a matrix
    _, cols, v = op.positionj(B).to_coo()
    assert sorted(v.tolist()) == sorted(cols.tolist())
    rows, _, v = indexunary.rowindex(A).to_coo()
    assert sorted(v.tolist()) == sorted(rows.tolist())


def test_setitem_mutating_assign():
    """Reference ``__setitem__`` sugar: region / element / full assigns
    rebind in place (HPEC2022 ``A[:, :] = v`` style)."""
    import numpy as np

    from python_graphblas_ray.core import GBMatrix, GBVector

    A = GBMatrix.from_coo(np.array([0, 1]), np.array([1, 2]),
                          np.array([1.0, 2.0]), 3, 3)
    A[0, 0] = 9.0                    # element upsert
    assert A.get(0, 0) == 9.0 and A.get(1, 2) == 2.0
    A[:, :] = 5.0                    # full overwrite (dense region)
    r, c, v = A.to_coo()
    assert set(v.tolist()) == {5.0} and len(v) == 9
    v2 = GBVector.from_dense(np.array([1.0, 2.0, 3.0]))
    v2[1] = 7.0
    assert v2[1].value == 7.0 and v2[2].value == 3.0


def test_delitem_mutating_delete():
    import numpy as np

    from python_graphblas_ray.core import GBMatrix, GBVector

    A = GBMatrix.from_coo(np.array([0, 1]), np.array([1, 2]),
                          np.array([1.0, 2.0]), 3, 3)
    del A[0, 1]
    assert A.nvals == 1 and A.get(1, 2) == 2.0
    v = GBVector.from_dense(np.array([1.0, 2.0, 3.0]))
    del v[1]
    assert v.nvals == 2 and v[1].is_empty and v[2].value == 3.0
