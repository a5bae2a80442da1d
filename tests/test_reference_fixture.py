"""Parity against the reference's own canonical golden fixture — the 7×7
matrix and hand-computed expected results from
``/root/reference/graphblas/tests/test_matrix.py:34-56`` (fixture),
``:307`` (mxm), ``:389`` (mxv), ``:395,:407`` (ewise), ``:348-376``
(masked mxm + update protocol), ``:378`` (accum), ``:1238`` (select).
Same inputs, same expected outputs, our engine."""

import numpy as np
import pytest

from python_graphblas_ray.core import GBMatrix, GBVector
from python_graphblas_ray.functions.monoids import semiring

#    0 1 2 3 4 5 6
# 0 [- 2 - 3 - - -]
# 1 [- - - - 8 - 4]
# 2 [- - - - - 1 -]
# 3 [3 - 3 - - - -]
# 4 [- - - - - 7 -]
# 5 [- - 1 - - - -]
# 6 [- - 5 7 3 - -]
_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]


@pytest.fixture
def A():
    return GBMatrix.from_coo(_ROWS, _COLS, np.array(_VALS, dtype=np.float64))


@pytest.fixture
def v():
    return GBVector.from_coo([1, 3, 4, 6], [1.0, 1.0, 2.0, 0.0], size=7)


def _golden(rows, cols, vals, nrows=7, ncols=7):
    return GBMatrix.from_coo(rows, cols, np.array(vals, dtype=np.float64),
                             nrows=nrows, ncols=ncols)


def test_mxm_golden(A):
    C = A.mxm(A, semiring.plus_times)
    result = _golden(
        [0, 0, 0, 0, 1, 1, 1, 1, 2, 3, 3, 3, 4, 5, 6, 6, 6],
        [0, 2, 4, 6, 2, 3, 4, 5, 2, 1, 3, 5, 2, 5, 0, 2, 5],
        [9, 9, 16, 8, 20, 28, 12, 56, 1, 6, 9, 3, 7, 1, 21, 21, 26])
    assert C.isequal(result)


def test_mxv_golden(A, v):
    w = A.mxv(v, semiring.plus_times)
    expect = GBVector.from_coo([0, 1, 6], [5.0, 16.0, 13.0], size=7)
    assert w.isequal(expect)


def test_mxm_nonsquare_golden():
    A = GBMatrix.from_coo([0, 0, 0], [0, 2, 4], [1.0, 2.0, 3.0],
                          nrows=1, ncols=5)
    B = GBMatrix.from_coo([0, 2, 4], [0, 0, 0], [10.0, 20.0, 30.0],
                          nrows=5, ncols=1)
    C = A.mxm(B, semiring.max_plus)
    assert C.get(0, 0) == 33
    C2 = A.T.mxm(B.T, semiring.max_plus)
    assert C2.nrows == 5 and C2.ncols == 5


def test_ewise_mult_golden(A):
    B = _golden([0, 0, 5], [1, 2, 2], [5, 4, 8])
    C = A.ewise_mult(B, "times")
    assert C.isequal(_golden([0, 5], [1, 2], [10, 8]))


def test_ewise_add_golden(A):
    B = _golden([0, 0, 5], [1, 2, 2], [5, 4, 8])
    result = _golden(
        [0, 3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1],
        [2, 0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6],
        [4, 3, 5, 3, 8, 5, 3, 7, 8, 3, 1, 7, 4])
    # SECOND(x, empty) == x — union pass-through semantics
    assert A.ewise_add(B, "second").isequal(result)
    assert A.ewise_add(B, "max").isequal(result)


def test_mxm_value_mask_golden(A):
    val_mask = _golden([0, 3, 4], [2, 3, 2], [True, True, True])
    C = A.update(A.mxm(A, semiring.plus_times), mask=val_mask,
                 mask_structure=False)
    result = _golden(
        [0, 0, 0, 1, 1, 2, 3, 3, 3, 4, 4, 5, 6, 6, 6],
        [1, 2, 3, 4, 6, 5, 0, 2, 3, 2, 5, 2, 2, 3, 4],
        [2, 9, 3, 8, 4, 1, 3, 3, 9, 7, 7, 1, 5, 7, 3])
    assert C.isequal(result)


def test_mxm_complemented_mask_golden(A):
    val_mask = _golden([0, 3, 4], [2, 3, 2], [True, True, True])
    C = A.update(A.mxm(A, semiring.plus_times), mask=val_mask,
                 mask_structure=False, complement=True)
    result2 = _golden(
        [0, 0, 0, 1, 1, 1, 1, 2, 3, 3, 5, 6, 6, 6],
        [0, 4, 6, 2, 3, 4, 5, 2, 1, 5, 5, 0, 2, 5],
        [9, 16, 8, 20, 28, 12, 56, 1, 6, 3, 1, 21, 21, 26])
    assert C.isequal(result2)


def test_mxm_struct_mask_replace_golden(A):
    struct_mask = _golden([0, 3, 4], [2, 3, 2], [1, 0, 0])
    C = A.update(A.mxm(A, semiring.plus_times), mask=struct_mask,
                 mask_structure=True, replace=True)
    result3 = _golden([0, 3, 4], [2, 3, 2], [9, 9, 7])
    assert C.isequal(result3)
    # masked new(): mask applied inside the mxm pipeline
    C2 = A.mxm(A, semiring.plus_times, mask=struct_mask.S)
    assert C2.isequal(result3)


def test_mxm_accum_golden(A):
    C = A.update(A.mxm(A, semiring.plus_times), accum="+")
    result = _golden(
        [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 2, 2, 3, 3, 3, 3, 3, 4, 4,
         5, 5, 6, 6, 6, 6, 6],
        [0, 1, 2, 3, 4, 6, 2, 3, 4, 5, 6, 2, 5, 0, 1, 2, 3, 5, 2, 5,
         2, 5, 0, 2, 3, 4, 5],
        [9, 2, 9, 3, 16, 8, 20, 28, 20, 56, 4, 1, 1, 3, 6, 3, 9, 3, 7,
         7, 1, 1, 21, 26, 7, 3, 26])
    assert C.isequal(result)


def test_select_golden(A):
    A3 = _golden([0, 3, 3, 6], [3, 0, 2, 4], [3, 3, 3, 3])
    assert A.select("==", 3).isequal(A3)
    assert A.select("valueeq", 3).isequal(A3)
    A2cols = _golden([3, 0, 3, 5, 6], [0, 1, 2, 2, 2], [3, 2, 3, 1, 5])
    assert A.select("colle", 2).isequal(A2cols)


# -- vector goldens (reference graphblas/tests/test_vector.py:299,:371,
#    :402,:866) --------------------------------------------------------

def test_vxm_golden(A, v):
    w = v.vxm(A, semiring.plus_times)
    expect = GBVector.from_coo([0, 2, 3, 4, 5, 6],
                               [3.0, 3.0, 0.0, 8.0, 14.0, 4.0], size=7)
    assert w.isequal(expect)


def test_vector_ewise_golden(v):
    v2 = GBVector.from_coo([0, 3, 5, 6], [2.0, 3.0, 2.0, 1.0], size=7)
    assert v.ewise_mult(v2, "times").isequal(
        GBVector.from_coo([3, 6], [3.0, 0.0], size=7))
    assert v.ewise_add(v2, "max").isequal(GBVector.from_coo(
        [0, 1, 3, 4, 5, 6], [2.0, 1.0, 3.0, 2.0, 2.0, 1.0], size=7))


def test_vector_reduce_golden(v):
    assert v.reduce("plus").value == 4
    # structurally-empty reduce stays empty (allow_empty semantics)
    empty = GBVector.from_coo([], [], size=7)
    assert empty.reduce("plus").is_empty
    assert empty.reduce("plus", allow_empty=False).value == 0


def test_inner_outer_golden(v):
    s = v.inner(v)
    # Σ v_i² over present entries: 1+1+4+0 = 6
    assert s.value == 6.0
    O = v.outer(v, "times")
    idx, vals = v.to_coo()
    assert O.nvals == len(idx) ** 2
    assert O.get(3, 4) == 2.0 and O.get(4, 4) == 4.0 and O.get(6, 6) == 0.0


# -- extract / assign / apply / kronecker goldens (test_matrix.py:427,
#    :443,:607,:1158,:1714) --------------------------------------------

def test_extract_golden(A):
    result = _golden([0, 0, 1, 2, 2, 2], [0, 2, 1, 1, 2, 3],
                     [2, 3, 3, 5, 7, 3], nrows=3, ncols=4)
    assert A.extract([0, 3, 6], [1, 2, 3, 4]).isequal(result)
    assert A.extract(slice(0, None, 3), slice(1, 5)).isequal(result)


def test_extract_row_golden(A):
    # A[6, cols] yields the row restricted to cols, remapped to 0..len-1
    w = A[6, [0, 2, 4]]
    expect = GBVector.from_coo([1, 2], [5.0, 3.0], size=3)
    assert w.isequal(expect)


def test_assign_matrix_golden(A):
    B = GBMatrix.from_coo([0, 0, 1], [0, 1, 0],
                          np.array([9, 8, 7], dtype=np.float64))
    result = _golden(
        [0, 0, 2, 3, 0, 3, 5, 6, 0, 6, 1, 6, 4, 1],
        [0, 5, 0, 0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 6],
        [9, 8, 7, 3, 2, 3, 1, 5, 3, 7, 8, 3, 7, 4])
    C = A.assign([0, 2], [0, 5], B)
    assert C.isequal(result)


def test_apply_golden(A):
    result = _golden(_ROWS, _COLS, [-x for x in _VALS])
    assert A.apply("ainv").isequal(result)


def test_transpose_golden(A):
    result = _golden(_COLS, _ROWS, _VALS)
    assert A.T.isequal(result)


def test_kronecker_golden():
    A = GBMatrix.from_coo([0, 1, 1], [0, 0, 1],
                          np.array([1, 2, 3], dtype=np.float64))
    B = GBMatrix.from_coo([0, 0, 1, 1], [1, 2, 0, 2],
                          np.array([2, 3, 8, 4], dtype=np.float64))
    result = _golden(
        [0, 0, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3],
        [1, 2, 0, 2, 1, 2, 4, 5, 0, 2, 3, 5],
        [2, 3, 8, 4, 4, 6, 6, 9, 16, 8, 24, 12], nrows=4, ncols=6)
    assert A.kronecker(B, "times").isequal(result)


# -- reduce / diag / reposition goldens (test_matrix.py:1355,:1648,
#    :1656,:2655-2681,:3792) -------------------------------------------

def test_reduce_goldens(A):
    rw = A.reduce_rowwise("plus")
    assert rw.isequal(GBVector.from_coo(
        [0, 1, 2, 3, 4, 5, 6],
        [5.0, 12.0, 1.0, 6.0, 7.0, 1.0, 15.0], size=7))
    cw = A.reduce_columnwise("plus")
    assert cw.isequal(GBVector.from_coo(
        [0, 1, 2, 3, 4, 5, 6],
        [3.0, 2.0, 9.0, 10.0, 11.0, 8.0, 4.0], size=7))
    assert A.reduce_scalar("plus").value == 47


@pytest.mark.parametrize("k,indices,values", [
    (0, [], []),
    (1, [0, 4], [2, 7]),
    (3, [0, 1, 2], [3, 8, 1]),
    (10, [], []),
    (-1, [2], [3]),
    (-3, [0, 2, 3], [3, 1, 7]),
    (-10, [], []),
])
def test_diag_goldens(A, k, indices, values):
    expected = GBVector.from_coo(indices,
                                 np.array(values, dtype=np.float64),
                                 size=max(0, 7 - abs(k)))
    assert A.diag(k).isequal(expected)
    assert A.T.diag(-k).isequal(expected)


@pytest.mark.parametrize("ro,co", [(1, 2), (-2, 0), (3, -4), (0, 0)])
def test_reposition_goldens(A, ro, co):
    r = np.array(_ROWS) + ro
    c = np.array(_COLS) + co
    keep = (r >= 0) & (r < 7) & (c >= 0) & (c < 7)
    expected = _golden(r[keep], c[keep],
                       np.array(_VALS, dtype=np.float64)[keep])
    assert A.reposition(ro, co).isequal(expected)


# -- bound-binary / indexunary apply goldens (test_matrix.py:1168,:1203) --

def test_apply_binary_golden(A):
    # right-bound: A > 1 elementwise (booleans)
    result_right = _golden(
        _ROWS, _COLS, [1, 1, 1, 0, 1, 1, 1, 1, 1, 0, 1, 1])
    got = A.apply(">", right=1)
    rr, cc, vv = got.to_coo()
    er, ec, ev = result_right.to_coo()
    np.testing.assert_array_equal(rr, er)
    np.testing.assert_array_equal(cc, ec)
    np.testing.assert_array_equal(vv.astype(np.int64), ev.astype(np.int64))
    # left-bound: 8 - A
    result_left = _golden(
        _ROWS, _COLS, [5, 6, 5, 7, 3, 5, 1, 0, 5, 7, 1, 4])
    assert A.apply("-", left=8).isequal(result_left)


def test_apply_indexunary_golden(A):
    Ar = _golden(_ROWS, _COLS, _ROWS)
    assert A.apply("rowindex", thunk=0).isequal(Ar)
    Ac = _golden(_ROWS, _COLS, [c + 2 for c in _COLS])
    assert A.apply("colindex", thunk=2).isequal(Ac)


def test_select_positional_goldens(A):
    # triu (test_matrix.py:1257)
    Aupper = _golden([0, 0, 1, 2, 4, 1], [1, 3, 4, 5, 5, 6],
                     [2, 3, 8, 1, 7, 4])
    assert A.select("triu").isequal(Aupper)
    # rowle 2 (:1265)
    A3rows = _golden([0, 0, 1, 1, 2], [1, 3, 4, 6, 5], [2, 3, 8, 4, 1])
    assert A.select("rowle", 2).isequal(A3rows)
    # mask-select: keep entries where another matrix has entries (:1278)
    mask3 = A.select("==", 3)
    A3 = _golden([0, 3, 3, 6], [3, 0, 2, 4], [3, 3, 3, 3])
    assert A.select(mask3.S).isequal(A3)
