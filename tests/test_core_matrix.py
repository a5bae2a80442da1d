"""Core GBMatrix/GBVector kernels vs dense numpy oracles.

Mirrors the reference's test strategy (SURVEY.md §5): the canonical 7x7
fixture from ``/root/reference/graphblas/tests/test_matrix.py:34-56`` plus
dense-numpy oracle comparison for every kernel.
"""

import numpy as np
import pytest

from python_graphblas_ray import (
    DuplicateIndexError,
    GBMatrix,
    GBScalar,
    GBVector,
    agg,
    binary,
    monoid,
    semiring,
    unary,
)

# canonical fixture (reference tests/test_matrix.py:34-56)
A_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
A_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
A_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]
V_IDX = [1, 3, 4, 6]
V_VALS = [1, 1, 2, 0]


@pytest.fixture
def A():
    return GBMatrix.from_coo(A_ROWS, A_COLS, A_VALS, nrows=7, ncols=7,
                             dtype="float64")


@pytest.fixture
def v():
    return GBVector.from_coo(V_IDX, V_VALS, size=7, dtype="float64")


def dense(M, fill=0.0):
    return M.to_dense(fill)


def test_from_to_coo_roundtrip(A):
    r, c, vals = A.to_coo(sort=True)
    order = np.lexsort((A_COLS, A_ROWS))
    np.testing.assert_array_equal(r, np.array(A_ROWS)[order])
    np.testing.assert_array_equal(c, np.array(A_COLS)[order])
    np.testing.assert_array_equal(vals, np.array(A_VALS, dtype="float64")[order])
    assert A.nvals == 12
    assert A.shape == (7, 7)


def test_from_coo_dup_error():
    with pytest.raises(DuplicateIndexError):
        GBMatrix.from_coo([0, 0], [1, 1], [1.0, 2.0])


def test_from_coo_dup_op():
    M = GBMatrix.from_coo([0, 0, 1], [1, 1, 2], [1.0, 2.0, 5.0], dup_op="plus")
    assert M.nvals == 2
    d = M.to_dense()
    assert d[0, 1] == 3.0 and d[1, 2] == 5.0


def test_csr_roundtrip(A):
    indptr, cols, vals = A.to_csr()
    B = GBMatrix.from_csr(indptr, cols, vals, ncols=7)
    assert B.isequal(A)
    indptr, rows, vals = A.to_csc()
    C = GBMatrix.from_csc(indptr, rows, vals, nrows=7)
    assert C.isequal(A)
    # hypersparse
    cr, ip, cc, vv = A.to_dcsr()
    D = GBMatrix.from_dcsr(cr, ip, cc, vv, nrows=7, ncols=7)
    assert D.isequal(A)


def test_from_dense_missing():
    arr = np.array([[1.0, 0.0], [0.0, 2.0]])
    M = GBMatrix.from_dense(arr, missing_value=0.0)
    assert M.nvals == 2
    np.testing.assert_array_equal(M.to_dense(0.0), arr)


def test_from_dicts_roundtrip(A):
    d = A.to_dicts()
    B = GBMatrix.from_dicts(d, nrows=7, ncols=7)
    assert B.isequal(A)


def test_mxv_plus_times(A, v):
    w = A.mxv(v, semiring.plus_times)
    expect = dense(A) @ v.to_dense(0.0)
    # structural: rows of A with no overlap with v's structure are absent
    got = w.to_dense(0.0)
    np.testing.assert_allclose(got, expect)


def test_mxv_min_plus(A, v):
    w = A.mxv(v, semiring.min_plus)
    Ad = dense(A, np.inf)
    vd = v.to_dense(np.inf)
    expect = np.min(Ad + vd[None, :], axis=1)
    got = w.to_dense(np.inf)
    np.testing.assert_allclose(got, expect)


def test_vxm(A, v):
    w = v.vxm(A, semiring.plus_times)
    expect = v.to_dense(0.0) @ dense(A)
    np.testing.assert_allclose(w.to_dense(0.0), expect)


def test_mxm_plus_times(A):
    C = A.mxm(A, semiring.plus_times)
    expect = dense(A) @ dense(A)
    np.testing.assert_allclose(C.to_dense(0.0), expect)


def test_mxm_masked(A):
    # C<A.S> = A plus_times A — only positions where A has entries
    C = A.mxm(A, semiring.plus_times, mask=A.S)
    full = dense(A) @ dense(A)
    mask = dense(A) != 0
    got = C.to_dense(0.0)
    np.testing.assert_allclose(got[mask & (full != 0)],
                               full[mask & (full != 0)])
    assert np.all(got[~mask] == 0)


def test_transpose(A):
    np.testing.assert_allclose(A.T.to_dense(0.0), dense(A).T)


def test_ewise_add_mult(A):
    B = A.T
    add = A.ewise_add(B, binary.plus)
    expect = dense(A) + dense(A).T
    np.testing.assert_allclose(add.to_dense(0.0), expect)
    mult = A.ewise_mult(B, binary.times)
    Ad = dense(A)
    inter = (Ad != 0) & (Ad.T != 0)
    expect_m = np.where(inter, Ad * Ad.T, 0.0)
    np.testing.assert_allclose(mult.to_dense(0.0), expect_m)


def test_ewise_union(A):
    B = A.T
    u = A.ewise_union(B, binary.minus, left_default=0.0, right_default=0.0)
    Ad, Bd = dense(A), dense(A).T
    union = (Ad != 0) | (Bd != 0)
    expect = np.where(union, Ad - Bd, 0.0)
    np.testing.assert_allclose(u.to_dense(0.0), expect)


def test_infix_ewise(v):
    w = GBVector.from_coo([1, 2], [10.0, 20.0], size=7)
    out = binary.min.fn  # sanity that op exists
    res = (v | w)
    added = res.with_op(binary.plus)
    exp = np.zeros(7)
    exp[V_IDX] = V_VALS
    exp[1] += 10.0
    exp[2] += 20.0
    np.testing.assert_allclose(added.to_dense(0.0), exp)


def test_apply(A):
    B = A.apply(unary.ainv)
    np.testing.assert_allclose(B.to_dense(0.0), -dense(A))
    C = A.apply(binary.plus, right=10)
    got = C.to_dense(0.0)
    Ad = dense(A)
    np.testing.assert_allclose(got[Ad != 0], Ad[Ad != 0] + 10)


def test_apply_indexunary(A):
    B = A.apply("rowindex", thunk=0)
    r, c, vals = B.to_coo()
    np.testing.assert_array_equal(vals, r)


def test_select_tril(A):
    L = A.select("tril")
    r, c, vals = L.to_coo()
    assert np.all(c <= r)
    full_r, full_c, _ = A.to_coo()
    assert len(r) == int(np.sum(full_c <= full_r))


def test_select_value(A):
    S = A.select(">=", 3)
    _, _, vals = S.to_coo()
    assert np.all(vals >= 3)
    assert len(vals) == int(np.sum(np.array(A_VALS) >= 3))


def test_select_mask(A):
    L = A.select("tril")
    S = A.select(L.S)
    assert S.isequal(L)


def test_reduce_rowwise(A):
    w = A.reduce_rowwise(monoid.plus)
    Ad = dense(A)
    expect = Ad.sum(axis=1)
    got = w.to_dense(0.0)
    np.testing.assert_allclose(got, expect)


def test_reduce_columnwise_max(A):
    w = A.reduce_columnwise(monoid.max)
    Ad = dense(A, -np.inf)
    got = w.to_dense(-np.inf)
    expect = Ad.max(axis=0)
    np.testing.assert_allclose(got, expect)


def test_reduce_scalar(A):
    s = A.reduce_scalar(monoid.plus)
    assert s.value == sum(A_VALS)
    empty = GBMatrix.from_coo([], [], [], nrows=3, ncols=3)
    assert empty.reduce_scalar(monoid.plus).is_empty
    assert empty.reduce_scalar(monoid.plus, allow_empty=False).value == 0


def test_reduce_rowwise_aggregator(A):
    w = A.reduce_rowwise(agg.mean)
    Ad = dense(A)
    cnt = (Ad != 0).sum(axis=1)
    expect = np.divide(Ad.sum(axis=1), cnt, where=cnt > 0)
    got = w.to_dense(0.0)
    np.testing.assert_allclose(got[cnt > 0], expect[cnt > 0])


def test_reduce_rowwise_argmin(A):
    w = A.reduce_rowwise(agg.argmin)
    Ad = dense(A, np.inf)
    idx, vals = w.to_coo()
    for i, am in zip(idx, vals):
        assert Ad[i, int(am)] == Ad[i].min()


def test_vector_reduce(v):
    assert v.reduce(monoid.plus).value == sum(V_VALS)
    assert v.reduce(monoid.max).value == max(V_VALS)


def test_inner_outer(v):
    w = GBVector.from_coo([1, 3, 5], [2.0, 3.0, 4.0], size=7)
    ip = v.inner(w, semiring.plus_times)
    assert ip.value == 1 * 2.0 + 1 * 3.0
    op_ = v.outer(w, binary.times)
    expect = np.outer(v.to_dense(0.0), w.to_dense(0.0))
    np.testing.assert_allclose(op_.to_dense(0.0), expect)


def test_extract(A):
    sub = A.extract([0, 3, 6], slice(0, 4))
    expect = dense(A)[[0, 3, 6], :][:, 0:4]
    np.testing.assert_allclose(sub.to_dense(0.0), expect)
    # with repeats
    sub2 = A.extract([0, 0], [1, 1])
    assert sub2.to_dense(0.0).tolist() == [[2.0, 2.0], [2.0, 2.0]]


def test_getitem(A):
    s = A[0, 1]
    assert s.value == 2.0
    assert A[0, 0].is_empty
    row = A[6, :]
    np.testing.assert_allclose(row.to_dense(0.0), dense(A)[6])
    col = A[:, 2]
    np.testing.assert_allclose(col.to_dense(0.0), dense(A)[:, 2])


def test_assign_scalar(A):
    B = A.assign([0, 1], [0, 1], 9.0)
    d = B.to_dense(0.0)
    assert np.all(d[:2, :2] == 9.0)
    d2 = dense(A)
    d2[:2, :2] = 9.0
    np.testing.assert_allclose(d, d2)


def test_assign_matrix(A):
    S = GBMatrix.from_coo([0, 1], [1, 0], [100.0, 200.0], nrows=2, ncols=2)
    B = A.assign([2, 3], [2, 3], S)
    d = B.to_dense(0.0)
    expect = dense(A)
    expect[2:4, 2:4] = np.array([[0, 100.0], [200.0, 0]])
    np.testing.assert_allclose(d, expect)


def test_assign_accum(A):
    B = A.assign([3], [0], 10.0, accum="plus")
    assert B[3, 0].value == 13.0


def test_update_masked(A):
    # C(mask=L.S) << A.T : masked write, unmasked kept
    L = A.select("tril")
    C = A.update(A.T, mask=L.S)
    Cd = C.to_dense(0.0)
    Ad, At = dense(A), dense(A).T
    Lmask = np.tri(7, dtype=bool) & (Ad != 0)
    # masked positions: A.T values where A.T has entries (else dropped)
    for i in range(7):
        for j in range(7):
            if Lmask[i, j]:
                assert Cd[i, j] == At[i, j]
            else:
                assert Cd[i, j] == Ad[i, j]


def test_update_accum_replace(A):
    C = A.update(A.T, accum=binary.plus)
    np.testing.assert_allclose(C.to_dense(0.0), dense(A) + dense(A).T)


def test_diag(A):
    d0 = A.diag(0)
    assert d0.nvals == 0  # fixture has no diagonal entries
    M = GBMatrix.from_coo([0, 1, 2], [1, 2, 3], [5.0, 6.0, 7.0],
                          nrows=4, ncols=4)
    d1 = M.diag(1)
    np.testing.assert_allclose(d1.to_dense(0.0), [5.0, 6.0, 7.0])
    v = GBVector.from_coo([0, 2], [1.0, 2.0], size=3)
    D = v.diag(0)
    assert D.shape == (3, 3)
    assert D[0, 0].value == 1.0 and D[2, 2].value == 2.0


def test_setdiag(A):
    B = A.setdiag(1.0, 0)
    d = B.to_dense(0.0)
    assert np.all(np.diag(d) == 1.0)


def test_kronecker():
    A = GBMatrix.from_coo([0, 1], [1, 0], [1.0, 2.0], nrows=2, ncols=2)
    B = GBMatrix.from_coo([0, 0], [0, 1], [3.0, 4.0], nrows=1, ncols=2)
    K = A.kronecker(B, binary.times)
    expect = np.kron(A.to_dense(0.0), B.to_dense(0.0))
    np.testing.assert_allclose(K.to_dense(0.0), expect)


def test_power():
    A = GBMatrix.from_coo([0, 1, 2], [1, 2, 0], [1.0, 1.0, 1.0],
                          nrows=3, ncols=3)
    P3 = A.power(3, semiring.plus_times)
    expect = np.linalg.matrix_power(A.to_dense(0.0), 3)
    np.testing.assert_allclose(P3.to_dense(0.0), expect)


def test_reposition(A):
    B = A.reposition(1, -1)
    Ad = dense(A)
    expect = np.zeros_like(Ad)
    expect[1:, :-1] = Ad[:-1, 1:]
    np.testing.assert_allclose(B.to_dense(0.0), expect)


def test_isequal_isclose(A):
    assert A.isequal(A.dup())
    B = A.apply(binary.plus, right=1e-9)
    assert not A.isequal(B)
    assert A.isclose(B, rel_tol=1e-7)
    assert not A.isclose(B, rel_tol=1e-12, abs_tol=0.0)


def test_vector_assign_extract(v):
    w = v.assign([0, 2], 5.0)
    d = w.to_dense(0.0)
    assert d[0] == 5.0 and d[2] == 5.0 and d[1] == 1.0
    e = v.extract([1, 3, 5])
    np.testing.assert_allclose(e.to_dense(0.0), [1.0, 1.0, 0.0])
    assert v[1].value == 1.0
    assert v[0].is_empty


def test_vector_reposition(v):
    w = v.reposition(2)
    d = w.to_dense(0.0)
    exp = np.zeros(7)
    exp[np.array(V_IDX[:3]) + 2] = V_VALS[:3]  # index 6+2 out of range
    np.testing.assert_allclose(d, exp)


def test_scalar():
    s = GBScalar.from_value(5)
    assert s.nvals == 1 and not s.is_empty
    e = GBScalar()
    assert e.is_empty and e.nvals == 0
    assert not bool(e)


def test_resize_clear(A):
    B = A.resize(4, 4)
    assert B.shape == (4, 4)
    r, c, _ = B.to_coo()
    assert np.all(r < 4) and np.all(c < 4)
    assert A.clear().nvals == 0


def test_contains_and_iter(A, v):
    """Reference matrix.py:342/:361, vector.py:308/:328."""
    assert (3, 0) in A and (0, 0) not in A
    with pytest.raises(TypeError, match="2-tuple of ints"):
        5 in A
    got = sorted(A)
    assert got == sorted(zip(A_ROWS, A_COLS))
    assert 1 in v and 0 not in v
    with pytest.raises(TypeError, match="integer is expected"):
        (1, 2) in v
    assert list(v) == sorted(V_IDX)


def test_scalar_ops_surface():
    """0-D operation surface (reference scalar.py:186-1003): union /
    intersection empty-handling, apply, select, dup/clear/get/wait."""
    s = GBScalar(5.0)
    e = GBScalar(None)
    assert s.ewise_add(GBScalar(2.0), "plus").value == 7.0
    assert s.ewise_add(e).value == 5.0          # union passes through
    assert e.ewise_add(e).is_empty
    assert s.ewise_mult(GBScalar(2.0), "times").value == 10.0
    assert s.ewise_mult(e).is_empty             # intersection empties
    assert s.ewise_union(e, "minus", 0.0, 1.0).value == 4.0
    assert e.ewise_union(GBScalar(3.0), "minus", 10.0, 0.0).value == 7.0
    assert e.ewise_union(e, "plus", 1.0, 1.0).is_empty
    assert s.apply("ainv").value == -5.0
    assert s.apply("minus", right=1.0).value == 4.0
    assert s.apply("minus", left=1.0).value == -4.0
    assert e.apply("ainv").is_empty
    assert s.select("valuegt", 4).value == 5.0
    assert s.select("valuegt", 5).is_empty
    assert s.isequal(5.0) and s.isequal(GBScalar(5.0))
    assert not s.isequal(e) and e.isequal(GBScalar(None))
    d = s.dup()
    s.clear()
    assert s.is_empty and d.value == 5.0 and d.get(-1) == 5.0
    assert s.get(-1) == -1 and s.wait() is s
    assert d.is_cscalar and not d.is_grbscalar


def test_build_matrix(A):
    """Mirrors reference tests/test_matrix.py:219-239 (test_build)."""
    from python_graphblas_ray import IndexOutOfBound, OutputNotEmpty

    assert A.nvals == 12
    A.clear()
    A.build([0, 6], [0, 1], [1, 2])
    assert A.nvals == 2
    with pytest.raises(OutputNotEmpty):
        A.build([1, 5], [2, 3], [3, 4])
    assert A.nvals == 2  # nothing modified
    A.build([1, 2, 5], [1, 2, 3], [2, 3, 4], clear=True)
    assert A.nvals == 3
    A.clear()
    with pytest.raises(IndexOutOfBound):
        A.build([0, 11], [0, 0], [1, 1])
    B = GBMatrix.from_coo([], [], [], nrows=2, ncols=2, dtype="int64")
    B.build([0, 11], [0, 0], [1, 1], nrows=12)
    want = GBMatrix.from_coo([0, 11], [0, 0], [1, 1], nrows=12, ncols=2,
                             dtype="int64")
    assert B.isequal(want)
    # duplicates collapse with the default plus dup_op (reference :660)
    C = GBMatrix.from_coo([], [], [], nrows=3, ncols=3, dtype="float64")
    C.build([1, 1], [2, 2], [5.0, 7.0])
    assert C.get(1, 2) == 12.0
    assert C.ndim == 2


def test_build_vector(v):
    from python_graphblas_ray import IndexOutOfBound, OutputNotEmpty

    assert v.ndim == 1 and v.shape == (7,)
    with pytest.raises(OutputNotEmpty):
        v.build([0], [9.0])
    v.build([2, 5], [9.0, 8.0], clear=True)
    assert v.nvals == 2 and v.get(5) == 8.0
    assert v.get(0) is None and v.get(0, default=-1) == -1
    with pytest.raises(IndexOutOfBound):
        v.build([99], [1.0], clear=True)
    v.build([8], [4.0], clear=True, size=10)
    assert v.size == 10 and v.get(8) == 4.0


def test_dedup():
    import ray.data
    import pyarrow as pa
    t = pa.table({"src": [0, 0, 1], "dst": [1, 1, 2], "val": [1.0, 2.0, 3.0]})
    M = GBMatrix.from_dataset(ray.data.from_arrow(t), 3, 3).dedup("plus")
    assert M.nvals == 2
    assert M[0, 1].value == 3.0


def test_head_and_iter(A):
    r, c, v = A.head(5, sort=True)
    assert len(r) == 5
    items = dict(A.iteritems())
    assert len(items) == A.nvals
    rr, cc, vv = A.to_coo()
    for i, j, x in zip(rr, cc, vv):
        assert items[(int(i), int(j))] == x


def test_parquet_roundtrip(A, tmp_path):
    p = str(tmp_path / "mat")
    A.write_parquet(p, num_partitions=3)
    import os
    assert len([f for f in os.listdir(p) if f.endswith(".parquet")]) >= 1
    from python_graphblas_ray.core import GBMatrix
    B = GBMatrix.read_parquet(p, nrows=A.nrows, ncols=A.ncols)
    assert A.isequal(B)
    C = GBMatrix.read_parquet(p)  # shape inferred from data
    assert C.nrows <= A.nrows and C.isequal(A.resize(C.nrows, C.ncols))


def test_mxm_masked_shuffle_mode(A):
    """mask_mode='shuffle' (hash-partitioned semi join — the big-mask
    scale path) must equal the broadcast mask path, incl. complement."""
    from python_graphblas_ray.functions.monoids import semiring
    L = A.select("tril", thunk=-1)
    b = L.mxm(L, semiring.plus_pair, mask=L.S)
    s = L.mxm(L, semiring.plus_pair, mask=L.S, mask_mode="shuffle")
    assert b.isequal(s)
    bc = L.mxm(L, semiring.plus_pair, mask=L.S, complement=True)
    sc = L.mxm(L, semiring.plus_pair, mask=L.S, complement=True,
               mask_mode="shuffle")
    assert bc.isequal(sc)


def test_head_empty_matrix():
    """head(n>0) on an empty matrix returns empty arrays, not
    ArrowInvalid (ADVICE r1)."""
    E = GBMatrix.from_coo([], [], [], nrows=4, ncols=4)
    r, c, v = E.head(5)
    assert len(r) == 0 and len(c) == 0 and len(v) == 0
