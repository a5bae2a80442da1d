"""Per-row .ss extras (scan/selectk/compactify/sort/split/concat/
flatten/reshape) + MatrixMarket round-trip, vs numpy oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from python_graphblas_ray.core import GBMatrix
from python_graphblas_ray.sources.matrixmarket import mmread, mmwrite
from python_graphblas_ray.stages.perrow import (
    concat,
    flatten,
    reshape,
    row_compactify,
    row_scan,
    row_selectk,
    row_sort,
    split,
)


@pytest.fixture(scope="module")
def M():
    rng = np.random.default_rng(11)
    nr, nc, nnz = 20, 30, 120
    packed = rng.choice(nr * nc, size=nnz, replace=False)
    r = (packed // nc).astype(np.int64)
    c = (packed % nc).astype(np.int64)
    v = np.round(rng.random(nnz) * 10, 3)
    return GBMatrix.from_coo(r, c, v, nrows=nr, ncols=nc), (r, c, v)


def _dense(A):
    return A.to_dense(np.nan)


def test_row_scan(M):
    A, (r, c, v) = M
    out = row_scan(A, "plus").to_coo()
    # oracle: cumulative sum within row in col order
    order = np.lexsort((c, r))
    rs, cs, vs = r[order], c[order], v[order]
    expect = vs.copy()
    for i in range(1, len(vs)):
        if rs[i] == rs[i - 1]:
            expect[i] += expect[i - 1]
    np.testing.assert_array_equal(out[0], rs)
    np.testing.assert_array_equal(out[1], cs)
    np.testing.assert_allclose(out[2], expect)


def test_row_selectk_first_largest(M):
    A, (r, c, v) = M
    got_r, got_c, got_v = row_selectk(A, "first", 2).to_coo()
    for row in np.unique(r):
        mask = r == row
        expect_c = np.sort(c[mask])[:2]
        np.testing.assert_array_equal(np.sort(got_c[got_r == row]),
                                      expect_c)
    got_r, got_c, got_v = row_selectk(A, "largest", 2).to_coo()
    for row in np.unique(r):
        mask = r == row
        k = min(2, mask.sum())
        expect_v = np.sort(v[mask])[::-1][:k]
        np.testing.assert_allclose(np.sort(got_v[got_r == row])[::-1],
                                   expect_v)


def test_row_compactify_and_sort(M):
    A, (r, c, v) = M
    got_r, got_c, got_v = row_compactify(A, "smallest", 3).to_coo()
    for row in np.unique(r):
        mask = r == row
        k = min(3, mask.sum())
        np.testing.assert_array_equal(got_c[got_r == row],
                                      np.arange(k))
        np.testing.assert_allclose(np.sort(got_v[got_r == row]),
                                   np.sort(v[mask])[:k])
    got_r, got_c, got_v = row_sort(A).to_coo()
    for row in np.unique(r):
        mask = r == row
        np.testing.assert_allclose(got_v[got_r == row],
                                   np.sort(v[mask]))


def test_split_concat_roundtrip(M):
    A, _ = M
    tiles = split(A, [8, 12], [10, 10, 10])
    assert len(tiles) == 2 and len(tiles[0]) == 3
    B = concat(tiles)
    assert (B.nrows, B.ncols) == (A.nrows, A.ncols)
    assert A.isequal(B)


def test_flatten_reshape(M):
    A, (r, c, v) = M
    f = flatten(A)
    idx, vals = f.to_coo()
    np.testing.assert_array_equal(idx, np.lexsort((c, r)) * 0 +
                                  (r * A.ncols + c)[np.lexsort((c, r))])
    B = reshape(A, 30, 20)
    assert (B.nrows, B.ncols) == (30, 20)
    C = reshape(B, 20, 30)
    assert A.isequal(C)


def test_mmwrite_mmread_roundtrip(tmp_path, M):
    A, _ = M
    p = str(tmp_path / "m.mtx")
    mmwrite(p, A)
    B = mmread(p)
    assert (B.nrows, B.ncols) == (A.nrows, A.ncols)
    assert A.isclose(B, rel_tol=1e-12)


def test_mmread_symmetric(tmp_path):
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("% comment\n3 3 3\n1 1 5.0\n2 1 1.5\n3 2 2.5\n")
    A = mmread(p)
    d = A.to_dense(0.0)
    expect = np.array([[5.0, 1.5, 0], [1.5, 0, 2.5], [0, 2.5, 0]])
    np.testing.assert_allclose(d, expect)


def test_mmread_pattern(tmp_path):
    p = str(tmp_path / "p.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("2 2 3\n1 1\n1 2\n2 2\n")
    A = mmread(p)
    np.testing.assert_allclose(A.to_dense(0.0),
                               np.array([[1.0, 1.0], [0, 1.0]]))


def test_mmread_distributed_path(tmp_path, M):
    A, _ = M
    p = str(tmp_path / "big.mtx")
    mmwrite(p, A)
    B = mmread(p, driver_parse_limit=0)  # force the read_text path
    assert A.isclose(B, rel_tol=1e-12)


def test_col_scan(M):
    A, (r, c, v) = M
    out_r, out_c, out_v = row_scan(A, "plus", order="columnwise").to_coo(
        sort=False)
    order = np.lexsort((r, c))
    rs, cs, vs = r[order], c[order], v[order]
    expect = vs.copy()
    for i in range(1, len(vs)):
        if cs[i] == cs[i - 1]:
            expect[i] += expect[i - 1]
    got = {(i, j): x for i, j, x in zip(out_r, out_c, out_v)}
    for i, j, x in zip(rs, cs, expect):
        assert np.isclose(got[(i, j)], x)


def test_mmread_distributed_entry_equals_dims(tmp_path):
    """A data entry whose (row, col, value) equals the dims triple must
    NOT be dropped by the distributed parse (ADVICE r1: dims line is
    skipped by position, not value)."""
    p = str(tmp_path / "trap.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write("% header comment\n")
        f.write("3 3 3\n")      # dims
        f.write("1 1 2\n")
        f.write("2 2 4\n")
        f.write("3 3 3\n")      # data entry == dims triple
    A = mmread(p, driver_parse_limit=0)  # force distributed path
    expect = np.array([[2.0, 0, 0], [0, 4.0, 0], [0, 0, 3.0]])
    np.testing.assert_allclose(A.to_dense(0.0), expect)


def test_mmread_array_symmetric_triangular(tmp_path):
    """Spec-conformant symmetric array files store only the lower
    triangle column-major: n(n+1)/2 values (ADVICE r1)."""
    p = str(tmp_path / "sym.mtx")
    # n=3 lower triangle col-major: a11 a21 a31 | a22 a32 | a33
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix array real symmetric\n")
        f.write("3 3\n1\n2\n3\n4\n5\n6\n")
    A = mmread(p)
    expect = np.array([[1.0, 2, 3], [2, 4, 5], [3, 5, 6]])
    np.testing.assert_allclose(A.to_dense(0.0), expect)


def test_mmread_array_skew_symmetric_triangular(tmp_path):
    p = str(tmp_path / "skew.mtx")
    # n=3 strictly-lower col-major: a21 a31 | a32
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix array real skew-symmetric\n")
        f.write("3 3\n1\n2\n3\n")
    A = mmread(p)
    expect = np.array([[0.0, -1, -2], [1, 0, -3], [2, 3, 0]])
    np.testing.assert_allclose(A.to_dense(0.0), expect)


def test_selectk_largest_bool_and_unsigned():
    """'largest' must not negate values (BOOL raises, UINT wraps):
    rank-from-segment-end keeps (val desc, dst asc) order for any
    sortable dtype."""
    import numpy as np

    from python_graphblas_ray.core import GBMatrix
    from python_graphblas_ray.stages.perrow import row_selectk, row_sort

    # bool values: row 0 = [F@0, T@1, T@2]; largest-1 keeps dst=1 (tie→asc)
    B = GBMatrix.from_coo([0, 0, 0], [0, 1, 2],
                          np.array([False, True, True]), nrows=1, ncols=3)
    r, c, v = row_selectk(B, "largest", 1).to_coo()
    assert c.tolist() == [1] and v.tolist() == [True]
    # uint64 with a 0 entry: negation would wrap 0 to the 'largest'
    U = GBMatrix.from_coo([0, 0, 0], [0, 1, 2],
                          np.array([0, 7, 3], dtype=np.uint64),
                          nrows=1, ncols=3)
    r, c, v = row_selectk(U, "largest", 2).to_coo()
    assert sorted(v.tolist()) == [3, 7]  # 0 must NOT be selected
    # row_sort descending on uint64: column j = j-th largest
    r, c, v = row_sort(U, ascending=False).to_coo()
    order = np.argsort(c)
    assert v[order].tolist() == [7, 3, 0]


def test_matrix_ss_accessor_binds_perrow_kernels(tmp_path):
    """A.ss.<kernel> == the module-level per-row kernels; serialize
    round-trips through the Parquet container."""
    from python_graphblas_ray.core import GBMatrix
    from python_graphblas_ray.stages.perrow import row_scan

    A = GBMatrix.from_coo([0, 0, 1, 2], [0, 1, 1, 2],
                          [1.0, 2.0, 3.0, 4.0], nrows=3, ncols=3)
    got = A.ss.scan("plus").to_coo()
    want = row_scan(A, "plus").to_coo()
    for g, w in zip(got, want):
        o1, o2 = np.lexsort((got[1], got[0])), np.lexsort((want[1],
                                                           want[0]))
        np.testing.assert_array_equal(g[o1], w[o2])
    assert A.ss.selectk("first", 1).nvals == 3
    assert A.ss.sort().nvals == A.nvals
    p = str(tmp_path / "mat")
    A.ss.serialize(p)
    B = GBMatrix.read_parquet(p)
    assert B.isequal(A)


def test_vector_scan_plus_and_max():
    """Distributed two-pass prefix scan == numpy accumulate in index
    order, across multiple blocks."""
    from python_graphblas_ray.core import GBVector
    from python_graphblas_ray.stages.perrow import vector_scan

    rng = np.random.default_rng(6)
    idx = np.sort(rng.choice(5000, size=1200, replace=False))
    val = rng.random(1200)
    v = GBVector(ray.data.from_arrow(pa.table({
        "vid": idx, "val": val})).repartition(8), 5000)
    for op, ref in (("plus", np.add), ("max", np.maximum)):
        gi, gv = vector_scan(v, op).to_coo()
        o = np.argsort(gi)
        np.testing.assert_array_equal(gi[o], idx)
        np.testing.assert_allclose(gv[o], ref.accumulate(val))
    # times on a well-conditioned range (a 1200-long cumprod of U(0,1)
    # underflows to denormals where relative error is meaningless)
    val2 = rng.uniform(0.9, 1.1, size=len(idx))
    v2 = GBVector(ray.data.from_arrow(pa.table({
        "vid": idx, "val": val2})).repartition(8), 5000)
    gi, gv = vector_scan(v2, "times").to_coo()
    o = np.argsort(gi)
    np.testing.assert_allclose(gv[o], np.multiply.accumulate(val2),
                               rtol=1e-9)
