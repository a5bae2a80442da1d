"""Round-2 operator-surface extensions (SURVEY §2.4/2.5): IndexBinaryOp
(reference ``core/operator/indexbinary.py:456``), parameterized UDFs
(``core/operator/base.py:646``), UDT record dtypes
(``core/dtypes.py:165``), mask composition (``core/mask.py:36,:85,:111``),
positional unaries, bit-field binaries, and the ``op.numpy`` namespaces."""

import numpy as np
import pytest

from python_graphblas_ray.core import GBMatrix, GBVector
from python_graphblas_ray.functions import dtypes as gdt
from python_graphblas_ray.functions.monoids import (
    Monoid,
    Semiring,
    monoid,
    semiring,
)
from python_graphblas_ray.functions.ops import (
    BinaryOp,
    IndexBinaryOp,
    UnaryOp,
    binary,
    indexbinary,
    unary,
)


def _mat():
    # 3x3: (0,1)=2, (1,0)=5, (1,2)=3, (2,2)=7
    return GBMatrix.from_coo([0, 1, 1, 2], [1, 0, 2, 2],
                             [2.0, 5.0, 3.0, 7.0], nrows=3, ncols=3)


# ---------------------------------------------------------------------------
# IndexBinaryOp
# ---------------------------------------------------------------------------

def test_indexbinary_ewise_mult():
    # z = |ix - jx| + theta on aligned entries (reference register_new
    # example: indexbinary.py:456 docstring)
    IndexBinaryOp.register_new(
        "index_dist", lambda x, ix, jx, y, iy, jy, t: np.abs(ix - jx) + t)
    op = indexbinary["index_dist"](10)
    A = _mat()
    r, c, v = A.ewise_mult(A, op).to_coo()
    # |i-j| per entry + 10
    expect = {(0, 1): 11, (1, 0): 11, (1, 2): 11, (2, 2): 10}
    assert {(i, j): int(x) for i, j, x in zip(r, c, v)} == expect


def test_indexbinary_value_call_raises():
    iop = IndexBinaryOp.register_new(
        "ib_tmp", lambda x, ix, jx, y, iy, jy, t: x)
    with pytest.raises(TypeError):
        iop(1).fn(1, 2)


def test_indexbinary_semiring_mxm():
    # multiplier z = jx (the k index) + theta; with min monoid this is
    # min_secondi-with-offset — cross-check against the positional op
    IndexBinaryOp.register_new(
        "kidx", lambda x, ix, jx, y, iy, jy, t: jx + t)
    sr = Semiring("min_kidx", monoid["min"], indexbinary["kidx"](0))
    A = _mat()
    got = dict(zip(zip(*A.mxm(A, sr).to_coo()[:2]),
                   A.mxm(A, sr).to_coo()[2]))
    want_m = A.mxm(A, semiring.min_secondi)
    want = dict(zip(zip(*want_m.to_coo()[:2]), want_m.to_coo()[2]))
    assert {k: int(v) for k, v in got.items()} == {
        k: int(v) for k, v in want.items()}


def test_indexbinary_mxv():
    IndexBinaryOp.register_new(
        "rowplus", lambda x, ix, jx, y, iy, jy, t: ix + t)
    sr = Semiring("max_rowplus", monoid["max"], indexbinary["rowplus"](1))
    A = _mat()
    v = GBVector.from_dense(np.ones(3))
    idx, vals = A.mxv(v, sr).to_coo()
    # z[i] = max over k of (i + 1)
    assert dict(zip(idx, vals.astype(int))) == {0: 1, 1: 2, 2: 3}


# ---------------------------------------------------------------------------
# Parameterized UDFs
# ---------------------------------------------------------------------------

def test_parameterized_unary():
    shift = UnaryOp.register_new(
        "param_shift", lambda n: (lambda x: x + n), parameterized=True)
    op3 = shift(3)
    assert shift(3) is op3  # lru-cached (reference base.py:660)
    A = _mat()
    _, _, v = A.apply(op3).to_coo()
    assert sorted(v) == [5.0, 6.0, 8.0, 10.0]


def test_parameterized_binary_in_ewise():
    blend = BinaryOp.register_new(
        "param_blend", lambda a: (lambda x, y: a * x + (1 - a) * y),
        parameterized=True)
    A = _mat()
    _, _, v = A.ewise_mult(A, blend(0.25)).to_coo()
    np.testing.assert_allclose(sorted(v), [2.0, 3.0, 5.0, 7.0])


def test_parameterized_indexbinary():
    fac = IndexBinaryOp.register_new(
        "param_ib", lambda scale: (
            lambda x, ix, jx, y, iy, jy, t: scale * (ix + jx) + t),
        parameterized=True)
    op = fac(100)(1)  # scale=100, theta=1
    A = _mat()
    r, c, v = A.ewise_mult(A, op).to_coo()
    assert {(i, j): int(x) for i, j, x in zip(r, c, v)} == {
        (0, 1): 101, (1, 0): 101, (1, 2): 301, (2, 2): 401}


# ---------------------------------------------------------------------------
# UDT record dtypes
# ---------------------------------------------------------------------------

def test_udt_roundtrip_and_apply():
    Point = gdt.register_new("Point", [("x", "<f8"), ("y", "<f8")])
    assert gdt.dtypes.Point is Point and Point.is_udt
    vals = np.array([(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)],
                    dtype=Point.np_dtype)
    A = GBMatrix.from_coo([0, 1, 2], [1, 2, 0], vals, nrows=3, ncols=3)
    assert A.dtype == Point.np_dtype
    r, c, v = A.to_coo()
    assert v.dtype == Point.np_dtype
    np.testing.assert_allclose(np.sort(v["x"]), [1.0, 3.0, 5.0])
    # apply with a UDT-aware unary: swap fields
    def swap(p):
        out = np.empty(len(p), dtype=p.dtype)
        out["x"], out["y"] = p["y"], p["x"]
        return out
    UnaryOp.register_new("pt_swap", swap)
    _, _, v2 = A.apply("pt_swap").to_coo()
    np.testing.assert_allclose(np.sort(v2["x"]), [2.0, 4.0, 6.0])


def test_udt_ewise_and_reduce():
    Pair = gdt.register_anonymous([("a", "<i8"), ("b", "<f8")])
    vals = np.array([(1, 2.0), (3, 4.0)], dtype=Pair.np_dtype)
    V = GBVector.from_coo([0, 2], vals, size=3)

    def padd(p, q):
        out = np.empty(np.broadcast_shapes(p.shape, q.shape),
                       dtype=p.dtype)
        out["a"] = p["a"] + q["a"]
        out["b"] = p["b"] + q["b"]
        return out

    BinaryOp.register_new("pt_add", padd)
    idx, v = V.ewise_mult(V, "pt_add").to_coo()
    assert list(v["a"]) == [2, 6]
    # reduction with a user monoid over the UDT
    ident = np.zeros((), dtype=Pair.np_dtype)[()]
    Monoid.register_new("pt_plus", binary["pt_add"], identity=ident)
    s = V.reduce(monoid["pt_plus"]).value
    assert s["a"] == 4 and s["b"] == 6.0


def test_udt_subarray_field():
    Vec3 = gdt.register_anonymous([("w", "<f8", (3,))])
    vals = np.zeros(2, dtype=Vec3.np_dtype)
    vals["w"] = [[1, 2, 3], [4, 5, 6]]
    V = GBVector.from_coo([0, 1], vals, size=2)
    _, v = V.to_coo()
    np.testing.assert_allclose(v["w"].sum(), 21.0)


def test_lookup_dtype():
    assert gdt.lookup_dtype("FP64").np_dtype == np.float64
    assert gdt.lookup_dtype(np.int32).name == "INT32"


# ---------------------------------------------------------------------------
# mask composition
# ---------------------------------------------------------------------------

def test_mask_and_or():
    A = _mat()                      # entries (0,1) (1,0) (1,2) (2,2)
    B = GBMatrix.from_coo([0, 1, 2], [1, 2, 0], [1.0, 0.0, 1.0],
                          nrows=3, ncols=3)  # (1,2) is falsy
    both = (A.S & B.S).new()
    r, c, _ = both.to_coo()
    assert set(zip(r, c)) == {(0, 1), (1, 2)}
    vboth = (A.S & B.V).new()       # value mask drops (1,2)
    r, c, _ = vboth.to_coo()
    assert set(zip(r, c)) == {(0, 1)}
    either = (A.S | B.S).new()
    r, c, _ = either.to_coo()
    assert set(zip(r, c)) == {(0, 1), (1, 0), (1, 2), (2, 2), (2, 0)}
    minus = (A.S & ~B.S).new()      # A minus B
    r, c, _ = minus.to_coo()
    assert set(zip(r, c)) == {(1, 0), (2, 2)}


def test_mask_composed_in_op():
    A = _mat()
    B = GBMatrix.from_coo([0, 1], [1, 0], [1.0, 1.0], nrows=3, ncols=3)
    sel = A.select((A.S & B.S))
    r, c, v = sel.to_coo()
    assert set(zip(r, c)) == {(0, 1), (1, 0)}


def test_mask_complement_compose_lazy():
    A = _mat()
    B = GBMatrix.from_coo([0], [1], [1.0], nrows=3, ncols=3)
    m = ~A.S | ~B.S                 # = ~(A & B): complement stays lazy
    assert m.complement
    sel = A.select(m)  # keeps A entries NOT in (A & B) = all but (0,1)
    r, c, _ = sel.to_coo()
    assert set(zip(r, c)) == {(1, 0), (1, 2), (2, 2)}
    # shape-bounded materialization (reference mask.py:36): the dense
    # complement of (A & B) over the full 3x3 shape
    dense = m.new()
    r, c, v = dense.to_coo()
    assert all(v)
    assert set(zip(r, c)) == {(i, j) for i in range(3)
                              for j in range(3)} - {(0, 1)}
    # above the configured bound it still refuses (engine-scale guard)
    from python_graphblas_ray import config
    with config.set(complement_materialize_limit=4):
        with pytest.raises(NotImplementedError, match="dense"):
            m.new()


def test_mask_new_complement_reference_fixture():
    """Models reference tests/test_mask.py:10 (test_mask_new, the
    single-mask arm): for the 8 mask views of the fixture vectors,
    ``m.new()`` and ``m.new(complement=True)`` match the brute-force
    applied-position sets, as bool containers of all-True entries."""
    from python_graphblas_ray.core import GBVector

    n = 10
    # v1[3:6] = 0, v1[:3] = 10 ; v2[1::3] = 0, v2[::3] = 10
    v1 = GBVector.from_coo([0, 1, 2, 3, 4, 5],
                           [10, 10, 10, 0, 0, 0], size=n)
    v2 = GBVector.from_coo([1, 4, 7, 0, 3, 6, 9],
                           [0, 0, 0, 10, 10, 10, 10], size=n)
    present = {id(v1): {0, 1, 2, 3, 4, 5}, id(v2): {0, 1, 3, 4, 6, 7, 9}}
    truthy = {id(v1): {0, 1, 2}, id(v2): {0, 3, 6, 9}}
    for vec in (v1, v2):
        for structure in (True, False):
            applied = present[id(vec)] if structure else truthy[id(vec)]
            m = vec.S if structure else vec.V
            for view, want in ((m, applied), (~m, set(range(n)) - applied)):
                got = view.new()
                i, vals = got.to_coo()
                assert set(i.tolist()) == want, (structure,
                                                 view.complement)
                assert all(vals)
                # complement=True flips once more
                got_c = view.new(complement=True)
                i_c, vals_c = got_c.to_coo()
                assert set(i_c.tolist()) == set(range(n)) - want
                assert all(vals_c)


# ---------------------------------------------------------------------------
# inventory extensions
# ---------------------------------------------------------------------------

def test_positional_unaries():
    A = _mat()
    _, _, v = A.apply(unary["positioni"]).to_coo()
    assert sorted(v) == [0, 1, 1, 2]
    _, _, v = A.apply(unary["positionj1"]).to_coo()
    assert sorted(v) == [1, 2, 3, 3]


def test_bitfield_binaries():
    x = np.array([0b1010, 0b0110], dtype=np.int64)
    y = np.array([1, 2], dtype=np.int64)
    assert list(binary["bget"].fn(x, y)) == [1, 1]
    assert list(binary["bset"].fn(x, y)) == [0b1010, 0b0110]
    assert list(binary["bclr"].fn(x, y)) == [0b1000, 0b0010]
    assert list(binary["bshift"].fn(x, np.array([2, -1]))) == [0b101000,
                                                               0b0011]


def test_frexp_halves():
    x = np.array([8.0, 0.75])
    m = unary["frexpx"].fn(x)
    e = unary["frexpe"].fn(x)
    np.testing.assert_allclose(np.ldexp(m, e), x)


def test_numpy_namespaces():
    assert "numpy.cbrt" in unary
    np.testing.assert_allclose(unary["numpy.cbrt"].fn(np.array([8.0])),
                               [2.0])
    np.testing.assert_allclose(unary.numpy.spacing.fn(np.array([1.0])),
                               np.spacing(1.0))
    np.testing.assert_allclose(
        binary["numpy.logaddexp"].fn(np.array([0.0]), np.array([0.0])),
        [np.log(2.0)])
    assert "numpy.nextafter" in binary


def test_binom_matches_reference_recurrence():
    """binary.binom reproduces the reference's int64 recurrence exactly,
    including its conservative overflow→0 (core/operator/binary.py:337)."""
    import numpy as np
    from python_graphblas_ray.functions.ops import binary

    MAX = np.iinfo(np.int64).max

    def ref_binom(N, k):
        if k > N or k < 0:
            return 0
        val = 1
        for i in range(min(k, N - k)):
            if val > MAX // (N - i):
                return 0
            val *= N - i
            val //= i + 1
        return val

    rng = np.random.default_rng(7)
    N = rng.integers(-2, 120, 300)
    K = rng.integers(-2, 120, 300)
    got = binary["binom"](N, K)
    assert got.tolist() == [ref_binom(int(n), int(k)) for n, k in zip(N, K)]


def test_isclose_parameterized_factory():
    """binary.isclose is a parameterized factory (binary.py:327): calling
    it with tolerances yields a boolean op matching math.isclose."""
    import math

    import numpy as np
    from python_graphblas_ray.functions.ops import binary

    op = binary["isclose"](1e-7, 0.0)
    x = np.array([1.0, 1.0 + 1e-9, 2.0, np.inf, -1.0])
    y = np.array([1.0, 1.0, 2.1, np.inf, 1.0])
    expect = [math.isclose(a, b, rel_tol=1e-7, abs_tol=0.0)
              for a, b in zip(x, y)]
    assert op(x, y).tolist() == expect
    loose = binary["isclose"](0.1, 0.0)
    assert loose(np.array([2.0]), np.array([2.1])).tolist() == [True]


# ---------------------------------------------------------------------------
# Complex dtypes FC32/FC64 (reference core/dtypes.py:15 FC rows;
# unary.py conj/creal/cimag/carg; binary.py cmplx)
# ---------------------------------------------------------------------------

_CR = np.array([0, 0, 1, 2])
_CC = np.array([1, 2, 2, 0])
_CV = np.array([1 + 2j, 3 - 1j, 0.5j, 2.0 + 0j], dtype=np.complex128)
_CORDER = np.lexsort((_CC, _CR))


def _cmat():
    return GBMatrix.from_coo(_CR, _CC, _CV, nrows=3, ncols=3)


def test_complex_dtype_registry():
    assert gdt.dtypes.FC64.np_dtype == np.complex128
    assert gdt.dtypes.FC32.np_dtype == np.complex64
    assert gdt.lookup_dtype(np.complex128) is gdt.dtypes.FC64
    # Arrow representation is the marker struct (never a Python object col)
    import pyarrow as pa

    t = gdt.dtypes.FC64.arrow_type
    assert pa.types.is_struct(t) and t.num_fields == 2


def test_complex_roundtrip_and_apply():
    A = _cmat()
    assert A.dtype == np.complex128
    _, _, v = A.to_coo()
    assert v.dtype == np.complex128
    assert np.array_equal(v, _CV[_CORDER])
    assert np.allclose(A.apply(unary.conj).to_coo()[2],
                       np.conj(_CV)[_CORDER])
    re = A.apply(unary.creal).to_coo()[2]
    im = A.apply(unary.cimag).to_coo()[2]
    assert re.dtype == np.float64 and im.dtype == np.float64
    assert np.allclose(re, _CV.real[_CORDER])
    assert np.allclose(im, _CV.imag[_CORDER])
    assert np.allclose(A.apply(unary.carg).to_coo()[2],
                       np.angle(_CV)[_CORDER])


def test_complex_ewise_and_cmplx():
    A = _cmat()
    m = A.ewise_mult(A, "times").to_coo()[2]
    assert np.allclose(m, (_CV * _CV)[_CORDER])
    # cmplx pairs two FP matrices into one FC64 matrix
    Ar = GBMatrix.from_coo(_CR, _CC, _CV.real, nrows=3, ncols=3)
    Ai = GBMatrix.from_coo(_CR, _CC, _CV.imag, nrows=3, ncols=3)
    Z = Ar.ewise_mult(Ai, binary.cmplx)
    assert Z.to_coo()[2].dtype == np.complex128
    assert np.allclose(Z.to_coo()[2], _CV[_CORDER])
    # ewise_add against the transpose exercises the packed outer join
    S = A.ewise_add(A.T, "plus")
    D = np.zeros((3, 3), complex)
    D[_CR, _CC] = _CV
    r, c, v = S.to_coo()
    dense = np.zeros((3, 3), complex)
    dense[r, c] = v
    assert np.allclose(dense, D + D.T)


def test_complex_mxm_mxv_reduce_vs_dense():
    A = _cmat()
    D = np.zeros((3, 3), complex)
    D[_CR, _CC] = _CV
    r, c, v = A.mxm(A, semiring.plus_times).to_coo()
    got = np.zeros((3, 3), complex)
    got[r, c] = v
    assert np.allclose(got, D @ D)
    u = GBVector.from_coo(np.arange(3), np.array([1 + 1j, 2, 3j]), size=3)
    wi, wv = A.mxv(u, semiring.plus_times).to_coo()
    expect = D @ np.array([1 + 1j, 2, 3j])
    dense_w = np.zeros(3, complex)
    dense_w[wi] = wv
    assert np.allclose(dense_w[wi], expect[wi])
    s = A.reduce_scalar(monoid.plus)
    assert np.isclose(s.value, _CV.sum())
    ri, rv = A.reduce_rowwise(monoid.plus).to_coo()
    row_sum = np.add.reduceat(_CV[np.argsort(_CR, kind="stable")],
                              [0, 2, 3])
    assert np.allclose(rv, row_sum)


def test_complex_isequal_cast_parquet(tmp_path):
    A = _cmat()
    assert A.isequal(A.dup())
    assert A.isclose(A.dup())
    assert not A.isequal(A.apply(unary.conj))
    Ar = GBMatrix.from_coo(_CR, _CC, _CV.real, nrows=3, ncols=3)
    Afc = Ar.dup(dtype=np.complex128)
    assert Afc.dtype == np.complex128
    assert np.allclose(Afc.to_coo()[2], _CV.real[_CORDER])
    # parquet container roundtrip keeps the complex column
    path = str(tmp_path / "cmat")
    A.write_parquet(path)
    B = GBMatrix.read_parquet(path, nrows=3, ncols=3)
    assert B.to_coo()[2].dtype == np.complex128
    assert A.isequal(B)


def test_read_parquet_infers_complex_and_udt_dtype(tmp_path):
    """dtype=None read infers the container dtype from the val column
    (complex marker struct and UDT struct round-trip without the caller
    restating the dtype)."""
    A = _cmat()
    path = str(tmp_path / "c")
    A.write_parquet(path)
    B = GBMatrix.read_parquet(path)
    assert B.dtype == np.complex128 and B.nrows == 3
    assert A.isequal(B)
    pt = gdt.register_anonymous([("x", "<f8"), ("y", "<i8")])
    vals = np.array([(1.5, 2), (0.5, 7)], dtype=pt.np_dtype)
    M = GBMatrix.from_coo([0, 1], [1, 0], vals, nrows=2, ncols=2)
    p2 = str(tmp_path / "u")
    M.write_parquet(p2)
    R = GBMatrix.read_parquet(p2)
    assert R.dtype.names == ("x", "y")
    assert M.isequal(R)


def test_hpec_ctor_and_udt_region_assign():
    """HPEC2022 opening cells: dict-UDT empty constructor, full-region
    tuple assign, element dict assign, field-extract lambda apply."""
    import numpy as np

    from python_graphblas_ray.core import GBMatrix, GBVector

    A = GBMatrix({"x": int, "y": float}, nrows=5, ncols=5)
    assert A.nvals == 0 and A.dtype.names == ("x", "y")
    A[:, :] = (1, 2)
    assert A.nvals == 25
    A[0, 0] = {"x": 10, "y": 20}
    assert A.get(0, 0) == {"x": 10, "y": 20.0}  # struct → dict scalar
    B = A.apply(lambda v: v["x"])
    r, c, v = B.to_coo()
    assert v[(r == 0) & (c == 0)][0] == 10
    assert sorted(np.unique(v).tolist()) == [1, 10]
    # plain empty constructors
    E = GBMatrix(float, 3, 3)
    assert E.nvals == 0 and E.dtype == np.float64
    w = GBVector("int64", 7)
    assert w.nvals == 0 and w.size == 7
