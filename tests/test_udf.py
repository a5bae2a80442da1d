"""User-extension surface (SURVEY §2.5; reference ``register_new`` —
``unary.py:331``, ``binary.py:724``, ``monoid.py:373``,
``semiring.py:370``, ``indexunary.py:269``, ``agg registration``): plain
numpy callables become first-class ops usable in every kernel."""

import numpy as np

from python_graphblas_ray.core import GBMatrix, GBVector
from python_graphblas_ray.functions.aggregators import Aggregator, agg
from python_graphblas_ray.functions.monoids import (
    Monoid,
    Semiring,
    get_semiring,
    monoid,
    semiring,
)
from python_graphblas_ray.functions.ops import (
    BinaryOp,
    IndexUnaryOp,
    UnaryOp,
    binary,
    indexunary,
    unary,
)


def test_register_unary_and_apply():
    UnaryOp.register_new("plus_one", lambda x: x + 1)
    assert "plus_one" in unary
    A = GBMatrix.from_coo([0, 1], [1, 0], [2.0, 5.0], nrows=2, ncols=2)
    r, c, v = A.apply("plus_one").to_coo()
    np.testing.assert_allclose(sorted(v), [3.0, 6.0])


def test_register_binary_and_ewise():
    BinaryOp.register_new("absdiff", lambda x, y: np.abs(x - y),
                          commutes_to="absdiff")
    A = GBMatrix.from_coo([0, 1], [1, 0], [2.0, 5.0], nrows=2, ncols=2)
    B = GBMatrix.from_coo([0, 1], [1, 0], [7.0, 1.0], nrows=2, ncols=2)
    r, c, v = A.ewise_mult(B, "absdiff").to_coo()
    np.testing.assert_allclose(sorted(v), [4.0, 5.0])


def test_register_monoid_and_reduce():
    if "absdiff" not in binary:
        BinaryOp.register_new("absdiff", lambda x, y: np.abs(x - y))
    Monoid.register_new("maxabs", binary["max"], identity=-np.inf,
                        idempotent=True)
    A = GBMatrix.from_coo([0, 0, 1], [0, 1, 1], [3.0, -9.0, 4.0],
                          nrows=2, ncols=2)
    out = A.reduce_scalar(monoid["maxabs"])
    assert out.value == 4.0


def test_register_semiring_and_mxv():
    # max_times: w[i] = max_j A[i,j] * v[j]
    sr = get_semiring("max", "times")
    A = GBMatrix.from_coo([0, 0, 1], [0, 1, 1], [2.0, 3.0, 4.0],
                          nrows=2, ncols=2)
    v = GBVector.from_dense(np.array([5.0, 7.0]))
    idx, vals = A.mxv(v, sr).to_coo()
    np.testing.assert_array_equal(idx, [0, 1])
    np.testing.assert_allclose(vals, [21.0, 28.0])  # max(10,21), 28


def test_custom_semiring_object():
    sr = Semiring("min_max", monoid["min"], binary["max"])
    A = GBMatrix.from_coo([0, 0], [0, 1], [2.0, 9.0], nrows=1, ncols=2)
    v = GBVector.from_dense(np.array([5.0, 1.0]))
    idx, vals = A.mxv(v, sr).to_coo()
    # min(max(2,5), max(9,1)) = min(5, 9) = 5
    np.testing.assert_allclose(vals, [5.0])


def test_register_indexunary_select():
    IndexUnaryOp.register_new(
        "upper_band", lambda v, r, c, t: (c - r) <= t, bool_valued=True)
    assert "upper_band" in indexunary
    A = GBMatrix.from_coo([0, 0, 0], [0, 1, 2], [1.0, 2.0, 3.0],
                          nrows=3, ncols=3)
    r, c, v = A.select("upper_band", thunk=1).to_coo()
    np.testing.assert_array_equal(c, [0, 1])


def test_register_aggregator():
    Aggregator.register_new(
        "range_width",
        partial=lambda v, i: {"mn": v.min(), "mx": v.max()},
        final=lambda d: float(np.max(d["mx"]) - np.min(d["mn"])))
    assert "range_width" in agg
    A = GBMatrix.from_coo([0, 0, 0, 1], [0, 1, 2, 0],
                          [3.0, 9.0, 5.0, 2.0], nrows=2, ncols=3)
    vec = A.reduce_rowwise(agg["range_width"])
    d = vec.to_dict()
    assert d[0] == 6.0 and d[1] == 0.0


def test_scalar_branching_udf_falls_back(recwarn):
    """A plain SCALAR Python fn with per-element branching (raises on
    arrays) must still work via the np.frompyfunc fallback — reference
    register_new semantics for non-vectorizable fns (r3 verdict item 6),
    with a one-time perf warning."""
    import warnings

    def clip5(v):
        if v > 5:          # raises ValueError on a numpy array
            return 5.0
        return float(v)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        UnaryOp.register_new("clip5_scalar", clip5)
        A = GBMatrix.from_coo([0, 1, 2], [1, 0, 2], [2.0, 9.0, 7.0],
                              nrows=3, ncols=3)
        r, c, v = A.apply("clip5_scalar").to_coo()
        np.testing.assert_allclose(sorted(v), [2.0, 5.0, 5.0])
        # Vector apply too
        vec = GBVector.from_coo([0, 1], [8.0, 3.0], size=3)
        _, vv = vec.apply("clip5_scalar").to_coo()
        np.testing.assert_allclose(sorted(vv), [3.0, 5.0])
        # raw-callable apply path (A.apply(lambda ...))
        r2, c2, v2 = A.apply(clip5).to_coo()
        np.testing.assert_allclose(sorted(v2), [2.0, 5.0, 5.0])


def test_scalar_branching_binary_udf_falls_back():
    import warnings

    def pick(x, y):
        return float(x) if x > y else float(y) * 10

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        BinaryOp.register_new("pick_scalar", pick)
        A = GBMatrix.from_coo([0, 1], [1, 0], [2.0, 9.0], nrows=2,
                              ncols=2)
        B = GBMatrix.from_coo([0, 1], [1, 0], [5.0, 4.0], nrows=2,
                              ncols=2)
        r, c, v = A.ewise_mult(B, "pick_scalar").to_coo()
        np.testing.assert_allclose(sorted(v), [9.0, 50.0])


def test_vectorized_udf_keeps_fast_path():
    """A vectorizable UDF must stay on the array path (no object-dtype
    round trip): probe by registering a fn that records its input."""
    seen = {}

    def vfn(x):
        seen["t"] = type(x).__name__
        return x * 2

    UnaryOp.register_new("dbl_probe", vfn)
    A = GBMatrix.from_coo([0, 1], [1, 0], [2.0, 5.0], nrows=2, ncols=2)
    _, _, v = A.apply("dbl_probe").to_coo()
    np.testing.assert_allclose(sorted(v), [4.0, 10.0])
