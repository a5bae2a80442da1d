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
