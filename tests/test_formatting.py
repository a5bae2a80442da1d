"""Golden repr tests modeled on reference ``tests/test_formatting.py``
(same fixtures and layout; the ``format`` column reports this engine's
storage token — the reference's own goldens are suitesparse-specific
and its suite skips on any other backend, ``test_formatting.py:18``)."""

import numpy as np

from python_graphblas_ray.core import GBMatrix, GBScalar, GBVector


def test_matrix_repr_small(ray_session):
    # reference test_formatting.py:184 fixture A: 1x5 INT64, 3 entries
    A = GBMatrix.from_coo([0, 0, 0], [0, 2, 4], [0, 1, 2],
                          nrows=1, ncols=5, dtype="int64")
    assert repr(A) == (
        '"M"        nvals  nrows  ncols  dtype   format\n'
        "gb.Matrix      3      1      5  INT64  raydata\n"
        "----------------------------------------------\n"
        "   0 1  2 3  4\n"
        "0  0    1    2"
    )
    # fixture B: the 5x1 column
    B = GBMatrix.from_coo([0, 2, 4], [0, 0, 0], [10, 20, 30],
                          nrows=5, ncols=1, dtype="int64")
    assert repr(B) == (
        '"M"        nvals  nrows  ncols  dtype   format\n'
        "gb.Matrix      3      5      1  INT64  raydata\n"
        "----------------------------------------------\n"
        "    0\n"
        "0  10\n"
        "1    \n"
        "2  20\n"
        "3    \n"
        "4  30"
    )


def test_vector_repr_small(ray_session):
    # reference test_formatting.py:408 fixture v
    v = GBVector.from_coo([0, 2, 4], [0.0, 1.1, 2.2], size=5)
    assert repr(v) == (
        '"v"        nvals  size dtype   format\n'
        "gb.Vector      3     5  FP64  raydata\n"
        "-------------------------------------\n"
        "index    0 1    2 3    4\n"
        "value  0.0    1.1    2.2"
    )


def test_scalar_repr(ray_session):
    # reference test_formatting.py:513
    s = GBScalar.from_value(42, dtype="int64")
    assert repr(s) == ('"s"        value  dtype\n'
                       "gb.Scalar     42  INT64")
    t = GBScalar(None, "int64")
    assert repr(t) == ('"s"       value  dtype\n'
                       "gb.Scalar  None  INT64")


def test_mask_repr_small(ray_session):
    # reference test_formatting.py: structural 1s, value 0/1,
    # complement flips
    A = GBMatrix.from_coo([0, 0, 0], [0, 2, 4], [0, 1, 2],
                          nrows=1, ncols=5, dtype="int64")
    assert repr(A.S) == (
        '"M.S"         nvals  nrows  ncols  dtype   format\n'
        "StructuralMask\n"
        "of gb.Matrix      3      1      5  INT64  raydata\n"
        "-------------------------------------------------\n"
        "   0 1  2 3  4\n"
        "0  1    1    1"
    )
    assert repr(A.V).split("\n")[-1] == "0  0    1    1"
    v = GBVector.from_coo([0, 2, 4], [0.0, 1.1, 2.2], size=5)
    assert repr(~v.V).split("\n")[-1] == "value  1    0    0"


def test_matrix_repr_large_elision(ray_session):
    """Axes past the display limits elide with ``...`` (reference
    test_matrix_repr_large shape); only the displayed window is fetched
    from the Dataset (one filtered streaming scan)."""
    n = 50
    B = GBMatrix.from_coo(np.arange(n), np.arange(n)[::-1],
                          np.arange(n) * 1.5, nrows=n, ncols=n)
    text = repr(B)
    lines = text.split("\n")
    assert lines[1].startswith("gb.Matrix     50     50     50")
    assert "..." in text
    # anti-diagonal corners present, middle elided
    assert "0.0" in lines[4]          # (0, 49)
    assert lines[-1].startswith("49   73.5")
    body_rows = [ln for ln in lines[4:] if not ln.startswith(" ")]
    assert len(body_rows) <= 21       # 20 shown + the "..." row


def test_repr_never_raises_without_ray():
    """The terse fallback: repr outside a usable Dataset context must
    not raise (debuggers call repr at arbitrary times)."""
    A = GBMatrix.from_coo([0], [0], [1.0], nrows=1, ncols=1)
    A_bad = GBMatrix.__new__(GBMatrix)
    A_bad.__dict__.update(A.__dict__)
    A_bad.ds = None  # poison the dataset
    out = repr(A_bad)
    assert out.startswith("GBMatrix(")
