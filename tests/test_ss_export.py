"""Explicit ``ss.export`` / ``import_any`` physical formats (reference
``core/ss/matrix.py:525-741,:1987-2686`` raw=False shapes) — the last
§2.6 conformance row: every format round-trips bit-exactly through the
export dict, including bitmap/full/hyper and the Vector sparse/bitmap/
full trio."""

import numpy as np
import pytest

from python_graphblas_ray import ss as gss
from python_graphblas_ray.core import GBMatrix, GBVector

MAT_FORMATS = ["csr", "csc", "hypercsr", "hypercsc", "bitmapr",
               "bitmapc", "coo", "coor", "cooc"]


@pytest.fixture(scope="module")
def A(ray_session):
    rng = np.random.default_rng(3)
    r = rng.integers(0, 9, 40)
    c = rng.integers(0, 7, 40)
    u = np.unique(r * 7 + c)
    r, c = u // 7, u % 7
    v = (r * 10 + c + 1).astype(np.float64)
    return GBMatrix.from_coo(r, c, v, nrows=9, ncols=7), (r, c, v)


@pytest.mark.parametrize("fmt", MAT_FORMATS)
def test_matrix_format_roundtrip(A, fmt):
    M, (r, c, v) = A
    d = M.ss.export(fmt)
    assert d["format"] == fmt
    back = gss.import_any(**d)
    assert (back.nrows, back.ncols) == (9, 7)
    r2, c2, v2 = back.to_coo()
    assert np.array_equal(r2, r) and np.array_equal(c2, c)
    assert np.array_equal(v2, v)


def test_matrix_full_formats(ray_session):
    dense = np.arange(12, dtype=np.float64).reshape(3, 4) + 1
    M = GBMatrix.from_dense(dense)
    for fmt, order in (("fullr", "C"), ("fullc", "F")):
        d = M.ss.export(fmt)
        assert d["values"].flags["C_CONTIGUOUS" if order == "C"
                                 else "F_CONTIGUOUS"]
        back = gss.import_any(**d)
        assert np.array_equal(back.to_dense(), dense)
    # default export of a full matrix picks fullr
    assert M.ss.export()["format"] == "fullr"
    # full export of a non-full matrix refuses
    S = GBMatrix.from_coo([0], [0], [1.0], nrows=2, ncols=2)
    with pytest.raises(ValueError, match="FULL"):
        S.ss.export("fullr")
    assert S.ss.export()["format"] == "csr"


def test_matrix_bitmap_layout(A):
    M, (r, c, v) = A
    d = M.ss.export("bitmapr")
    assert d["bitmap"].shape == (9, 7) and d["nvals"] == len(r)
    assert d["bitmap"][r, c].all()
    assert np.array_equal(d["values"][r, c], v)
    dc = M.ss.export("bitmapc")
    assert dc["bitmap"].flags["F_CONTIGUOUS"]


def test_vector_formats_roundtrip(ray_session):
    idx = np.array([1, 4, 5, 9], dtype=np.int64)
    val = np.array([2.0, 8.0, 10.0, 18.0])
    v = GBVector.from_coo(idx, val, size=12)
    for fmt in ("sparse", "bitmap"):
        d = v.ss.export(fmt)
        back = gss.import_any(**d)
        assert back.size == 12
        i2, v2 = back.to_coo()
        assert np.array_equal(i2, idx) and np.array_equal(v2, val)
    with pytest.raises(ValueError, match="FULL"):
        v.ss.export("full")
    full = GBVector.from_dense(np.arange(5, dtype=np.float64))
    d = full.ss.export()
    assert d["format"] == "full"
    assert np.array_equal(gss.import_any(**d).to_dense(),
                          np.arange(5, dtype=np.float64))
