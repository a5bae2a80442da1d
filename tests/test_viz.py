"""viz surface (reference ``graphblas/viz.py``): distributed rasterize
+ text_spy, and the reference's import gates for the plotting wrappers
(matplotlib/scipy/holoviz are absent in this container)."""

import numpy as np
import pyarrow as pa
import pytest

from python_graphblas_ray import viz
from python_graphblas_ray.core import GBMatrix


def _mat(r, c, v, nr, nc):
    return GBMatrix.from_coo(np.asarray(r, np.int64),
                             np.asarray(c, np.int64),
                             np.asarray(v, np.float64),
                             nrows=nr, ncols=nc, dup_op="plus")


def test_rasterize_count_exact():
    """Grid == matrix dims ⇒ every cell is its own pixel: the count
    raster equals the dense nnz indicator (dups summed)."""
    A = _mat([0, 0, 2, 2, 2], [0, 3, 1, 1, 2], [1, 2, 3, 4, 5], 3, 4)
    g = viz.rasterize(A, width=4, height=3, agg="count")
    want = np.zeros((3, 4))
    want[0, 0] = 1
    want[0, 3] = 1
    want[2, 1] = 1  # from_coo default dup collapses — one entry
    want[2, 2] = 1
    assert g.shape == (3, 4)
    assert np.array_equal(g, want)


def test_rasterize_aggs_vs_numpy():
    """count/sum/mean/min/max rasters on a downsampled grid match a
    numpy histogram oracle (NaN for empty cells)."""
    rng = np.random.default_rng(7)
    nr, nc, nnz = 57, 91, 800
    r = rng.integers(0, nr, nnz)
    c = rng.integers(0, nc, nnz)
    # unique (r, c) so from_coo dup handling can't diverge from oracle
    key = r * nc + c
    _, idx = np.unique(key, return_index=True)
    r, c = r[idx], c[idx]
    v = rng.normal(size=len(r))
    A = _mat(r, c, v, nr, nc)
    H, W = 8, 10
    gy, gx = r * H // nr, c * W // nc
    cell = gy * W + gx
    for agg in ("count", "sum", "mean", "min", "max"):
        got = viz.rasterize(A, width=W, height=H, agg=agg)
        want = np.full(H * W, np.nan)
        cnt = np.bincount(cell, minlength=H * W).astype(float)
        if agg == "count":
            want = cnt
        elif agg == "sum":
            want[cnt > 0] = np.bincount(cell, weights=v,
                                        minlength=H * W)[cnt > 0]
        elif agg == "mean":
            s = np.bincount(cell, weights=v, minlength=H * W)
            want[cnt > 0] = s[cnt > 0] / cnt[cnt > 0]
        elif agg == "min":
            m = np.full(H * W, np.inf)
            np.minimum.at(m, cell, v)
            want[cnt > 0] = m[cnt > 0]
        else:
            m = np.full(H * W, -np.inf)
            np.maximum.at(m, cell, v)
            want[cnt > 0] = m[cnt > 0]
        np.testing.assert_allclose(got.reshape(-1), want,
                                   equal_nan=True, err_msg=agg)


def test_rasterize_clamps_grid_and_rejects_bad_agg():
    A = _mat([0, 1], [0, 1], [1.0, 1.0], 2, 2)
    g = viz.rasterize(A, width=80, height=40, agg="count")
    assert g.shape == (2, 2)
    with pytest.raises(ValueError, match="agg must be one of"):
        viz.rasterize(A, agg="median")


def test_text_spy_diag():
    A = _mat(range(5), range(5), [1.0] * 5, 5, 5)
    s = viz.text_spy(A, width=5, height=5)
    lines = s.split("\n")
    assert len(lines) == 5 and all(len(ln) == 5 for ln in lines)
    for i in range(5):
        assert lines[i][i] != " "  # diagonal visible
        assert all(lines[i][j] == " " for j in range(5) if j != i)


def test_text_spy_empty_matrix():
    A = GBMatrix.from_coo(np.array([], np.int64), np.array([], np.int64),
                          np.array([], np.float64), nrows=4, ncols=4)
    s = viz.text_spy(A, width=4, height=4)
    assert set(s) <= {" ", "\n"}


def test_plot_wrappers_import_gated():
    """matplotlib / holoviz absent here — the wrappers raise the
    reference's ImportError message shape (viz.py:36-38)."""
    A = _mat([0], [0], [1.0], 2, 2)
    with pytest.raises(ImportError, match="`spy` requires matplotlib"):
        viz.spy(A)
    with pytest.raises(ImportError, match="`draw` requires matplotlib"):
        viz.draw(A)
    with pytest.raises(ImportError, match="`datashade` requires"):
        viz.datashade(A)


def test_viz_lazy_namespace():
    import python_graphblas_ray as gb

    assert gb.viz.text_spy is viz.text_spy
