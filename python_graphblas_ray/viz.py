"""Matrix visualization (reference ``graphblas/viz.py``).

The reference surface — ``draw`` (networkx graph plot), ``spy``
(matplotlib sparsity plot), ``datashade`` (hvplot/datashader raster) —
is import-gated exactly like the reference (``viz.py:22-42``
``_get_imports`` raises ``ImportError: \\`spy\\` requires matplotlib to
be installed``).

The distributed core those wrappers sit on is ours and always
available: :func:`rasterize` bins the COO entries of a ``GBMatrix``
into a fixed ``height x width`` pixel grid with a per-batch combiner
(one streaming pass, partial grids merged associatively — the same
count/sum/mean/min/max reductions datashader applies, reference
``viz.py:108-116``), and :func:`text_spy` renders that grid as ASCII.
At 10^12-edge scale the grid is the ONLY thing that leaves the
cluster: each block contributes one ``height*width`` partial, never
its rows.
"""

from importlib import import_module as _import_module

import numpy as np
import pyarrow as pa

from .core import GBMatrix

_LAZY_IMPORTS = {
    "bk": "bokeh",
    "ds": "datashader",
    "hv": "holoviews",
    "hp": "hvplot.pandas",
    "mpl": "matplotlib",
    "plt": "matplotlib.pyplot",
    "nx": "networkx",
    "pd": "pandas",
    "ss": "scipy.sparse",
}

_AGGS = ("count", "sum", "mean", "min", "max")


def _get_imports(names, within):
    """Lazy import-gate (reference ``viz.py:22``): missing lib raises
    ``ImportError: \\`<within>\\` requires <lib> to be installed``."""
    is_string = isinstance(names, str)
    if is_string:
        names = [names]
    rv = []
    for name in names:
        if name not in _LAZY_IMPORTS:  # pragma: no cover (safety)
            raise KeyError(f"Unknown library to import: {name}")
        try:
            val = _import_module(_LAZY_IMPORTS[name])
        except ImportError:
            modname = _LAZY_IMPORTS[name].split(".")[0]
            raise ImportError(
                f"`{within}` requires {modname} to be installed") from None
        rv.append(val)
    if is_string:
        return rv[0]
    return rv


def rasterize(M: GBMatrix, width=80, height=40, agg="count"):
    """Bin a matrix's entries into a ``(grid_h, grid_w)`` float64 pixel
    grid — the distributed reduction under ``spy``/``datashade``.

    ``agg``: ``count`` | ``sum`` | ``mean`` | ``min`` | ``max`` over
    the values landing in each pixel. Cells with no entry are NaN for
    sum/mean/min/max and 0 for count. Grid dims are clamped to the
    matrix dims (a 3x3 matrix never gets an 80-wide raster).

    One streaming ``map_batches`` pass: each Arrow block reduces to a
    single ``grid_h*grid_w`` partial row (count + the agg's partial),
    merged associatively on the driver — O(blocks * pixels) driver
    work, independent of nnz.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {_AGGS}, got {agg!r}")
    nr, nc = M.nrows, M.ncols
    grid_h = int(min(height, max(nr, 1)))
    grid_w = int(min(width, max(nc, 1)))
    ncells = grid_h * grid_w

    def partial(batch: pa.Table) -> pa.Table:
        r = batch["src"].to_numpy(zero_copy_only=False)
        c = batch["dst"].to_numpy(zero_copy_only=False)
        v = batch["val"].to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False)
        idx = (r * grid_h // max(nr, 1)) * grid_w + (c * grid_w
                                                     // max(nc, 1))
        cnt = np.bincount(idx, minlength=ncells).astype(np.float64)
        if agg == "count":
            acc = cnt
        elif agg in ("sum", "mean"):
            acc = np.bincount(idx, weights=v, minlength=ncells)
        elif agg == "min":
            acc = np.full(ncells, np.inf)
            np.minimum.at(acc, idx, v)
        else:  # max
            acc = np.full(ncells, -np.inf)
            np.maximum.at(acc, idx, v)
        return pa.table({"cnt": [cnt.tobytes()], "acc": [acc.tobytes()]})

    cnt = np.zeros(ncells)
    if agg == "min":
        acc = np.full(ncells, np.inf)
    elif agg == "max":
        acc = np.full(ncells, -np.inf)
    else:
        acc = np.zeros(ncells)
    for b in M.ds.map_batches(partial, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            cnt += np.frombuffer(b["cnt"][i].as_py(), dtype=np.float64)
            p = np.frombuffer(b["acc"][i].as_py(), dtype=np.float64)
            if agg == "min":
                acc = np.minimum(acc, p)
            elif agg == "max":
                acc = np.maximum(acc, p)
            else:
                acc = acc + p

    empty = cnt == 0
    if agg == "count":
        out = cnt
    elif agg == "mean":
        out = np.where(empty, np.nan, acc / np.where(empty, 1, cnt))
    else:
        out = np.where(empty, np.nan, acc)
    return out.reshape(grid_h, grid_w)


_RAMP = " .:-=+*#%@"


def text_spy(M: GBMatrix, width=80, height=40, ramp=_RAMP):
    """ASCII sparsity plot — the no-matplotlib ``spy``. Each character
    cell covers a ``(nrows/height, ncols/width)`` tile; the glyph is
    the tile's entry count mapped onto ``ramp`` by density relative to
    the densest tile (space = empty). Returns the multi-line string."""
    grid = rasterize(M, width=width, height=height, agg="count")
    mx = float(grid.max())
    if mx <= 0:
        lv = np.zeros(grid.shape, dtype=np.int64)
    else:
        lv = np.ceil(grid / mx * (len(ramp) - 1)).astype(np.int64)
        lv[(grid > 0) & (lv == 0)] = 1  # any entry is visibly non-space
    chars = np.array(list(ramp))
    return "\n".join("".join(row) for row in chars[lv])


def spy(M, *, centered=False, show=True, figure=None, axes=None,
        figsize=None, **kwargs):
    """Sparsity plot via ``matplotlib.axes.Axes.spy`` (reference
    ``viz.py:69``); gated on matplotlib + scipy. Use :func:`text_spy`
    when plotting libs are absent."""
    mpl, plt, _ss = _get_imports(["mpl", "plt", "ss"], "spy")
    from .sources.interop import to_scipy_sparse

    A = to_scipy_sparse(M, "coo")
    if show:  # pragma: no cover - interactive
        plt.ion()
        plt.show()
    if axes is None:
        if figure is None:
            figure = mpl.figure.Figure(figsize=figsize)
        axes = figure.subplots()
    if kwargs.get("markersize") is None:
        markersize = min(axes.bbox.width / A.shape[1],
                         axes.bbox.height / A.shape[0])
        kwargs["markersize"] = max(0.002,
                                   markersize * 72 / axes.figure.dpi)
    axes.spy(A, **kwargs)
    if not centered:
        axes.figure.draw_without_rendering()
        axes.set_xticks(axes.get_xticks()[1:-1] - 0.5,
                        axes.get_xticklabels()[1:-1])
        axes.set_yticks(axes.get_yticks()[1:-1] - 0.5,
                        axes.get_yticklabels()[1:-1])
    return axes.figure


def draw(m):
    """Draw a square adjacency Matrix as a networkx graph (reference
    ``viz.py:45``); gated on networkx + matplotlib."""
    nx, plt = _get_imports(["nx", "plt"], "draw")
    if not isinstance(m, GBMatrix):
        raise TypeError(f"Can only draw a Matrix, not {type(m)}")
    from .sources.interop import to_networkx

    g = to_networkx(m)
    pos = nx.spring_layout(g)
    edge_labels = {(i, j): d["weight"]
                   for i, j, d in g.edges(data=True)}
    nx.draw_networkx(g, pos, node_color="red", node_size=500)
    nx.draw_networkx_edge_labels(g, pos, edge_labels=edge_labels)
    plt.show()  # pragma: no cover - interactive


def datashade(M, agg="count", *, width=None, height=None,
              opts_kwargs=None, **kwargs):
    """Interactive raster plot (reference ``viz.py:107``); gated on the
    holoviz stack. The aggregation itself is :func:`rasterize` — use it
    directly for the grid without any plotting dependency."""
    _get_imports(["pd", "bk", "hv", "hp", "ds"], "datashade")
    raise NotImplementedError(  # pragma: no cover - libs absent here
        "hvplot rendering not wired in this environment; "
        "use rasterize()/text_spy() for the aggregated grid")
