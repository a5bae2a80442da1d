"""Borůvka minimum spanning forest vs a driver-side Kruskal oracle
under the same strict (w, a, b) total order (forest is unique)."""

import numpy as np
import pyarrow as pa
import ray

from python_graphblas_ray.pipelines.mst import (
    _cc_labels,
    mst_boruvka,
    mst_kruskal_numpy,
    undirected_weights,
)


def _multigraph_ds(src, dst, val):
    return ray.data.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64),
        "val": np.asarray(val, dtype=np.float64),
    }))


def _canon_simple(src, dst, val):
    """numpy twin of undirected_weights."""
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    v = val[keep]
    key = a * 1_000_000 + b
    uk, inv = np.unique(key, return_inverse=True)
    w = np.zeros(len(uk))
    np.add.at(w, inv, v)
    return uk // 1_000_000, uk % 1_000_000, w


def _forest_set(f):
    return set(zip(f["a"].tolist(), f["b"].tolist(), f["w"].tolist()))


def _run(src, dst, val, n):
    ds = undirected_weights(_multigraph_ds(src, dst, val), n)
    forest, comp = mst_boruvka(ds, n)
    a, b, w = _canon_simple(np.asarray(src), np.asarray(dst),
                            np.asarray(val, dtype=np.float64))
    ka, kb, kw = mst_kruskal_numpy(a, b, w, n)
    return forest, comp, set(zip(ka.tolist(), kb.tolist(), kw.tolist()))


def test_boruvka_matches_kruskal_random():
    rng = np.random.default_rng(11)
    n, m = 64, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    val = rng.integers(1, 20, m).astype(np.float64)
    forest, comp, kset = _run(src, dst, val, n)
    assert _forest_set(forest) == kset


def test_boruvka_all_equal_weights_tiebreak():
    # every edge weight identical — the (w, a, b) order alone decides
    rng = np.random.default_rng(5)
    n, m = 40, 150
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    val = np.ones(m)
    forest, comp, kset = _run(src, dst, val, n)
    assert _forest_set(forest) == kset


def test_boruvka_disconnected_forest():
    # two cliques {0..4} and {10..14}, no bridge
    import itertools
    e1 = list(itertools.combinations(range(5), 2))
    e2 = list(itertools.combinations(range(10, 15), 2))
    edges = e1 + e2
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    val = np.arange(1, len(edges) + 1).astype(np.float64)
    forest, comp, kset = _run(src, dst, val, 15)
    assert _forest_set(forest) == kset
    assert len(forest["a"]) == 8  # (5-1) + (5-1)
    # components: the two cliques plus 5 isolated vertices
    assert len(np.unique(comp)) == 2 + 5
    assert (comp[:5] == comp[0]).all() and (comp[10:] == comp[10]).all()


def test_cc_labels_chain():
    # long path graph — exercises pointer jumping over deep trees
    n = 300
    eu = np.arange(n - 1)
    ev = np.arange(1, n)
    lab = _cc_labels(n, eu, ev)
    assert (lab == 0).all()


def test_boruvka_multigraph_weights_sum():
    # duplicate (src, dst) rows must sum into one canonical edge
    src = np.array([0, 1, 0, 2, 1])
    dst = np.array([1, 0, 2, 0, 2])
    val = np.array([1.0, 2.0, 5.0, 1.0, 3.0])
    ds = undirected_weights(_multigraph_ds(src, dst, val), 3)
    rows = {(r["a"], r["b"]): r["w"] for r in ds.take_all()}
    assert rows == {(0, 1): 3.0, (0, 2): 6.0, (1, 2): 3.0}
    forest, _ = mst_boruvka(ds, 3)
    assert _forest_set(forest) == {(0, 1, 3.0), (1, 2, 3.0)}
