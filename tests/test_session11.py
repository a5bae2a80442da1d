"""Session-11 regressions: the grouped_agg / groupby_aggregator
cardinality-overflow paths now run the hash-exchange + cross-group
lexsort/segment finisher (one shuffle, no per-group Python) instead of
Ray-native groupby machinery — these tests force the overflow with
``driver_merge_threshold=1`` and require bit-identical results to the
driver-merge path and to a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _table(seed=7, n=5000, nkeys=37):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": rng.integers(0, nkeys, n).astype(np.int64),
        "k2": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.normal(size=n),
    })


def _collect(ds):
    bs = [b for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None) if b.num_rows]
    t = pa.concat_tables(bs, promote_options="permissive")
    return t.to_pandas().sort_values(
        [c for c in t.column_names]).reset_index(drop=True)


def test_grouped_agg_overflow_matches_driver_path():
    from python_graphblas_ray.stages.reduce import grouped_agg

    t = _table()
    specs = [("v", "sum", "s"), ("v", "min", "lo"),
             ("v", "max", "hi"), ("v", "count", "n")]
    small = _collect(grouped_agg(ray.data.from_arrow(t), ["k"], specs))
    big = _collect(grouped_agg(ray.data.from_arrow(t), ["k"], specs,
                               driver_merge_threshold=1))
    # identical group keys + exact min/max/count; sums may differ in
    # merge order between the two paths, so compare allclose there
    assert (small["k"].to_numpy() == big["k"].to_numpy()).all()
    for c in ("lo", "hi", "n"):
        assert (small[c].to_numpy() == big[c].to_numpy()).all(), c
    assert np.allclose(small["s"], big["s"], rtol=1e-12, atol=1e-12)
    # pandas oracle
    ora = (t.to_pandas().groupby("k")
           .agg(s=("v", "sum"), lo=("v", "min"), hi=("v", "max"),
                n=("v", "count")).reset_index()
           .sort_values("k").reset_index(drop=True))
    assert (big["lo"].to_numpy() == ora["lo"].to_numpy()).all()
    assert (big["n"].to_numpy() == ora["n"].to_numpy()).all()
    assert np.allclose(big["s"], ora["s"], rtol=1e-12, atol=1e-12)


def test_grouped_agg_overflow_composite_key():
    from python_graphblas_ray.stages.reduce import grouped_agg

    t = _table(seed=11)
    specs = [("v", "count", "n"), ("v", "max", "hi")]
    big = _collect(grouped_agg(ray.data.from_arrow(t), ["k", "k2"],
                               specs, driver_merge_threshold=1))
    ora = (t.to_pandas().groupby(["k", "k2"])
           .agg(n=("v", "count"), hi=("v", "max")).reset_index()
           .sort_values(["k", "k2"]).reset_index(drop=True))
    assert len(big) == len(ora)
    for c in ("k", "k2", "n", "hi"):
        assert (big[c].to_numpy() == ora[c].to_numpy()).all(), c


def test_grouped_agg_overflow_string_keys():
    from python_graphblas_ray.stages.reduce import grouped_agg

    rng = np.random.default_rng(3)
    t = pa.table({
        "k": pa.array([f"key_{i:03d}" for i in
                       rng.integers(0, 53, 4000)]),
        "v": rng.integers(0, 1000, 4000).astype(np.int64),
    })
    big = _collect(grouped_agg(ray.data.from_arrow(t), ["k"],
                               [("v", "sum", "s"), ("v", "count", "n")],
                               driver_merge_threshold=1))
    ora = (t.to_pandas().groupby("k")
           .agg(s=("v", "sum"), n=("v", "count")).reset_index()
           .sort_values("k").reset_index(drop=True))
    assert (big["k"].to_numpy() == ora["k"].to_numpy()).all()
    assert (big["s"].to_numpy() == ora["s"].to_numpy()).all()
    assert (big["n"].to_numpy() == ora["n"].to_numpy()).all()


def test_groupby_aggregator_overflow_matches_driver_path():
    from python_graphblas_ray.functions.aggregators import agg
    from python_graphblas_ray.stages.reduce import groupby_aggregator

    t = _table(seed=23)
    for name in ("mean", "stdp", "varp"):
        a = agg[name]
        small = _collect(groupby_aggregator(
            ray.data.from_arrow(t), ["k"], "v", a, out_col="val"))
        big = _collect(groupby_aggregator(
            ray.data.from_arrow(t), ["k"], "v", a, out_col="val",
            driver_merge_threshold=1))
        assert (small["k"].to_numpy() == big["k"].to_numpy()).all(), name
        assert np.allclose(small["val"], big["val"],
                           rtol=1e-9, atol=1e-12), name


def test_groupby_aggregator_overflow_positional():
    """argmin needs the idx_col plumbing through the exchange path."""
    from python_graphblas_ray.functions.aggregators import agg
    from python_graphblas_ray.stages.reduce import groupby_aggregator

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table({
        "k": rng.integers(0, 29, n).astype(np.int64),
        "v": rng.permutation(n).astype(np.int64),
        "i": np.arange(n, dtype=np.int64),
    })
    a = agg["argmin"]
    big = _collect(groupby_aggregator(
        ray.data.from_arrow(t), ["k"], "v", a, out_col="pos",
        idx_col="i", driver_merge_threshold=1))
    df = t.to_pandas()
    ora = df.loc[df.groupby("k")["v"].idxmin()].sort_values(
        "k").reset_index(drop=True)
    assert (big["k"].to_numpy() == ora["k"].to_numpy()).all()
    assert (big["pos"].to_numpy() == ora["i"].to_numpy()).all()


def test_no_pandas_map_groups_left_in_stages():
    """The overflow paths must not regress to per-group Python:
    no ``batch_format=\"pandas\"`` map_groups anywhere in stages/."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    for f in (root / "python_graphblas_ray" / "stages").glob("*.py"):
        src = f.read_text()
        assert 'batch_format="pandas"' not in src, f.name


def _coo_matrix(rows=40, deg=12, seed=1):
    from python_graphblas_ray.core import GBMatrix

    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(rows, dtype=np.int64), deg)
    dst = np.concatenate([rng.choice(200, deg, replace=False)
                          for _ in range(rows)]).astype(np.int64)
    val = rng.integers(1, 100, rows * deg).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst,
                                       "val": val}))
    return GBMatrix.from_dataset(ds, 200, 200), src, dst, val


def _coo_of(A):
    t = pa.concat_tables([b for b in A.ds.iter_batches(
        batch_format="pyarrow", batch_size=None) if b.num_rows],
        promote_options="permissive")
    df = t.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    return df


def test_selectk_random_semantics():
    """ss.selectk(how='random'): k entries per row, a subset of the
    row's entries, deterministic per seed, seed-sensitive."""
    from python_graphblas_ray.stages.perrow import row_selectk

    A, src, dst, val = _coo_matrix()
    k = 3
    out1 = _coo_of(row_selectk(A, "random", k, seed=7))
    out2 = _coo_of(row_selectk(A, "random", k, seed=7))
    out3 = _coo_of(row_selectk(A, "random", k, seed=8))
    pd.testing.assert_frame_equal(out1, out2)  # deterministic
    assert not out1.equals(out3)               # seed-sensitive
    # exactly k per row (every row has degree 12 > k)
    assert (out1.groupby("src").size() == k).all()
    # every kept entry is one of the row's original entries (same val)
    orig = pd.DataFrame({"src": src, "dst": dst, "val": val})
    merged = out1.merge(orig, on=["src", "dst"], suffixes=("", "_o"))
    assert len(merged) == len(out1)
    assert (merged["val"] == merged["val_o"]).all()


def test_selectk_random_short_rows():
    """Rows with fewer than k entries keep everything."""
    from python_graphblas_ray.core import GBMatrix
    from python_graphblas_ray.stages.perrow import row_selectk

    ds = ray.data.from_arrow(pa.table({
        "src": np.array([0, 0, 1], dtype=np.int64),
        "dst": np.array([3, 5, 9], dtype=np.int64),
        "val": np.array([1.0, 2.0, 3.0])}))
    A = GBMatrix.from_dataset(ds, 16, 16)
    out = _coo_of(row_selectk(A, "random", 5, seed=0))
    assert len(out) == 3


def test_compactify_random():
    """ss.compactify(how='random'): k survivors re-indexed to columns
    0..k-1 in draw order; values subset of the row's values."""
    from python_graphblas_ray.stages.perrow import row_compactify

    A, src, dst, val = _coo_matrix(seed=3)
    k = 4
    out = _coo_of(row_compactify(A, "random", k, seed=11))
    assert out["dst"].isin(range(k)).all()
    assert (out.groupby("src")["dst"].apply(
        lambda s: sorted(s) == list(range(k)))).all()
    C = row_compactify(A, "random", k, seed=11)
    assert C.ncols == k
    orig = pd.DataFrame({"src": src, "val": val})
    for s, grp in out.groupby("src"):
        assert set(grp["val"]) <= set(orig.loc[orig["src"] == s, "val"])


def test_selectk_random_matches_sql_replay():
    """The engine pick equals a DuckDB ROW_NUMBER replay of the same
    knuth32 draw — the property the driver-window member relies on."""
    import duckdb
    from python_graphblas_ray.stages.perrow import row_selectk

    A, src, dst, val = _coo_matrix(rows=30, deg=9, seed=5)
    out = _coo_of(row_selectk(A, "random", 2, seed=7))
    con = duckdb.connect()
    con.register("E", pd.DataFrame({"src": src, "dst": dst, "val": val}))
    ora = con.sql(
        "SELECT src, dst, val FROM (SELECT *, row_number() OVER ("
        "PARTITION BY src ORDER BY "
        "((CAST(src AS BIGINT) * 200 + dst + 7) % 4294967296 "
        "* 2654435761) % 4294967296, dst) AS rn FROM E) WHERE rn <= 2"
    ).df().sort_values(["src", "dst"]).reset_index(drop=True)
    assert (out["src"].to_numpy() == ora["src"].to_numpy()).all()
    assert (out["dst"].to_numpy() == ora["dst"].to_numpy()).all()
    assert (out["val"].to_numpy() == ora["val"].to_numpy()).all()


# ---------------------------------------------------------------------------
# hub-split sampling (round-3: the documented random_walks/sample_neighbors
# /node2vec hub-split boundary is closed via per-actor offset context)
# ---------------------------------------------------------------------------

def _skewed_engines(n=200, seed=9):
    """A graph with one massive hub dst so the hub range splits; returns
    (split engine, unsplit engine, edge set)."""
    from python_graphblas_ray.state.superstep import SuperstepEngine

    rng = np.random.default_rng(seed)
    # hub vertex 7 receives half of all edges
    n_hub, n_rest = 2000, 2000
    src_h = rng.integers(0, n, n_hub).astype(np.int64)
    dst_h = np.full(n_hub, 7, dtype=np.int64)
    src_r = rng.integers(0, n, n_rest).astype(np.int64)
    dst_r = rng.integers(0, n, n_rest).astype(np.int64)
    src = np.concatenate([src_h, src_r])
    dst = np.concatenate([dst_h, dst_r])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    t = pa.table({"src": src, "dst": dst})
    split = SuperstepEngine(ray.data.from_arrow(t), n, num_partitions=4,
                            partition_mode="exchange",
                            hub_split_factor=1.2)
    plain = SuperstepEngine(ray.data.from_arrow(t), n, num_partitions=4,
                            partition_mode="exchange",
                            hub_split_factor=None)
    edges = set(zip(src.tolist(), dst.tolist()))
    return split, plain, edges


def test_hub_split_sample_neighbors_full_coverage():
    """With k ≥ max degree the windowed sample IS the full adjacency, so
    the split engine must return exactly the unsplit engine's neighbor
    sets (order-free) — the strongest equivalence the offset scheme
    can be held to."""
    split, plain, edges = _skewed_engines()
    try:
        assert split.has_hub_split and not plain.has_hub_split
        vids = np.arange(200, dtype=np.int64)
        k = 5000  # > any degree
        vs, ns = split.sample_neighbors(vids, k, seed=3)
        vp, npn = plain.sample_neighbors(vids, k, seed=3)
        got = {}
        for v, nb in zip(vs.tolist(), ns.tolist()):
            got.setdefault(v, []).append(nb)
        want = {}
        for v, nb in zip(vp.tolist(), npn.tolist()):
            want.setdefault(v, []).append(nb)
        assert set(got) == set(want)
        for v in want:
            assert sorted(got[v]) == sorted(want[v]), v
    finally:
        split.shutdown()
        plain.shutdown()


def test_hub_split_sample_neighbors_k_and_determinism():
    split, plain, edges = _skewed_engines(seed=17)
    try:
        vids = np.array([7, 0, 1, 2, 3], dtype=np.int64)
        vs1, ns1 = split.sample_neighbors(vids, 5, seed=4)
        vs2, ns2 = split.sample_neighbors(vids, 5, seed=4)
        o1 = np.lexsort((ns1, vs1))
        o2 = np.lexsort((ns2, vs2))
        assert (vs1[o1] == vs2[o2]).all() and (ns1[o1] == ns2[o2]).all()
        # every sampled (neighbor -> vid) is a real edge; at most k per
        # vid; the hub (deg ~2000 > 5) returns exactly 5 DISTINCT slots
        for v, nb in zip(vs1.tolist(), ns1.tolist()):
            assert (nb, v) in edges
        counts = pd.Series(vs1).value_counts()
        assert counts.max() <= 5
        assert counts.get(7, 0) == 5
    finally:
        split.shutdown()
        plain.shutdown()


def test_hub_split_random_walks_valid_and_deterministic():
    split, plain, edges = _skewed_engines(seed=23)
    try:
        starts = np.arange(40, dtype=np.int64)
        w1 = split.random_walks(starts, length=6, seed=11)
        w2 = split.random_walks(starts, length=6, seed=11)
        assert (w1 == w2).all()
        # every transition follows an IN-edge: pos[t+1] is an
        # in-neighbor of pos[t], i.e. (next, cur) in edges
        for row in w1:
            for t in range(len(row) - 1):
                cur, nxt = row[t], row[t + 1]
                if cur < 0 or nxt < 0:
                    continue
                assert (nxt, cur) in edges, (cur, nxt)
        # walkers that start on the hub must be able to leave it
        assert (w1[7] >= 0).any()
    finally:
        split.shutdown()
        plain.shutdown()


def test_hub_split_node2vec_runs_and_is_valid():
    split, plain, edges = _skewed_engines(seed=31)
    try:
        starts = np.arange(20, dtype=np.int64)
        w = split.node2vec_walks(starts, length=4, p=2.0, q=0.5, seed=5)
        assert w.shape == (20, 5)
        for row in w:
            for t in range(len(row) - 1):
                cur, nxt = row[t], row[t + 1]
                if cur < 0 or nxt < 0:
                    continue
                assert (nxt, cur) in edges
    finally:
        split.shutdown()
        plain.shutdown()


def test_mode_pairs_two_key_path_beyond_31_bits():
    """Labels above 2^31 take the lexsort path — must agree with a
    pure-Python Counter oracle AND with the packed path on the same
    small-relabelled data."""
    from collections import Counter

    from python_graphblas_ray.state.superstep import _mode_pairs

    rng = np.random.default_rng(2)
    dstl = rng.integers(0, 50, 3000).astype(np.int64)
    big_base = np.int64(1) << np.int64(40)
    small = rng.integers(0, 97, 3000).astype(np.int64)
    big = small + big_base
    ud_b, ul_b, c_b = _mode_pairs(dstl, big)
    assert ul_b.max() >= big_base  # really exercised the big path
    oracle = Counter(zip(dstl.tolist(), big.tolist()))
    got = dict(zip(zip(ud_b.tolist(), ul_b.tolist()), c_b.tolist()))
    assert got == dict(oracle)
    # packed path on the small labels agrees after relabelling
    ud_s, ul_s, c_s = _mode_pairs(dstl, small)
    assert (ud_s == ud_b).all()
    assert (ul_s + big_base == ul_b).all()
    assert (c_s == c_b).all()


def test_lpa_unaffected_by_mode_pairs_swap():
    """Hub-split LPA via the driver pipeline still matches the plain
    engine (mode merges across split actors)."""
    from python_graphblas_ray.pipelines.algorithms import (
        label_propagation)

    split, plain, _ = _skewed_engines(seed=41)
    try:
        # undirected LPA needs symmetrized engines
        su = split.symmetrized()
        pu = plain.symmetrized()
        l1, i1, _ = label_propagation(su, itermax=4)
        l2, i2, _ = label_propagation(pu, itermax=4)
        assert i1 == i2
        assert (l1 == l2).all()
        su.shutdown()
        pu.shutdown()
    finally:
        split.shutdown()
        plain.shutdown()


def test_hub_split_inactor_pagerank_parity():
    """pagerank_inactor now runs on hub-split engines (leader-merge):
    same superstep count and rank vector as the unsplit engine and the
    pipeline driver."""
    from python_graphblas_ray.pipelines.algorithms import pagerank

    split, plain, _ = _skewed_engines(seed=51)
    try:
        r1, i1 = split.pagerank_inactor(tol=1e-10)
        r2, i2 = plain.pagerank_inactor(tol=1e-10)
        assert i1 == i2
        assert np.allclose(r1, r2, rtol=1e-12, atol=1e-15)
        r3, i3, _ = pagerank(split, tol=1e-10)
        assert i3 == i1
        assert np.allclose(r1, r3, rtol=1e-12, atol=1e-15)
        r4, _ = split.pagerank_inactor(tol=1e-10)
        assert (r1 == r4).all()  # deterministic
    finally:
        split.shutdown()
        plain.shutdown()


def test_hub_split_inactor_cc_and_lpa_parity():
    """FastSV and LPA in-actor on hub-split engines: min/count merges
    are order-free, so results are IDENTICAL to the unsplit engine."""
    split, plain, _ = _skewed_engines(seed=57)
    try:
        su = split.symmetrized()
        pu = plain.symmetrized()
        assert su.has_hub_split
        f1, it1 = su.connected_components_inactor()
        f2, it2 = pu.connected_components_inactor()
        assert it1 == it2
        assert (f1 == f2).all()
        l1, j1 = su.label_propagation_inactor(itermax=30)
        l2, j2 = pu.label_propagation_inactor(itermax=30)
        assert j1 == j2
        assert (l1 == l2).all()
        su.shutdown()
        pu.shutdown()
    finally:
        split.shutdown()
        plain.shutdown()


def test_hub_split_inactor_anf_parity():
    """ANF in-actor on hub-split engines: max/or register merges are
    idempotent, so per-level counts are bit-identical to unsplit, in
    both exact-bitset and HLL modes."""
    split, plain, _ = _skewed_engines(seed=63)
    try:
        e1 = split.anf_inactor(tmax=16, mode="exact")
        e2 = plain.anf_inactor(tmax=16, mode="exact")
        assert (e1 == e2).all()
        h1 = split.anf_inactor(tmax=16, mode="hll", b=6, seed=3)
        h2 = plain.anf_inactor(tmax=16, mode="hll", b=6, seed=3)
        assert len(h1) == len(h2)
        assert np.allclose(h1, h2, rtol=0, atol=0)
    finally:
        split.shutdown()
        plain.shutdown()


def test_vector_selectk_all_modes():
    """Vector.ss.selectk (reference core/ss/vector.py:1403): every mode
    against a numpy oracle on a 400-entry vector spread over blocks."""
    from python_graphblas_ray.core import GBVector

    rng = np.random.default_rng(8)
    vid = np.sort(rng.choice(5000, 400, replace=False)).astype(np.int64)
    val = rng.normal(size=400)
    v = GBVector.from_coo(vid, val, size=5000)
    k = 7

    def got(how, seed=0):
        i, x = v.ss.selectk(how, k, seed=seed).to_coo()
        return np.asarray(i), np.asarray(x)

    i, x = got("first")
    assert (i == vid[:k]).all() and np.allclose(x, val[:k])
    i, x = got("last")
    assert (np.sort(i) == vid[-k:]).all()
    i, x = got("smallest")
    assert set(x.tolist()) == set(np.sort(val)[:k].tolist())
    i, x = got("largest")
    assert set(x.tolist()) == set(np.sort(val)[-k:].tolist())
    # random: deterministic, seed-sensitive, k entries from the vector
    i1, x1 = got("random", seed=5)
    i2, x2 = got("random", seed=5)
    i3, _ = got("random", seed=6)
    assert (i1 == i2).all() and (x1 == x2).all()
    assert not np.array_equal(i1, i3)
    assert len(i1) == k and set(i1.tolist()) <= set(vid.tolist())
    # matches the direct knuth32 ranking oracle
    key = (vid.astype(np.uint64) + np.uint64(5))
    draw = ((key % np.uint64(2**32)) * np.uint64(2654435761)) \
        % np.uint64(2**32)
    want = vid[np.lexsort((vid, draw))[:k]]
    assert sorted(i1.tolist()) == sorted(want.tolist())


def test_vector_selectk_short_and_compactify():
    from python_graphblas_ray.core import GBVector

    v = GBVector.from_coo(np.array([3, 9, 40]),
                          np.array([5.0, -2.0, 7.0]), size=64)
    i, x = v.ss.selectk("smallest", 10).to_coo()
    assert len(i) == 3  # fewer entries than k keeps everything
    c = v.ss.compactify("largest", 2)
    ci, cx = c.to_coo()
    assert ci.tolist() == [0, 1]
    assert cx.tolist() == [7.0, 5.0]
    assert c.size == 2
    cfull = v.ss.compactify()  # k=None -> nvals, index order
    fi, fx = cfull.to_coo()
    assert fi.tolist() == [0, 1, 2]
    assert fx.tolist() == [5.0, -2.0, 7.0]


def test_vector_sort_and_permutation():
    """Vector.ss.sort (reference GxB sort): sorted values compacted to
    0..nvals-1 + permutation of original indices, ties by index."""
    from python_graphblas_ray.core import GBVector

    rng = np.random.default_rng(12)
    vid = np.sort(rng.choice(900, 120, replace=False)).astype(np.int64)
    val = rng.integers(0, 20, 120).astype(np.float64)  # many ties
    v = GBVector.from_coo(vid, val, size=900)
    w, p = v.ss.sort()
    wi, wv = w.to_coo()
    pi, pv = p.to_coo()
    assert (wi == np.arange(120)).all() and (pi == np.arange(120)).all()
    order = np.lexsort((vid, val))
    assert (wv == val[order]).all()
    assert (pv == vid[order]).all()
    # descending with index ties
    wd, pd_ = v.ss.sort(ascending=False)
    _, wdv = wd.to_coo()
    _, pdv = pd_.to_coo()
    order_d = np.lexsort((vid, -val))
    assert (wdv == val[order_d]).all()
    assert (pdv == vid[order_d]).all()
    # flags
    only_w, none_p = v.ss.sort(permutation=False)
    assert none_p is None and only_w is not None
    none_w, only_p = v.ss.sort(values=False)
    assert none_w is None and only_p is not None


def test_vector_split_concat_roundtrip_and_head():
    from python_graphblas_ray.core import GBVector
    from python_graphblas_ray.stages.perrow import vector_concat

    vid = np.array([1, 5, 12, 17, 23], dtype=np.int64)
    val = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    v = GBVector.from_coo(vid, val, size=24)
    parts = v.ss.split([10, 8, 6])
    assert [p.size for p in parts] == [10, 8, 6]
    i0, x0 = parts[0].to_coo()
    assert i0.tolist() == [1, 5] and x0.tolist() == [1.0, 2.0]
    i1, x1 = parts[1].to_coo()
    assert i1.tolist() == [2, 7]  # 12-10, 17-10
    back = vector_concat(parts)
    assert back.size == 24
    bi, bx = back.to_coo()
    assert bi.tolist() == vid.tolist() and bx.tolist() == val.tolist()
    hi, hx = v.ss.head(3, sort=True)
    assert hi.tolist() == [1, 5, 12] and hx.tolist() == [1.0, 2.0, 3.0]
    with pytest.raises(ValueError):
        v.ss.split([10, 8])  # doesn't sum to size


def test_compactify_reverse_and_asindex():
    """Reference compactify(reverse=, asindex=) signature parity for
    both Matrix and Vector."""
    from python_graphblas_ray.core import GBMatrix, GBVector

    A = GBMatrix.from_coo(np.array([0, 0, 0, 1, 1]),
                          np.array([2, 5, 9, 1, 4]),
                          np.array([30.0, 10.0, 20.0, 7.0, 3.0]),
                          nrows=2, ncols=16)
    # smallest k=2, asindex: values are ORIGINAL column indices
    C = A.ss.compactify("smallest", 2, asindex=True)
    r, c, v = C.to_coo()
    got = {(int(a), int(b)): int(x) for a, b, x in zip(r, c, v)}
    # row 0 smallest two: 10.0@5, 20.0@9 -> positions 0,1 with idx 5,9
    assert got[(0, 0)] == 5 and got[(0, 1)] == 9
    assert got[(1, 0)] == 4 and got[(1, 1)] == 1
    # reverse flips positions within the kept set
    Cr = A.ss.compactify("smallest", 2, reverse=True)
    r, c, v = Cr.to_coo()
    got = {(int(a), int(b)): float(x) for a, b, x in zip(r, c, v)}
    assert got[(0, 0)] == 20.0 and got[(0, 1)] == 10.0
    # vector variants
    vec = GBVector.from_coo(np.array([3, 9, 40]),
                            np.array([5.0, -2.0, 7.0]), size=64)
    ci, cv = vec.ss.compactify("largest", 2, asindex=True).to_coo()
    assert ci.tolist() == [0, 1] and cv.tolist() == [40, 3]
    ri, rv = vec.ss.compactify("largest", 2, reverse=True).to_coo()
    assert ri.tolist() == [0, 1] and rv.tolist() == [5.0, 7.0]


def test_ss_is_iso_and_metadata():
    from python_graphblas_ray.core import GBMatrix, GBVector

    A = GBMatrix.from_coo(np.array([0, 1, 2]), np.array([1, 2, 0]),
                          np.array([7.0, 7.0, 7.0]), nrows=4, ncols=4)
    assert A.ss.is_iso
    assert A.ss.iso_value.value == 7.0
    assert A.ss.format == "coo-dataset"
    assert A.ss.nbytes >= 0
    B = GBMatrix.from_coo(np.array([0, 1]), np.array([1, 2]),
                          np.array([7.0, 8.0]), nrows=4, ncols=4)
    assert not B.ss.is_iso
    with pytest.raises(ValueError):
        B.ss.iso_value
    v = GBVector.from_coo(np.array([2, 5]), np.array([3.0, 3.0]),
                          size=8)
    assert v.ss.is_iso and v.ss.iso_value.value == 3.0


def test_jaccard_dedup_groups_planted_clusters():
    """jaccard_dedup_groups: planted near-identical doc groups collapse
    to one cluster each, keep = smallest id, singletons self-keep."""
    from python_graphblas_ray.pipelines.corpus import jaccard_dedup_groups

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = []
    # group A: docs 0,1,2 near-identical (one word changed)
    docs.append((0, base))
    docs.append((1, base.replace("kappa", "lambda")))
    docs.append((2, base.replace("iota", "mu")))
    # group B: docs 3,4
    b2 = "one two three four five six seven eight nine ten"
    docs.append((3, b2))
    docs.append((4, b2.replace("ten", "eleven")))
    # singletons
    docs.append((5, "completely different words entirely here now"))
    docs.append((6, "unrelated content again nothing shared at all"))
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([s for _, s in docs], pa.string())})
    out = ray.data.from_arrow(t)
    res = pa.concat_tables(list(jaccard_dedup_groups(
        out, threshold=0.8).iter_batches(
            batch_format="pyarrow", batch_size=None))).to_pandas()
    res = res.sort_values("doc_id").reset_index(drop=True)
    assert res["cluster"].tolist() == [0, 0, 0, 3, 3, 5, 6]
    assert res["keep"].tolist() == [True, False, False, True, False,
                                    True, True]


def _rand_edges(seed, n, m):
    rng = np.random.default_rng(seed)
    s, d = rng.integers(0, n, m), rng.integers(0, n, m)
    k = s != d
    return pa.table({"src": s[k].astype(np.int64),
                     "dst": d[k].astype(np.int64)})


def test_add_edges_invalidates_gather_plan():
    """Regression: pagerank -> add_edges -> pagerank must equal a fresh
    engine over the union. Before the fix the slice-exchange gather
    plan survived the re-load and the second run read garbage (NaNs)."""
    from python_graphblas_ray.state.superstep import SuperstepEngine

    n = 100
    t1, t2 = _rand_edges(3, n, 600), _rand_edges(4, n, 600)
    eng = SuperstepEngine(ray.data.from_arrow(t1), n, num_partitions=4,
                          partition_mode="exchange",
                          hub_split_factor=None)
    eng.pagerank_inactor(tol=1e-10)  # builds the plan pre-update
    eng.add_edges(ray.data.from_arrow(t2))
    r_after, i_after = eng.pagerank_inactor(tol=1e-10)
    eng.shutdown()
    eng2 = SuperstepEngine(
        ray.data.from_arrow(pa.concat_tables([t1, t2])), n,
        num_partitions=4, partition_mode="exchange",
        hub_split_factor=None)
    r_truth, i_truth = eng2.pagerank_inactor(tol=1e-10)
    eng2.shutdown()
    assert i_after == i_truth
    assert np.allclose(r_after, r_truth, rtol=1e-9, atol=1e-12)
    assert not np.isnan(r_after).any()


def test_add_edges_on_hub_split_engine():
    """add_edges now works on hub-split engines: new edges of a split
    range land at the group leader; results equal a fresh engine over
    the union, and sampling offsets rebuild (no stale context)."""
    from python_graphblas_ray.state.superstep import SuperstepEngine

    split, plain, _ = _skewed_engines(seed=71)
    try:
        n = 200
        extra = _rand_edges(9, n, 800)
        split.add_edges(ray.data.from_arrow(extra))
        plain.add_edges(ray.data.from_arrow(extra))
        r1, i1 = split.pagerank_inactor(tol=1e-10)
        r2, i2 = plain.pagerank_inactor(tol=1e-10)
        assert i1 == i2
        assert np.allclose(r1, r2, rtol=1e-9, atol=1e-12)
        assert split.num_edges == plain.num_edges
        # sampling still valid post-update: full-coverage equivalence
        vids = np.arange(n, dtype=np.int64)
        vs, ns = split.sample_neighbors(vids, 10_000, seed=2)
        vp, npn = plain.sample_neighbors(vids, 10_000, seed=2)
        got, want = {}, {}
        for v, nb in zip(vs.tolist(), ns.tolist()):
            got.setdefault(v, []).append(nb)
        for v, nb in zip(vp.tolist(), npn.tolist()):
            want.setdefault(v, []).append(nb)
        assert set(got) == set(want)
        for v in want:
            assert sorted(got[v]) == sorted(want[v]), v
    finally:
        split.shutdown()
        plain.shutdown()
