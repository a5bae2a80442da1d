"""Session-8 operators: sweep-line peak concurrency, session-size
histogram, TPC-H Q5-style region revenue, Zipf slope."""
import numpy as np
import pyarrow as pa
import pytest
import ray

MIN = 60_000_000


# ------------------------------------------------ peak concurrency

def test_peak_concurrency_hand_case():
    from python_graphblas_ray.pipelines.windows import peak_concurrency

    # type a: events at minutes 0/10/20 (30-min dur) -> all 3 overlap
    # in [20, 30); type b: two events 100 min apart -> peak 1, first
    # peak bucket is minute 0
    ts = np.array([0, 10, 20, 0, 100], dtype=np.int64) * MIN
    ds = ray.data.from_arrow(pa.table({
        "event_type": ["a", "a", "a", "b", "b"],
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(3)
    t = peak_concurrency(ds).to_pandas().set_index("event_type")
    assert t.loc["a", "peak"] == 3
    assert t.loc["a", "peak_ts"].value == 20 * MIN * 1000
    assert t.loc["b", "peak"] == 1
    assert t.loc["b", "peak_ts"].value == 0

    # half-open: an interval ending at minute 30 does NOT overlap one
    # starting at minute 30
    ts2 = np.array([0, 30], dtype=np.int64) * MIN
    ds2 = ray.data.from_arrow(pa.table({
        "event_type": ["a", "a"],
        "ts": pa.array(ts2, pa.timestamp("us"))}))
    t2 = peak_concurrency(ds2).to_pandas()
    assert t2["peak"].iloc[0] == 1

    # empty input keeps schema
    t3 = peak_concurrency(ray.data.from_arrow(pa.table({
        "event_type": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us"))})))
    assert t3.num_rows == 0
    assert t3.column_names == ["event_type", "peak_ts", "peak"]


def test_peak_concurrency_brute_force():
    from python_graphblas_ray.pipelines.windows import peak_concurrency

    rng = np.random.RandomState(7)
    n = 2000
    ts = rng.randint(0, 600, n).astype(np.int64) * MIN \
        + rng.randint(0, MIN, n)
    ty = np.array(["x", "y", "z"])[rng.randint(0, 3, n)]
    ds = ray.data.from_arrow(pa.table({
        "event_type": ty.tolist(),
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(5)
    got = peak_concurrency(ds).to_pandas().set_index("event_type")
    for tt in "xyz":
        m = ts[ty == tt] // MIN
        grid = np.zeros(700, dtype=np.int64)
        for mm in m:
            grid[mm:mm + 30] += 1
        pk = grid.max()
        first = np.flatnonzero(grid == pk)[0]
        assert got.loc[tt, "peak"] == pk
        assert got.loc[tt, "peak_ts"].value == first * MIN * 1000


# ------------------------------------------- session-size histogram

def test_session_size_histogram_parity():
    from python_graphblas_ray.pipelines.windows import sessionize
    from python_graphblas_ray.stages.reduce import grouped_agg

    rng = np.random.RandomState(5)
    n = 4000
    users = rng.randint(0, 60, n).astype(np.int64)
    ts = np.sort(rng.randint(0, 86_400_000_000 * 3, n)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "user_id": users,
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(7)
    s = sessionize(ds)
    h = grouped_agg(s, ["n_events"], [("n_events", "count", "n_sessions")])
    got = {int(r["n_events"]): int(r["n_sessions"])
           for r in h.take_all()}
    # pandas reference
    import pandas as pd
    df = pd.DataFrame({"u": users, "t": ts}).sort_values(["u", "t"])
    gap = 30 * 60 * 1_000_000
    new = (df["u"].ne(df["u"].shift())
           | (df["t"] - df["t"].shift() > gap))
    sizes = df.groupby(new.cumsum()).size()
    want = sizes.value_counts().to_dict()
    assert got == {int(k): int(v) for k, v in want.items()}


# ------------------------------------------------- zipf slope

def test_zipf_slope_reference():
    from python_graphblas_ray.stages.text import zipf_slope

    # craft exact counts: term_k appears k times (k = 1..50)
    docs = []
    for k in range(1, 51):
        docs.append(" ".join([f"w{k:03d}"] * k))
    ds = ray.data.from_items([{"text": d} for d in docs]).repartition(4)
    t = zipf_slope(ds, top_n=100).to_pandas()
    assert int(t["n_terms"].iloc[0]) == 50
    # numpy reference: counts sorted desc = 50..1, ranks 1..50
    c = np.arange(50, 0, -1, dtype=np.float64)
    x = np.log(np.arange(1, 51, dtype=np.float64))
    y = np.log(c)
    n = 50.0
    want = (n * np.sum(x * y) - np.sum(x) * np.sum(y)) / (
        n * np.sum(x * x) - np.sum(x) ** 2)
    assert t["slope"].iloc[0] == pytest.approx(want, abs=1e-10)

    # top_n cut: only the top 10 terms enter the fit
    t10 = zipf_slope(ds, top_n=10).to_pandas()
    c10 = np.arange(50, 40, -1, dtype=np.float64)
    x10 = np.log(np.arange(1, 11, dtype=np.float64))
    y10 = np.log(c10)
    want10 = (10 * np.sum(x10 * y10) - np.sum(x10) * np.sum(y10)) / (
        10 * np.sum(x10 * x10) - np.sum(x10) ** 2)
    assert t10["slope"].iloc[0] == pytest.approx(want10, abs=1e-10)

    # degenerate: single term pins 0.0; empty corpus pins (0, 0.0)
    ds1 = ray.data.from_items([{"text": "a a a"}])
    t1 = zipf_slope(ds1).to_pandas()
    assert int(t1["n_terms"].iloc[0]) == 1 and t1["slope"].iloc[0] == 0.0
    ds0 = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    t0 = zipf_slope(ds0).to_pandas()
    assert int(t0["n_terms"].iloc[0]) == 0 and t0["slope"].iloc[0] == 0.0


# ------------------------------------------------ region revenue

def test_region_revenue_pandas_parity(tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq
    from __ray_entry__ import _q_region_revenue

    rng = np.random.RandomState(9)
    nl = 500
    li = pd.DataFrame({
        "l_orderkey": rng.randint(0, 120, nl).astype(np.int64),
        "l_suppkey": rng.randint(0, 20, nl).astype(np.int64),
        "l_extendedprice": np.round(rng.rand(nl) * 1000, 2),
        "l_discount": np.round(rng.rand(nl) * 0.1, 2)})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(120, dtype=np.int64),
        "o_custkey": rng.randint(0, 40, 120).astype(np.int64)})
    cust = pd.DataFrame({
        "c_custkey": np.arange(40, dtype=np.int64),
        "c_nationkey": rng.randint(0, 5, 40).astype(np.int64)})
    supp = pd.DataFrame({
        "s_suppkey": np.arange(20, dtype=np.int64),
        "s_nationkey": rng.randint(0, 5, 20).astype(np.int64)})
    nation = pd.DataFrame({
        "n_nationkey": np.arange(5, dtype=np.int64),
        "n_name": [f"NAT{i}" for i in range(5)],
        "n_regionkey": np.array([0, 0, 1, 1, 1], dtype=np.int64)})
    region = pd.DataFrame({
        "r_regionkey": np.arange(2, dtype=np.int64),
        "r_name": ["EAST", "WEST"]})
    for name, df in [("lineitem", li), ("orders", orders),
                     ("customer", cust), ("supplier", supp),
                     ("nation", nation), ("region", region)]:
        pq.write_table(pa.Table.from_pandas(df), tmp_path / f"{name}.parquet")
    got = _q_region_revenue(str(tmp_path)).to_pandas().sort_values(
        ["region", "nation"]).reset_index(drop=True)
    # pandas reference with the same integer basis
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j = j.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    j = j[j.c_nationkey == j.s_nationkey].copy()
    j["rev"] = (np.floor(j.l_extendedprice * 100 + 0.5).astype(np.int64)
                * (100 - np.floor(j.l_discount * 100 + 0.5).astype(np.int64)))
    w = j.groupby("c_nationkey")["rev"].sum().reset_index()
    w = w.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    w = w.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    want = w[["r_name", "n_name", "rev"]].rename(columns={
        "r_name": "region", "n_name": "nation"}).sort_values(
        ["region", "nation"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------ inter-arrival gaps

def test_inter_arrival_gaps_pandas_parity():
    from python_graphblas_ray.pipelines.windows import inter_arrival_gaps

    rng = np.random.RandomState(3)
    n = 3000
    users = rng.randint(0, 50, n).astype(np.int64)
    ts = rng.randint(0, 10**9, n).astype(np.int64)
    ty = np.array(["a", "b", "c"])[rng.randint(0, 3, n)]
    eid = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "user_id": users, "event_id": eid,
        "event_type": ty.tolist(),
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(6)
    got = inter_arrival_gaps(ds).to_pandas()
    import pandas as pd
    df = pd.DataFrame({"u": users, "t": ts, "ty": ty, "e": eid})
    df = df.sort_values(["u", "t", "e"])
    gaps = df.groupby("u")["t"].diff()
    ref = df[gaps.notna()].assign(gap=gaps.dropna().astype(np.int64))
    want = ref.groupby("ty")["gap"].agg(["count", "sum"])
    g = got.groupby("event_type")["gap_us"].agg(["count", "sum"])
    assert g.to_dict() == want.to_dict()
    # exact multiset per type
    for t in "abc":
        a = np.sort(got[got.event_type == t]["gap_us"].to_numpy())
        b = np.sort(ref[ref.ty == t]["gap"].to_numpy())
        assert np.array_equal(a, b)


# ------------------------------------------------ davies-bouldin

def test_davies_bouldin_numpy_parity():
    from python_graphblas_ray.pipelines.clustering import davies_bouldin

    rng = np.random.RandomState(2)
    k, d = 4, 8
    cents = rng.randn(k, d) * 5
    pts = np.concatenate([cents[i] + 0.3 * rng.randn(200, d)
                          for i in range(k)])
    ids = np.arange(len(pts), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(pts), pa.list_(pa.float64()))})
    ).repartition(5)
    got = davies_bouldin(ds, cents).to_pandas().set_index("cluster")
    # numpy reference
    d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
    own = np.argmin(d2, axis=1)
    dist = np.sqrt(d2[np.arange(len(pts)), own])
    s = np.array([dist[own == i].mean() for i in range(k)])
    dm = np.sqrt(((cents[:, None] - cents[None, :]) ** 2).sum(-1))
    for i in range(k):
        r = max((s[i] + s[j]) / dm[i, j] for j in range(k) if j != i)
        assert got.loc[i, "r"] == pytest.approx(r, abs=1e-9)
        assert got.loc[i, "n"] == int((own == i).sum())
    # empty corpus keeps schema
    e = davies_bouldin(ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))})), cents)
    assert e.num_rows == 0 and e.column_names == ["cluster", "n", "r"]


# ------------------------------------------------ bipartite check

def _mk_engine_und(src, dst, n):
    from python_graphblas_ray.pipelines.algorithms import build_engine
    ds = ray.data.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64),
        "val": np.ones(len(src), dtype=np.float64)}))
    return ds, build_engine(ds, n, num_partitions=2, undirected=True,
                            weighted=True)


def test_bipartite_check_hand_cases():
    from python_graphblas_ray.pipelines.algorithms import (
        bipartite_check, connected_components)
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    # C4 (bipartite) on 0-3 plus C5 (odd cycle) on 4-8, plus isolated 9
    src = [0, 1, 2, 3, 4, 5, 6, 7, 8]
    dst = [1, 2, 3, 0, 5, 6, 7, 8, 4]
    n = 10
    ds, eng = _mk_engine_und(src, dst, n)
    try:
        comp, _, _ = connected_components(eng)
        A = simple_undirected(ds, n)
        t = bipartite_check(eng, A, comp).to_pandas().set_index("comp")
    finally:
        eng.shutdown()
    assert t.loc[0, "n"] == 4 and t.loc[0, "n_conflicts"] == 0
    assert t.loc[4, "n"] == 5 and t.loc[4, "n_conflicts"] == 1
    assert t.loc[9, "n"] == 1 and t.loc[9, "n_conflicts"] == 0

    # triangle: one odd cycle, exactly one equal-parity edge
    src2, dst2 = [0, 1, 2], [1, 2, 0]
    ds2, eng2 = _mk_engine_und(src2, dst2, 3)
    try:
        comp2, _, _ = connected_components(eng2)
        A2 = simple_undirected(ds2, 3)
        t2 = bipartite_check(eng2, A2, comp2).to_pandas()
    finally:
        eng2.shutdown()
    assert t2["n_conflicts"].tolist() == [1]


# ------------------------------------------- condensation longest path

def test_condensation_longest_path_hand_case():
    from python_graphblas_ray.pipelines.algorithms import (
        condensation_longest_path)

    # two 2-cycles chained to a sink: {0,1} -> {2,3} -> {4};
    # depths: comp0=0, comp2=1, comp4=2; isolated 5 stays 0
    src = [0, 1, 1, 2, 3, 3]
    dst = [1, 0, 2, 3, 2, 4]
    comp = np.array([0, 0, 2, 2, 4, 5], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "src": np.array(src, dtype=np.int64),
        "dst": np.array(dst, dtype=np.int64)})).repartition(3)
    t = condensation_longest_path(ds, comp).to_pandas().set_index("comp")
    assert t.loc[0, "depth"] == 0
    assert t.loc[2, "depth"] == 1
    assert t.loc[4, "depth"] == 2
    assert t.loc[5, "depth"] == 0

    # empty graph
    e = condensation_longest_path(
        ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64())})),
        np.array([], dtype=np.int64))
    assert e.num_rows == 0 and e.column_names == ["comp", "depth"]


def test_condensation_longest_path_random_vs_networkx_free_dp():
    from python_graphblas_ray.pipelines.algorithms import (
        condensation_longest_path)

    # random DAG over 40 nodes (edges only low->high, comp = identity
    # so the condensation IS the graph); reference = topological DP
    rng = np.random.RandomState(13)
    n = 40
    a = rng.randint(0, n, 300)
    b = rng.randint(0, n, 300)
    keep = a < b
    a, b = a[keep], b[keep]
    comp = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "src": a.astype(np.int64),
        "dst": b.astype(np.int64)})).repartition(4)
    t = condensation_longest_path(ds, comp).to_pandas().set_index("comp")
    depth = np.zeros(n, dtype=np.int64)
    for v in range(n):  # nodes already in topological (ascending) order
        for x, y in zip(a, b):
            if y == v:
                depth[v] = max(depth[v], depth[x] + 1)
    for v in range(n):
        assert t.loc[v, "depth"] == depth[v]
