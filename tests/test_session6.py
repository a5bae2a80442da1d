"""Session-6 operators vs independent pure-Python/numpy oracles:
per-user daily z-scores, CUSUM burst statistic, priority sampling
(Duffield-Lund-Thorup), degree rank correlation (Spearman), degree
Gini, and the simplified silhouette."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from python_graphblas_ray.pipelines.clustering import (
    silhouette_simplified,
)
from python_graphblas_ray.pipelines.linkpred import (
    degree_gini,
    degree_rank_correlation,
)
from python_graphblas_ray.pipelines.sampling import priority_sample
from python_graphblas_ray.pipelines.windows import daily_zscores, user_cusum
from python_graphblas_ray.stages.sketch import _hash64

DAY = 86_400_000_000


def _events(user, day):
    """Synthesize an events table with one row per (user, day) repeat."""
    u = np.asarray(user, dtype=np.int64)
    d = np.asarray(day, dtype=np.int64) * DAY
    return ray.data.from_arrow(pa.table({
        "user_id": u, "ts": pa.array(d, pa.timestamp("us"))}))


def _collect(ds):
    batches = [b for b in ds.iter_batches(batch_format="pyarrow",
                                          batch_size=None) if b.num_rows]
    return (pa.concat_tables(batches, promote_options="permissive")
            if batches else None)


# ---------------------------------------------------------------- zscore

def test_daily_zscores_hand_case():
    # user 1: counts 1, 3 over two days -> m=2, var=1, z = -1, +1
    # user 2: constant counts -> z = 0 on both days
    ds = _events([1, 1, 1, 1, 2, 2], [0, 1, 1, 1, 0, 5])
    t = _collect(daily_zscores(ds)).to_pandas().sort_values(
        ["user_id", "day"]).reset_index(drop=True)
    assert list(t["x"]) == [1, 3, 1, 1]
    assert np.allclose(t["z"], [-1.0, 1.0, 0.0, 0.0], atol=0, rtol=0)


def test_daily_zscores_matches_numpy_reference():
    rng = np.random.RandomState(7)
    user = rng.randint(0, 20, 500)
    day = rng.randint(0, 15, 500)
    t = _collect(daily_zscores(_events(user, day))).to_pandas()
    import collections
    cnt = collections.Counter(zip(user.tolist(), day.tolist()))
    assert len(t) == len(cnt)
    for _, row in t.sample(80, random_state=0).iterrows():
        u = int(row["user_id"])
        d = int(row["day"].value // 1000 // DAY)  # ns -> us -> day index
        xs = np.array([c for (uu, _), c in sorted(cnt.items())
                       if uu == u], dtype=np.int64)
        nd = len(xs)
        m = xs.sum().astype(np.float64) / nd
        var = (xs * xs).sum().astype(np.float64) / nd - m * m
        x = cnt[(u, d)]
        assert x == int(row["x"])
        want = 0.0 if var <= 0 else (x - m) / np.sqrt(var)
        assert row["z"] == want


# ----------------------------------------------------------------- cusum

def _cusum_ref(xs):
    """Pure-Python CUSUM over one user's ordered daily counts."""
    nd, sx = len(xs), sum(xs)
    d = 0
    runmin = 0
    best = 0
    first = True
    for x in xs:
        d += nd * x - sx - nd
        if first:
            runmin = d
            first = False
        runmin = min(runmin, d)
        best = max(best, d - runmin)
    return best / nd


def test_user_cusum_hand_and_random():
    # constant user: drift strictly negative, stat 0
    t = _collect(user_cusum(_events([1] * 4, [0, 1, 2, 3]))).to_pandas()
    assert t["cusum"].tolist() == [0.0]
    # burst user: quiet days then a spike
    ds = _events([2] * 7, [0, 1, 2, 3, 3, 3, 3])
    t = _collect(user_cusum(ds)).to_pandas()
    assert t["cusum"].tolist() == [_cusum_ref([1, 1, 1, 4])]
    rng = np.random.RandomState(11)
    user = rng.randint(0, 12, 400)
    day = rng.randint(0, 10, 400)
    t = _collect(user_cusum(_events(user, day))).to_pandas() \
        .set_index("user_id")["cusum"]
    import collections
    cnt = collections.Counter(zip(user.tolist(), day.tolist()))
    for u in np.unique(user):
        xs = [c for (uu, dd), c in sorted(cnt.items()) if uu == u]
        assert t.loc[u] == _cusum_ref(xs)


# ------------------------------------------------------- priority sample

def test_priority_sample_matches_reference_and_is_unbiasedish():
    rng = np.random.RandomState(3)
    user = rng.zipf(1.5, 2000) % 300
    ds = ray.data.from_arrow(pa.table({"user_id": user.astype(np.int64)}))
    k = 16
    t = priority_sample(ds, "user_id", k).to_pandas()
    # reference: exact DLT over the true counts
    import collections
    cnt = collections.Counter(user.tolist())
    keys = np.array(sorted(cnt), dtype=np.int64)
    w = np.array([cnt[int(x)] for x in keys], dtype=np.int64)
    h = _hash64(keys.astype(np.uint64))
    u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(2 ** 53)
    q = w / u
    order = np.lexsort((keys, -q))
    tau = q[order[k]] if len(order) > k else 0.0
    want_keys = keys[order[:k]]
    want_est = np.maximum(w[order[:k]].astype(np.float64), tau)
    assert t["user_id"].tolist() == want_keys.tolist()
    assert t["est"].tolist() == want_est.tolist()
    assert t["rank"].tolist() == list(range(1, k + 1))
    # the DLT estimator: expected subset sums are exact; the full-set
    # estimate should land within a loose factor of the truth
    assert 0.3 * len(user) < t["est"].sum() < 3.0 * len(user)


def test_priority_sample_small_population_tau_zero():
    ds = ray.data.from_arrow(pa.table(
        {"user_id": np.array([5, 5, 7], dtype=np.int64)}))
    t = priority_sample(ds, "user_id", 10).to_pandas()
    # fewer keys than k: tau = 0, estimates = exact weights
    assert sorted(t["user_id"].tolist()) == [5, 7]
    assert t.set_index("user_id")["est"].to_dict() == {5: 2.0, 7: 1.0}


# --------------------------------------------------- rank corr and gini

def _edges_ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64),
        "val": np.ones(len(src), dtype=np.float64)}))


def _rank_avg(vals):
    vals = np.asarray(vals)
    out = np.empty(len(vals), dtype=np.float64)
    for i, v in enumerate(vals):
        out[i] = (vals < v).sum() + ((vals == v).sum() + 1) / 2.0
    return out


def test_degree_rank_correlation_matches_scipy_style_reference():
    rng = np.random.RandomState(5)
    n = 40
    src = rng.randint(0, n, 300)
    dst = rng.randint(0, n, 300)
    got = degree_rank_correlation(_edges_ds(src, dst), n)
    E = set(zip(src.tolist(), dst.tolist()))
    od = np.zeros(n, dtype=np.int64)
    idg = np.zeros(n, dtype=np.int64)
    for a, b in E:
        od[a] += 1
        idg[b] += 1
    rx, ry = _rank_avg(od), _rank_avg(idg)
    want = np.corrcoef(rx, ry)[0, 1]
    assert got == pytest.approx(want, rel=1e-12)


def test_degree_rank_correlation_perfect_and_degenerate():
    # identical in/out structure -> +1
    src = [0, 1, 2, 0, 1, 2]
    dst = [1, 2, 0, 2, 0, 1]
    r = degree_rank_correlation(_edges_ds(src, dst), 4)
    # all degrees equal except vertex 3 (0, 0): still rank-identical
    assert r == pytest.approx(1.0)
    # empty graph: zero rank variance -> nan
    r = degree_rank_correlation(_edges_ds([], []), 4)
    assert r != r


def test_degree_gini_reference_and_extremes():
    # all edges from one hub out of n=8
    src = [0] * 5
    dst = [1, 2, 3, 4, 5]
    g = degree_gini(_edges_ds(src, dst), 8, "src")
    # sorted degrees: seven 0s then 5 -> Gini = (2*8*5)/(8*5) - 9/8
    assert g == pytest.approx((2.0 * 8 * 5) / (8 * 5) - 9.0 / 8)
    # perfectly uniform: every vertex out-degree 1 -> Gini 0... n=4 ring
    g = degree_gini(_edges_ds([0, 1, 2, 3], [1, 2, 3, 0]), 4, "src")
    assert g == pytest.approx(0.0)
    # no edges: defined as 0
    assert degree_gini(_edges_ds([], []), 4, "src") == 0.0


def test_degree_gini_matches_sorted_reference():
    rng = np.random.RandomState(9)
    n = 60
    src = rng.zipf(1.6, 400) % n
    dst = rng.randint(0, n, 400)
    g = degree_gini(_edges_ds(src, dst), n, "src")
    E = set(zip(src.tolist(), dst.tolist()))
    od = np.zeros(n, dtype=np.int64)
    for a, _ in E:
        od[a] += 1
    x = np.sort(od)
    i = np.arange(1, n + 1)
    want = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
    assert g == pytest.approx(want, rel=1e-12)


# ------------------------------------------------------------ silhouette

def test_silhouette_simplified_matches_numpy_reference():
    rng = np.random.RandomState(2)
    m = rng.randn(200, 16)
    cents = rng.randn(5, 16)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(200, dtype=np.int64),
        "embedding": [row.tolist() for row in m]}))
    t = _collect(silhouette_simplified(ds, cents)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    own = d2.argmin(1)
    a = np.sqrt(d2[np.arange(200), own])
    d2[np.arange(200), own] = np.inf
    b = np.sqrt(d2.min(1))
    s = (b - a) / np.maximum(a, b)
    assert t["cluster"].tolist() == own.tolist()
    assert np.allclose(t["sil"], s, atol=0, rtol=0)
    # silhouette is bounded
    assert (t["sil"] <= 1.0).all() and (t["sil"] >= -1.0).all()


def test_silhouette_vector_on_its_centroid():
    cents = np.array([[0.0, 0.0], [10.0, 0.0]])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.array([0, 1], dtype=np.int64),
        "embedding": [[0.0, 0.0], [4.0, 0.0]]}))
    t = _collect(silhouette_simplified(ds, cents)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # exactly on centroid 0: a=0, b=10 -> s=1
    assert t["sil"][0] == 1.0
    # 4.0: a=4, b=6 -> s=(6-4)/6
    assert t["sil"][1] == pytest.approx((6 - 4) / 6, rel=1e-12)
    assert t["cluster"].tolist() == [0, 0]


# ------------------------------------------------ scan / pack / entropy

def test_ordered_prefix_sum_partition_invariant():
    from python_graphblas_ray.stages.exchange import ordered_prefix_sum
    rng = np.random.RandomState(4)
    ids = rng.permutation(3000).astype(np.int64)
    vals = rng.randint(0, 50, 3000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": ids, "v": vals})) \
        .repartition(7)
    order = np.argsort(ids)
    want = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
    for P in (1, 4, 32):
        t = _collect(ordered_prefix_sum(ds, "k", "v",
                                        num_partitions=P)).to_pandas() \
            .sort_values("k")
        assert (t["offset"].to_numpy() == want).all()


def test_ordered_prefix_sum_rejects_duplicate_keys():
    from python_graphblas_ray.stages.exchange import ordered_prefix_sum
    ds = ray.data.from_arrow(pa.table(
        {"k": np.array([1, 1, 2], dtype=np.int64),
         "v": np.array([5, 5, 5], dtype=np.int64)}))
    with pytest.raises(Exception, match="duplicate"):
        _collect(ordered_prefix_sum(ds, "k", "v", num_partitions=2))


def test_pack_offsets_layout():
    from python_graphblas_ray.stages.text import pack_offsets
    texts = ["a b c", "", "d " * 300, "e f"]  # 3, 0, 300, 2 tokens
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    t = _collect(pack_offsets(ds, budget=256)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # empty doc 1 emits no row; offsets are the running token layout
    assert t["doc_id"].tolist() == [0, 2, 3]
    assert t["offset"].tolist() == [0, 3, 303]
    assert t["first_seq"].tolist() == [0, 0, 1]
    # doc 2 spans tokens [3, 303) -> sequences 0 and 1
    assert t["last_seq"].tolist() == [0, 1, 1]


def test_user_entropy_reference():
    from python_graphblas_ray.pipelines.windows import user_entropy
    import collections
    import math
    rng = np.random.RandomState(6)
    user = rng.randint(0, 10, 300)
    types = np.array(["a", "b", "c", "d"])[rng.randint(0, 4, 300)]
    ds = ray.data.from_arrow(pa.table({
        "user_id": user.astype(np.int64),
        "event_type": types}))
    t = _collect(user_entropy(ds)).to_pandas().set_index("user_id")
    cnt = collections.Counter(zip(user.tolist(), types.tolist()))
    for u in np.unique(user):
        cs = [c for (uu, _), c in cnt.items() if uu == u]
        n = sum(cs)
        want = sum(-(c / n) * math.log(c / n) for c in sorted(cs))
        assert t.loc[int(u), "entropy"] == pytest.approx(want, abs=2e-8)
    # single-type user is exactly 0.0
    ds1 = ray.data.from_arrow(pa.table({
        "user_id": np.array([9, 9], dtype=np.int64),
        "event_type": ["x", "x"]}))
    t1 = _collect(user_entropy(ds1)).to_pandas()
    assert t1["entropy"].tolist() == [0.0]


# ------------------------------------------------------ grouped quantile

def test_grouped_quantile_disc_convention():
    from python_graphblas_ray.stages.reduce import grouped_quantile
    # quantile_disc semantics: element at ceil(q*n) - 1 of the sorted
    # group; verified against DuckDB's convention (n=1..5 probe)
    ds = ray.data.from_arrow(pa.table({
        "g": ["a"] * 4 + ["b"] * 5 + ["c"],
        "v": np.array([4.0, 1.0, 3.0, 2.0,
                       50.0, 10.0, 40.0, 20.0, 30.0, 7.0])}))
    for q, want in ((0.5, {"a": 2.0, "b": 30.0, "c": 7.0}),
                    (0.25, {"a": 1.0, "b": 20.0, "c": 7.0}),
                    (0.9, {"a": 4.0, "b": 50.0, "c": 7.0})):
        t = _collect(grouped_quantile(ds, ["g"], "v", q=q)).to_pandas()
        assert dict(zip(t["g"], t["qval"])) == want


def test_grouped_quantile_multikey_and_partition_invariance():
    from python_graphblas_ray.stages.reduce import grouped_quantile
    rng = np.random.RandomState(8)
    g1 = rng.randint(0, 6, 400).astype(np.int64)
    g2 = rng.randint(0, 3, 400).astype(np.int64)
    v = rng.randn(400)
    ds = ray.data.from_arrow(pa.table({"g1": g1, "g2": g2, "v": v})) \
        .repartition(9)
    import collections
    groups = collections.defaultdict(list)
    for a, b, x in zip(g1, g2, v):
        groups[(a, b)].append(x)
    want = {k: sorted(xs)[int(np.ceil(0.5 * len(xs))) - 1]
            for k, xs in groups.items()}
    for P in (2, 16):
        t = _collect(grouped_quantile(ds, ["g1", "g2"], "v", q=0.5,
                                      num_partitions=P)).to_pandas()
        got = {(a, b): x for a, b, x in zip(t["g1"], t["g2"], t["qval"])}
        assert got == want
