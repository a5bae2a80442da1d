"""Session-9 operators: daily autocorrelation, Calinski-Harabasz,
Heaps'-law fit, contingency chi-square, and the TPC-H Q13/Q14 family."""
import numpy as np
import pyarrow as pa
import pytest
import ray

DAY = 86_400_000_000


# ------------------------------------------------ daily autocorrelation

def _np_autocorr(x, lag):
    m = len(x) - lag
    a, b = x[:m].astype(np.int64), x[lag:].astype(np.int64)
    sa, sb = a.sum(), b.sum()
    da = m * (a * a).sum() - sa * sa
    db = m * (b * b).sum() - sb * sb
    if da <= 0 or db <= 0:
        return 0.0
    return float(np.float64(m * (a * b).sum() - sa * sb)
                 / (np.sqrt(np.float64(da)) * np.sqrt(np.float64(db))))


def test_daily_autocorrelation_parity():
    from python_graphblas_ray.pipelines.windows import (
        daily_autocorrelation)

    rng = np.random.RandomState(3)
    # 40-day span with gaps (days 12-14 silent -> zeros in the grid)
    days = np.concatenate([rng.randint(0, 12, 300),
                           rng.randint(15, 40, 500)]).astype(np.int64)
    ts = days * DAY + rng.randint(0, DAY, len(days))
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(5)
    got = daily_autocorrelation(ds, max_lag=7).to_pandas()
    grid = np.bincount(days - days.min(), minlength=40)
    assert len(got) == 7
    for _, row in got.iterrows():
        lag = int(row["lag"])
        assert row["n"] == len(grid) - lag
        assert row["ac"] == _np_autocorr(grid, lag), lag


def test_daily_autocorrelation_perfect_and_degenerate():
    from python_graphblas_ray.pipelines.windows import (
        daily_autocorrelation)

    # constant series -> zero variance -> pinned 0.0
    ts = np.repeat(np.arange(10, dtype=np.int64) * DAY, 3)
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array(ts, pa.timestamp("us"))}))
    got = daily_autocorrelation(ds, max_lag=3).to_pandas()
    assert (got["ac"] == 0.0).all()

    # period-2 alternation: lag-2 correlation is exactly 1
    days = np.arange(20, dtype=np.int64)
    counts = np.where(days % 2 == 0, 3, 1)
    ts2 = np.repeat(days * DAY, counts)
    ds2 = ray.data.from_arrow(pa.table({
        "ts": pa.array(ts2, pa.timestamp("us"))}))
    got2 = daily_autocorrelation(ds2, max_lag=2).to_pandas()
    assert got2.set_index("lag").loc[2, "ac"] == pytest.approx(1.0)
    assert got2.set_index("lag").loc[1, "ac"] < 0

    # short span: lags with <2 pairs emit no row
    ts3 = np.array([0, DAY, 2 * DAY], dtype=np.int64)
    got3 = daily_autocorrelation(ray.data.from_arrow(pa.table({
        "ts": pa.array(ts3, pa.timestamp("us"))})), max_lag=7)
    assert got3.num_rows == 1  # only lag 1 has >= 2 pairs

    # empty input keeps schema, 0 rows
    got4 = daily_autocorrelation(ray.data.from_arrow(pa.table({
        "ts": pa.array([], pa.timestamp("us"))})), max_lag=7)
    assert got4.num_rows == 0
    assert got4.column_names == ["lag", "n", "ac"]


# ------------------------------------------------ Calinski-Harabasz

def test_calinski_harabasz_parity():
    from python_graphblas_ray.pipelines.clustering import (
        calinski_harabasz)

    rng = np.random.RandomState(5)
    k, d = 4, 8
    cents = rng.randn(k, d) * 4
    x = np.vstack([cents[i] + rng.randn(60, d) * 0.5 for i in range(k)])
    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array(list(x.astype(np.float32)),
                              pa.list_(pa.float32()))})).repartition(4)
    got = calinski_harabasz(ds, cents).to_pandas()
    # numpy reference with the same assignment contract
    xf = x.astype(np.float32).astype(np.float64)
    d2 = ((xf[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
    own = np.argmin(d2, axis=1)
    n = np.bincount(own, minlength=k)
    W = d2[np.arange(len(xf)), own].sum()
    cbar = (n[:, None] * cents).sum(axis=0) / n.sum()
    B = (n * ((cents - cbar) ** 2).sum(axis=1)).sum()
    want = (B * (len(xf) - k)) / (W * (k - 1))
    assert got["k"].iloc[0] == k
    assert got["n"].iloc[0] == len(xf)
    assert got["ch"].iloc[0] == pytest.approx(want, rel=1e-12)
    # well-separated planted blobs score high
    assert got["ch"].iloc[0] > 50


def test_calinski_harabasz_degenerate():
    from python_graphblas_ray.pipelines.clustering import (
        calinski_harabasz)

    # all points identical on one centroid -> W = 0 -> pinned 0.0
    x = np.zeros((10, 4), dtype=np.float32)
    cents = np.vstack([np.zeros(4), np.ones(4)])
    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array(list(x), pa.list_(pa.float32()))}))
    got = calinski_harabasz(ds, cents).to_pandas()
    assert got["ch"].iloc[0] == 0.0
    assert got["k"].iloc[0] == 1  # only one live cluster

    # empty corpus -> 0 rows with schema
    e = calinski_harabasz(ray.data.from_arrow(pa.table({
        "embedding": pa.array([], pa.list_(pa.float32()))})), cents)
    assert e.num_rows == 0
    assert e.column_names == ["k", "n", "ch"]


# ------------------------------------------------ Heaps-law fit

def test_heaps_fit_hand_case():
    from python_graphblas_ray.stages.text import heaps_fit

    # 8 docs, ids 0..7, doc i introduces exactly one new word and
    # repeats word "the": T grows by 2/doc, V by 1 (+1 for "the" at 0)
    docs = [f"the w{i}" for i in range(8)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(8, dtype=np.int64)),
        "text": docs})).repartition(3)
    t = heaps_fit(ds, n_checkpoints=4).to_pandas()
    assert len(t) == 4
    # thresholds (7*(i+1))//4 = 1, 3, 5, 7 -> 2/4/6/8 docs
    assert t["tokens"].tolist() == [4, 8, 12, 16]
    assert t["vocab"].tolist() == [3, 5, 7, 9]
    # beta matches the numpy fit
    x, y = np.log(t["tokens"].to_numpy(dtype=float)), \
        np.log(t["vocab"].to_numpy(dtype=float))
    m = 4
    want = (m * (x * y).sum() - x.sum() * y.sum()) \
        / (m * (x * x).sum() - x.sum() ** 2)
    assert t["beta"].iloc[0] == pytest.approx(want, rel=1e-12)
    assert (t["beta"] == t["beta"].iloc[0]).all()


def test_heaps_fit_degenerates():
    from python_graphblas_ray.stages.text import heaps_fit

    # empty corpus -> 0 rows
    e = heaps_fit(ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())})))
    assert e.num_rows == 0

    # all-null text: 16 rows of zeros, beta pinned 0.0
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 5, 9], pa.int64()),
        "text": pa.array([None, None, None], pa.string())}))
    t = heaps_fit(ds).to_pandas()
    assert len(t) == 16
    assert (t["tokens"] == 0).all() and (t["vocab"] == 0).all()
    assert (t["beta"] == 0.0).all()

    # single doc id 0: all thresholds 0, everything lands in ck 0
    one = heaps_fit(ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": ["a b a"]}))).to_pandas()
    assert one["tokens"].tolist() == [3] * 16
    assert one["vocab"].tolist() == [2] * 16
    assert (one["beta"] == 0.0).all()  # zero x-variance


# ------------------------------------------------ contingency chi-square

def test_contingency_chisq_parity():
    from python_graphblas_ray.pipelines.windows import contingency_chisq

    rng = np.random.RandomState(11)
    a = np.array(["en", "de", "fr"])[rng.randint(0, 3, 5000)]
    # make b DEPENDENT on a so chi2 is large
    b = np.where(a == "en",
                 np.array(["s1", "s2"])[rng.randint(0, 2, 5000)],
                 np.array(["s2", "s3"])[rng.randint(0, 2, 5000)])
    ds = ray.data.from_arrow(pa.table({
        "lang": a.tolist(), "source": b.tolist()})).repartition(6)
    got = contingency_chisq(ds, "lang", "source").to_pandas()
    # scipy-free reference
    import pandas as pd
    O = pd.crosstab(pd.Series(a), pd.Series(b)).to_numpy()
    r, c = O.sum(1), O.sum(0)
    e = r[:, None] * c[None, :] / O.sum()
    want = (((O - e) ** 2) / e).sum()
    assert got["dof"].iloc[0] == (O.shape[0] - 1) * (O.shape[1] - 1)
    assert got["n"].iloc[0] == 5000
    assert got["chi2"].iloc[0] == pytest.approx(want, rel=1e-12)
    assert got["chi2"].iloc[0] > 100  # dependence detected

    # independent uniform -> chi2 small (sanity, not a sharp bound)
    b2 = np.array(["s1", "s2"])[rng.randint(0, 2, 5000)]
    ds2 = ray.data.from_arrow(pa.table({
        "lang": a.tolist(), "source": b2.tolist()}))
    small = contingency_chisq(ds2, "lang", "source").to_pandas()
    assert small["chi2"].iloc[0] < 20

    # empty -> 0 rows
    e0 = contingency_chisq(ray.data.from_arrow(pa.table({
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string())})), "lang", "source")
    assert e0.num_rows == 0


# ------------------------------------------------ TPC-H family parity

def test_custdist_promo_pandas_parity(tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    nc, no = 120, 400
    cust = pa.table({"c_custkey": np.arange(nc, dtype=np.int64),
                     "c_name": [f"c{i}" for i in range(nc)],
                     "c_nationkey": np.zeros(nc, dtype=np.int32),
                     "c_acctbal": np.zeros(nc),
                     "c_mktsegment": ["A"] * nc})
    # custkeys skewed + some dangling (>= nc)
    ok = np.concatenate([rng.randint(0, 60, no - 20),
                         rng.randint(nc, nc + 5, 20)]).astype(np.int64)
    orders = pa.table({
        "o_orderkey": np.arange(no, dtype=np.int64),
        "o_custkey": ok,
        "o_orderstatus": ["O"] * no,
        "o_totalprice": np.zeros(no),
        "o_orderdate": pa.array(np.zeros(no, np.int64),
                                pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * no})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(cust, d / "customer.parquet")
    pq.write_table(orders, d / "orders.parquet")

    import __ray_entry__ as em
    got = em._q_custdist(str(d)).to_pandas() \
        .sort_values("c_count").reset_index(drop=True)
    oc = pd.Series(ok[ok < nc]).value_counts()
    full = np.zeros(nc, dtype=np.int64)
    full[oc.index.to_numpy()] = oc.to_numpy()
    want = pd.Series(full).value_counts().sort_index()
    assert got["c_count"].tolist() == want.index.tolist()
    assert got["n_custs"].tolist() == want.tolist()


# ------------------------------------------------ JS source divergence

def test_js_source_divergence_parity():
    from python_graphblas_ray.stages.text import js_source_divergence

    rng = np.random.RandomState(13)
    vocab_a = [f"wa{i}" for i in range(30)]
    vocab_b = [f"wb{i}" for i in range(30)]
    shared = [f"ws{i}" for i in range(20)]
    docs, srcs = [], []
    for _ in range(120):
        docs.append(" ".join(rng.choice(vocab_a + shared, 20)))
        srcs.append("sA")
    for _ in range(100):
        docs.append(" ".join(rng.choice(vocab_b + shared, 25)))
        srcs.append("sB")
    for _ in range(80):
        docs.append(" ".join(rng.choice(shared, 15)))
        srcs.append("sC")
    ds = ray.data.from_arrow(pa.table({
        "source": srcs, "text": docs})).repartition(5)
    got = js_source_divergence(ds).to_pandas().set_index(["sa", "sb"])

    # numpy reference over the full vocabulary
    import pandas as pd
    rows = []
    for s, t in zip(srcs, docs):
        for w in t.split():
            rows.append((s, w))
    df = pd.DataFrame(rows, columns=["s", "w"])
    ct = df.groupby(["s", "w"]).size().unstack(fill_value=0)
    P = ct.div(ct.sum(axis=1), axis=0)

    def js(p, q):
        m = (p + q)
        ta = np.where(p > 0, p * np.log(2.0 * p / m), 0.0)
        tb = np.where(q > 0, q * np.log(2.0 * q / m), 0.0)
        return (0.5 * (ta + tb)).sum()

    for a, b in [("sA", "sB"), ("sA", "sC"), ("sB", "sC")]:
        want = js(P.loc[a].to_numpy(), P.loc[b].to_numpy())
        assert got.loc[(a, b), "js"] == pytest.approx(want, rel=1e-9)
    # disjoint-heavy pair diverges more than shared-only pairs
    assert got.loc[("sA", "sB"), "js"] > got.loc[("sA", "sC"), "js"]
    # bounds: 0 <= js <= ln 2
    assert ((got["js"] >= 0) & (got["js"] <= np.log(2) + 1e-12)).all()


def test_js_source_divergence_degenerates():
    from python_graphblas_ray.stages.text import js_source_divergence

    # identical distributions -> exactly 0
    ds = ray.data.from_arrow(pa.table({
        "source": ["x", "y", "x", "y"],
        "text": ["a b", "a b", "b a", "b a"]}))
    got = js_source_divergence(ds).to_pandas()
    assert got["js"].iloc[0] == 0.0

    # disjoint vocabularies -> exactly ln 2 (both halves are p·ln2)
    ds2 = ray.data.from_arrow(pa.table({
        "source": ["x", "y"], "text": ["a a b", "c d"]}))
    got2 = js_source_divergence(ds2).to_pandas()
    assert got2["js"].iloc[0] == pytest.approx(np.log(2), rel=1e-15)

    # single live source (the other is all-empty text) -> 0 rows
    ds3 = ray.data.from_arrow(pa.table({
        "source": ["x", "y"], "text": ["a b", "   "]}))
    assert js_source_divergence(ds3).num_rows == 0

    # empty corpus -> 0 rows with schema
    e = js_source_divergence(ray.data.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "text": pa.array([], pa.string())})))
    assert e.num_rows == 0
    assert e.column_names == ["sa", "sb", "js"]
