"""Session-7 operators vs independent pure-Python/numpy oracles:
item co-visitation (bipartite projection + cosine) and per-community
conductance."""

import collections
import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray

from python_graphblas_ray.pipelines.louvain import conductance
from python_graphblas_ray.pipelines.recsys import item_covisitation


def _collect(ds):
    batches = [b for b in ds.iter_batches(batch_format="pyarrow",
                                          batch_size=None) if b.num_rows]
    return (pa.concat_tables(batches, promote_options="permissive")
            if batches else None)


# --------------------------------------------------- item co-visitation

def _brute_covisit(u, it, max_basket):
    baskets = collections.defaultdict(set)
    for a, b in zip(u.tolist(), it.tolist()):
        baskets[a].add(b)
    baskets = {k: v for k, v in baskets.items()
               if 2 <= len(v) <= max_basket}
    pc, ci = collections.Counter(), collections.Counter()
    for v in baskets.values():
        for x in v:
            ci[x] += 1
        for a, b in itertools.combinations(sorted(v), 2):
            pc[(a, b)] += 1
    return pc, ci, baskets


def test_covisit_bruteforce_parity_and_guard():
    rng = np.random.RandomState(5)
    u = rng.randint(0, 300, 2000).astype(np.int64)
    it = rng.randint(0, 25, 2000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"user_id": u, "item": it})).repartition(7)
    t = _collect(item_covisitation(ds, max_basket=6)).to_pandas() \
        .sort_values(["i", "j"]).reset_index(drop=True)
    pc, ci, baskets = _brute_covisit(u, it, 6)
    assert len(baskets) < 300  # the guard genuinely drops users
    assert list(zip(t["i"], t["j"])) == sorted(pc)
    for (a, b), c in pc.items():
        row = t[(t.i == a) & (t.j == b)].iloc[0]
        assert row["c"] == c
        # cosine must be the SAME IEEE ops: c / sqrt(ci*cj)
        assert row["cosine"] == c / np.sqrt(np.float64(ci[a] * ci[b]))


def test_covisit_partition_invariance():
    rng = np.random.RandomState(6)
    u = rng.randint(0, 80, 1200).astype(np.int64)
    it = rng.randint(0, 30, 1200).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"user_id": u, "item": it})).repartition(5)
    ref = None
    for P in (2, 16):
        t = _collect(item_covisitation(
            ds, max_basket=12, num_partitions=P)).to_pandas() \
            .sort_values(["i", "j"]).reset_index(drop=True)
        if ref is None:
            ref = t
        else:
            assert (t[["i", "j", "c", "cosine"]].values
                    == ref[["i", "j", "c", "cosine"]].values).all()


def test_covisit_all_dropped_keeps_schema():
    rng = np.random.RandomState(7)
    u = rng.randint(0, 20, 400).astype(np.int64)
    it = rng.randint(0, 25, 400).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"user_id": u, "item": it}))
    out = item_covisitation(ds, max_basket=1).materialize()
    assert out.count() == 0
    assert out.schema().names == ["i", "j", "c", "cosine"]


# ------------------------------------------------------- conductance

def _sym_edges(rng, n, m):
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    pairs = {(min(a, b), max(a, b))
             for a, b in zip(src[keep], dst[keep])}
    S = np.array([(a, b) for a, b in pairs]
                 + [(b, a) for a, b in pairs], dtype=np.int64)
    return S


def test_conductance_numpy_parity():
    rng = np.random.RandomState(8)
    n, k = 60, 4
    S = _sym_edges(rng, n, 500)
    ds = ray.data.from_arrow(pa.table({
        "src": S[:, 0], "dst": S[:, 1],
        "val": np.ones(len(S))})).repartition(5)
    lab = np.arange(n, dtype=np.int64) % k
    t = conductance(ds, lab, n, k=k).to_pandas()
    M = np.zeros((k, k), dtype=np.int64)
    for a, b in S:
        M[lab[a], lab[b]] += 1
    vol = M.sum(1)
    cut = vol - np.diag(M)
    tm = vol.sum()
    assert t["comm"].tolist() == list(range(k))
    for r in t.itertuples():
        c = int(r.comm)
        assert r.cut == cut[c] and r.vol == vol[c]
        assert r.phi == cut[c] / min(vol[c], tm - vol[c])


def test_conductance_degenerate_and_perfect_split():
    rng = np.random.RandomState(9)
    S = _sym_edges(rng, 30, 200)
    ds = ray.data.from_arrow(pa.table({
        "src": S[:, 0], "dst": S[:, 1], "val": np.ones(len(S))}))
    # single community: no complement volume -> phi exactly 0.0
    t = conductance(ds, np.zeros(30, dtype=np.int64), 30, k=1) \
        .to_pandas()
    assert t["phi"].tolist() == [0.0] and t["cut"].tolist() == [0]
    # two disconnected cliques labeled by their clique: phi == 0 both
    a = np.array([(i, j) for i in range(4) for j in range(4) if i != j])
    b = a + 4
    S2 = np.concatenate([a, b]).astype(np.int64)
    ds2 = ray.data.from_arrow(pa.table({
        "src": S2[:, 0], "dst": S2[:, 1], "val": np.ones(len(S2))}))
    lab = (np.arange(8) >= 4).astype(np.int64)
    t2 = conductance(ds2, lab, 8, k=2).to_pandas()
    assert t2["phi"].tolist() == [0.0, 0.0]
    assert t2["vol"].tolist() == [12, 12]
    # empty labeling/graph keeps schema
    t3 = conductance(ds2, np.array([], dtype=np.int64), 0, k=None)
    assert t3.column_names == ["comm", "cut", "vol", "phi"]
    assert t3.num_rows == 0


# ------------------------------------------- daily type correlation

def test_type_daily_correlation_numpy_parity():
    from python_graphblas_ray.pipelines.windows import (
        type_daily_correlation,
    )
    rng = np.random.RandomState(11)
    DAY = 86_400_000_000
    n_ev = 3000
    types = np.array(["a", "b", "c"])[rng.randint(0, 3, n_ev)]
    day = rng.randint(0, 40, n_ev).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "event_type": types,
        "ts": pa.array(day * DAY + rng.randint(0, DAY, n_ev),
                       pa.timestamp("us"))})).repartition(6)
    t = type_daily_correlation(ds).to_pandas()
    # numpy reference over the shared day grid
    days = np.unique(day)
    tys = np.unique(types)
    X = np.zeros((len(tys), len(days)))
    for tt, dd in zip(types, day):
        X[np.searchsorted(tys, tt), np.searchsorted(days, dd)] += 1
    want = np.corrcoef(X)
    got = {(r.ta, r.tb): r.corr for r in t.itertuples()}
    for i in range(len(tys)):
        for j in range(i + 1, len(tys)):
            assert got[(tys[i], tys[j])] == pytest.approx(
                want[i, j], abs=1e-12)


def test_type_daily_correlation_edges():
    from python_graphblas_ray.pipelines.windows import (
        type_daily_correlation,
    )
    DAY = 86_400_000_000
    # perfectly correlated pair + a constant (zero-variance) series
    rows_t, rows_ts = [], []
    for d in range(5):
        rows_t += ["up"] * (d + 1) + ["dn"] * (2 * d + 2) + ["flat"]
        rows_ts += [d * DAY] * ((d + 1) + (2 * d + 2) + 1)
    ds = ray.data.from_arrow(pa.table({
        "event_type": rows_t,
        "ts": pa.array(np.array(rows_ts, dtype=np.int64),
                       pa.timestamp("us"))}))
    t = type_daily_correlation(ds).to_pandas()
    got = {(r.ta, r.tb): r.corr for r in t.itertuples()}
    assert got[("dn", "up")] == pytest.approx(1.0, abs=1e-12)
    assert got[("dn", "flat")] == 0.0  # zero variance pins 0.0
    assert got[("flat", "up")] == 0.0
    # single type -> no pairs, schema kept
    ds1 = ray.data.from_arrow(pa.table({
        "event_type": ["a", "a"],
        "ts": pa.array(np.array([0, DAY], dtype=np.int64),
                       pa.timestamp("us"))}))
    t1 = type_daily_correlation(ds1)
    assert t1.num_rows == 0
    assert t1.column_names == ["ta", "tb", "corr"]
