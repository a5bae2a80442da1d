"""Session-10 additions: corpus TF-IDF top terms and the TPC-H Q18
large-volume-orders composition."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from python_graphblas_ray.stages.text import tfidf_top_terms


def _tfidf_ref(texts, top_k):
    """Pure-Python TF-IDF reference: cnt · ln(N/df), round-8
    half-away, (score DESC, term) ties."""
    n = len(texts)
    cnt, df = Counter(), Counter()
    for t in texts:
        words = [w for w in (t or "").split() if w]
        cnt.update(words)
        df.update(set(words))
    rows = []
    for w in cnt:
        raw = cnt[w] * math.log(n / df[w])
        score = math.floor(abs(raw) * 1e8 + 0.5) / 1e8 * (
            1 if raw >= 0 else -1)
        rows.append((w, cnt[w], df[w], score))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:top_k]


def _run_tfidf(texts, top_k=20):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": pa.array(texts, pa.string())}))
    t = tfidf_top_terms(ds, len(texts), top_k=top_k)
    return list(zip(t["term"].to_pylist(), t["cnt"].to_pylist(),
                    t["df"].to_pylist(), t["tfidf"].to_pylist()))


def test_tfidf_matches_reference():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(120)]
    got = _run_tfidf(texts, top_k=15)
    want = _tfidf_ref(texts, top_k=15)
    assert [(g[0], g[1], g[2]) for g in got] == \
        [(w[0], w[1], w[2]) for w in want]
    assert np.allclose([g[3] for g in got], [w[3] for w in want],
                       rtol=0, atol=0)


def test_tfidf_everywhere_term_scores_zero():
    # a term present in EVERY doc has ln(N/df) = ln(1) = 0 exactly
    texts = ["common alpha", "common beta", "common gamma"]
    got = dict((r[0], r[3]) for r in _run_tfidf(texts))
    assert got["common"] == 0.0
    assert got["alpha"] > 0


def test_tfidf_degenerate_inputs():
    assert _run_tfidf([]) == []
    assert _run_tfidf(["", "   ", ""]) == []
    got = _run_tfidf([None, "solo solo"])
    assert got == [("solo", 2, 1, math.floor(
        2 * math.log(2.0) * 1e8 + 0.5) / 1e8)]


def test_big_orders_pandas_parity(tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    rng = np.random.default_rng(3)
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, 60, 500),
        "l_quantity": rng.integers(1, 50, 500).astype(float)})
    # orders cover only part of the orderkeys (dangling FKs drop);
    # customers cover only part of the custkeys
    orders = pd.DataFrame({"o_orderkey": np.arange(0, 50),
                           "o_custkey": rng.integers(0, 12, 50)})
    cust = pd.DataFrame({"c_custkey": np.arange(0, 9)})
    d = tmp_path / "sf"
    d.mkdir()
    for name, df in [("lineitem", li), ("orders", orders),
                     ("customer", cust)]:
        pq.write_table(pa.Table.from_pandas(df), d / f"{name}.parquet")
    for name in ["region", "nation", "supplier", "part", "events",
                 "documents", "embeddings"]:
        pq.write_table(pa.table({"x": pa.array([], pa.int64())}),
                       d / f"{name}.parquet")

    got = em.queries()["big_orders"](str(d)).to_pandas().sort_values(
        ["custkey", "orderkey"]).reset_index(drop=True)
    agg = li.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
    agg = agg[agg.l_quantity > 150]
    want = agg.merge(orders, left_on="l_orderkey",
                     right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey")
    want = want.rename(columns={"o_custkey": "custkey",
                                "l_orderkey": "orderkey",
                                "l_quantity": "sum_qty"})[
        ["custkey", "orderkey", "sum_qty"]].sort_values(
        ["custkey", "orderkey"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got.custkey.to_numpy() == want.custkey.to_numpy()).all()
    assert (got.orderkey.to_numpy() == want.orderkey.to_numpy()).all()
    assert np.allclose(got.sum_qty, want.sum_qty, rtol=0, atol=0)


def test_small_qty_revenue_pandas_parity(tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    rng = np.random.default_rng(11)
    li = pd.DataFrame({
        "l_partkey": rng.integers(0, 30, 800),
        "l_quantity": rng.integers(1, 50, 800).astype(float),
        "l_extendedprice": np.round(
            rng.uniform(1, 1000, 800), 2)})
    part = pd.DataFrame({
        "p_partkey": np.arange(0, 25),  # keys 25..29 dangle
        "p_brand": [f"B{i % 4}" for i in range(25)]})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(li), d / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(part), d / "part.parquet")
    for name in ["region", "nation", "customer", "supplier", "orders",
                 "events", "documents", "embeddings"]:
        pq.write_table(pa.table({"x": pa.array([], pa.int64())}),
                       d / f"{name}.parquet")

    got = em.queries()["small_qty_revenue"](str(d)).to_pandas() \
        .sort_values("brand").reset_index(drop=True)
    a = li.groupby("l_partkey").agg(
        sq=("l_quantity", "sum"), nq=("l_quantity", "count"))
    j = li.join(a, on="l_partkey")
    j = j[j.l_quantity < 0.2 * (j.sq / j.nq)]
    j["cents"] = np.floor(
        j.l_extendedprice * 100.0 + 0.5).astype(np.int64)
    j = j.merge(part, left_on="l_partkey", right_on="p_partkey")
    want = j.groupby("p_brand").agg(
        n_lines=("cents", "count"), rev=("cents", "sum")) \
        .reset_index().sort_values("p_brand").reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert list(got.brand) == list(want.p_brand)
    assert list(got.n_lines) == list(want.n_lines)
    assert list(got.rev) == list(want.rev)


def test_idle_rich_customers_pandas_parity(tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    rng = np.random.default_rng(5)
    cust = pd.DataFrame({
        "c_custkey": np.arange(0, 40),
        "c_mktsegment": [f"S{i % 3}" for i in range(40)],
        "c_acctbal": np.round(rng.uniform(-500, 5000, 40), 2)})
    # half the customers have orders
    orders = pd.DataFrame({"o_custkey": np.repeat(
        np.arange(0, 40, 2), 2)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(cust), d / "customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders), d / "orders.parquet")
    for name in ["region", "nation", "supplier", "part", "lineitem",
                 "events", "documents", "embeddings"]:
        pq.write_table(pa.table({"x": pa.array([], pa.int64())}),
                       d / f"{name}.parquet")

    got = em.queries()["idle_rich_customers"](str(d)).to_pandas() \
        .sort_values("seg").reset_index(drop=True)
    c2 = cust.copy()
    c2["cents"] = np.floor(
        c2.c_acctbal * 100.0 + 0.5).astype(np.int64)
    pos = c2.cents[c2.cents > 0]
    thr = int(pos.sum()) / len(pos)
    keep = c2[(c2.cents > thr)
              & ~c2.c_custkey.isin(orders.o_custkey)]
    want = keep.groupby("c_mktsegment").agg(
        n=("cents", "count"), sum_cents=("cents", "sum")) \
        .reset_index().sort_values("c_mktsegment") \
        .reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert list(got.seg) == list(want.c_mktsegment)
    assert list(got.n) == list(want.n)
    assert list(got.sum_cents) == list(want.sum_cents)
