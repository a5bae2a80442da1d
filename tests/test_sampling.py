"""Sampling / splitting / packing vs independent oracles.

Oracles: a pure-int (no numpy) splitmix64 re-implementation for the
hash-derived decisions, and DuckDB SQL for the knuth32 split (the same
one-expression hash the contract query uses)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from python_graphblas_ray.pipelines.sampling import (
    hash_split,
    pack_sequences,
    quota_sample,
    split_column,
    stratified_sample,
)

SF = "/root/testdata/sf0.01"
M64 = (1 << 64) - 1


def _splitmix_int(x: int) -> int:
    """Independent scalar splitmix64 (pure Python ints)."""
    z = (x + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def _u01_int(x: int, salt: int = 0) -> float:
    h = _splitmix_int(x)
    if salt:
        h = _splitmix_int(h ^ salt)
    return h / 2.0**64


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(SF + "/documents.parquet",
                      columns=["doc_id", "lang", "n_chars"])
    return t


def _ds(t):
    return ray.data.from_arrow(t)


FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_column_matches_scalar_oracle(docs):
    out = split_column(_ds(docs), FR, key_col="doc_id", salt=7) \
        .take_all()
    assert len(out) == docs.num_rows
    cum = [("train", 0.8), ("val", 0.9), ("test", 1.0)]
    for row in out:
        u = _u01_int(row["doc_id"], salt=7)
        want = next(n for n, c in cum if u < c or c == 1.0)
        assert row["split"] == want


def test_hash_split_disjoint_complete_consistent(docs):
    parts = hash_split(_ds(docs), FR, key_col="doc_id", salt=7)
    ids = {n: set(r["doc_id"] for r in d.take_all())
           for n, d in parts.items()}
    assert sum(len(s) for s in ids.values()) == docs.num_rows
    assert not (ids["train"] & ids["val"]) and not (ids["val"] & ids["test"])
    # consistent with split_column labels
    lbl = split_column(_ds(docs), FR, key_col="doc_id", salt=7).take_all()
    for row in lbl:
        assert row["doc_id"] in ids[row["split"]]
    # roughly proportional
    assert 0.7 < len(ids["train"]) / docs.num_rows < 0.9


def test_split_knuth32_matches_duckdb(docs):
    out = split_column(_ds(docs), FR, key_col="doc_id",
                       method="knuth32").take_all()
    got = {r["doc_id"]: r["split"] for r in out}
    con = duckdb.connect()
    con.register("documents", docs)
    sql = """
        SELECT doc_id,
          CASE WHEN u < 0.8 THEN 'train'
               WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id,
                (((doc_id % 4294967296) * 2654435761) % 4294967296)
                  / 4294967296.0 AS u
              FROM documents)
    """
    for doc_id, split in con.execute(sql).fetchall():
        assert got[doc_id] == split, doc_id


def test_stratified_sample_scalar_and_dict(docs):
    kept = stratified_sample(_ds(docs), "lang", 0.25, key_col="doc_id",
                             salt=3).take_all()
    for row in kept:
        assert _u01_int(row["doc_id"], salt=3) < 0.25
    n_exp = sum(_u01_int(i, salt=3) < 0.25
                for i in docs["doc_id"].to_pylist())
    assert len(kept) == n_exp

    rates = {"en": 0.5, "de": 1.0}
    kept2 = stratified_sample(_ds(docs), "lang", rates, key_col="doc_id",
                              salt=3, default_fraction=0.1).take_all()
    langs = dict(zip(docs["doc_id"].to_pylist(),
                     docs["lang"].to_pylist()))
    n_exp2 = 0
    for i, lang in langs.items():
        if _u01_int(i, salt=3) < rates.get(lang, 0.1):
            n_exp2 += 1
    assert len(kept2) == n_exp2
    for row in kept2:
        r = rates.get(langs[row["doc_id"]], 0.1)
        assert _u01_int(row["doc_id"], salt=3) < r


def test_quota_sample_exact_k_smallest_hash(docs):
    k = 20
    out = quota_sample(_ds(docs), "lang", k, key_col="doc_id", salt=11,
                       num_partitions=4).take_all()
    ids = docs["doc_id"].to_pylist()
    langs = docs["lang"].to_pylist()
    by_lang = {}
    for i, lang in zip(ids, langs):
        by_lang.setdefault(lang, []).append(i)
    want = set()
    for lang, members in by_lang.items():
        members.sort(key=lambda i: _u01_int(i, salt=11))
        want.update(members[:k])
    got = set(r["doc_id"] for r in out)
    assert got == want
    counts = {}
    for r in out:
        counts[langs[ids.index(r["doc_id"])]] = counts.get(
            langs[ids.index(r["doc_id"])], 0) + 1
    for lang, members in by_lang.items():
        assert counts.get(lang, 0) == min(k, len(members))


def test_pack_sequences_budget_and_coverage():
    rng = np.random.default_rng(0)
    n = 500
    lens = rng.integers(1, 900, n)
    lens[7] = 5000  # over-budget doc → own pack
    t = pa.table({"doc_id": pa.array(np.arange(n)),
                  "n_tokens": pa.array(lens)})
    budget = 2048
    out = pack_sequences(ray.data.from_arrow(t), "n_tokens", budget,
                         "doc_id").take_all()
    assert len(out) == n
    assert set(r["doc_id"] for r in out) == set(range(n))
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r)
    for pid, rows in packs.items():
        rows.sort(key=lambda r: r["pack_pos"])
        assert [r["pack_pos"] for r in rows] == list(range(len(rows)))
        assert pid == min(r["doc_id"] for r in rows)
        total = sum(min(int(lens[r["doc_id"]]), budget) for r in rows)
        assert total <= budget
    # the long doc is alone in its pack
    long_pack = next(r["pack_id"] for r in out if r["doc_id"] == 7)
    assert len(packs[long_pack]) == 1
    # greedy within one block: consecutive ids per pack
    for rows in packs.values():
        ids_sorted = sorted(r["doc_id"] for r in rows)
        assert ids_sorted == list(range(ids_sorted[0],
                                        ids_sorted[0] + len(ids_sorted)))


def test_pack_sequences_deterministic():
    t = pa.table({"doc_id": pa.array(np.arange(100)),
                  "n_tokens": pa.array(np.full(100, 300))})
    a = pack_sequences(ray.data.from_arrow(t), "n_tokens", 1000,
                       "doc_id").take_all()
    b = pack_sequences(ray.data.from_arrow(t), "n_tokens", 1000,
                       "doc_id").take_all()
    key = lambda rows: sorted((r["doc_id"], r["pack_id"], r["pack_pos"])
                              for r in rows)
    assert key(a) == key(b)
    # 3 docs of 300 per 1000-token pack
    sizes = {}
    for r in a:
        sizes[r["pack_id"]] = sizes.get(r["pack_id"], 0) + 1
    assert sorted(sizes.values(), reverse=True)[0] == 3


def test_null_strata_handled():
    """Review regressions: null stratum rows must not crash and must
    behave like their own SQL partition / take the default rate."""
    t = pa.table({"doc_id": pa.array(np.arange(40)),
                  "lang": pa.array(["en", None] * 20)})
    out = quota_sample(ray.data.from_arrow(t), "lang", 5,
                       key_col="doc_id", num_partitions=2).take_all()
    langs = [r["lang"] for r in out]
    assert langs.count("en") == 5 and langs.count(None) == 5

    kept = stratified_sample(ray.data.from_arrow(t), "lang",
                             {"en": 1.0, None: 0.0}, key_col="doc_id",
                             default_fraction=0.5).take_all()
    assert all(r["lang"] == "en" for r in kept) and len(kept) == 20


def test_knuth32_rejects_negative_keys():
    t = pa.table({"doc_id": pa.array([-1, 2, 3], type=pa.int64())})
    with pytest.raises(Exception, match="non-negative"):
        split_column(ray.data.from_arrow(t), FR, key_col="doc_id",
                     method="knuth32").take_all()


def test_mixture_sample_quotas_and_determinism():
    from python_graphblas_ray.pipelines.sampling import mixture_sample

    rng = np.random.default_rng(51)
    sources = np.array(["big"] * 800 + ["mid"] * 150 + ["tiny"] * 50)
    rng.shuffle(sources)
    t = pa.table({"doc_id": np.arange(1000, dtype=np.int64),
                  "source": sources})
    ds = ray.data.from_arrow(t).repartition(4)
    out1 = sorted(r["doc_id"] for r in mixture_sample(
        ds, "source", total=200, key_col="doc_id",
        temperature=0.5, method="knuth32").take_all())
    out2 = sorted(r["doc_id"] for r in mixture_sample(
        ds, "source", total=200, key_col="doc_id",
        temperature=0.5, method="knuth32").take_all())
    assert out1 == out2 and len(out1) == 200
    # temperature < 1 upsamples small sources vs their raw share
    got = mixture_sample(ds, "source", total=200, key_col="doc_id",
                         temperature=0.5, method="knuth32").take_all()
    from collections import Counter
    c = Counter(r["source"] for r in got)
    n = np.array([800.0, 150.0, 50.0])
    w = np.sqrt(n); w /= w.sum()
    raw = w * 200
    # each quota within 1 of the largest-remainder target
    for s, r in zip(("big", "mid", "tiny"), raw):
        assert abs(c[s] - r) <= 1.0, (s, c[s], r)
    assert c["tiny"] / 200 > 50 / 1000  # upsampled share


def test_mixture_sample_caps_at_stratum_size():
    from python_graphblas_ray.pipelines.sampling import mixture_sample

    t = pa.table({"doc_id": np.arange(30, dtype=np.int64),
                  "source": ["a"] * 25 + ["b"] * 5})
    ds = ray.data.from_arrow(t)
    got = mixture_sample(ds, "source", total=28, key_col="doc_id",
                         temperature=0.0, method="knuth32").take_all()
    from collections import Counter
    c = Counter(r["source"] for r in got)
    # τ=0 → equal targets (14, 14) but 'b' caps at 5
    assert c["b"] == 5 and c["a"] == 14
