"""mmr_select vs a pure-numpy MMR reference."""

import numpy as np
import pyarrow as pa
import ray

from python_graphblas_ray.pipelines.similarity import mmr_select


def _emb_ds(vecs):
    return ray.data.from_arrow(pa.table({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))


def _mmr_ref(vecs, qid, k, lam, pool):
    m = np.asarray(vecs, dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    ids = np.arange(len(m))
    rel = m @ m[qid]
    keep = ids != qid
    ids, rel, m = ids[keep], rel[keep], m[keep]
    order = np.lexsort((ids, -rel))[:pool]
    ids, rel, m = ids[order], rel[order], m[order]
    sel = []
    chosen = np.zeros(len(ids), bool)
    maxsim = np.full(len(ids), -np.inf)
    for r in range(min(k, len(ids))):
        score = rel if r == 0 else lam * rel - (1 - lam) * maxsim
        score = np.where(chosen, -np.inf, score)
        best = np.lexsort((ids, -score))[0]
        sel.append(int(ids[best]))
        chosen[best] = True
        maxsim = np.maximum(maxsim, m @ m[best])
    return sel


def test_mmr_matches_reference():
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    got = mmr_select(_emb_ds(vecs), query_id=0, k=5, lam=0.7, pool=16)
    assert got["vec_id"].to_pylist() == _mmr_ref(vecs, 0, 5, 0.7, 16)
    assert got["rank"].to_pylist() == [1, 2, 3, 4, 5]


def test_mmr_promotes_diversity():
    # near-duplicate cluster around the query + one orthogonal-ish
    # direction: pure top-2 takes two near-dups; MMR's second pick
    # must escape the cluster
    q = np.array([1.0, 0.0, 0.0, 0.0])
    dup1 = np.array([0.90, 0.43589, 0.0, 0.0])   # rel 0.90
    dup2 = np.array([0.89, 0.45607, 0.0, 0.0])   # rel 0.89, ~dup of dup1
    other = np.array([0.85, 0.0, 0.52678, 0.0])  # rel 0.85, diverse
    vecs = np.stack([q, dup1, dup2, other]).astype(np.float32)
    got = mmr_select(_emb_ds(vecs), query_id=0, k=2, lam=0.5, pool=4)
    picks = got["vec_id"].to_pylist()
    assert picks[0] == 1           # most relevant first
    assert picks[1] == 3           # diversity pick, not the twin dup


def test_mmr_small_corpus_and_missing_query():
    vecs = np.eye(3, 8).astype(np.float32)
    got = mmr_select(_emb_ds(vecs), query_id=0, k=10, lam=0.7, pool=32)
    assert len(got) == 2  # corpus minus the query
    empty = mmr_select(_emb_ds(vecs), query_id=99, k=3, lam=0.7, pool=8)
    assert len(empty) == 0
    assert empty.column_names == ["vec_id", "rank"]
