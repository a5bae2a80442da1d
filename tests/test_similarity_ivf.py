"""IVF scale path: batched probe search and bucketed near-dup must agree
with the exact brute-force formulations (recall bars per round-1 verdict:
ann_ivf ≥ 0.9 vs brute force; planted near-dup recall ≥ 0.95)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from python_graphblas_ray.pipelines.dedup import embedding_neardup_pairs
from python_graphblas_ray.pipelines.similarity import (
    ann_topk,
    ann_topk_ivf,
    ivf_build,
    ivf_search,
    ivf_search_batch,
)


def _table(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                            promote_options="permissive")


@pytest.fixture(scope="module")
def emb_ds():
    """2k vectors in 8 well-separated clusters + planted near-dup pairs:
    vector 2i+1 of the first 100 even ids is a tiny perturbation of 2i."""
    rng = np.random.default_rng(7)
    n, d, k = 2000, 16, 8
    centers = rng.normal(size=(k, d)) * 5
    base = centers[rng.integers(0, k, n)] + rng.normal(size=(n, d)) * 0.5
    for i in range(0, 200, 2):  # plant 100 near-dup pairs
        base[i + 1] = base[i] + rng.normal(size=d) * 0.01
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.tolist() for row in base],
    })).repartition(8)
    return ds.materialize()


def test_ivf_batch_recall_vs_brute(emb_ds):
    qids = list(range(0, 40))
    brute = _table(ann_topk(emb_ds, qids, k=10)).to_pandas()
    ivf = _table(ann_topk_ivf(emb_ds, qids, k=10, nprobe=3,
                              num_centroids=16)).to_pandas()
    b = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    v = {(r.query_id, r.neighbor_id) for r in ivf.itertuples()}
    recall = len(b & v) / len(b)
    assert recall >= 0.9, recall


def test_ivf_single_query_matches_batch(emb_ds):
    cents, assigned = ivf_build(emb_ds, num_centroids=16)
    assigned = assigned.materialize()
    t = _table(emb_ds)
    q = np.asarray(t["embedding"][5].as_py(), dtype=np.float64)
    ids_s, _ = ivf_search(cents, assigned, q, k=10, nprobe=3)
    batch_out = _table(ivf_search_batch(
        cents, assigned, [5], q[None, :], k=10, nprobe=3,
        exclude_self=False)).to_pandas()
    # single-vector search has no self-exclusion; compare the sets
    assert set(ids_s[:10]) == set(batch_out.neighbor_id.tolist())


def test_embedding_neardup_ivf_recall(emb_ds):
    brute = _table(embedding_neardup_pairs(
        emb_ds, threshold=0.995, method="brute")).to_pandas()
    ivf = _table(embedding_neardup_pairs(
        emb_ds, threshold=0.995, method="ivf", num_centroids=16,
        nassign=2)).to_pandas()
    b = set(zip(brute.ia.tolist(), brute.ib.tolist()))
    v = set(zip(ivf.ia.tolist(), ivf.ib.tolist()))
    assert v <= b                      # no false positives (exact verify)
    assert len(b) >= 100               # planted pairs are present
    recall = len(b & v) / len(b)
    assert recall >= 0.95, recall


def test_embedding_neardup_ivf_hot_cell_guard():
    """One centroid swallowing ~50% of the corpus (the boilerplate-skew
    case IVF dedup exists for) must finish LINEARLY: the guarded
    exchange sign-splits the hot cell instead of one unbounded
    quadratic task, keeps recall on the planted near-dups inside the
    hot cluster, and emits no false positives."""
    rng = np.random.default_rng(31)
    n, d = 4000, 16
    hot = rng.normal(size=d) * 5
    other = -hot
    base = np.where((np.arange(n) % 2 == 0)[:, None],
                    hot[None, :], other[None, :]) \
        + rng.normal(size=(n, d)) * 0.4
    for i in range(0, 400, 2):  # planted near-dups inside the HOT half
        base[i] = hot + rng.normal(size=d) * 0.3
        base[i + 1] = base[i] + rng.normal(size=d) * 0.005
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.tolist() for row in base],
    })).repartition(8).materialize()
    brute = _table(embedding_neardup_pairs(
        ds, threshold=0.999, method="brute")).to_pandas()
    # max_cell far below the hot-cell size forces the sign-split path
    from python_graphblas_ray.pipelines.dedup import _embedding_neardup_ivf
    ivf = _table(_embedding_neardup_ivf(
        ds, 0.999, "vec_id", "embedding", num_centroids=4, nassign=1,
        max_cell=256)).to_pandas()
    b = set(zip(brute.ia.tolist(), brute.ib.tolist()))
    v = set(zip(ivf.ia.tolist(), ivf.ib.tolist()))
    planted = {(i, i + 1) for i in range(0, 400, 2)}
    assert v <= b                       # exact verify: no false positives
    assert planted <= b
    got = len(planted & v) / len(planted)
    assert got >= 0.95, got


def test_embedding_neardup_auto_routes_small_to_brute(emb_ds):
    # auto on a small corpus must be byte-identical to brute
    a = _table(embedding_neardup_pairs(emb_ds, threshold=0.995,
                                       method="auto")).to_pandas()
    b = _table(embedding_neardup_pairs(emb_ds, threshold=0.995,
                                       method="brute")).to_pandas()
    assert (set(zip(a.ia.tolist(), a.ib.tolist())) ==
            set(zip(b.ia.tolist(), b.ib.tolist())))


def test_gram_matrix_matches_numpy_and_is_psd():
    """Distributed per-batch gram partials == full-matrix numpy matmul
    (allclose under partial-order noise), symmetric, PSD."""
    from python_graphblas_ray.pipelines.similarity import (gram_matrix,
                                                           pc1_power)

    rng = np.random.default_rng(7)
    m = rng.normal(size=(300, 16))
    axis = rng.normal(size=16)
    axis /= np.linalg.norm(axis)
    # plant a dominant principal axis so the eigengap is wide and the
    # power iteration's convergence is actually testable
    m = (m + 4.0 * rng.normal(size=(300, 1)) * axis).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
    })).repartition(5)
    g, n = gram_matrix(ds)
    assert n == 300 and g.shape == (16, 16)
    ref = m.astype(np.float64).T @ m.astype(np.float64) / 300
    np.testing.assert_allclose(g, ref, rtol=0, atol=1e-12)
    np.testing.assert_allclose(g, g.T, rtol=0, atol=0)
    assert np.linalg.eigvalsh(g).min() >= -1e-12
    # power iteration converges to the top principal axis
    y = pc1_power(g, iters=50)
    y = y / np.linalg.norm(y)
    top = np.linalg.eigh(g)[1][:, -1]
    assert abs(abs(y @ top) - 1.0) < 1e-9
    # the fixed 2-step contract variant replays the recipe exactly
    ones = np.ones(16)
    np.testing.assert_array_equal(pc1_power(g, iters=2), g @ (g @ ones))


def test_random_projection_recipe_and_jl_property():
    from python_graphblas_ray.pipelines.similarity import random_projection
    from python_graphblas_ray.state.superstep import _splitmix64

    rng = np.random.default_rng(11)
    m = rng.normal(size=(200, 64)).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
    })).repartition(4)
    out = _table(random_projection(ds, k=16)).to_pandas()
    out = out.sort_values(["vec_id", "j"]).reset_index(drop=True)
    y = out.v.to_numpy().reshape(200, 16)
    # exact recipe parity vs a directly-built sign matrix
    h = _splitmix64(np.arange(16 * 64, dtype=np.uint64))
    signs = np.where(h & np.uint64(1), 1.0, -1.0).reshape(16, 64)
    np.testing.assert_allclose(
        y, m.astype(np.float64) @ signs.T, rtol=0, atol=1e-12)
    # JL: scaled squared distances concentrate around the originals
    d_orig = ((m[None, :50] - m[:50, None]) ** 2).sum(-1)
    # E[||y_a - y_b||^2] = k * ||a - b||^2 for +/-1 sign rows
    d_proj = ((y[None, :50] - y[:50, None]) ** 2).sum(-1) / 16.0
    iu = np.triu_indices(50, 1)
    ratio = d_proj[iu] / d_orig[iu]
    assert 0.25 < np.median(ratio) < 4.0
    assert np.corrcoef(d_orig[iu], d_proj[iu])[0, 1] > 0.3
