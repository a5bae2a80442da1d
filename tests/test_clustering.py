"""k-means / diversity sampling: planted-blob recovery + invariants."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from python_graphblas_ray.pipelines.clustering import (
    diversity_sample,
    kmeans_assign,
    kmeans_fit,
)


def _blobs(n_per=400, d=8, k=3, sep=12.0, seed=1):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * sep
    pts = np.concatenate([centers[i] + rng.normal(size=(n_per, d))
                          for i in range(k)])
    labels = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(len(pts))
    return pts[perm], labels[perm]


def _tbl(pts):
    return pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in pts],
                              type=pa.list_(pa.float32())),
    })


def _purity(got, want, k):
    """Best-case label-permutation agreement."""
    total = 0
    for c in range(k):
        m = got == c
        if m.any():
            total += np.bincount(want[m]).max()
    return total / len(got)


def test_kmeans_recovers_blobs_l2():
    pts, labels = _blobs()
    ds = ray.data.from_arrow(_tbl(pts))
    cents, inertia = kmeans_fit(ds, 3, iters=15, seed=0)
    assert cents.shape == (3, 8)
    # inertia measured against entering centroids → non-increasing
    assert all(a >= b - 1e-9 for a, b in zip(inertia, inertia[1:]))
    out = kmeans_assign(ds, cents, dist_col="d2").take_all()
    got = np.asarray([r["cluster"] for r in out])
    ids = np.asarray([r["vec_id"] for r in out])
    assert _purity(got, labels[ids], 3) > 0.99
    assert all(r["d2"] >= 0 for r in out)


def test_kmeans_cosine_metric():
    pts, labels = _blobs(sep=20.0, seed=3)
    ds = ray.data.from_arrow(_tbl(pts))
    cents, _ = kmeans_fit(ds, 3, iters=15, seed=0, metric="cosine")
    # cosine centroids are unit-norm
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0,
                               atol=1e-9)
    out = kmeans_assign(ds, cents, metric="cosine").take_all()
    got = np.asarray([r["cluster"] for r in out])
    ids = np.asarray([r["vec_id"] for r in out])
    assert _purity(got, labels[ids], 3) > 0.95


def test_kmeans_deterministic():
    pts, _ = _blobs(n_per=100)
    ds = ray.data.from_arrow(_tbl(pts))
    c1, i1 = kmeans_fit(ds, 3, iters=5, seed=7)
    c2, i2 = kmeans_fit(ds, 3, iters=5, seed=7)
    np.testing.assert_array_equal(c1, c2)
    assert i1 == i2


def test_kmeans_empty_raises():
    t = pa.table({"embedding": pa.array([], type=pa.list_(pa.float32()))})
    with pytest.raises(ValueError):
        kmeans_fit(ray.data.from_arrow(t), 3)


def test_diversity_sample_quota():
    pts, _ = _blobs(n_per=200)
    ds = ray.data.from_arrow(_tbl(pts))
    out = diversity_sample(ds, 3, 25, iters=10, seed=0).take_all()
    counts = {}
    for r in out:
        counts[r["cluster"]] = counts.get(r["cluster"], 0) + 1
    # balanced blobs → every cluster filled its quota
    assert sorted(counts.values()) == [25, 25, 25]
    assert len({r["vec_id"] for r in out}) == len(out)


def test_kmeans_explicit_init_and_rounding():
    """init_centroids pins the starting centroids (no seeded sample);
    round_to quantizes every post-update coordinate, including those of
    empty clusters that keep their previous centroid."""
    rng = np.random.default_rng(3)
    pts = np.concatenate([rng.normal(0.0, 0.1, (30, 4)),
                          rng.normal(5.0, 0.1, (30, 4))])
    ds = ray.data.from_arrow(_tbl(pts))
    init = np.array([[0.123456789] * 4, [5.0] * 4, [99.0] * 4])
    cents, _ = kmeans_fit(ds, 3, iters=2, init_centroids=init,
                          round_to=6, tol=0.0)
    # clusters 0/1 moved to the blob means; 2 stayed empty and kept its
    # (rounded) init coordinates
    assert np.allclose(cents[0], pts[:30].mean(axis=0), atol=1e-5)
    assert np.allclose(cents[1], pts[30:].mean(axis=0), atol=1e-5)
    assert np.allclose(cents[2], 99.0)
    # every coordinate sits exactly on the 1e-6 grid
    assert np.allclose(cents, np.round(cents, 6), rtol=0, atol=0)
