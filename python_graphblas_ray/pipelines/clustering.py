"""Distributed k-means over an embedding column, and cluster-balanced
("diversity") sampling built on top of it.

No reference analogue; this is the clustering leg of the training-data
toolkit (semantic bucketing for balanced corpora, curriculum mixes,
IVF-style partitioning). The IVF ANN index (`similarity.ivf_build`) is
the spherical special case wired for search; this module exposes the
general op: L2 or cosine metric, convergence tracking, predict, and a
per-cluster quota sample.

Scale shape: each Lloyd iteration is ONE streaming ``map_batches`` pass
emitting per-batch (sum, count, sq-dist) partials per centroid — k·d
floats per batch, merged on the driver; the corpus is never shuffled and
never materialized. Assignment is another streaming pass against a
broadcast (``ray.put``) centroid matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .similarity import _matrix, _normalize, _stack


def _assign_codes(m, cents, metric):
    """(codes, sqdist) for one batch. L2 uses ||x-c||² = ||x||² - 2x·c +
    ||c||² (one matmul); cosine normalizes and maximizes the dot."""
    if metric == "cosine":
        sim = _normalize(m) @ _normalize(cents).T
        a = np.argmax(sim, axis=1)
        d = 2.0 - 2.0 * sim[np.arange(len(m)), a]
        return a, np.maximum(d, 0.0)
    xc = m @ cents.T
    cn = (cents * cents).sum(axis=1)
    d2 = (m * m).sum(axis=1)[:, None] - 2.0 * xc + cn[None, :]
    a = np.argmin(d2, axis=1)
    return a, np.maximum(d2[np.arange(len(m)), a], 0.0)


def kmeans_fit(emb_ds, k, iters=10, emb_col="embedding", seed=42,
               metric="l2", tol=1e-6, init_centroids=None, round_to=None):
    """Lloyd k-means → ``(centroids, inertia_history)``.

    Init: seeded sample from the first batch (deterministic), or the
    explicit ``init_centroids`` array when given. Empty clusters keep
    their previous centroid. Stops early when the max centroid shift
    drops below ``tol``. ``inertia_history[i]`` is the total squared
    distance measured DURING pass ``i`` (i.e. against the centroids
    entering that pass), so it is non-increasing.

    ``round_to``: round every centroid coordinate to this many decimals
    after each update — pins the fixed-iteration variant to a grain an
    external oracle (summing in a different order) reproduces exactly.
    """
    if metric not in ("l2", "cosine"):
        raise ValueError(f"unknown metric: {metric!r}")
    if init_centroids is not None:
        cents = np.asarray(init_centroids, dtype=np.float64).copy()
        if metric == "cosine":
            cents = _normalize(cents)
    else:
        first = next(iter(emb_ds.select_columns([emb_col]).iter_batches(
            batch_format="pyarrow", batch_size=max(int(k) * 8, 256))), None)
        if first is None or first.num_rows == 0:
            raise ValueError("kmeans_fit: empty embedding dataset")
        m0 = _matrix(first[emb_col])
        if metric == "cosine":
            m0 = _normalize(m0)
        rng = np.random.default_rng(seed)
        cents = m0[rng.choice(len(m0), size=min(int(k), len(m0)),
                              replace=False)].copy()

    inertia = []
    for _ in range(int(iters)):
        ref = ray.put(cents)
        mt = metric

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _matrix(batch[emb_col])
            a, d = _assign_codes(m, c, mt)
            if mt == "cosine":
                m = _normalize(m)
            kc, dim = c.shape
            sums = np.zeros((kc, dim))
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=kc).astype(np.int64)
            dsum = np.zeros(kc)
            np.add.at(dsum, a, d)
            return pa.table({
                "centroid": np.arange(kc, dtype=np.int64),
                "vsum": [row.tolist() for row in sums],
                "n": counts,
                "dsum": dsum,
            })

        tot = np.zeros_like(cents)
        cnt = np.zeros(len(cents), dtype=np.int64)
        dtot = 0.0
        for b in emb_ds.map_batches(partials, batch_format="pyarrow",
                                    batch_size=8192).iter_batches(
                batch_format="pyarrow"):
            cid = b["centroid"].to_numpy(zero_copy_only=False)
            tot[cid] += _stack(b["vsum"].to_pylist())
            cnt[cid] += b["n"].to_numpy(zero_copy_only=False)
            dtot += float(np.sum(b["dsum"].to_numpy(
                zero_copy_only=False)))
        inertia.append(dtot)
        nz = cnt > 0
        new = cents.copy()
        new[nz] = tot[nz] / cnt[nz, None]
        if metric == "cosine":
            new[nz] = _normalize(new[nz])
        if round_to is not None:
            new = np.round(new, round_to)
        shift = float(np.max(np.linalg.norm(new - cents, axis=1))) \
            if len(cents) else 0.0
        cents = new
        if shift < tol:
            break
    return cents, inertia


def kmeans_assign(emb_ds, centroids, emb_col="embedding", metric="l2",
                  out_col="cluster", dist_col=None):
    """Append the nearest-centroid id (and optionally the squared
    distance) — one streaming pass against broadcast centroids."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _matrix(batch[emb_col])
        a, d = _assign_codes(m, c, metric)
        out = batch.append_column(out_col, pa.array(a.astype(np.int64)))
        if dist_col:
            out = out.append_column(dist_col, pa.array(d))
        return out

    return emb_ds.map_batches(assign, batch_format="pyarrow",
                              batch_size=8192)


def diversity_sample(emb_ds, k_clusters, per_cluster, id_col="vec_id",
                     emb_col="embedding", iters=10, seed=42,
                     metric="l2", salt=0):
    """Cluster-balanced sample: k-means the corpus, then take exactly
    ``min(per_cluster, |cluster|)`` rows per cluster (smallest key hash
    — `sampling.quota_sample`). The standard semantic-diversity
    downsampling move for training mixes: over-represented regions of
    embedding space can't dominate the sample."""
    from .sampling import quota_sample

    cents, _ = kmeans_fit(emb_ds, k_clusters, iters=iters,
                          emb_col=emb_col, seed=seed, metric=metric)
    assigned = kmeans_assign(emb_ds, cents, emb_col=emb_col,
                             metric=metric)
    return quota_sample(assigned, "cluster", per_cluster,
                        key_col=id_col, salt=salt)


def silhouette_simplified(emb_ds, centroids, id_col="vec_id",
                          emb_col="embedding", batch_size=8192):
    """Simplified silhouette (Hruschka et al. 2004) — the standard
    clustering-quality score at scale: per vector, ``a`` = L2 distance
    to its OWN centroid, ``b`` = distance to the nearest OTHER
    centroid, ``s = (b − a) / max(a, b)`` (0 when both are 0). Unlike
    the classic silhouette's O(n²) pairwise distances, this needs only
    the k broadcast centroids — ONE streaming pass, the corpus never
    shuffles.

    Assignment = argmin squared distance with ties to the lowest
    centroid id (the :func:`kmeans_assign` contract); distances use
    the explicit ``Σ(x−c)²`` form so a SQL twin's grouped sum matches
    within a round-8 grain. Returns ``(id, cluster, sil)``."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _matrix(batch[emb_col])
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1)
        own = np.argmin(d2, axis=1)
        rows = np.arange(len(m))
        a2 = d2[rows, own]
        d2[rows, own] = np.inf
        b2 = d2.min(axis=1)
        a = np.sqrt(a2)
        b = np.sqrt(b2)
        mx = np.maximum(a, b)
        s = np.where(mx > 0, (b - a) / np.where(mx > 0, mx, 1.0), 0.0)
        return pa.table({id_col: batch[id_col],
                         "cluster": own.astype(np.int64),
                         "sil": s})

    return emb_ds.map_batches(score, batch_format="pyarrow",
                              batch_size=batch_size)


def davies_bouldin(emb_ds, centroids, emb_col="embedding",
                   batch_size=8192):
    """Per-cluster Davies-Bouldin similarity score (Davies & Bouldin
    1979): with ``s_i`` = mean L2 distance of cluster-i members to
    their centroid and ``m_ij`` = L2 distance between centroids ``i``
    and ``j``, each non-empty cluster scores
    ``r_i = max_{j≠i, m_ij>0} (s_i + s_j) / m_ij`` — lower is
    better-separated (the classic DB index is the mean of the r_i).

    Scale shape: ONE streaming pass against the k broadcast centroids
    emitting per-batch ``(cluster, n, Σdist)`` partials (the
    :func:`silhouette_simplified` posture — the corpus never
    shuffles); the k×k finish runs on the driver. Assignment = argmin
    squared L2 with ties to the lowest centroid id (the
    :func:`kmeans_assign` contract). Callers comparing against a SQL
    twin round to ~6 decimals (Σ√d summation order is unspecified).
    Clusters with no positive-distance partner pin ``r = 0.0``.
    Returns ``(cluster, n, r)`` for non-empty clusters."""
    c = np.asarray(centroids, dtype=np.float64)
    k = len(c)
    ref = ray.put(c)

    def partial(batch: pa.Table) -> pa.Table:
        cc = ray.get(ref)
        m = _matrix(batch[emb_col])
        d2 = ((m[:, None, :] - cc[None, :, :]) ** 2).sum(axis=-1)
        own = np.argmin(d2, axis=1)
        dist = np.sqrt(d2[np.arange(len(m)), own])
        n = np.bincount(own, minlength=k).astype(np.int64)
        sd = np.bincount(own, weights=dist, minlength=k)
        return pa.table({"cluster": np.arange(k, dtype=np.int64),
                         "n": n, "sd": sd})

    tabs = [b for b in emb_ds.map_batches(
                partial, batch_format="pyarrow",
                batch_size=batch_size).iter_batches(
                    batch_format="pyarrow", batch_size=None)
            if b.num_rows and "sd" in b.column_names]
    empty = pa.table({"cluster": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "r": pa.array([], pa.float64())})
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="permissive")
    cl = t["cluster"].to_numpy(zero_copy_only=False)
    n = np.zeros(k, dtype=np.int64)
    sd = np.zeros(k, dtype=np.float64)
    np.add.at(n, cl, t["n"].to_numpy(zero_copy_only=False))
    np.add.at(sd, cl, t["sd"].to_numpy(zero_copy_only=False))
    live = np.flatnonzero(n > 0)
    if len(live) == 0:
        return empty
    s = np.zeros(k)
    s[live] = sd[live] / n[live]
    dm = np.sqrt(((c[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1))
    r = np.zeros(len(live))
    for a, i in enumerate(live):
        best = 0.0
        for j in live:
            if j != i and dm[i, j] > 0:
                best = max(best, (s[i] + s[j]) / dm[i, j])
        r[a] = best
    return pa.table({"cluster": live.astype(np.int64),
                     "n": n[live], "r": r})


def calinski_harabasz(emb_ds, centroids, emb_col="embedding",
                      batch_size=8192):
    """Calinski-Harabasz variance-ratio score of a fixed clustering
    (Caliński & Harabasz 1974): ``CH = (B/(k−1)) / (W/(n−k))`` with
    ``W`` = Σ squared L2 of members to their (given) center and ``B`` =
    Σᵢ nᵢ·‖cᵢ − c̄‖² around the member-weighted center of centers
    ``c̄ = Σ nᵢcᵢ / n`` (equal to the data mean when the centers are
    exact cluster means) — higher is better-separated.

    Scale shape: ONE streaming pass against the k broadcast centroids
    emitting per-batch ``(cluster, n, Σd²)`` partials (the
    :func:`davies_bouldin` posture — the corpus never shuffles); the
    k×d finish runs on the driver. Assignment = argmin squared L2 with
    ties to the lowest centroid id (the :func:`kmeans_assign`
    contract). ``k`` counts NON-EMPTY clusters. Callers comparing
    against a SQL twin round to ~6 decimals (Σd² summation order is
    unspecified). Degenerate cases (k < 2, n ≤ k, or W = 0) pin 0.0.
    Returns a 1-row table ``(k, n, ch)``; empty input → 0 rows."""
    c = np.asarray(centroids, dtype=np.float64)
    k = len(c)
    ref = ray.put(c)

    def partial(batch: pa.Table) -> pa.Table:
        cc = ray.get(ref)
        m = _matrix(batch[emb_col])
        d2 = ((m[:, None, :] - cc[None, :, :]) ** 2).sum(axis=-1)
        own = np.argmin(d2, axis=1)
        n = np.bincount(own, minlength=k).astype(np.int64)
        sd2 = np.bincount(own, weights=d2[np.arange(len(m)), own],
                          minlength=k)
        return pa.table({"cluster": np.arange(k, dtype=np.int64),
                         "n": n, "sd2": sd2})

    tabs = [b for b in emb_ds.map_batches(
                partial, batch_format="pyarrow",
                batch_size=batch_size).iter_batches(
                    batch_format="pyarrow", batch_size=None)
            if b.num_rows and "sd2" in b.column_names]
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "ch": pa.array([], pa.float64())})
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="permissive")
    cl = t["cluster"].to_numpy(zero_copy_only=False)
    n = np.zeros(k, dtype=np.int64)
    w = np.zeros(k, dtype=np.float64)
    np.add.at(n, cl, t["n"].to_numpy(zero_copy_only=False))
    np.add.at(w, cl, t["sd2"].to_numpy(zero_copy_only=False))
    live = np.flatnonzero(n > 0)
    n_tot = int(n.sum())
    k_live = len(live)
    W = float(w.sum())
    ch = 0.0
    if k_live >= 2 and n_tot > k_live and W > 0:
        cbar = (n[live, None] * c[live]).sum(axis=0) / np.float64(n_tot)
        B = float((n[live] * ((c[live] - cbar) ** 2).sum(axis=1)).sum())
        ch = (B * np.float64(n_tot - k_live)) \
            / (W * np.float64(k_live - 1))
    return pa.table({"k": pa.array([k_live], pa.int64()),
                     "n": pa.array([n_tot], pa.int64()),
                     "ch": pa.array([float(ch)], pa.float64())})
