"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk``   — exact brute-force cosine top-k: the (small) query matrix
  is broadcast once via ``ray.put``; every corpus batch does one numpy
  matmul and emits per-batch top-k candidates; a final per-query
  ``groupby.map_groups`` merges candidates into the global top-k. The
  corpus streams — nothing is materialized driver-side.
- ``ivf_build`` / ``ivf_search`` — the scale path: k-means (Lloyd over
  ``map_batches`` partial sums) → bucket assignment (one shuffle) →
  search probes only ``nprobe`` nearest buckets.

No reference analogue (the reference has no similarity surface); this is
first-class training-data-pipeline surface per the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _stack(col_list) -> np.ndarray:
    return np.stack([np.asarray(x, dtype=np.float64) for x in col_list])


def _matrix(col) -> np.ndarray:
    """Arrow ``list<float>`` column → (n, d) float64 matrix WITHOUT
    per-row Python: flatten the child values buffer and reshape (all
    embedding rows share one width)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        w = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False).reshape(-1, w)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    lens = offs[1:] - offs[:-1]
    if len(lens) == 0:
        return np.empty((0, 0), dtype=np.float64)
    w = int(lens[0])
    if not (lens == w).all():  # ragged — fall back to the slow path
        return _stack(col.to_pylist())
    flat = col.values.to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False)
    return flat[offs[0]:offs[-1]].reshape(-1, w)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def ann_topk(emb_ds, query_ids, k=10, id_col="vec_id", emb_col="embedding",
             exclude_self=True):
    """Exact top-k cosine neighbors for each query id.

    Returns a Dataset ``(query_id, neighbor_id, rank)`` with rank 1..k by
    descending cosine (ties broken by neighbor id asc — deterministic).
    """
    query_ids = np.unique(np.asarray(query_ids, dtype=np.int64))

    # gather the query vectors (small side) — one streaming pass
    got_ids, got_m = [], []
    for b in emb_ds.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 16):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        hit = np.isin(ids, query_ids)
        if hit.any():
            got_ids.append(ids[hit])
            got_m.append(_matrix(b[emb_col].filter(pa.array(hit))))
    _empty = pa.table({"query_id": pa.array([], pa.int64()),
                       "neighbor_id": pa.array([], pa.int64()),
                       "sim": pa.array([], pa.float64())})
    if not got_ids:  # none of the query ids exist in the corpus
        return ray.data.from_arrow(pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64())}))
    qids = np.concatenate(got_ids)
    order = np.argsort(qids)
    qids = qids[order]
    qm = _normalize(np.concatenate(got_m)[order])
    ref = ray.put((qids, qm))

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # shuffle stages emit 0-row blocks
            return _empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(batch[emb_col]))
        qi, q = ray.get(ref)
        sims = q @ m.T                      # (nq, batch)
        nq, nb = sims.shape
        take = min(k + (1 if exclude_self else 0), nb)
        part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        rowq = np.repeat(qi, take)
        cols = part.ravel()
        return pa.table({
            "query_id": rowq,
            "neighbor_id": ids[cols],
            "sim": sims[np.repeat(np.arange(nq), take), cols],
        })

    cand = emb_ds.map_batches(candidates, batch_format="pyarrow",
                              batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        q = group["query_id"][0].as_py()
        nid = group["neighbor_id"].to_numpy(zero_copy_only=False)
        sim = group["sim"].to_numpy(zero_copy_only=False)
        if exclude_self:
            keep = nid != q
            nid, sim = nid[keep], sim[keep]
        order = np.lexsort((nid, -sim))[:k]
        return pa.table({
            "query_id": np.full(len(order), q, dtype=np.int64),
            "neighbor_id": nid[order],
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
        })

    return cand.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (inverted-file) — the at-scale variant
# ---------------------------------------------------------------------------

def ivf_build(emb_ds, num_centroids=16, iters=5, id_col="vec_id",
              emb_col="embedding", seed=42):
    """K-means centroids via distributed Lloyd iterations: each iteration is
    one ``map_batches`` producing per-batch (sum, count) partials per
    centroid + a driver-side combine — no shuffle of the corpus. Returns
    ``(centroids, assignments_ds)`` where assignments adds a ``bucket``
    column (the one shuffle happens only if the caller groups by it)."""
    first = next(iter(emb_ds.select_columns([emb_col]).iter_batches(
        batch_format="pyarrow", batch_size=max(num_centroids * 8, 256))),
        None)
    if first is None or first.num_rows == 0:
        raise ValueError("ivf_build: empty embedding dataset")
    m0 = _normalize(_matrix(first[emb_col]))
    rng = np.random.default_rng(seed)
    cents = m0[rng.choice(len(m0), size=min(num_centroids, len(m0)),
                          replace=False)]

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _normalize(_matrix(batch[emb_col]))
            a = np.argmax(m @ c.T, axis=1)
            kc, d = c.shape
            sums = np.zeros((kc, d))
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=kc).astype(np.int64)
            return pa.table({
                "centroid": np.arange(kc, dtype=np.int64),
                "vsum": [row.tolist() for row in sums],
                "n": counts,
            })

        tot = np.zeros_like(cents)
        cnt = np.zeros(len(cents), dtype=np.int64)
        for b in emb_ds.map_batches(partials, batch_format="pyarrow",
                                    batch_size=8192).iter_batches(
                batch_format="pyarrow"):
            cid = b["centroid"].to_numpy(zero_copy_only=False)
            tot[cid] += _stack(b["vsum"].to_pylist())
            cnt[cid] += b["n"].to_numpy(zero_copy_only=False)
        nz = cnt > 0
        cents[nz] = _normalize(tot[nz] / cnt[nz, None])

    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_matrix(batch[emb_col]))
        a = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(a))

    return cents, emb_ds.map_batches(assign, batch_format="pyarrow",
                                     batch_size=8192)


def ivf_search(centroids, assigned_ds, query_vec, k=10, nprobe=4,
               id_col="vec_id", emb_col="embedding"):
    """Search only the ``nprobe`` buckets nearest to the query: a filter
    (pruned scan) + per-batch matmul + driver-side merge of ≤ k·nblocks
    candidates. Returns ``(ids, sims)`` arrays sorted by descending sim."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-30)
    probe = set(np.argsort(-(centroids @ q))[:nprobe].tolist())

    def scan(batch: pa.Table) -> pa.Table:
        sel = np.isin(batch["bucket"].to_numpy(zero_copy_only=False),
                      list(probe))
        sub = batch.filter(pa.array(sel))
        if sub.num_rows == 0:
            return pa.table({"nid": np.array([], dtype=np.int64),
                             "sim": np.array([], dtype=np.float64)})
        m = _normalize(_matrix(sub[emb_col]))
        sims = m @ q
        take = min(k, len(sims))
        top = np.argpartition(-sims, take - 1)[:take]
        return pa.table({"nid": sub[id_col].to_numpy(
            zero_copy_only=False)[top], "sim": sims[top]})

    nid, sim = [], []
    for b in assigned_ds.map_batches(scan, batch_format="pyarrow",
                                     batch_size=8192).iter_batches(
            batch_format="pyarrow"):
        nid.append(b["nid"].to_numpy(zero_copy_only=False))
        sim.append(b["sim"].to_numpy(zero_copy_only=False))
    nid = np.concatenate(nid) if nid else np.array([], dtype=np.int64)
    sim = np.concatenate(sim) if sim else np.array([], dtype=np.float64)
    order = np.lexsort((nid, -sim))[:k]
    return nid[order], sim[order]

def ivf_search_batch(centroids, assigned_ds, query_ids, query_matrix, k=10,
                     nprobe=4, id_col="vec_id", emb_col="embedding",
                     exclude_self=True):
    """Batched IVF search over a query SET (the scale form of ann_topk):
    broadcast (query ids, normalized query matrix, per-query probe-bucket
    bitmap) once; each corpus batch computes ONE masked matmul — a query
    only scores rows whose bucket is in its probe set — and emits per-batch
    top-k candidates; a per-query merge finishes. Corpus streams; work is
    ~``nprobe/num_centroids`` of brute force.

    Returns a Dataset ``(query_id, neighbor_id, rank)`` like ``ann_topk``.
    """
    query_ids = np.asarray(query_ids, dtype=np.int64)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    nc = len(centroids)
    # (nq, nc) probe bitmap
    sims_c = qm @ centroids.T
    take_c = min(nprobe, nc)
    # stable sort: probe ties break toward the lower centroid id
    # (deterministic — and SQL-replayable for the fixed-centroid oracle)
    probe_cols = np.argsort(-sims_c, axis=1, kind="stable")[:, :take_c]
    probe = np.zeros((len(query_ids), nc), dtype=bool)
    probe[np.repeat(np.arange(len(query_ids)), take_c),
          probe_cols.ravel()] = True
    ref = ray.put((query_ids, qm, probe))

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # shuffle stages emit 0-row blocks
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        qi, q, pr = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bkt = batch["bucket"].to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(batch[emb_col]))
        sims = q @ m.T                        # (nq, nb)
        sims[~pr[:, bkt]] = -np.inf           # probe-bucket mask
        nq, nb = sims.shape
        take = min(k + (1 if exclude_self else 0), nb)
        part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        rowq = np.repeat(np.arange(nq), take)
        cols = part.ravel()
        s = sims[rowq, cols]
        keep = np.isfinite(s)
        return pa.table({
            "query_id": np.repeat(qi, take)[keep],
            "neighbor_id": ids[cols][keep],
            "sim": s[keep],
        })

    cand = assigned_ds.map_batches(candidates, batch_format="pyarrow",
                                   batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        q = group["query_id"][0].as_py()
        nid = group["neighbor_id"].to_numpy(zero_copy_only=False)
        sim = group["sim"].to_numpy(zero_copy_only=False)
        if exclude_self:
            kp = nid != q
            nid, sim = nid[kp], sim[kp]
        order = np.lexsort((nid, -sim))[:k]
        return pa.table({
            "query_id": np.full(len(order), q, dtype=np.int64),
            "neighbor_id": nid[order],
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
        })

    return cand.groupby("query_id").map_groups(merge,
                                               batch_format="pyarrow")


def ann_topk_ivf(emb_ds, query_ids, k=10, nprobe=4, num_centroids=None,
                 id_col="vec_id", emb_col="embedding"):
    """ann_topk through the IVF index (build → assign → batched probe
    search). The at-scale default: brute force stays the small-N oracle."""
    query_ids = np.unique(np.asarray(query_ids, dtype=np.int64))
    if num_centroids is None:
        n = emb_ds.count()
        num_centroids = max(4, int(np.sqrt(max(n, 1))))
    cents, assigned = ivf_build(emb_ds, num_centroids=num_centroids,
                                id_col=id_col, emb_col=emb_col)
    assigned = assigned.materialize()
    got_ids, got_m = [], []
    for b in assigned.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 16):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        hit = np.isin(ids, query_ids)
        if hit.any():
            got_ids.append(ids[hit])
            got_m.append(_matrix(b[emb_col].filter(pa.array(hit))))
    if not got_ids:  # none of the query ids exist in the corpus
        return ray.data.from_arrow(pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64())}))
    qids = np.concatenate(got_ids)
    order = np.argsort(qids)
    return ivf_search_batch(cents, assigned, qids[order],
                            np.concatenate(got_m)[order], k=k,
                            nprobe=nprobe, id_col=id_col, emb_col=emb_col)


def gram_matrix(emb_ds, emb_col="embedding", mean=True):
    """Distributed second-moment (uncentered Gram) matrix of the
    embedding column: ``G = Eᵀ E / n`` (``mean=False`` skips the ``/n``)
    → ``(G, n)`` with ``G`` a (d, d) float64 numpy array.

    Scale shape: ONE streaming ``map_batches`` pass, each batch emitting
    a single d×d float64 partial (d² floats — 32 KB at d=64) as one
    output row; the corpus never shuffles and never materializes. The
    driver sums the O(num_blocks) tiny partials — at fleet scale these
    tree-reduce, but the partial itself is already block-size-free.
    Summation order across partials is NOT the single-process order, so
    downstream exact-match contracts must round below the ~1e-14
    relative partial-order noise (the suite queries round to 8
    decimals on O(0.01–1) values)."""

    def partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch[emb_col])
        g = (m.T @ m) if m.size else np.zeros((0, 0))
        return pa.table({
            "g": pa.array([g.reshape(-1)], type=pa.list_(pa.float64())),
            "d": pa.array([g.shape[0]], type=pa.int64()),
            "n": pa.array([len(m)], type=pa.int64()),
        })

    parts = emb_ds.map_batches(partial, batch_format="pyarrow").take_all()
    d = max((int(p["d"]) for p in parts), default=0)
    g = np.zeros((d, d), dtype=np.float64)
    n = 0
    for p in parts:
        if int(p["d"]) == d and d:
            g += np.asarray(p["g"], dtype=np.float64).reshape(d, d)
        n += int(p["n"])
    if mean and n:
        g /= n
    return g, n


def pc1_power(g: np.ndarray, iters: int = 2) -> np.ndarray:
    """Fixed-iteration UNNORMALIZED power iteration on a (d, d) Gram
    matrix from the all-ones start: ``y ← G @ y`` repeated ``iters``
    times. With ``G`` mean-scaled the entries stay O(1), so the result
    is exact-contract-friendly (no norm step whose sqrt would amplify
    summation-order noise); direction converges to the top principal
    axis as ``iters`` grows. Pure O(d²) driver work — the distributed
    part is building ``G`` (:func:`gram_matrix`)."""
    y = np.ones(g.shape[0], dtype=np.float64)
    for _ in range(iters):
        y = g @ y
    return y


def random_projection(emb_ds, k=8, id_col="vec_id", emb_col="embedding"):
    """Johnson-Lindenstrauss ±1 sign projection (Achlioptas 2003,
    database-friendly random projections): ``y = E @ Sᵀ`` where
    ``S[j, i] = +1`` if bit 0 of ``splitmix64(j·d + i)`` else ``-1`` —
    fully deterministic, so an external oracle can replay the sign
    matrix bit-for-bit. Distances are preserved in expectation up to
    the usual JL ``√k`` scale (left unapplied to keep the contract a
    pure signed sum).

    Scale shape: the (k, d) sign matrix is O(k·d) driver bytes built
    once per batch-fn closure; each corpus batch pays ONE (n, d)×(d, k)
    matmul and emits n·k rows — streaming, no shuffle, no
    materialization. Returns a Dataset (id_col, j, v)."""
    from ..state.superstep import _splitmix64

    def project(batch: pa.Table) -> pa.Table:
        m = _matrix(batch[emb_col])
        d = m.shape[1] if m.size else 0
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if not d:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        h = _splitmix64(np.arange(k * d, dtype=np.uint64))
        signs = np.where(h & np.uint64(1), 1.0, -1.0).reshape(k, d)
        y = m @ signs.T
        return pa.table({
            id_col: np.repeat(ids, k),
            "j": np.tile(np.arange(k, dtype=np.int64), len(ids)),
            "v": y.reshape(-1),
        })

    return emb_ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011) — the compressed-domain
# ANN scale path: d-dim vectors → m sub-codes of log2(ksub) bits each, so
# a 100 TB float corpus compresses ~128× and distance evaluation becomes
# m table lookups per vector (ADC).
# ---------------------------------------------------------------------------


def pq_onehot_codebooks(d, m=8):
    """Fixed, externally replayable codebooks: subspace ``s`` uses the
    ``dsub`` unit one-hot vectors (ksub = dsub). argmin L2 then equals
    argmax of the subvector element (ties → lower code), which a SQL
    oracle replays with pure comparisons — the fixed-centroid analogue
    of ``ann_ivf_fixed``. Shape (m, dsub, dsub)."""
    if d % m:
        raise ValueError(f"d={d} not divisible by m={m}")
    dsub = d // m
    return np.broadcast_to(np.eye(dsub), (m, dsub, dsub)).copy()


def _pq_assign(x, codebooks):
    """(n, d) → (n, m) int64 codes: per subspace, argmin_j of
    ``||c_j||² − 2·x·c_j`` (the ``||x||²`` term is code-independent).
    First-minimum ties → lower code; the linear form keeps the argmin
    exactly monotone in the matched component for one-hot codebooks."""
    n, d = x.shape
    m, ksub, dsub = codebooks.shape
    xs = x.reshape(n, m, dsub)
    # scores[s] = x_s @ C_s.T  (n, ksub); c2[s, j] = ||C_sj||²
    scores = np.einsum("nsd,sjd->nsj", xs, codebooks)
    c2 = np.einsum("sjd,sjd->sj", codebooks, codebooks)
    return np.argmin(c2[None, :, :] - 2.0 * scores, axis=2)


def pq_fit(emb_ds, m=8, ksub=8, iters=5, emb_col="embedding", seed=42):
    """Per-subspace Lloyd k-means, all ``m`` subspaces in ONE streaming
    pass per iteration: each batch assigns codes and emits (sum, count)
    partials per (subspace, code) — m·ksub·dsub floats, tree-reducible —
    so the corpus never shuffles or materializes. Deterministic seeded
    init from the first batch (house ``kmeans_fit`` convention). Empty
    cells keep their previous centroid. Returns (m, ksub, dsub)."""
    first = next(iter(emb_ds.select_columns([emb_col]).iter_batches(
        batch_format="pyarrow", batch_size=max(int(ksub) * 8, 256))), None)
    if first is None or first.num_rows == 0:
        raise ValueError("pq_fit: empty embedding dataset")
    m0 = _matrix(first[emb_col])
    d = m0.shape[1]
    if d % m:
        raise ValueError(f"d={d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(m0), size=min(int(ksub), len(m0)),
                      replace=False)
    cents = np.ascontiguousarray(
        m0[pick].reshape(len(pick), m, dsub).transpose(1, 0, 2))

    for _ in range(int(iters)):
        ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = _matrix(batch[emb_col])
            if x.size == 0:
                return pa.table({"cell": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(
                                     pa.float64()))})
            mm, kk, dd = c.shape
            codes = _pq_assign(x, c)                       # (n, m)
            xs = x.reshape(len(x), mm, dd)
            cell = (np.arange(mm)[None, :] * kk + codes).ravel()
            u_cell, inv = np.unique(cell, return_inverse=True)
            cnt = np.bincount(inv)
            vs = np.zeros((len(u_cell), dd))
            np.add.at(vs, inv, xs.reshape(-1, dd))
            return pa.table({
                "cell": u_cell.astype(np.int64),
                "cnt": cnt.astype(np.int64),
                "vsum": pa.array(list(vs), type=pa.list_(pa.float64())),
            })

        agg_cnt = np.zeros(m * ksub, dtype=np.int64)
        agg_sum = np.zeros((m * ksub, dsub))
        for b in emb_ds.map_batches(partials, batch_format="pyarrow",
                                    batch_size=8192).iter_batches(
                batch_format="pyarrow", batch_size=None):
            cell = b["cell"].to_numpy(zero_copy_only=False)
            np.add.at(agg_cnt, cell,
                      b["cnt"].to_numpy(zero_copy_only=False))
            np.add.at(agg_sum, cell, _matrix(b["vsum"]))
        nz = agg_cnt > 0
        new = cents.reshape(-1, dsub).copy()
        new[nz] = agg_sum[nz] / agg_cnt[nz, None]
        cents = new.reshape(m, ksub, dsub)
    return cents


def pq_encode(emb_ds, codebooks, id_col="vec_id", emb_col="embedding"):
    """Corpus → PQ codes in long form: Dataset ``(id_col, sub, code)``
    — one streaming assignment pass, no shuffle. ``codebooks`` is
    broadcast once via ``ray.put``."""
    cb = np.asarray(codebooks, dtype=np.float64)
    ref = ray.put(cb)
    mm = cb.shape[0]

    def encode(batch: pa.Table) -> pa.Table:
        x = _matrix(batch[emb_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if x.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sub": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64())})
        codes = _pq_assign(x, ray.get(ref))
        return pa.table({
            id_col: np.repeat(ids, mm),
            "sub": np.tile(np.arange(mm, dtype=np.int64), len(ids)),
            "code": codes.ravel().astype(np.int64),
        })

    return emb_ds.map_batches(encode, batch_format="pyarrow",
                              batch_size=8192)


def pq_adc_topk(emb_ds, codebooks, query_ids, k=10, id_col="vec_id",
                emb_col="embedding", round_to=None):
    """Asymmetric-distance top-k: each query builds an (m, ksub) lookup
    table of exact subspace distances ONCE; every corpus batch then
    pays m gathers + one sum per vector — the compressed-domain search
    that replaces the full matmul at scale. Ranking is on the raw
    distance (ties → neighbor id asc): like ``ann_ivf_fixed``, real
    embedding distance gaps dwarf summation-order noise, so an external
    oracle recomputing the same distances reproduces the ranking
    (``round_to`` optionally coarsens the key first). Returns a Dataset
    ``(query_id, neighbor_id, rank)``, self included.
    """
    cb = np.asarray(codebooks, dtype=np.float64)
    mm, kk, dd = cb.shape
    query_ids = np.unique(np.asarray(query_ids, dtype=np.int64))
    got_ids, got_m = [], []
    for b in emb_ds.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 16):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        hit = np.isin(ids, query_ids)
        if hit.any():
            got_ids.append(ids[hit])
            got_m.append(_matrix(b[emb_col].filter(pa.array(hit))))
    if not got_ids:
        return ray.data.from_arrow(pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64())}))
    qids = np.concatenate(got_ids)
    order = np.argsort(qids)
    qids = qids[order]
    qm = np.concatenate(got_m)[order]
    # lut[q, s, j] = ||q_s − c_sj||² — the per-(q, s, j) 8-term sums are
    # the only float reductions; everything else is gather + m-term sum
    diff = qm.reshape(len(qm), mm, 1, dd) - cb[None]
    lut = np.einsum("qsjd,qsjd->qsj", diff, diff)
    ref = ray.put((qids, lut, cb))
    _empty = pa.table({"query_id": pa.array([], pa.int64()),
                       "neighbor_id": pa.array([], pa.int64()),
                       "dist": pa.array([], pa.float64())})

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        qi, lt, c = ray.get(ref)
        x = _matrix(batch[emb_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        codes = _pq_assign(x, c)                       # (n, m)
        # dist[q, n] = Σ_s lut[q, s, codes[n, s]]
        d = lt[:, np.arange(mm)[None, :], codes].sum(axis=2)
        if round_to is not None:
            # half-AWAY (DuckDB ROUND), not banker's np.round — the
            # key must round identically to a SQL replay on ties
            p = 10.0 ** round_to
            d = np.floor(d * p + 0.5) / p  # distances are >= 0
        nq, nb = d.shape
        take = min(k, nb)
        # per-query (dist, id)-lexicographic selection: distinct code
        # vectors can yield EQUAL (rounded) distances, and the batch
        # cut must keep the same tie members the global merge would
        rows, cols = [], []
        for qi_ix in range(nq):
            sel = np.lexsort((ids, d[qi_ix]))[:take]
            rows.append(np.full(take, qi_ix))
            cols.append(sel)
        rr, cc = np.concatenate(rows), np.concatenate(cols)
        return pa.table({
            "query_id": qi[rr],
            "neighbor_id": ids[cc],
            "dist": d[rr, cc],
        })

    cand = emb_ds.map_batches(candidates, batch_format="pyarrow",
                              batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        q = group["query_id"][0].as_py()
        nid = group["neighbor_id"].to_numpy(zero_copy_only=False)
        dist = group["dist"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, dist))[:k]
        return pa.table({
            "query_id": np.full(len(order), q, dtype=np.int64),
            "neighbor_id": nid[order],
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
        })

    return cand.groupby("query_id").map_groups(merge,
                                               batch_format="pyarrow")


def mmr_select(emb_ds, query_id, k=5, lam=0.7, pool=32, id_col="vec_id",
               emb_col="embedding"):
    """Maximal Marginal Relevance diversity selection (Carbonell &
    Goldstein 1998) — the training-data / retrieval move that trades
    pure relevance for coverage: greedily pick
    ``argmax λ·cos(q, d) − (1−λ)·max_{s∈S} cos(d, s)``.

    Two stages, matching the quadratic cost structure: (1) a
    distributed exact top-``pool`` cosine prefilter against the
    broadcast query vector (per-batch top-pool candidates, the
    ``ann_topk`` shape — the corpus streams, never shuffles);
    (2) the O(pool²) greedy runs on the driver over the tiny pool,
    ties broken by (score desc, id asc). Returns a pyarrow table
    ``(vec_id, rank)`` with rank 1..k in selection order.
    """
    # -- query vector (one streaming scan, same as ann_topk)
    qvec = None
    for b in emb_ds.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 16):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        hit = np.flatnonzero(ids == query_id)
        if len(hit):
            qvec = _normalize(_matrix(b[emb_col]))[hit[0]]
            break
    if qvec is None:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    qref = ray.put(qvec)

    def cands(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "rel": pa.array([], pa.float64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(batch[emb_col]))
        rel = m @ ray.get(qref)
        keep = ids != query_id
        ids, rel, m = ids[keep], rel[keep], m[keep]
        take = min(pool, len(ids))
        if take < len(ids):
            # per-batch top-pool by (rel desc, id asc) — lexsort keeps
            # the boundary deterministic
            order = np.lexsort((ids, -rel))[:take]
            ids, rel, m = ids[order], rel[order], m[order]
        return pa.table({"vec_id": ids, "rel": rel,
                         "vec": pa.array(list(m), pa.list_(pa.float64()))})

    parts = [t for t in emb_ds.map_batches(
        cands, batch_format="pyarrow", batch_size=1 << 16).iter_batches(
            batch_format="pyarrow", batch_size=None) if t.num_rows]
    if not parts:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    rel = t["rel"].to_numpy(zero_copy_only=False)
    m = _matrix(t["vec"])
    order = np.lexsort((ids, -rel))[:min(pool, len(ids))]
    ids, rel, m = ids[order], rel[order], m[order]

    # -- greedy MMR over the pool
    sel = []
    chosen = np.zeros(len(ids), dtype=bool)
    maxsim = np.full(len(ids), -np.inf)
    for r in range(min(k, len(ids))):
        score = rel if r == 0 else lam * rel - (1.0 - lam) * maxsim
        score = np.where(chosen, -np.inf, score)
        # argmax with (score desc, id asc) tie-break
        best = np.lexsort((ids, -score))[0]
        sel.append(int(ids[best]))
        chosen[best] = True
        maxsim = np.maximum(maxsim, m @ m[best])
    return pa.table({"vec_id": np.asarray(sel, dtype=np.int64),
                     "rank": np.arange(1, len(sel) + 1, dtype=np.int64)})
