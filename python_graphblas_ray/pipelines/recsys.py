"""Co-visitation / bipartite-projection analytics over a (user, item)
interaction stream — the classic item-item collaborative-filtering
counts ("users who touched i also touched j") plus the cosine
normalization, built scale-first:

- ONE grouped-count exchange collapses the raw event stream to DISTINCT
  ``(user, item)`` rows (multiplicity is irrelevant for co-visitation).
- ONE user-keyed exchange co-locates each user's basket; a single
  vectorized cross-basket pass (repeat/arange combination expansion —
  no per-user Python) emits each unordered item pair once (``i < j``)
  and pre-aggregates the pair counts WITHIN the partition before the
  final bounded grouped sum, so the shuffle carries at most
  ``|items|²`` rows per partition, never the quadratic pair stream.
- Heavy baskets are the quadratic hazard: a user with 10⁵ distinct
  items contributes 5·10⁹ pairs of pure noise. ``max_basket`` DROPS
  such users entirely (the standard recsys guard — same posture as the
  hot-word df guard in ``dedup.word_jaccard_pairs``); the cut is
  deterministic so an SQL twin reproduces it exactly.
- ``cosine(i, j) = c_ij / sqrt(c_i · c_j)`` where ``c_i`` is the
  distinct-user count of item i: integers in, ONE IEEE sqrt + divide
  out — bit-exact against a SQL twin, no rounding grain. The item
  marginal table is bounded by the item vocabulary and is broadcast
  (``ray.put`` once), never re-shipped per batch.

No analogue in the reference (python-graphblas has no bipartite
projection); the adjacency-set formulation mirrors its
``plus_pair`` mxm semantics (reference: graphblas/core/matrix.py mxm)
applied to the user-item incidence matrix.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _distinct_user_item(events_ds, user_col, item_col):
    from ..stages.reduce import grouped_agg

    return grouped_agg(
        events_ds.select_columns([user_col, item_col]),
        [user_col, item_col], [(item_col, "count", "_c")])


def item_covisitation(events_ds, user_col="user_id", item_col="item",
                      max_basket=256, num_partitions=None):
    """Item-item co-visitation counts + cosine similarity.

    Returns a Dataset ``(i, j, c, cosine)`` with ``i < j``: ``c`` =
    number of distinct users who interacted with BOTH items (users with
    more than ``max_basket`` distinct items are dropped — quadratic-
    noise guard), ``cosine = c / sqrt(c_i · c_j)`` over the distinct-
    user item marginals of the SAME guarded population. All counts are
    integers; cosine is one sqrt + one divide — bit-exact vs SQL."""
    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import grouped_agg

    ui = _distinct_user_item(events_ds, user_col, item_col)

    empty = pa.table({"i": pa.array([], pa.int64()),
                      "j": pa.array([], pa.int64()),
                      "c": pa.array([], pa.int64())})

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or item_col not in t.column_names:
            return empty
        u = t[user_col].to_numpy(zero_copy_only=False)
        it = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, u))
        u, it = u[order], it[order]
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        sizes = np.diff(np.append(starts, len(u)))
        keep_seg = (sizes >= 2) & (sizes <= max_basket)
        if not keep_seg.any():
            return empty
        mask = np.repeat(keep_seg, sizes)
        it = it[mask]
        sizes = sizes[keep_seg]
        n = len(it)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        # combination expansion: element at in-segment position p pairs
        # with the (size - 1 - p) items after it; all users at once
        pos = np.arange(n) - np.repeat(starts, sizes)
        rem = np.repeat(sizes, sizes) - 1 - pos
        first = np.repeat(np.arange(n), rem)
        cum = np.cumsum(rem) - rem
        second = first + 1 + (np.arange(rem.sum()) - np.repeat(cum, rem))
        # items are distinct and ascending within a basket -> i < j
        i, j = it[first], it[second]
        # pre-aggregate within the partition (bounded by |items|^2)
        pk = np.stack([i, j])
        uniq, cnt = np.unique(pk, axis=1, return_counts=True)
        return pa.table({"i": uniq[0], "j": uniq[1],
                         "c": cnt.astype(np.int64)})

    partial = hash_exchange_apply(ui, user_col, pairs,
                                  num_partitions=num_partitions)
    pc_counts = grouped_agg(partial, ["i", "j"], [("c", "sum", "c")])

    # item marginals of the SAME guarded population (bounded by the
    # item vocabulary): distinct-user count per item among kept users
    def marginals(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or item_col not in t.column_names:
            return pa.table({item_col: pa.array([], pa.int64()),
                             "ci": pa.array([], pa.int64())})
        u = t[user_col].to_numpy(zero_copy_only=False)
        it = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, u))
        u, it = u[order], it[order]
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        sizes = np.diff(np.append(starts, len(u)))
        keep = np.repeat((sizes >= 2) & (sizes <= max_basket), sizes)
        it = it[keep]
        items, cnt = np.unique(it, return_counts=True)
        return pa.table({item_col: items, "ci": cnt.astype(np.int64)})

    marg = grouped_agg(
        hash_exchange_apply(ui, user_col, marginals,
                            num_partitions=num_partitions),
        [item_col], [("ci", "sum", "ci")])
    mt = marg.materialize()
    if mt.count() == 0:
        return ray.data.from_arrow(empty.append_column(
            "cosine", pa.array([], pa.float64())))
    cm = {}
    for b in mt.iter_batches(batch_format="pyarrow"):
        if b.num_rows and "ci" in b.column_names:
            for k, v in zip(b[item_col].to_pylist(), b["ci"].to_pylist()):
                cm[int(k)] = int(v)
    items = np.array(sorted(cm), dtype=np.int64)
    counts = np.array([cm[k] for k in items], dtype=np.int64)
    lut_ref = ray.put((items, counts))

    def cosine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c" not in batch.column_names:
            return empty.append_column("cosine",
                                       pa.array([], pa.float64()))
        its, cts = ray.get(lut_ref)
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = cts[np.searchsorted(its, i)]
        cj = cts[np.searchsorted(its, j)]
        cos = c / np.sqrt((ci * cj).astype(np.float64))
        return pa.table({"i": i, "j": j, "c": c, "cosine": cos})

    return pc_counts.map_batches(cosine, batch_format="pyarrow")
