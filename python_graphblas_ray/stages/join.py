"""Join utilities over Ray Datasets.

GraphBLAS element-wise ops and mxm are index-aligned joins (SURVEY.md §2.3).
We use Ray Data's native hash-partitioned ``Dataset.join`` (Ray ≥2.46) for
the wide cases, and broadcast semi/anti-joins (``ray.put`` the key set once,
filter inside ``map_batches``) when one side is small — the 100 TB rule:
never shuffle the big side to meet a small side.

Empty-side handling: Ray 2.49's hash-shuffle join silently drops 0-row
blocks, so a side that is entirely empty reaches Acero as a zero-column
table and the join fails ("No match ... FieldRef"). Structural emptiness is
*normal* in GraphBLAS (empty masks, cleared containers). Two modes:

- default (``streaming=False``): materialize both sides, prune empty
  blocks, synthesize the result directly when a side is empty — measured
  fastest single-node (counts collapse tiny joins to 1 partition);
- ``streaming=True``: union a null-key sentinel row per side (null keys
  match nothing) so the join can never see an all-empty side, keeping the
  pipeline barrier-free — the multi-node scale mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

DEFAULT_JOIN_PARTITIONS = 16


def _num_join_partitions(total_rows):
    """Partitions sized to the data: ~500k rows per join partition. Tiny
    joins collapse to one partition (hash-shuffle fixed cost dominates
    them); the cap keeps very large joins within task-overhead sanity."""
    return max(1, min(64, int(total_rows) // 500_000 + 1))


def _materialize_clean(ds):
    """Materialize and drop 0-row blocks (Ray's aggregate/shuffle stages emit
    schema-less empties that break downstream Acero joins).

    Returns ``(clean_ds_or_None, pyarrow_schema_or_None, total_rows)``."""
    mat = ds.materialize()
    schema = None
    try:
        s = mat.schema(fetch_if_missing=True)
        if s is not None and s.names:
            schema = pa.schema([(n, t) for n, t in zip(s.names, s.types)])
    except Exception:
        pass
    refs, counts = [], []
    try:
        for bundle in mat.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                refs.append(block_ref)
                counts.append(meta.num_rows if meta.num_rows is not None else -1)
    except Exception:
        refs = mat.to_arrow_refs()
        counts = [-1] * len(refs)
    if any(c < 0 for c in counts):
        @ray.remote
        def _nrows(t):
            return t.num_rows
        counts = ray.get([_nrows.remote(r) for r in refs])
    nonempty = [r for r, c in zip(refs, counts) if c > 0]
    total = int(sum(c for c in counts if c > 0))
    if not nonempty:
        return None, schema, 0
    return ray.data.from_arrow_refs(nonempty), schema, total


def _join_name_maps(left_schema, right_schema, on, right_on,
                    left_suffix, right_suffix):
    """Replicate Ray 2.49 join output naming (observed behavior): the right
    key columns are dropped (coalesced into the left key columns); any name
    collision between remaining columns — keys included — gets the
    suffixes. Returns ``(left_map, right_map)`` of input→output names
    (right keys map to the left key's output name)."""
    ls, rs = (left_suffix or ""), (right_suffix or "")
    right_out = [f.name for f in right_schema if f.name not in right_on]
    left_names = set(left_schema.names)
    right_names = set(right_out)
    left_map = {f.name: (f.name + ls if f.name in right_names else f.name)
                for f in left_schema}
    right_map = {}
    for f in right_schema:
        if f.name in right_on:
            right_map[f.name] = left_map[on[list(right_on).index(f.name)]]
        else:
            right_map[f.name] = (f.name + rs if f.name in left_names
                                 else f.name)
    return left_map, right_map


def _suffixed_schema(left_schema, right_schema, on, right_on,
                     left_suffix, right_suffix):
    left_map, right_map = _join_name_maps(left_schema, right_schema, on,
                                          right_on, left_suffix, right_suffix)
    fields = [pa.field(left_map[f.name], f.type) for f in left_schema]
    fields += [pa.field(right_map[f.name], f.type) for f in right_schema
               if f.name not in right_on]
    return pa.schema(fields)


def _empty_side_result(present_ds, present_side, left_schema, right_schema,
                       on, right_on, how, left_suffix, right_suffix):
    """Join result when one side has zero rows, built without Ray's join.

    inner → empty with the joined schema; outer joins → the surviving
    side's rows with the other side's columns null."""
    out_schema = _suffixed_schema(left_schema, right_schema, on, right_on,
                                  left_suffix, right_suffix)
    keep_side = None
    if how == "full_outer":
        keep_side = present_side
    elif how == "left_outer" and present_side == "left":
        keep_side = "left"
    elif how == "right_outer" and present_side == "right":
        keep_side = "right"
    if keep_side is None or present_ds is None:
        return ray.data.from_arrow(out_schema.empty_table())

    left_map, right_map = _join_name_maps(left_schema, right_schema, on,
                                          right_on, left_suffix, right_suffix)
    side_map = left_map if keep_side == "left" else right_map
    side_schema = left_schema if keep_side == "left" else right_schema

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {f.name: pa.nulls(n, f.type) for f in out_schema}
        for f in side_schema:
            out_name = side_map[f.name]
            cols[out_name] = batch[f.name].cast(
                out_schema.field(out_name).type)
        return pa.table({f.name: cols[f.name] for f in out_schema})

    return present_ds.map_batches(expand, batch_format="pyarrow")


_SENT_L = "__sent_l__"
_SENT_R = "__sent_r__"


def _lazy_schema(ds):
    """Arrow schema of a (possibly lazy) Dataset — a cheap first-block
    peek, NOT a materialization."""
    try:
        s = ds.schema(fetch_if_missing=True)
        if s is not None and s.names:
            return pa.schema([(n, t) for n, t in zip(s.names, s.types)])
    except Exception:
        pass
    return None


def _with_sentinel(ds, schema, marker):
    """Union one all-null-key sentinel row (marker=True) onto ``ds`` and
    tag real rows marker=False. Null keys match nothing in the hash join
    (SQL semantics), so the sentinel only guarantees the side is never
    entirely empty — the case Ray 2.49's hash-shuffle join crashes on —
    without a materialization barrier."""
    cols = {f.name: pa.nulls(1, f.type) for f in schema}
    cols[marker] = pa.array([True])
    sent = ray.data.from_arrow(pa.table(cols))

    def mark(b: pa.Table) -> pa.Table:
        return b.append_column(
            marker, pa.array(np.zeros(b.num_rows, dtype=bool)))

    return ds.map_batches(mark, batch_format="pyarrow").union(sent)


def _hash_join_streaming(left, right, lschema, rschema, on, right_on, how,
                         left_suffix, right_suffix, num_partitions):
    import pyarrow.compute as pc

    ls = _with_sentinel(left, lschema, _SENT_L)
    rs = _with_sentinel(right, rschema, _SENT_R)
    out = ls.join(
        rs,
        join_type=how,
        num_partitions=num_partitions or DEFAULT_JOIN_PARTITIONS,
        on=on,
        right_on=right_on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )

    def strip(b: pa.Table) -> pa.Table:
        present = [m for m in (_SENT_L, _SENT_R) if m in b.column_names]
        keep = None
        for m in present:
            flag = pc.invert(pc.coalesce(b[m], pa.scalar(False)))
            keep = flag if keep is None else pc.and_(keep, flag)
        if keep is not None:
            b = b.filter(keep)
        return b.drop_columns(present)

    return out.map_batches(strip, batch_format="pyarrow")


def hash_join(left, right, on, right_on=None, how="inner",
              left_suffix=None, right_suffix=None, num_partitions=None,
              streaming=None):
    """Hash-partitioned join of two Datasets on key column(s).

    ``streaming=True``: no materialization barrier — each side gets a
    null-key sentinel row so an entirely-empty side can't crash the
    hash-shuffle (see ``_with_sentinel``); blocks pipeline straight into
    the join's shuffle. This is the multi-node scale mode: at cluster
    scale the barrier costs pipelining and buffers both sides.

    ``streaming=False``: materialize-and-prune. MEASURED faster
    on this single node (1.5 s vs 2.3-4.2 s per small join — the sentinel
    union + schema peek add fixed stages, and the count lets the
    partition heuristic collapse tiny joins to one partition). Also used
    automatically when a side's schema is unknowable.

    ``streaming=None`` (default): route by ``config["join_mode"]`` —
    "materialize" on a single node, flip to "streaming" cluster-wide
    with one config set (no per-call kwargs). The full driver window is
    parity-swept green in both modes."""
    if streaming is None:
        from .._config import config

        streaming = config["join_mode"] == "streaming"
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = on if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))
    if streaming:
        lschema = _lazy_schema(left)
        rschema = _lazy_schema(right)
        if lschema is not None and rschema is not None:
            return _hash_join_streaming(left, right, lschema, rschema, on,
                                        right_on, how, left_suffix,
                                        right_suffix, num_partitions)
    left_c, left_schema, left_n = _materialize_clean(left)
    right_c, right_schema, right_n = _materialize_clean(right)
    if left_n == 0 or right_n == 0:
        if left_n == 0 and right_n == 0:
            if left_schema is None or right_schema is None:
                # both sides legitimately empty and at least one schema
                # unrecoverable (0-row blocks skip map_batches UDFs):
                # the join result is empty — propagate the schema-less
                # empty instead of crashing (downstream stages tolerate
                # 0-row 0-column blocks)
                return ray.data.from_arrow(pa.table({}))
            return ray.data.from_arrow(_suffixed_schema(
                left_schema, right_schema, on, right_on,
                left_suffix, right_suffix).empty_table())
        if left_schema is None or right_schema is None:
            # the empty side's schema is unrecoverable (0-row blocks
            # skip map_batches UDFs) so the joined schema can't be
            # built — the result is empty anyway (inner/semi, and our
            # pipelines never outer-join a schema-less side); return a
            # schema-less empty rather than crash
            return ray.data.from_arrow(pa.table({}))
        present_ds, present_side = ((left_c, "left") if left_n
                                    else (right_c, "right"))
        return _empty_side_result(present_ds, present_side, left_schema,
                                  right_schema, on, right_on, how,
                                  left_suffix, right_suffix)
    num_partitions = num_partitions or _num_join_partitions(
        left_n + right_n)
    return left_c.join(
        right_c,
        join_type=how,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


def _key_view(arrs):
    """Pack 1-2 int64 key columns into one sortable array (i<<32|j when the
    second column fits 32 bits, else a structured-array view)."""
    if len(arrs) == 1:
        return np.asarray(arrs[0], dtype=np.int64)
    a = np.asarray(arrs[0], dtype=np.int64)
    b = np.asarray(arrs[1], dtype=np.int64)
    return (a << np.int64(32)) | b  # caller guarantees 0 <= b < 2**32


def broadcast_key_set(ds, key_cols):
    """Collect the distinct packed key set of ``ds`` to a sorted numpy array
    and ``ray.put`` it once (broadcast side of a semi/anti join). Only valid
    when the key set fits driver memory; callers document the scale path
    (shuffle semi-join) for when it does not."""
    packed = []
    for batch in ds.select_columns(list(key_cols)).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20):
        arrs = [batch[c].to_numpy(zero_copy_only=False) for c in key_cols]
        packed.append(np.unique(_key_view(arrs)))
    keys = (np.unique(np.concatenate(packed)) if packed
            else np.array([], dtype=np.int64))
    return ray.put(keys)


def semi_join_shuffle(ds, key_cols, keys_ds, anti=False,
                      num_partitions=None):
    """Shuffle-based semi/anti join — the scale path for key sets too big
    to broadcast (``broadcast_key_set`` collects to the driver; this
    never does). Implementation: distinct the key side, hash-join, and
    for ``anti`` use a left-outer join + null-probe filter.

    ``keys_ds`` must contain exactly ``key_cols``.
    """
    key_cols = tuple(key_cols)

    def distinct_keys(batch: pa.Table) -> pa.Table:
        arrs = [batch[c].to_numpy(zero_copy_only=False) for c in key_cols]
        packed = _key_view(arrs)
        _, first = np.unique(packed, return_index=True)
        return batch.select(list(key_cols)).take(pa.array(first))

    keys_d = keys_ds.select_columns(list(key_cols)).map_batches(
        distinct_keys, batch_format="pyarrow")
    # block-level distinct above + groupby-free join below: duplicates
    # across blocks are removed by marking instead of multiplying — we
    # join against (keys, marker) and keep/drop on marker presence
    marked = keys_d.map_batches(
        lambda b: b.append_column("__m", pa.array(
            np.ones(b.num_rows, dtype=np.int8))),
        batch_format="pyarrow")
    from ..functions.monoids import monoid as _mono
    from .reduce import groupby_monoid

    # exact distinct across blocks (combining groupby; driver merge when
    # small) so the inner join can't fan out rows
    marked = groupby_monoid(marked, list(key_cols), "__m", _mono["min"])

    joined = hash_join(ds, marked, on=key_cols, how="left_outer")

    def probe(batch: pa.Table) -> pa.Table:
        hit = ~np.asarray(batch["__m"].is_null())
        keep = ~hit if anti else hit
        return batch.filter(pa.array(keep)).drop_columns(["__m"])

    return joined.map_batches(probe, batch_format="pyarrow")


def semi_join_filter(ds, key_cols, keyset_ref, anti=False):
    """Keep (semi) or drop (anti) rows whose packed key is in the broadcast
    sorted key set. One ``ray.get`` per task — zero-copy from the local
    object store."""
    key_cols = tuple(key_cols)

    def filt(batch: pa.Table) -> pa.Table:
        keys = ray.get(keyset_ref)
        arrs = [batch[c].to_numpy(zero_copy_only=False) for c in key_cols]
        packed = _key_view(arrs)
        if len(keys) == 0:
            hit = np.zeros(len(packed), dtype=bool)
        else:
            pos = np.searchsorted(keys, packed)
            pos_c = np.minimum(pos, len(keys) - 1)
            hit = keys[pos_c] == packed
        mask = ~hit if anti else hit
        return batch.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow")
