"""Hash-exchange co-location without the sort/groupby machinery.

The same map-side split pattern as the superstep engine's "exchange"
partitioner (``state/superstep.py:_split_block``), generalized: one task
per input block bins rows by key hash and returns P zero-copy slices;
one task per partition concatenates its slices and runs a VECTORIZED
user function over the whole co-located table. Replaces
``groupby(key).map_groups`` (one Python call per group — the measured
~10 s / 80k-group trap) for operators whose per-key logic vectorizes
across keys once rows are co-located (sessionization, sorted merges).

Data moves once all-to-all — identical volume to a groupby shuffle; on a
multi-node cluster each slice ref pulls directly source→destination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _split_by_hash(t: pa.Table, key_col: str, P: int):
    """Bin one block's rows by key hash (splitmix64 avalanche → even
    spread for sequential ids; strings via the vectorized FNV-1a path);
    stable part-sort + zero-copy slices."""
    if t.num_rows == 0 or key_col not in t.column_names:
        # degenerate block: Ray can emit 0-row 0-COLUMN blocks after
        # select_columns/union over empty filter results (0-row blocks
        # skip map_batches UDFs, so upstream stages can't normalize
        # them) — they contribute no rows to any partition
        e = t.slice(0, 0)
        return tuple(e for _ in range(P))
    kc = t[key_col]
    if kc.null_count:  # null keys co-locate deterministically (as 0 / "")
        import pyarrow.compute as pc
        kc = pc.fill_null(kc, 0 if pa.types.is_integer(kc.type) else "")
    if pa.types.is_integer(kc.type):
        k = kc.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = (k + np.uint64(0x9E3779B97F4A7C15))
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z ^= z >> np.uint64(31)
    else:
        from .sketch import _hash_any
        z = _hash_any(kc)
    part = (z % np.uint64(P)).astype(np.int64)
    counts = np.bincount(part, minlength=P)
    order = np.argsort(part, kind="stable")
    st = t.take(pa.array(order))
    cum = np.concatenate([[0], np.cumsum(counts)])
    return tuple(st.slice(int(cum[p]), int(counts[p])) for p in range(P))


@ray.remote
def _apply_partition(fn, *tables):
    tabs = [t for t in tables if t.num_rows]
    if not tabs:
        # fn must handle the empty table (defines the output schema);
        # prefer a block that still carries columns — degenerate 0-col
        # empties (see _split_by_hash) would KeyError inside fn
        probe = next((t for t in tables if t.num_columns), None)
        if probe is None:
            return tables[0]  # fully schema-less: stay empty
        return fn(probe)
    return fn(pa.concat_tables(
        [t for t in tabs], promote_options="permissive"))


def hash_exchange_apply(ds, key_col, fn, num_partitions=None):
    """Co-locate rows by ``hash(key) % P`` and run ``fn`` once per
    partition over its full table (every row of a key in one call).

    ``fn: pa.Table -> pa.Table`` must be vectorized across keys and must
    return the correct (possibly empty) schema for an empty input.
    Returns a Dataset of the per-partition outputs.
    """
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    P = int(num_partitions)
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        # zero blocks: the OUTPUT schema must still be fn's — build an
        # empty input table from the dataset schema and run fn once
        s = mat.schema(fetch_if_missing=True)
        empty = pa.table({n: pa.array([], type=t)
                          for n, t in zip(s.names, s.types)})
        return ray.data.from_arrow(fn(empty))
    if P == 1:  # degenerate exchange: everything lands in one partition
        return ray.data.from_arrow_refs(
            [_apply_partition.remote(fn, *refs)])
    outs = [_split_by_hash.options(num_returns=P).remote(r, key_col, P)
            for r in refs]
    parts = [_apply_partition.remote(fn, *[o[p] for o in outs])
             for p in range(P)]
    return ray.data.from_arrow_refs(parts)


@ray.remote
def _split_by_range(t: pa.Table, key_col: str, P: int, span: int):
    """Bin one block's rows into P contiguous key ranges
    (``p = key * P // span``); stable part-sort + zero-copy slices —
    the range twin of :func:`_split_by_hash`."""
    if t.num_rows == 0 or key_col not in t.column_names:
        e = t.slice(0, 0)
        return tuple(e for _ in range(P))
    k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    part = np.clip(k * P // max(span, 1), 0, P - 1)
    counts = np.bincount(part, minlength=P)
    order = np.argsort(part, kind="stable")
    st = t.take(pa.array(order))
    cum = np.concatenate([[0], np.cumsum(counts)])
    return tuple(st.slice(int(cum[p]), int(counts[p])) for p in range(P))


@ray.remote
def _partition_sum(val_col: str, *tables):
    tot = 0
    for t in tables:
        if t.num_rows and val_col in t.column_names:
            tot += int(t[val_col].to_numpy(
                zero_copy_only=False).astype(np.int64).sum())
    return tot


@ray.remote
def _scan_partition(key_col, val_col, out_col, base, *tables):
    tabs = [t for t in tables if t.num_rows]
    if not tabs:
        probe = next((t for t in tables if t.num_columns), tables[0])
        if out_col not in probe.column_names and probe.num_columns:
            probe = probe.append_column(out_col,
                                        pa.array([], pa.int64()))
        return probe
    t = pa.concat_tables(tabs, promote_options="permissive")
    k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k, kind="stable")
    ks, vs = k[order], v[order]
    if len(ks) > 1 and (ks[1:] == ks[:-1]).any():
        raise ValueError(f"ordered_prefix_sum: duplicate {key_col} keys")
    off = base + np.concatenate([[0], np.cumsum(vs)[:-1]])
    return t.take(pa.array(order)).append_column(
        out_col, pa.array(off.astype(np.int64)))


def ordered_prefix_sum(ds, key_col, val_col, out_col="offset",
                       num_partitions=None):
    """Global EXCLUSIVE prefix sum of ``val_col`` in ascending
    ``key_col`` order (unique non-negative integer keys) — the
    distributed SCAN primitive (sequence packing offsets, byte/token
    layout, cumulative quotas).

    Scale shape: one streaming ``max(key)`` fixes deterministic range
    bins, ONE range exchange co-locates each bin, then a two-phase
    scan — per-partition totals (P tiny ints) to the driver, exclusive
    cumsum there, and a per-partition vectorized sort+cumsum pass
    adding the base. The result is EXACT integer arithmetic identical
    for ANY partition count or block order. No global sort machinery.

    Returns the input rows (re-ordered) with ``out_col`` appended.
    """
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    P = int(num_partitions)
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    mx = mat.max(key_col) if mat.count() else None
    if not refs or mx is None:
        s = mat.schema(fetch_if_missing=True)
        cols = {n: pa.array([], type=t)
                for n, t in zip(s.names, s.types)} if s is not None else {}
        cols[out_col] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))
    span = int(mx) + 1
    if P == 1:  # degenerate: one partition holds the whole scan
        return ray.data.from_arrow_refs(
            [_scan_partition.remote(key_col, val_col, out_col, 0,
                                    *refs)])
    outs = [_split_by_range.options(num_returns=P).remote(
        r, key_col, P, span) for r in refs]
    sums = ray.get([_partition_sum.remote(val_col, *[o[p] for o in outs])
                    for p in range(P)])
    base = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    parts = [_scan_partition.remote(key_col, val_col, out_col,
                                    int(base[p]), *[o[p] for o in outs])
             for p in range(P)]
    return ray.data.from_arrow_refs(parts)
