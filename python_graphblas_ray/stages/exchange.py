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
