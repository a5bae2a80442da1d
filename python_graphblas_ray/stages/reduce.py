"""Distributed reduction primitives.

The load-bearing pattern (SURVEY.md §2.4, reference ``agg.py:233-259``):
**pre-aggregate inside map_batches (combiner), then a small
groupby().aggregate() over partials** — so the all-to-all shuffle moves one
row per (key, batch) instead of one row per input row. At 100 TB this is the
difference between shuffling partials (~#keys × #blocks rows) and shuffling
the whole dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import AggregateFn, Count, Max, Min, Sum

# monoid name -> numpy ufunc usable with .reduceat for per-batch group reduce
_MONOID_UFUNC = {
    "plus": np.add,
    "times": np.multiply,
    "min": np.minimum,
    "max": np.maximum,
    "lor": np.logical_or,
    "land": np.logical_and,
    "lxor": np.logical_xor,
    "bor": np.bitwise_or,
    "band": np.bitwise_and,
    "bxor": np.bitwise_xor,
}


def segments(keys: np.ndarray):
    """(starts, sizes, seg_pos) for a sorted key array: segment start
    indices, segment sizes, and each element's rank within its segment.
    The shared boundary kernel for every sorted-run operator (per-row
    ``.ss`` ops, as-of merges, group combiners)."""
    n = len(keys)
    if n == 0:
        z = np.array([], dtype=np.int64)
        return z, z.copy(), z.copy()
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    seg_pos = np.arange(n) - np.repeat(starts, sizes)
    return starts, sizes, seg_pos


def _col_np(arr):
    """Arrow value column → numpy; struct (UDT/complex) via dtypes."""
    if pa.types.is_struct(arr.type) or pa.types.is_fixed_size_list(arr.type):
        from ..functions.dtypes import arrow_to_np_values

        return arrow_to_np_values(arr)
    return arr.to_numpy(zero_copy_only=False)


def _col_pa(vals):
    """Numpy value column → Arrow; struct (UDT/complex) via dtypes."""
    vals = np.asarray(vals)
    if vals.dtype.names is not None or vals.dtype.kind == "c" or vals.ndim > 1:
        from ..functions.dtypes import np_to_arrow_values

        return np_to_arrow_values(vals)
    return pa.array(vals)


def np_group_reduce(keys, vals, monoid):
    """Sort-based per-batch group reduction (the combiner).

    ``keys``: tuple of equal-length int64 arrays (1 or 2 key columns).
    Returns ``(keys_out: tuple[np.ndarray], vals_out: np.ndarray)`` with one
    row per distinct key. Runs entirely in numpy — no Python per-row loop.
    """
    vals = np.asarray(vals)
    n = len(vals)
    if n == 0:
        return tuple(k[:0] for k in keys), vals[:0]
    if len(keys) == 1:
        order = np.argsort(keys[0], kind="stable")
    else:
        order = np.lexsort(tuple(reversed(keys)))
    sk = tuple(k[order] for k in keys)
    sv = vals[order]
    # group boundaries
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in sk:
        change[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    ufunc = _MONOID_UFUNC.get(monoid.name)
    if monoid.name == "any":
        out = sv[starts]
    elif ufunc is not None:
        out = ufunc.reduceat(sv, starts)
    else:
        # generic fallback for user-registered monoids (rare; partials only)
        ends = np.append(starts[1:], n)
        out = np.array([monoid.reduce_np(sv[s:e]) for s, e in zip(starts, ends)])
    return tuple(k[starts] for k in sk), out


def make_batch_combiner(key_cols, val_col, monoid, out_val_col=None):
    """Arrow-batch combiner fn for ``map_batches``: one output row per
    distinct key per batch."""
    out_val_col = out_val_col or val_col

    def combine(batch: pa.Table) -> pa.Table:
        keys = tuple(batch[c].to_numpy(zero_copy_only=False) for c in key_cols)
        vals = _col_np(batch[val_col])
        k_out, v_out = np_group_reduce(keys, vals, monoid)
        cols = {c: pa.array(k) for c, k in zip(key_cols, k_out)}
        cols[out_val_col] = _col_pa(v_out)
        return pa.table(cols)

    return combine


def _monoid_aggregate_fn(monoid, val_col, out_col):
    """Generic Ray ``AggregateFn`` for any monoid (used when no builtin
    Sum/Min/Max matches)."""
    fn = monoid.binaryop.fn
    identity = monoid.identity

    def accumulate_block(acc, block):
        if isinstance(block, pa.Table):
            arr = block[val_col].to_numpy(zero_copy_only=False)
        else:  # pandas
            arr = block[val_col].to_numpy()
        r = monoid.reduce_np(arr)
        return r if acc is None else fn(acc, r)

    return AggregateFn(
        init=lambda k: None,
        merge=lambda a, b: b if a is None else (a if b is None else fn(a, b)),
        accumulate_block=accumulate_block,
        finalize=lambda a: identity if a is None else a,
        name=out_col,
    )


def groupby_monoid(ds, key_cols, val_col, monoid, out_col=None,
                   pre_aggregate=True, driver_merge_threshold=4_000_000):
    """``ds.groupby(keys).aggregate(monoid)`` with per-batch combining.

    The per-batch combiner shrinks the stream to ≤ one row per (key,
    block). When the combined partial set is small (≤
    ``driver_merge_threshold`` rows — it is bounded by
    #distinct-keys × #blocks, NOT by input rows), the final merge runs
    as one vectorized ``np_group_reduce`` on the driver: Ray's
    sort-shuffle groupby costs ~30s on even 250k two-key rows, two
    orders of magnitude more than the numpy merge. Larger partial sets
    (true large-key-cardinality outputs) take the distributed
    groupby/aggregate shuffle. Returns a Dataset with columns
    ``key_cols + [out_col]``.
    """
    out_col = out_col or val_col
    ds_in = ds
    if pre_aggregate:
        ds = ds.map_batches(make_batch_combiner(key_cols, val_col, monoid),
                            batch_format="pyarrow")
    if driver_merge_threshold:
        import ray.data

        mat = ds.materialize()
        if mat.count() <= driver_merge_threshold:
            batches = list(mat.iter_batches(batch_format="pyarrow",
                                            batch_size=1 << 20))
            batches = [b for b in batches if b.num_rows]
            if not batches:
                # legitimately-empty input: rebuild the output schema
                # from the pre-combiner input (0-row blocks skip
                # map_batches UDFs, so `mat` itself is schema-less)
                sch = ds_in.schema()
                if sch is not None and val_col in sch.names:
                    types = dict(zip(sch.names, sch.types))
                    fields = {c: pa.array([], types[c]) for c in key_cols}
                    fields[out_col] = pa.array([], types[val_col])
                    return ray.data.from_arrow(pa.table(fields))
                return mat
            t = pa.concat_tables(batches, promote_options="permissive")
            keys = tuple(t[c].to_numpy(zero_copy_only=False)
                         for c in key_cols)
            vals = _col_np(t[val_col])
            k_out, v_out = np_group_reduce(keys, vals, monoid)
            cols = {c: pa.array(k) for c, k in zip(key_cols, k_out)}
            cols[out_col] = _col_pa(v_out)
            return ray.data.from_arrow(pa.table(cols))
        ds = mat
    key = key_cols[0] if len(key_cols) == 1 else key_cols
    builtin = {
        "plus": Sum, "min": Min, "max": Max,
    }.get(monoid.name)
    if builtin is not None:
        out = ds.groupby(key).aggregate(builtin(val_col, alias_name=out_col))
    else:
        out = ds.groupby(key).aggregate(_monoid_aggregate_fn(monoid, val_col, out_col))
    return out


def global_monoid_reduce(ds, val_col, monoid):
    """Matrix/Vector → Scalar reduction: per-batch fold, tiny driver merge.

    Streams one partial per block to the driver; never materializes rows.
    Returns None when the input has no entries (structural empty — reference
    ``matrix.py:2712`` ``allow_empty`` semantics handled by caller).
    """

    def _vals(arr):
        if pa.types.is_struct(arr.type) or pa.types.is_fixed_size_list(
                arr.type):  # UDT values
            from ..functions.dtypes import arrow_to_np_values

            return arrow_to_np_values(arr)
        return arr.to_numpy(zero_copy_only=False)

    def fold(batch: pa.Table) -> pa.Table:
        vals = _vals(batch[val_col])
        typ = batch.schema.field(val_col).type
        if len(vals) == 0:
            return pa.table({"p": pa.array([], type=typ)})
        r = monoid.reduce_np(vals)
        if vals.dtype.names is not None or vals.dtype.kind == "c":
            # structured/complex scalar → struct row
            return pa.table({"p": _col_pa(np.array([r], dtype=vals.dtype))})
        return pa.table({"p": [r]})

    parts = [_vals(b["p"])
             for b in ds.map_batches(fold, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    parts = [p for p in parts if len(p)]
    if not parts:
        return None
    allp = np.concatenate(parts)
    return monoid.reduce_np(allp)


#: (partial arrow agg, merge arrow agg) per supported kind. ``count`` is
#: count-rows; partial counts merge by summation.
_AGG_KINDS = {
    "count": ("count_all", "sum"),
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def grouped_agg(ds, key_cols, specs, driver_merge_threshold=4_000_000):
    """Vectorized grouped count/sum/min/max over arbitrary-typed keys.

    ``specs``: list of ``(in_col, kind, out_col)`` with ``kind`` in
    ``count | sum | min | max`` (``in_col`` ignored for ``count``).

    Two-level Arrow hash aggregation — NO per-group Python:

    1. per-batch ``pa.Table.group_by(...).aggregate(...)`` combiner
       (Arrow's C++ hash aggregate) shrinks the stream to one row per
       (key, batch);
    2. the partials — bounded by #distinct-keys × #blocks, not input
       rows — merge in one more Arrow hash aggregate on the driver when
       small, else through Ray's distributed ``groupby().aggregate()``.

    Replaces ``groupby().map_groups`` finishers (measured ~10 s at 80k
    groups: one Python call per group) for order-independent aggregates.
    Returns a Dataset with columns ``key_cols + [out_col, ...]``.
    """
    import ray.data

    key_cols = list(key_cols)
    partial_aggs = []   # [(agg_tuple, partial_name, merge_kind, out_col)]
    for in_col, kind, out_col in specs:
        p_kind, m_kind = _AGG_KINDS[kind]
        if kind == "count":
            partial_aggs.append((([], "count_all"), "count_all",
                                 m_kind, out_col))
        else:
            partial_aggs.append(((in_col, p_kind), f"{in_col}_{p_kind}",
                                 m_kind, out_col))

    arrow_aggs = [a for a, _, _, _ in partial_aggs]

    def combine(batch: pa.Table) -> pa.Table:
        return batch.group_by(key_cols).aggregate(arrow_aggs)

    partials = ds.map_batches(combine, batch_format="pyarrow")

    def merge_table(t: pa.Table) -> pa.Table:
        merged = t.group_by(key_cols).aggregate(
            [(p, m) for _, p, m, _ in partial_aggs])
        cols = {k: merged[k] for k in key_cols}
        for _, p, m, out_col in partial_aggs:
            col = merged[f"{p}_{m}"]
            if m == "sum" and p == "count_all":
                col = col.cast(pa.int64())
            cols[out_col] = col
        return pa.table(cols)

    mat = partials.materialize()
    if mat.count() <= driver_merge_threshold:
        batches = [b for b in mat.iter_batches(batch_format="pyarrow",
                                               batch_size=1 << 20)
                   if b.num_rows]
        if not batches:
            # legitimately-empty input: rebuild the output schema (0-row
            # blocks skip map_batches UDFs, so `mat` is schema-less)
            sch = ds.schema()
            types = (dict(zip(sch.names, sch.types))
                     if sch is not None else {})
            needed = list(key_cols) + [c for c, k, _ in specs
                                       if k != "count"]
            if any(c not in types for c in needed):
                return mat  # types unknowable — keep the schema-less empty
            fields = {c: pa.array([], types[c]) for c in key_cols}
            for in_col, kind, out_name in specs:
                fields[out_name] = pa.array(
                    [], pa.int64() if kind == "count"
                    else types[in_col])
            return ray.data.from_arrow(pa.table(fields))
        return ray.data.from_arrow(
            merge_table(pa.concat_tables(batches,
                                         promote_options="permissive")))
    # large-cardinality overflow: ONE hash exchange co-locates every
    # key's partials, then the SAME Arrow merge kernel runs once per
    # partition — one shuffle, no sort machinery, no per-group Python
    # (replaces the former Ray-native ``groupby().aggregate()``
    # sort-shuffle path). A single-column key hashes directly; a
    # COMPOSITE key exchanges on a combined hash of ALL key columns —
    # hashing only the leading column would collapse the exchange to a
    # handful of partitions whenever that column is low-cardinality
    # (e.g. a status flag), re-serializing the merge this path exists
    # to distribute.
    from .exchange import hash_exchange_apply

    if len(key_cols) == 1:
        return hash_exchange_apply(mat, key_cols[0], merge_table)

    from .sketch import _hash_any

    def add_xkey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__xkey", pa.array([], pa.uint64()))
        z = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in key_cols:
                kc = t[c]
                # the inline integer fast path requires null-free
                # columns: with nulls, to_numpy yields float NaN and the
                # uint64 cast is platform-defined — route through
                # _hash_any (which fill_nulls) instead
                if pa.types.is_integer(kc.type) and kc.null_count == 0:
                    h = kc.to_numpy(zero_copy_only=False).astype(np.uint64)
                    h += np.uint64(0x9E3779B97F4A7C15)
                    h = (h ^ (h >> np.uint64(30))) * np.uint64(
                        0xBF58476D1CE4E5B9)
                    h = (h ^ (h >> np.uint64(27))) * np.uint64(
                        0x94D049BB133111EB)
                    h ^= h >> np.uint64(31)
                else:
                    h = _hash_any(kc)
                # boost-style combine: order-sensitive, avalanched
                z = (z * np.uint64(0x100000001B3)) ^ h
        return t.append_column("__xkey", pa.array(z, pa.uint64()))

    def merge_drop(t: pa.Table) -> pa.Table:
        if "__xkey" in t.column_names:
            t = t.drop_columns(["__xkey"])
        return merge_table(t)

    keyed = mat.map_batches(add_xkey, batch_format="pyarrow")
    return hash_exchange_apply(keyed, "__xkey", merge_drop)


def groupby_aggregator(ds, key_cols, val_col, aggregator, out_col="val",
                       idx_col=None, driver_merge_threshold=4_000_000):
    """Grouped reduction with a composite Aggregator (mean/std/argmin/...).

    Two-level: per-batch ``partial`` rows (combiner) → shuffle → per-group
    ``final`` over the few partial rows. ``idx_col`` feeds positional
    aggregators (argmin/first/...)."""

    def make_partials(batch: pa.Table) -> pa.Table:
        keys = tuple(batch[c].to_numpy(zero_copy_only=False) for c in key_cols)
        vals = batch[val_col].to_numpy(zero_copy_only=False)
        idx = (batch[idx_col].to_numpy(zero_copy_only=False)
               if idx_col else np.arange(len(vals), dtype=np.int64))
        n = len(vals)
        if n == 0:
            return pa.table({c: pa.array([], type=pa.int64()) for c in key_cols})
        if len(keys) == 1:
            order = np.argsort(keys[0], kind="stable")
        else:
            order = np.lexsort(tuple(reversed(keys)))
        sk = tuple(k[order] for k in keys)
        sv, si = vals[order], idx[order]
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in sk:
            change[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        rows = [aggregator.partial(sv[s:e], si[s:e]) for s, e in zip(starts, ends)]
        cols = {c: k[starts] for c, k in zip(key_cols, sk)}
        for pname in rows[0]:
            cols[f"__p_{pname}"] = np.array([r[pname] for r in rows])
        return pa.table(cols)

    partials = ds.map_batches(make_partials, batch_format="pyarrow")

    # Driver-merge finisher (same policy as ``grouped_agg``): the partial
    # stream is bounded by #groups × #blocks, so when it fits, lexsort it
    # once on the driver and run ``final`` per group in-process — no Ray
    # per-group task dispatch (the measured ~10 s / 80k-group map_groups
    # trap). Beyond the threshold the SAME finisher runs per partition
    # after one hash exchange (see ``finish_table`` below).
    import ray.data

    mat = partials.materialize()
    if mat.count() == 0:
        # legitimately-empty input — rebuild the output schema (0-row
        # blocks skip map_batches UDFs, so `mat` itself is schema-less)
        sch = ds.schema()
        types = (dict(zip(sch.names, sch.types)) if sch is not None
                 else {})
        fields = {c: pa.array([], types.get(c, pa.int64()))
                  for c in key_cols}
        out_t = (pa.from_numpy_dtype(np.dtype(aggregator.dtype))
                 if aggregator.dtype is not None else pa.float64())
        fields[out_col] = pa.array([], out_t)
        return ray.data.from_arrow(pa.table(fields))
    def finish_table(t: pa.Table) -> pa.Table:
        """Cross-group lexsort + segment finisher over a partials table
        whose keys are complete (all partials of a key present): one
        sort across ALL groups at once, then ``final`` per segment —
        no per-group task dispatch."""
        n = t.num_rows
        if n == 0:
            cols = {c: pa.array([], t[c].type) for c in key_cols}
            out_t = (pa.from_numpy_dtype(np.dtype(aggregator.dtype))
                     if aggregator.dtype is not None else pa.float64())
            cols[out_col] = pa.array([], out_t)
            return pa.table(cols)
        keys = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
        pvals = {c[4:]: t[c].to_numpy(zero_copy_only=False)
                 for c in t.column_names if c.startswith("__p_")}
        if len(keys) == 1:
            order = np.argsort(keys[0], kind="stable")
        else:
            order = np.lexsort(tuple(reversed(keys)))
        sk = [k[order] for k in keys]
        sp = {nm: v[order] for nm, v in pvals.items()}
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in sk:
            change[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        vals = [aggregator.final({nm: v[s:e] for nm, v in sp.items()})
                for s, e in zip(starts, ends)]
        cols = {c: k[starts] for c, k in zip(key_cols, sk)}
        cols[out_col] = (np.asarray(vals, dtype=aggregator.dtype)
                         if aggregator.dtype is not None
                         else np.asarray(vals))
        return pa.table(cols)

    if 0 < mat.count() <= driver_merge_threshold:
        t = pa.concat_tables(
            [b for b in mat.iter_batches(batch_format="pyarrow",
                                         batch_size=1 << 20) if b.num_rows],
            promote_options="permissive")
        return ray.data.from_arrow(finish_table(t))

    # cardinality overflow: ONE hash exchange on the leading key
    # co-locates each key's partials, then the SAME lexsort/segment
    # finisher runs per partition (distributing the per-group ``final``
    # calls across workers) — degrades to one shuffle, not to the
    # one-Python-call-per-group ``map_groups`` trap.
    from .exchange import hash_exchange_apply

    return hash_exchange_apply(mat, key_cols[0], finish_table)


def grouped_topk(ds, key_col: str, order_col: str, k: int,
                 descending: bool = True, tie_col: str | None = None,
                 num_partitions=None):
    """Top-k rows per group by ``order_col`` — the generic
    "top users per event type / top docs per domain" operator. ONE hash
    exchange on the group key, then a cross-group lexsort + segment-rank
    pass per partition (the same kernel family as ``quota_sample`` /
    the per-row ``.ss`` selectk): no per-group Python, no global sort.

    ``tie_col`` (e.g. the row id) makes the pick deterministic under
    order-value ties — matching a
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order [DESC], tie)``
    oracle. Returns a Dataset with the input columns."""
    from .exchange import hash_exchange_apply

    kk = int(k)

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        enc = t[key_col].combine_chunks().dictionary_encode()
        codes = np.asarray(pc.fill_null(
            enc.indices, len(enc.dictionary))).astype(np.int64)
        v = t[order_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        key2 = -v if descending else v
        if tie_col is not None:
            order = np.lexsort((np.asarray(t[tie_col]), key2, codes))
        else:
            order = np.lexsort((key2, codes))
        _, _, rank = segments(codes[order])
        take = order[rank < kk]
        return t.take(pa.array(np.sort(take)))

    return hash_exchange_apply(ds, key_col, per_part,
                               num_partitions=num_partitions)


def grouped_quantile(ds, key_cols, val_col, q=0.5, out_col="qval",
                     num_partitions=None):
    """EXACT discrete quantile per group (type-1 / ``quantile_disc``
    semantics: the element at index ``ceil(q·n) − 1`` of the group's
    sorted values) — the oracle-grade grouped median/percentile.

    Scale shape: ONE hash exchange keyed by the group columns, then a
    per-partition lexsort + segment-index pick across ALL the
    partition's groups at once (no per-group Python). Exact quantiles
    can't pre-aggregate, so a single giant group lands on one worker —
    at that scale use the mergeable KLL sketch
    (:mod:`..stages.sketch`) instead; this operator is for
    many-moderate-groups layouts. Returns ``key_cols + [out_col]``."""
    from .exchange import hash_exchange_apply

    key = key_cols[0]

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or val_col not in t.column_names:
            cols = {c: pa.array([], t[c].type if c in t.column_names
                                else pa.string()) for c in key_cols}
            cols[out_col] = pa.array([], pa.float64())
            return pa.table(cols)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ks = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
        order = np.lexsort((v, *ks[::-1]))
        kos = [k[order] for k in ks]
        vo = v[order]
        same = np.ones(len(vo), dtype=bool)
        same[0] = False
        for ko in kos:
            same[1:] &= ko[1:] == ko[:-1]
        starts = np.flatnonzero(~same)
        sizes = np.diff(np.append(starts, len(vo)))
        idx = starts + np.ceil(q * sizes).astype(np.int64) - 1
        cols = {c: ko[starts] for c, ko in zip(key_cols, kos)}
        cols[out_col] = vo[idx]
        return pa.table(cols)

    return hash_exchange_apply(
        ds.select_columns([*key_cols, val_col]), key, part,
        num_partitions=num_partitions)
