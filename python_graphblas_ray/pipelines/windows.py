"""Windowed aggregates over event streams (batch semantics).

The reference has NO streaming/window concept (SURVEY.md §2.7) — this is
new engine surface for the ``events`` table
``(event_id, ts, user_id, event_type, value, props)``.

A tumbling window is a pure column derivation (floor the timestamp) plus
one groupby shuffle — Ray-Data-first: ``map_batches`` adds the window
column, the single wide step is the aggregate. Order-independent
aggregates only (count/min/max/int-sum), so distribution never changes
results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_tumbling_window(events_ds, ts_col="ts", every="day",
                        out_col="window"):
    """Append a window-start timestamp column; ``every`` ∈ {hour, day}."""
    unit_us = {"hour": 3_600_000_000, "day": 86_400_000_000}[every]

    def kern(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        start = (ts // unit_us) * unit_us
        return batch.append_column(
            out_col, pa.array(start).cast(pa.timestamp("us")))

    return events_ds.map_batches(kern, batch_format="pyarrow")


def windowed_aggregate(events_ds, keys=("event_type",), ts_col="ts",
                       every="day", value_col="value"):
    """Tumbling-window aggregate: one shuffle keyed by (keys..., window).
    Emits count / min / max of ``value_col`` per group (order-independent,
    so exactly reproducible under any partitioning)."""
    from ..stages.reduce import grouped_agg

    ds = add_tumbling_window(events_ds, ts_col=ts_col, every=every)
    keys = list(keys) + ["window"]
    return grouped_agg(ds.select_columns(keys + [value_col]), keys,
                       [(None, "count", "n"),
                        (value_col, "min", "vmin"),
                        (value_col, "max", "vmax")])


def hopping_window_count(events_ds, keys=("event_type",), ts_col="ts",
                         size_us=7_200_000_000, hop_us=3_600_000_000):
    """Hopping (sliding) window counts: each event lands in every window
    ``[ws, ws + size)`` with ``ws ≡ 0 (mod hop)`` — a vectorized flat_map
    expansion (size/hop rows per event) + ONE groupby shuffle. Emits
    ``(keys..., window_us:int64, n:int64)``."""
    keys = list(keys)

    def expand(batch: pa.Table) -> pa.Table:
        t = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        first = (-(-(t - size_us + 1) // hop_us)) * hop_us  # ceil div
        last = (t // hop_us) * hop_us
        counts = ((last - first) // hop_us + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t)), counts)
        offs = (np.arange(int(counts.sum())) -
                np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]),
                          counts))
        ws = np.repeat(first, counts) + offs * hop_us
        cols = {k: batch[k].take(pa.array(idx)) for k in keys}
        cols["window_us"] = ws
        return pa.table(cols)

    from ..stages.reduce import grouped_agg

    ds = events_ds.select_columns(keys + [ts_col]).map_batches(
        expand, batch_format="pyarrow")
    return grouped_agg(ds, keys + ["window_us"],
                       [(None, "count", "n")])


def asof_join(left_ds, right_ds, key="user_id", ts_col="ts",
              right_value_cols=("ts",), suffix="_r"):
    """As-of join (inner): each left row matches the LATEST right row of
    the same key with ``right.ts <= left.ts`` (DuckDB ``ASOF JOIN``
    semantics); left rows with no earlier right row are dropped.

    Ray-Data-first: both sides are tagged and unioned so ONE
    hash-exchange keyed by ``key`` co-locates them (``stages.exchange``
    map-side split — no groupby machinery); each partition then runs a
    single vectorized merge across ALL its keys at once: lexsort by
    (key, ts, rights-before-lefts), forward-fill the last-right-row
    index with ``np.maximum.accumulate``, and invalidate fills that
    cross a key boundary. No per-key Python. The reference has no join
    surface at all (SURVEY §2.7) — this is new engine surface for event
    streams.
    """

    def tag(side):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__side", pa.array(np.full(batch.num_rows, side,
                                           dtype=np.int8)))
        return f

    left_t = left_ds.map_batches(tag(0), batch_format="pyarrow")
    right_keep = list(dict.fromkeys([key, ts_col, *right_value_cols]))
    right_t = right_ds.select_columns(right_keep).map_batches(
        tag(1), batch_format="pyarrow")

    left_schema = left_ds.schema()
    if left_schema is None or right_ds.schema() is None:
        # a side is a schema-less empty (0-row blocks skip map_batches
        # UDFs) — the as-of result is empty; propagate instead of crash
        import ray.data
        return ray.data.from_arrow(pa.table({}))
    lcols = list(left_schema.names)
    out_right = [c for c in right_value_cols]

    # unified schema for the exchange: blocks from either side must agree
    # (the hash-exchange concatenates raw side blocks, so pad each side's
    # missing columns with typed nulls up front)
    ltypes = dict(zip(left_schema.names, left_schema.types))
    rs = right_ds.schema()
    rtypes = dict(zip(rs.names, rs.types))
    unified = list(dict.fromkeys(lcols + right_keep))
    types = {c: ltypes.get(c, rtypes.get(c)) for c in unified}

    def pad(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in unified:
            cols[c] = (batch[c] if c in batch.column_names
                       else pa.nulls(batch.num_rows, types[c]))
        cols["__side"] = batch["__side"]
        return pa.table(cols)

    left_t = left_t.map_batches(pad, batch_format="pyarrow")
    right_t = right_t.map_batches(pad, batch_format="pyarrow")

    def merge_part(t: pa.Table) -> pa.Table:
        empty_cols = {c: t[c].take(pa.array([], pa.int64()))
                      for c in lcols}
        for c in out_right:
            empty_cols[c + suffix] = t[c].take(pa.array([], pa.int64()))
        if t.num_rows == 0:
            return pa.table(empty_cols)
        side = t["__side"].to_numpy(zero_copy_only=False)
        keys = t[key].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if not (side == 0).any() or not (side == 1).any():
            return pa.table(empty_cols)
        # rights sort BEFORE lefts at equal (key, ts): rts <= lts is
        # inclusive, and the LAST equal-ts right wins (stable order) —
        # identical tie semantics to the per-group searchsorted form
        order = np.lexsort((1 - side, ts, keys))
        ks, ss = keys[order], side[order]
        n = len(ks)
        marker = np.where(ss == 1, np.arange(n), -1)
        ffill = np.maximum.accumulate(marker)
        from ..stages.reduce import segments

        gstart, gsizes, _ = segments(ks)
        gpos = np.repeat(gstart, gsizes)
        hit = (ss == 0) & (ffill >= gpos)  # fill from an earlier key → miss
        l_orig = order[hit]
        r_orig = order[ffill[hit]]
        cols = {c: t[c].take(pa.array(l_orig)) for c in lcols}
        for c in out_right:
            cols[c + suffix] = t[c].take(pa.array(r_orig))
        return pa.table(cols)

    from ..stages.exchange import hash_exchange_apply

    return hash_exchange_apply(left_t.union(right_t), key, merge_part)


def range_join(left_ds, right_ds, key, left_val, right_lo, right_hi,
               suffix="_r"):
    """Interval/range join: left rows matched to right rows of the same
    key with ``right_lo <= left_val < right_hi``. Implemented as a hash
    join on the key + vectorized interval filter — right-sized when the
    key join is selective; an interval-index (sorted endpoints per key)
    is the densifying scale path."""
    from ..stages.join import hash_join

    j = hash_join(left_ds, right_ds, on=(key,), how="inner",
                  left_suffix="", right_suffix=suffix)

    def filt(batch: pa.Table) -> pa.Table:
        names = set(batch.column_names)
        lo = right_lo + suffix if right_lo + suffix in names else right_lo
        hi = right_hi + suffix if right_hi + suffix in names else right_hi
        v = batch[left_val].to_numpy(zero_copy_only=False)
        keep = ((batch[lo].to_numpy(zero_copy_only=False) <= v) &
                (v < batch[hi].to_numpy(zero_copy_only=False)))
        return batch.filter(pa.array(keep))

    return j.map_batches(filt, batch_format="pyarrow")


def sessionize(events_ds, gap_minutes=30, user_col="user_id", ts_col="ts",
               num_partitions=None):
    """Session windows per user: ONE hash-exchange keyed by user (the
    ``stages.exchange`` map-side split — no sort/groupby machinery), then
    a per-partition vectorized gap scan over ALL of the partition's users
    at once: lexsort by (user, ts), a session starts at a user boundary
    or a gap > ``gap_minutes``, aggregates via ``reduceat`` over session
    boundaries. No per-user Python anywhere. Emits per-session
    (user_id, session_start, session_end, n_events).

    Skew note: a pathological single user with billions of events would
    need range-splitting by day first; normal web users fit a partition.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)
    from ..stages.exchange import hash_exchange_apply

    def sessions_part(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "session_start": pa.array([], pa.timestamp("us")),
            "session_end": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        u = t[user_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new = np.empty(len(ts), dtype=bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts_idx = np.flatnonzero(new)
        ends = np.maximum.reduceat(ts, starts_idx)
        counts = np.diff(np.append(starts_idx, len(ts)))
        return pa.table({
            "user_id": u[starts_idx].astype(np.int64),
            "session_start": pa.array(ts[starts_idx]).cast(
                pa.timestamp("us")),
            "session_end": pa.array(ends).cast(pa.timestamp("us")),
            "n_events": counts.astype(np.int64),
        })

    return hash_exchange_apply(
        events_ds.select_columns([user_col, ts_col]), user_col,
        sessions_part, num_partitions=num_partitions)


def funnel(events_ds, steps, user_col="user_id", ts_col="ts",
           type_col="event_type", horizon_minutes=None,
           num_partitions=None):
    """Ordered funnel analysis — the production event-analytics op: for
    each user, how deep into the step sequence ``steps`` (e.g. view →
    click → purchase) they progressed, matching at every step the
    EARLIEST event strictly later than the previous step's match
    (first-touch/greedy semantics — if any increasing assignment exists,
    greedy-earliest finds one), optionally within ``horizon_minutes`` of
    the first step.

    Engine shape: ONE hash-exchange keyed by user (same
    ``stages.exchange`` split sessionize uses), then a per-partition
    fully vectorized pass over ALL the partition's users at once: filter
    to the step types, lexsort by (user, ts), and resolve each step with
    one merge-scan — queries interleaved into the step-k events by
    (user, ts, marker) order and matched through a reversed
    ``minimum.accumulate`` (next-event-index suffix scan). No per-user
    Python; the per-user skew note on ``sessionize`` applies.

    Emits one row per funnel-entering user:
    ``(user_id, step_reached 1..len(steps), ts_first, ts_last)``."""
    from ..stages.exchange import hash_exchange_apply

    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    horizon_us = (None if horizon_minutes is None
                  else int(horizon_minutes * 60 * 1_000_000))

    def funnel_part(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "step_reached": pa.array([], pa.int64()),
            "ts_first": pa.array([], pa.timestamp("us")),
            "ts_last": pa.array([], pa.timestamp("us")),
        })
        if t.num_rows == 0:
            return empty
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        typ = t[type_col].to_numpy(zero_copy_only=False)
        code = np.full(len(u), -1, dtype=np.int64)
        for k, s in enumerate(steps):
            code[typ == s] = k
        keep = code >= 0
        u, ts, code = u[keep], ts[keep], code[keep]
        if not len(u):
            return empty
        order = np.lexsort((ts, u))
        u, ts, code = u[order], ts[order], code[order]
        # step 1: first event of steps[0] per user (arrays are
        # (user, ts)-sorted, so unique's first index IS the earliest)
        m0 = code == 0
        uu, first = np.unique(u[m0], return_index=True)
        cur_u, cur_ts = uu, ts[m0][first]
        ts_first = cur_ts.copy()
        depth = np.ones(len(cur_u), dtype=np.int64)
        active = np.arange(len(cur_u))
        for k in range(1, len(steps)):
            mk = code == k
            eu, ets = u[mk], ts[mk]
            qi = active
            if not len(eu) or not len(qi):
                break
            qu, qts = cur_u[qi], cur_ts[qi]
            # merge events (marker 0) and queries (marker 1): at equal
            # (user, ts) the event sorts first, so the next event in
            # sorted order after a query has ts STRICTLY greater
            cu = np.concatenate([eu, qu])
            cts = np.concatenate([ets, qts])
            cm = np.concatenate([np.zeros(len(eu), dtype=np.int8),
                                 np.ones(len(qi), dtype=np.int8)])
            so = np.lexsort((cm, cts, cu))
            n_all = len(cu)
            pos_event = np.where(cm[so] == 0,
                                 np.arange(n_all), n_all)
            nxt = np.minimum.accumulate(pos_event[::-1])[::-1]
            inv = np.empty(n_all, dtype=np.int64)
            inv[so] = np.arange(n_all)
            q_sorted_pos = inv[len(eu) + np.arange(len(qi))]
            nq = nxt[q_sorted_pos]
            ok = nq < n_all
            ev_slot = np.where(ok, so[np.minimum(nq, n_all - 1)], 0)
            hit = ok & (eu[np.minimum(ev_slot, len(eu) - 1)] == qu)
            if horizon_us is not None:
                hit &= (ets[np.minimum(ev_slot, len(eu) - 1)]
                        - ts_first[qi]) <= horizon_us
            adv = qi[hit]
            cur_ts[adv] = ets[ev_slot[hit]]
            depth[adv] = k + 1
            active = adv
        return pa.table({
            "user_id": cur_u.astype(np.int64),
            "step_reached": depth,
            "ts_first": pa.array(ts_first).cast(pa.timestamp("us")),
            "ts_last": pa.array(cur_ts).cast(pa.timestamp("us")),
        })

    return hash_exchange_apply(
        events_ds.select_columns([user_col, ts_col, type_col]),
        user_col, funnel_part, num_partitions=num_partitions)


def retention(events_ds, user_col="user_id", ts_col="ts",
              num_partitions=None):
    """Cohort retention — the second standard event-analytics op next to
    :func:`funnel`: cohort each user by their FIRST active day, then
    count distinct users active again k days later, per (cohort_day,
    day_offset) cell.

    Engine shape: ONE hash-exchange keyed by user (every user's history
    lands whole in one partition), a per-partition vectorized pass —
    lexsort (user, day), distinct (user, day) mask, cohort = first day
    per user via the sorted segment starts, offsets by subtraction —
    emitting per-partition PARTIAL cell counts (distinct users count
    once globally because a user lives in exactly one partition), then
    one two-level Arrow hash aggregate (``stages.reduce.grouped_agg``)
    sums the partials: output is #cohorts × #offsets rows, never the
    event stream.

    Emits ``(cohort_day timestamp, day_offset int64, n_users int64)``."""
    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import grouped_agg

    us_per_day = 86_400_000_000

    def cells_part(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "cohort_day": pa.array([], pa.timestamp("us")),
            "day_offset": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // us_per_day)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        u, day = u[first], day[first]          # distinct (user, day)
        seg = np.empty(len(u), dtype=bool)
        seg[0] = True
        seg[1:] = u[1:] != u[:-1]
        cohort = day[np.flatnonzero(seg)][np.cumsum(seg) - 1]
        offset = day - cohort
        key = cohort * (offset.max() + 1) + offset
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({
            "cohort_day": pa.array((uniq // (offset.max() + 1))
                                   * us_per_day).cast(pa.timestamp("us")),
            "day_offset": (uniq % (offset.max() + 1)).astype(np.int64),
            "n": counts.astype(np.int64),
        })

    partials = hash_exchange_apply(
        events_ds.select_columns([user_col, ts_col]), user_col,
        cells_part, num_partitions=num_partitions)
    return grouped_agg(partials, ["cohort_day", "day_offset"],
                       [("n", "sum", "n_users")])


def windowed_distinct_users(events_ds, user_col="user_id", ts_col="ts",
                            num_partitions=None):
    """Distinct active users per tumbling day window — the
    COUNT(DISTINCT) aggregate the plain ``windowed_aggregate`` cannot do
    with mergeable partials. Same shape as :func:`retention`: ONE hash
    exchange keyed by user (each user's rows land whole in one
    partition, so per-partition distinct (user, day) pairs are globally
    distinct and their per-day counts SUM exactly), one vectorized
    distinct-mask pass per partition, one small grouped sum. Output is
    one row per day, never the event stream.

    Emits ``(window timestamp, n_users int64)``."""
    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import grouped_agg

    us_per_day = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "window": pa.array([], pa.timestamp("us")),
                "n": pa.array([], pa.int64()),
            })
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // us_per_day)
        key = np.unique(u * (day.max() + 1) + day)  # distinct (user, day)
        days, counts = np.unique(key % (day.max() + 1),
                                 return_counts=True)
        return pa.table({
            "window": pa.array(days * us_per_day).cast(
                pa.timestamp("us")),
            "n": counts.astype(np.int64),
        })

    partials = hash_exchange_apply(
        events_ds.select_columns([user_col, ts_col]), user_col,
        part, num_partitions=num_partitions)
    return grouped_agg(partials, ["window"], [("n", "sum", "n_users")])


def event_transitions(events_ds, user_col="user_id", ts_col="ts",
                      type_col="event_type", id_col="event_id",
                      num_partitions=None):
    """First-order Markov transition counts over per-user event
    sequences — the sequence-mining op behind journey analysis and
    next-event models: count of (src_type → dst_type) over consecutive
    events of the same user, ordered by (ts, event_id) (the unique
    event id breaks same-microsecond ties deterministically).

    Scale shape (same as :func:`sessionize`): ONE hash-exchange keyed
    by user, then a per-partition vectorized pass over ALL the
    partition's users at once — dictionary-encode the type column,
    lexsort by (user, ts, event_id), adjacent same-user pairs are the
    transitions, one ``bincount`` on packed (src, dst) codes. Each
    partition emits at most |types|² partial rows; ``grouped_agg``
    merges them with Arrow hash aggregates (no per-group Python).
    """
    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import grouped_agg

    empty = pa.table({
        "src_type": pa.array([], pa.string()),
        "dst_type": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
    })

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        et = t[type_col]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        u = t[user_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        uo, co = u[order], codes[order]
        same = uo[1:] == uo[:-1]
        if not same.any():
            return empty
        a, b = co[:-1][same], co[1:][same]
        k = len(vocab)
        cnt = np.bincount(a * k + b, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "src_type": pa.array(vocab[nz // k], pa.string()),
            "dst_type": pa.array(vocab[nz % k], pa.string()),
            "n": cnt[nz].astype(np.int64),
        })

    partials = hash_exchange_apply(
        events_ds.select_columns([user_col, ts_col, type_col, id_col]),
        user_col, part, num_partitions=num_partitions)
    return grouped_agg(partials, ["src_type", "dst_type"],
                       [("n", "sum", "n")])


def decayed_counts(events_ds, user_col="user_id", ts_col="ts",
                   half_life="day", as_of=None, max_exponent=60):
    """Exponentially time-decayed activity score per key — the standard
    recency-weighted engagement counter (each event contributes
    ``2^-age``, age in whole half-lives before ``as_of``).

    Determinism contract: half-life buckets are INTEGER (floor division
    on epoch-microseconds), so every weight is a dyadic rational
    ``2^-d`` and partial sums are EXACT in float64 regardless of
    summation order (values stay within the 53-bit span for any
    realistic stream) — no rounding grain needed, and a SQL oracle
    (``1.0 / (1::BIGINT << d)``) reproduces the scores bit-for-bit.
    Ages past ``max_exponent`` half-lives weigh exactly 0.

    Scale shape: ONE streaming max for ``as_of`` (skipped when given),
    then ONE ``map_batches`` pass of per-batch (user, partial-sum)
    combiners into the two-level hash aggregate — the stream never
    shuffles. Returns a Dataset ``(user_col, score)``."""
    from ..stages.reduce import grouped_agg

    us_per = {"hour": 3_600_000_000, "day": 86_400_000_000,
              "week": 604_800_000_000}[half_life]
    if as_of is None:
        as_of = events_ds.max(ts_col)
        if as_of is None:  # legitimately-empty stream → no scores
            import ray.data
            return ray.data.from_arrow(pa.table(
                {user_col: pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}))
    ref_us = int(pa.scalar(as_of, type=pa.timestamp("us")).value)

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or ts_col not in batch.column_names:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ts = batch[ts_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        u = batch[user_col].to_numpy(zero_copy_only=False)
        d = (ref_us - ts) // us_per
        w = np.where((d >= 0) & (d <= max_exponent),
                     np.ldexp(1.0, -np.clip(d, 0, max_exponent)
                              .astype(np.int64)), 0.0)
        uu, inv = np.unique(u, return_inverse=True)
        s = np.zeros(len(uu))
        np.add.at(s, inv, w)
        return pa.table({user_col: uu.astype(np.int64),
                         "score": s})

    partials = events_ds.select_columns([user_col, ts_col]).map_batches(
        part, batch_format="pyarrow", batch_size=65536)
    return grouped_agg(partials, [user_col], [("score", "sum", "score")])


def daily_zscores(events_ds, user_col="user_id", ts_col="ts",
                  num_partitions=None):
    """Per-user daily-volume anomaly z-scores — the standard activity
    anomaly screen (bot bursts, tracking breakage): for each user and
    active day, ``z = (x - mean) / std`` of that user's daily event
    counts over their active days (population std; users whose counts
    never vary get z = 0).

    Determinism contract (bit-exact, NO rounding grain): daily counts
    ``x``, per-user ``sx = Σx`` and ``sxx = Σx²`` are INTEGERS (exact
    in any merge order); the float tail is a FIXED single-op sequence
    — ``m = double(sx)/nd``, ``var = double(sxx)/nd − m·m``,
    ``z = (x − m)/sqrt(var)`` — each step exactly rounded identically
    by numpy and a SQL engine, so a DuckDB twin reproduces every z
    bit-for-bit.

    Scale shape (the :func:`event_transitions` posture): ONE hash
    exchange keyed by user co-locates each user's events, then a
    per-partition vectorized pass (lexsort → run-length daily counts →
    ``add.reduceat`` per-user moments → broadcast back). The stream
    never sorts globally. Returns ``(user, day, x, z)``.
    """
    from ..stages.exchange import hash_exchange_apply

    day_us = 86_400_000_000
    empty = pa.table({user_col: pa.array([], pa.int64()),
                      "day": pa.array([], pa.timestamp("us")),
                      "x": pa.array([], pa.int64()),
                      "z": pa.array([], pa.float64())})

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        u = t[user_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts // day_us) * day_us
        order = np.lexsort((day, u))
        uo, do = u[order], day[order]
        # run-length compress to one row per (user, day)
        new = np.empty(len(uo), dtype=bool)
        new[0] = True
        new[1:] = (uo[1:] != uo[:-1]) | (do[1:] != do[:-1])
        starts = np.flatnonzero(new)
        x = np.diff(np.append(starts, len(uo))).astype(np.int64)
        uu, dd = uo[starts], do[starts]
        # per-user moments over the compressed rows
        ustarts = np.flatnonzero(np.concatenate(
            [[True], uu[1:] != uu[:-1]]))
        nd = np.diff(np.append(ustarts, len(uu))).astype(np.int64)
        sx = np.add.reduceat(x, ustarts)
        sxx = np.add.reduceat(x * x, ustarts)
        m = sx.astype(np.float64) / nd
        var = sxx.astype(np.float64) / nd - m * m
        std = np.sqrt(np.where(var > 0, var, 1.0))
        rep = np.repeat(np.arange(len(nd)), nd)
        z = np.where(var[rep] > 0,
                     (x - m[rep]) / std[rep], 0.0)
        return pa.table({
            user_col: uu.astype(np.int64),
            "day": pa.array(dd, pa.timestamp("us")),
            "x": x,
            "z": z,
        })

    return hash_exchange_apply(
        events_ds.select_columns([user_col, ts_col]), user_col, part,
        num_partitions=num_partitions)


def user_cusum(events_ds, user_col="user_id", ts_col="ts",
               num_partitions=None):
    """Per-user CUSUM burst statistic over daily event counts — the
    classic changepoint / burst detector (Page 1954): with ``v_t =
    nd·x_t − sx − nd`` (daily count recentred by the user's own mean,
    scaled by the active-day count ``nd`` so everything stays INTEGER,
    minus one-event-per-day slack), the drift ``D_t = Σ_{s≤t} v_s``
    and the statistic is ``max_t (D_t − min_{s≤t} D_s) / nd`` — the
    largest sustained upward burst in the user's activity.

    Determinism contract: every ``D_t`` and running min is INTEGER, so
    the statistic is exact up to ONE final division — bit-exact vs a
    SQL twin (integer window sums commute), no rounding grain.

    Scale shape: same ONE user-keyed exchange as
    :func:`daily_zscores`; the per-partition pass is fully vectorized
    (the segmented running-min uses a per-segment descending offset —
    valid while ``4·B·segments`` fits int64, asserted). Returns
    ``(user, cusum)``.
    """
    from ..stages.exchange import hash_exchange_apply

    day_us = 86_400_000_000
    empty = pa.table({user_col: pa.array([], pa.int64()),
                      "cusum": pa.array([], pa.float64())})

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        u = t[user_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts // day_us) * day_us
        order = np.lexsort((day, u))
        uo, do = u[order], day[order]
        new = np.empty(len(uo), dtype=bool)
        new[0] = True
        new[1:] = (uo[1:] != uo[:-1]) | (do[1:] != do[:-1])
        starts = np.flatnonzero(new)
        x = np.diff(np.append(starts, len(uo))).astype(np.int64)
        uu = uo[starts]
        ustarts = np.flatnonzero(np.concatenate(
            [[True], uu[1:] != uu[:-1]]))
        nd = np.diff(np.append(ustarts, len(uu))).astype(np.int64)
        sx = np.add.reduceat(x, ustarts)
        seg = np.repeat(np.arange(len(nd)), nd)
        v = nd[seg] * x - sx[seg] - nd[seg]
        # segmented cumsum: global cumsum minus the segment's base
        cum = np.cumsum(v)
        base = cum[ustarts] - v[ustarts]
        d = cum - base[seg]
        # segmented running min via strictly-descending segment offsets
        b = int(np.abs(d).max()) + 1 if len(d) else 1
        assert 4 * b * max(len(nd), 1) < (1 << 62), "cusum offset overflow"
        off = (-4 * b) * seg
        runmin = np.minimum.accumulate(d + off) - off
        stat = np.maximum.reduceat(d - runmin, ustarts)
        return pa.table({
            user_col: uu[ustarts].astype(np.int64),
            "cusum": stat.astype(np.float64) / nd,
        })

    return hash_exchange_apply(
        events_ds.select_columns([user_col, ts_col]), user_col, part,
        num_partitions=num_partitions)


def user_entropy(events_ds, user_col="user_id", type_col="event_type",
                 num_partitions=None):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity axis (0 = single-action users; log k = uniform
    over k types). Integer counts are exact; the entropy terms
    ``−(c/n)·ln(c/n)`` are summed in ascending (user, type) order, so
    a SQL twin agrees within a round-8 grain (term-order noise only).

    Scale shape: ONE (user, type) grouped count exchange, then ONE
    user-keyed exchange of the (much smaller) counts table with a
    vectorized per-partition segment pass. Returns ``(user, entropy)``
    with entropy rounded to 8 decimals."""
    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import grouped_agg

    counts = grouped_agg(
        events_ds.select_columns([user_col, type_col]),
        [user_col, type_col], [(type_col, "count", "c")])

    empty = pa.table({user_col: pa.array([], pa.int64()),
                      "entropy": pa.array([], pa.float64())})

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return empty
        u = t[user_col].to_numpy(zero_copy_only=False)
        ty = t[type_col].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ty, u))
        uo, co = u[order], c[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], uo[1:] != uo[:-1]]))
        nu = np.add.reduceat(co, starts).astype(np.float64)
        sizes = np.diff(np.append(starts, len(uo)))
        p = co / np.repeat(nu, sizes)
        terms = -(p * np.log(p))
        h = np.add.reduceat(terms, starts)
        h[sizes == 1] = 0.0  # single-type users: exactly 0, not -0.0
        return pa.table({user_col: uo[starts].astype(np.int64),
                         "entropy": np.round(h, 8) + 0.0})

    return hash_exchange_apply(counts, user_col, part,
                               num_partitions=num_partitions)


def peak_concurrency(events_ds, type_col="event_type", ts_col="ts",
                     duration_minutes=30, bucket_minutes=1):
    """Sweep-line peak concurrency per event type: each event opens a
    half-open activity interval ``[minute(ts), minute(ts) + duration)``;
    the answer is the maximum number of simultaneously open intervals
    and the FIRST bucket where that peak is reached — the
    capacity-planning readout (peak concurrent sessions / streams).

    Determinism contract (bit-exact, NO rounding grain): bucketing makes
    every endpoint an integer minute; +1/−1 deltas are integers, the
    running level is an integer prefix sum, and half-open intervals mean
    an interval ending at ``t`` never overlaps one starting at ``t`` —
    processing all of a bucket's deltas as one net value is exact
    because ends (−1) sort before starts (+1) within a bucket, so the
    intra-bucket running max equals ``max(prev_prefix, net_prefix)``,
    both of which the per-bucket net-prefix scan sees.

    Scale shape: ONE (type, bucket) grouped-count exchange; the delta
    table is bounded by ``|types| × |active buckets| × 2`` (time-range
    bounded, tiny next to the stream), so the sweep runs on the driver.
    Returns ``(event_type, peak_ts, peak)``."""
    from ..stages.reduce import grouped_agg

    bucket_us = bucket_minutes * 60_000_000
    dur_us = int(duration_minutes) * 60_000_000
    empty = pa.table({type_col: pa.array([], pa.string()),
                      "peak_ts": pa.array([], pa.timestamp("us")),
                      "peak": pa.array([], pa.int64())})

    def deltas(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        m = (ts // bucket_us) * bucket_us
        ty = np.asarray(batch[type_col].to_pylist(), dtype=object)
        return pa.table({
            type_col: pa.array(np.concatenate([ty, ty]).tolist(),
                               pa.string()),
            "m": np.concatenate([m, m + dur_us]),
            "delta": np.concatenate([
                np.ones(len(m), dtype=np.int64),
                -np.ones(len(m), dtype=np.int64)])})

    agg = grouped_agg(
        events_ds.select_columns([type_col, ts_col]).map_batches(
            deltas, batch_format="pyarrow"),
        [type_col, "m"], [("delta", "sum", "delta")])
    tabs = [b for b in agg.iter_batches(batch_format="pyarrow",
                                        batch_size=None)
            if b.num_rows and "delta" in b.column_names]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="permissive")
    ty = np.asarray(t[type_col].to_pylist(), dtype=object)
    m = t["m"].to_numpy(zero_copy_only=False)
    d = t["delta"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((m, ty))
    ty, m, d = ty[order], m[order], d[order]
    starts = np.empty(len(ty), dtype=bool)
    starts[0] = True
    starts[1:] = ty[1:] != ty[:-1]
    run = np.cumsum(d)
    # reset the cumulative sum at each type boundary (exact: subtract
    # the prefix total just before the segment starts; each type's
    # deltas sum to 0 so that prefix is 0, but don't rely on it)
    sidx = np.flatnonzero(starts)
    seg = np.cumsum(starts) - 1
    bounds = np.concatenate([
        np.zeros(1, dtype=np.int64), run[sidx[1:] - 1]])
    run = run - bounds[seg]
    peak = np.zeros(len(sidx), dtype=np.int64)
    np.maximum.at(peak, seg, run)
    first = np.zeros(len(sidx), dtype=np.int64)
    hit = run == peak[seg]
    # first bucket per segment reaching the peak: minimum m among hits
    big = np.iinfo(np.int64).max
    mm = np.where(hit, m, big)
    first[:] = big
    np.minimum.at(first, seg, mm)
    return pa.table({
        type_col: pa.array(ty[sidx].tolist(), pa.string()),
        "peak_ts": pa.array(first).cast(pa.timestamp("us")),
        "peak": peak})


def type_daily_correlation(events_ds, type_col="event_type",
                           ts_col="ts"):
    """Pearson correlation matrix of the per-day event-count time
    series across event types — the metric-dashboard "do these two
    signals move together?" readout (e.g. clicks vs purchases co-vary,
    errors anti-correlate with traffic).

    Determinism contract (bit-exact, NO rounding grain): the day grid
    is every day active for ANY type (missing cells are 0); per-type
    ``Σx``, ``Σx²`` and pairwise ``Σx·y`` are INTEGER sums over that
    shared grid, so the Pearson moments are exact in any order, and
    the float tail is the FIXED op sequence
    ``double(n·Σxy − Σx·Σy) / (sqrt(double(n·Σx²−(Σx)²)) ·
    sqrt(double(n·Σy²−(Σy)²)))`` — each op exactly rounded identically
    by numpy and SQL. Zero-variance series pin corr = 0.0.

    Scale shape: ONE (type, day) grouped-count exchange; the counts
    table is bounded by ``|types| × |days|`` (both tiny next to the
    stream), so the pivot + integer matmul run on the driver. Returns
    an Arrow table ``(ta, tb, corr)`` for ``ta < tb`` lexicographic."""
    from ..stages.reduce import grouped_agg

    day_us = 86_400_000_000
    empty = pa.table({"ta": pa.array([], pa.string()),
                      "tb": pa.array([], pa.string()),
                      "corr": pa.array([], pa.float64())})

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({type_col: batch[type_col],
                         "day": (ts // day_us) * day_us})

    counts = grouped_agg(
        events_ds.select_columns([type_col, ts_col]).map_batches(
            bucket, batch_format="pyarrow"),
        [type_col, "day"], [("day", "count", "x")])
    tabs = [b for b in counts.iter_batches(batch_format="pyarrow",
                                           batch_size=None)
            if b.num_rows and "x" in b.column_names]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="permissive")
    ty = np.asarray(t[type_col].to_pylist(), dtype=object)
    dy = t["day"].to_numpy(zero_copy_only=False)
    x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = np.unique(ty)
    days = np.unique(dy)
    if len(types) < 2:
        return empty
    X = np.zeros((len(types), len(days)), dtype=np.int64)
    X[np.searchsorted(types, ty), np.searchsorted(days, dy)] = x
    n = np.int64(len(days))
    sx = X.sum(axis=1)
    sxx = (X * X).sum(axis=1)
    sxy = X @ X.T  # exact int64 matmul
    ia, ib = np.triu_indices(len(types), k=1)
    num = n * sxy[ia, ib] - sx[ia] * sx[ib]
    dena = n * sxx[ia] - sx[ia] * sx[ia]
    denb = n * sxx[ib] - sx[ib] * sx[ib]
    ok = (dena > 0) & (denb > 0)
    corr = np.zeros(len(ia))
    corr[ok] = (num[ok].astype(np.float64)
                / (np.sqrt(dena[ok].astype(np.float64))
                   * np.sqrt(denb[ok].astype(np.float64))))
    return pa.table({"ta": pa.array(types[ia].tolist(), pa.string()),
                     "tb": pa.array(types[ib].tolist(), pa.string()),
                     "corr": corr})


def daily_autocorrelation(events_ds, ts_col="ts", max_lag=7):
    """Lag-1..``max_lag`` autocorrelation of the global daily event-count
    series — the seasonality/trend-persistence dashboard readout (a
    weekly cycle shows as a lag-7 peak; bursty traffic decays fast).

    The series is the CONTIGUOUS day grid from the first to the last
    active day (missing days count 0 — absence of traffic is signal).
    For lag L the correlation pairs ``(x_t, x_{t+L})`` over the n−L
    overlapping days, with the same determinism contract as
    :func:`type_daily_correlation` (bit-exact, NO rounding grain):
    integer moments + the fixed IEEE tail
    ``double(m·Σxy − Σx·Σy) / (sqrt(double(m·Σxx−Σx²)) ·
    sqrt(double(m·Σyy−Σy²)))``; zero-variance windows pin 0.0; lags
    with fewer than 2 pairs emit no row.

    Scale shape: ONE (day) grouped-count exchange bounded by the number
    of active days; the O(days·max_lag) finish runs on the driver.
    Returns ``(lag, n, ac)``."""
    from ..stages.reduce import grouped_agg

    day_us = 86_400_000_000
    empty = pa.table({"lag": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "ac": pa.array([], pa.float64())})

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"day": ts // day_us})

    counts = grouped_agg(
        events_ds.select_columns([ts_col]).map_batches(
            bucket, batch_format="pyarrow"),
        ["day"], [("day", "count", "x")])
    tabs = [b for b in counts.iter_batches(batch_format="pyarrow",
                                           batch_size=None)
            if b.num_rows and "x" in b.column_names]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="permissive")
    dy = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    cx = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dy.min()), int(dy.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[dy - lo] = cx
    n = len(x)
    lags, ms, acs = [], [], []
    for lag in range(1, max_lag + 1):
        m = n - lag
        if m < 2:
            continue
        a, b = x[:m], x[lag:]
        sa, sb = a.sum(), b.sum()
        saa, sbb, sab = (a * a).sum(), (b * b).sum(), (a * b).sum()
        da, db = m * saa - sa * sa, m * sbb - sb * sb
        ac = 0.0
        if da > 0 and db > 0:
            ac = (np.float64(m * sab - sa * sb)
                  / (np.sqrt(np.float64(da)) * np.sqrt(np.float64(db))))
        lags.append(lag)
        ms.append(m)
        acs.append(float(ac))
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "n": pa.array(ms, pa.int64()),
                     "ac": pa.array(acs, pa.float64())})


def inter_arrival_gaps(events_ds, user_col="user_id", ts_col="ts",
                       type_col="event_type", id_col="event_id",
                       num_partitions=None):
    """Per-user inter-arrival gaps: for every event with a same-user
    predecessor, the microsecond gap to it, tagged with the LATER
    event's type — the raw material for latency/engagement-cadence
    readouts (median think-time before a purchase, p90 gap before an
    error).

    ONE hash exchange keyed by user (a user's timeline lives whole in
    one partition), then a per-partition lexsort over ALL the
    partition's users at once — ``(user, ts, id)`` order makes
    simultaneous events deterministic — and one vectorized diff.
    Integer microseconds — bit-exact. Returns ``(type, gap_us)``."""
    from ..stages.exchange import hash_exchange_apply

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table({type_col: pa.array([], pa.string()),
                          "gap_us": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t[user_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t[id_col].to_numpy(zero_copy_only=False)
        ty = np.asarray(t[type_col].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ts, ty = u[order], ts[order], ty[order]
        same = u[1:] == u[:-1]
        return pa.table({
            type_col: pa.array(ty[1:][same].tolist(), pa.string()),
            "gap_us": (ts[1:] - ts[:-1])[same]})

    return hash_exchange_apply(
        events_ds.select_columns([user_col, ts_col, type_col, id_col]),
        user_col, part, num_partitions=num_partitions)


def contingency_chisq(ds, col_a, col_b):
    """Pearson chi-square independence statistic of the ``col_a`` ×
    ``col_b`` contingency table — the dataset-card "is the language
    mix independent of the source?" readout (large χ² = the crawl's
    sources have very different language profiles; near-dof = mix is
    homogeneous).

    Scale shape: ONE grouped-count exchange bounded by |A| × |B|
    distinct pairs (both tiny next to the stream); the R×C finish runs
    on the driver. NULL categories count as ``''``.

    Determinism: observed/marginal counts are integers (bit-exact);
    each cell's term is the fixed IEEE sequence ``e = (double(rᵢ) ·
    double(cⱼ)) / double(n)``, ``(double(o) − e)² / e``; callers
    comparing against a SQL twin round the statistic to 8 decimals
    (cell summation order is unspecified). Returns one row
    ``(dof, n, chi2)`` with ``dof = (R−1)(C−1)``; empty input → 0
    rows."""
    from ..stages.reduce import grouped_agg

    empty = pa.table({"dof": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "chi2": pa.array([], pa.float64())})

    def clean(batch: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.fill_null(batch[col_a].cast(pa.string()), ""),
            "b": pc.fill_null(batch[col_b].cast(pa.string()), "")})

    counts = grouped_agg(
        ds.select_columns([col_a, col_b]).map_batches(
            clean, batch_format="pyarrow"),
        ["a", "b"], [("a", "count", "o")])
    tabs = [b for b in counts.iter_batches(batch_format="pyarrow",
                                           batch_size=None)
            if b.num_rows and "o" in b.column_names]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="permissive")
    a = np.asarray(t["a"].to_pylist(), dtype=object)
    b = np.asarray(t["b"].to_pylist(), dtype=object)
    o = t["o"].to_numpy(zero_copy_only=False).astype(np.int64)
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    O = np.zeros((len(ua), len(ub)), dtype=np.int64)
    O[ia, ib] = o
    r = O.sum(axis=1)
    c = O.sum(axis=0)
    n = int(O.sum())
    e = (r[:, None].astype(np.float64) * c[None, :].astype(np.float64)
         ) / np.float64(n)
    d = O.astype(np.float64) - e
    chi2 = float(((d * d) / e).sum())
    dof = (len(ua) - 1) * (len(ub) - 1)
    return pa.table({"dof": pa.array([dof], pa.int64()),
                     "n": pa.array([n], pa.int64()),
                     "chi2": pa.array([chi2], pa.float64())})
