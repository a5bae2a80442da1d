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
    ds = add_tumbling_window(events_ds, ts_col=ts_col, every=every)
    keys = list(keys) + ["window"]

    def agg(group: pa.Table) -> pa.Table:
        v = group[value_col].to_numpy(zero_copy_only=False)
        cols = {k: group[k].slice(0, 1) for k in keys}
        cols["n"] = np.array([len(v)], dtype=np.int64)
        cols["vmin"] = np.array([v.min()]) if len(v) else np.array([np.nan])
        cols["vmax"] = np.array([v.max()]) if len(v) else np.array([np.nan])
        return pa.table(cols)

    return ds.groupby(keys).map_groups(agg, batch_format="pyarrow")


def sessionize(events_ds, gap_minutes=30, user_col="user_id", ts_col="ts"):
    """Session windows per user: one shuffle keyed by user, then a
    per-group vectorized gap scan (sorted ts; new session when the gap
    exceeds ``gap_minutes``). Emits per-session (user, session_start,
    session_end, n_events).

    Skew note: a pathological single user with billions of events would
    need range-splitting by day first; normal web users fit one group.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def sessions(group: pa.Table) -> pa.Table:
        ts = np.sort(group[ts_col].cast(pa.int64())
                     .to_numpy(zero_copy_only=False))
        uid = group[user_col][0].as_py()
        new = np.empty(len(ts), dtype=bool)
        new[0] = True
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess_id = np.cumsum(new) - 1
        nsess = sess_id[-1] + 1
        starts = ts[new]
        ends = np.maximum.reduceat(ts, np.flatnonzero(new))
        counts = np.bincount(sess_id, minlength=nsess)
        return pa.table({
            "user_id": np.full(nsess, uid, dtype=np.int64),
            "session_start": pa.array(starts).cast(pa.timestamp("us")),
            "session_end": pa.array(ends).cast(pa.timestamp("us")),
            "n_events": counts.astype(np.int64),
        })

    return events_ds.groupby(user_col).map_groups(
        sessions, batch_format="pyarrow")
