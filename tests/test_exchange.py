"""Unit tests for the hash-exchange co-location stage
(``stages/exchange.py``) — the groupby().map_groups replacement used by
sessionize / asof_join / per-row .ss ops."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from python_graphblas_ray.stages.exchange import hash_exchange_apply


def _collect(ds):
    tabs = [b for b in ds.iter_batches(batch_size=None,
                                       batch_format="pyarrow")
            if b.num_rows]
    if not tabs:
        return None
    return pa.concat_tables(tabs, promote_options="permissive")


def test_colocation_every_key_in_one_partition():
    """Every row of a key must land in exactly one fn call."""
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=2000).astype(np.int64)
    vals = np.arange(2000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
    ds = ds.repartition(8)  # multiple input blocks per partition

    def per_key_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "vmin": pa.array([], pa.int64())})
        k = t["k"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        cnt = np.bincount(inv)
        vmin = np.full(len(uk), np.iinfo(np.int64).max)
        np.minimum.at(vmin, inv, v)
        return pa.table({"k": uk, "cnt": cnt.astype(np.int64),
                         "vmin": vmin})

    out = _collect(hash_exchange_apply(ds, "k", per_key_count,
                                       num_partitions=6))
    got = out.sort_by("k")
    # If a key were split across partitions it would appear twice here.
    ks = got["k"].to_numpy(zero_copy_only=False)
    assert len(ks) == len(np.unique(ks)) == 50
    exp_cnt = np.bincount(keys, minlength=50)
    assert np.array_equal(got["cnt"].to_numpy(zero_copy_only=False),
                          exp_cnt)
    exp_vmin = np.full(50, np.iinfo(np.int64).max)
    np.minimum.at(exp_vmin, keys, vals)
    assert np.array_equal(got["vmin"].to_numpy(zero_copy_only=False),
                          exp_vmin)


def test_row_preservation_identity_fn():
    """Identity fn: exchange is a pure repartition — no row gained/lost."""
    keys = np.arange(1000, dtype=np.int64) % 37
    ds = ray.data.from_arrow(pa.table(
        {"k": keys, "payload": np.arange(1000, dtype=np.float64)}))

    out = _collect(hash_exchange_apply(ds, "k", lambda t: t,
                                       num_partitions=5))
    assert out.num_rows == 1000
    got = np.sort(out["payload"].to_numpy(zero_copy_only=False))
    assert np.array_equal(got, np.arange(1000, dtype=np.float64))


def test_empty_partition_gets_schema_defining_call():
    """P > nkeys forces empty partitions: fn must receive an (empty)
    table and its returned schema must flow through."""
    ds = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 1, 1], pa.int64()),
         "v": pa.array([1.0, 2.0, 3.0])}))

    calls = []

    def fn(t: pa.Table) -> pa.Table:
        calls.append(t.num_rows)
        return pa.table({"k": t["k"], "s": t["v"]})

    out = _collect(hash_exchange_apply(ds, "k", fn, num_partitions=4))
    assert out.num_rows == 3
    assert set(out.column_names) == {"k", "s"}


def test_empty_dataset_passthrough():
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.float64())})
    ds = ray.data.from_arrow(empty)
    out = hash_exchange_apply(ds, "k", lambda t: t, num_partitions=3)
    assert out.count() == 0


def test_skewed_keys_still_exact():
    """One hot key (90% of rows) — correctness unaffected by skew."""
    keys = np.concatenate([np.zeros(900, np.int64),
                           np.arange(1, 101, dtype=np.int64)])
    vals = np.ones(1000, np.float64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(4)

    def total(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "tot": pa.array([], pa.float64())})
        k = t["k"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        tot = np.bincount(inv, weights=v)
        return pa.table({"k": uk, "tot": tot})

    out = _collect(hash_exchange_apply(ds, "k", total, num_partitions=8))
    got = out.sort_by("k")
    assert got.num_rows == 101
    tots = got["tot"].to_numpy(zero_copy_only=False)
    assert tots[0] == 900.0 and np.all(tots[1:] == 1.0)


def test_exchange_single_partition_and_empty_input():
    """P=1 degenerates to one apply (no num_returns=1 unpacking trap);
    zero-block input still yields fn's OUTPUT schema."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_graphblas_ray.stages.exchange import hash_exchange_apply

    def summarize(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table({"k": np.unique(k).astype(np.int64),
                         "n": np.bincount(k, minlength=0)[
                             np.unique(k)].astype(np.int64)}
                        if len(k) else
                        {"k": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})

    ds = ray.data.from_arrow(pa.table({
        "k": np.array([3, 1, 3, 2, 1, 3], dtype=np.int64)}))
    out = hash_exchange_apply(ds, "k", summarize, num_partitions=1)
    got = {r["k"]: r["n"] for r in out.take_all()}
    assert got == {1: 2, 2: 1, 3: 3}

    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    # force a zero-block materialization by filtering everything out
    out = hash_exchange_apply(empty, "k", summarize, num_partitions=4)
    assert out.schema().names == ["k", "n"]
    assert out.count() == 0
