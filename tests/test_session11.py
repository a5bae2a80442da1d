"""Session-11 regressions: the grouped_agg / groupby_aggregator
cardinality-overflow paths now run the hash-exchange + cross-group
lexsort/segment finisher (one shuffle, no per-group Python) instead of
Ray-native groupby machinery — these tests force the overflow with
``driver_merge_threshold=1`` and require bit-identical results to the
driver-merge path and to a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _table(seed=7, n=5000, nkeys=37):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": rng.integers(0, nkeys, n).astype(np.int64),
        "k2": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.normal(size=n),
    })


def _collect(ds):
    bs = [b for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None) if b.num_rows]
    t = pa.concat_tables(bs, promote_options="permissive")
    return t.to_pandas().sort_values(
        [c for c in t.column_names]).reset_index(drop=True)


def test_grouped_agg_overflow_matches_driver_path():
    from python_graphblas_ray.stages.reduce import grouped_agg

    t = _table()
    specs = [("v", "sum", "s"), ("v", "min", "lo"),
             ("v", "max", "hi"), ("v", "count", "n")]
    small = _collect(grouped_agg(ray.data.from_arrow(t), ["k"], specs))
    big = _collect(grouped_agg(ray.data.from_arrow(t), ["k"], specs,
                               driver_merge_threshold=1))
    # identical group keys + exact min/max/count; sums may differ in
    # merge order between the two paths, so compare allclose there
    assert (small["k"].to_numpy() == big["k"].to_numpy()).all()
    for c in ("lo", "hi", "n"):
        assert (small[c].to_numpy() == big[c].to_numpy()).all(), c
    assert np.allclose(small["s"], big["s"], rtol=1e-12, atol=1e-12)
    # pandas oracle
    ora = (t.to_pandas().groupby("k")
           .agg(s=("v", "sum"), lo=("v", "min"), hi=("v", "max"),
                n=("v", "count")).reset_index()
           .sort_values("k").reset_index(drop=True))
    assert (big["lo"].to_numpy() == ora["lo"].to_numpy()).all()
    assert (big["n"].to_numpy() == ora["n"].to_numpy()).all()
    assert np.allclose(big["s"], ora["s"], rtol=1e-12, atol=1e-12)


def test_grouped_agg_overflow_composite_key():
    from python_graphblas_ray.stages.reduce import grouped_agg

    t = _table(seed=11)
    specs = [("v", "count", "n"), ("v", "max", "hi")]
    big = _collect(grouped_agg(ray.data.from_arrow(t), ["k", "k2"],
                               specs, driver_merge_threshold=1))
    ora = (t.to_pandas().groupby(["k", "k2"])
           .agg(n=("v", "count"), hi=("v", "max")).reset_index()
           .sort_values(["k", "k2"]).reset_index(drop=True))
    assert len(big) == len(ora)
    for c in ("k", "k2", "n", "hi"):
        assert (big[c].to_numpy() == ora[c].to_numpy()).all(), c


def test_grouped_agg_overflow_string_keys():
    from python_graphblas_ray.stages.reduce import grouped_agg

    rng = np.random.default_rng(3)
    t = pa.table({
        "k": pa.array([f"key_{i:03d}" for i in
                       rng.integers(0, 53, 4000)]),
        "v": rng.integers(0, 1000, 4000).astype(np.int64),
    })
    big = _collect(grouped_agg(ray.data.from_arrow(t), ["k"],
                               [("v", "sum", "s"), ("v", "count", "n")],
                               driver_merge_threshold=1))
    ora = (t.to_pandas().groupby("k")
           .agg(s=("v", "sum"), n=("v", "count")).reset_index()
           .sort_values("k").reset_index(drop=True))
    assert (big["k"].to_numpy() == ora["k"].to_numpy()).all()
    assert (big["s"].to_numpy() == ora["s"].to_numpy()).all()
    assert (big["n"].to_numpy() == ora["n"].to_numpy()).all()


def test_groupby_aggregator_overflow_matches_driver_path():
    from python_graphblas_ray.functions.aggregators import agg
    from python_graphblas_ray.stages.reduce import groupby_aggregator

    t = _table(seed=23)
    for name in ("mean", "stdp", "varp"):
        a = agg[name]
        small = _collect(groupby_aggregator(
            ray.data.from_arrow(t), ["k"], "v", a, out_col="val"))
        big = _collect(groupby_aggregator(
            ray.data.from_arrow(t), ["k"], "v", a, out_col="val",
            driver_merge_threshold=1))
        assert (small["k"].to_numpy() == big["k"].to_numpy()).all(), name
        assert np.allclose(small["val"], big["val"],
                           rtol=1e-9, atol=1e-12), name


def test_groupby_aggregator_overflow_positional():
    """argmin needs the idx_col plumbing through the exchange path."""
    from python_graphblas_ray.functions.aggregators import agg
    from python_graphblas_ray.stages.reduce import groupby_aggregator

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table({
        "k": rng.integers(0, 29, n).astype(np.int64),
        "v": rng.permutation(n).astype(np.int64),
        "i": np.arange(n, dtype=np.int64),
    })
    a = agg["argmin"]
    big = _collect(groupby_aggregator(
        ray.data.from_arrow(t), ["k"], "v", a, out_col="pos",
        idx_col="i", driver_merge_threshold=1))
    df = t.to_pandas()
    ora = df.loc[df.groupby("k")["v"].idxmin()].sort_values(
        "k").reset_index(drop=True)
    assert (big["k"].to_numpy() == ora["k"].to_numpy()).all()
    assert (big["pos"].to_numpy() == ora["i"].to_numpy()).all()


def test_no_pandas_map_groups_left_in_stages():
    """The overflow paths must not regress to per-group Python:
    no ``batch_format=\"pandas\"`` map_groups anywhere in stages/."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    for f in (root / "python_graphblas_ray" / "stages").glob("*.py"):
        src = f.read_text()
        assert 'batch_format="pandas"' not in src, f.name
