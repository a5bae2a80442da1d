"""Session-8 operators: sweep-line peak concurrency, session-size
histogram, TPC-H Q5-style region revenue, Zipf slope."""
import numpy as np
import pyarrow as pa
import pytest
import ray

MIN = 60_000_000


# ------------------------------------------------ peak concurrency

def test_peak_concurrency_hand_case():
    from python_graphblas_ray.pipelines.windows import peak_concurrency

    # type a: events at minutes 0/10/20 (30-min dur) -> all 3 overlap
    # in [20, 30); type b: two events 100 min apart -> peak 1, first
    # peak bucket is minute 0
    ts = np.array([0, 10, 20, 0, 100], dtype=np.int64) * MIN
    ds = ray.data.from_arrow(pa.table({
        "event_type": ["a", "a", "a", "b", "b"],
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(3)
    t = peak_concurrency(ds).to_pandas().set_index("event_type")
    assert t.loc["a", "peak"] == 3
    assert t.loc["a", "peak_ts"].value == 20 * MIN * 1000
    assert t.loc["b", "peak"] == 1
    assert t.loc["b", "peak_ts"].value == 0

    # half-open: an interval ending at minute 30 does NOT overlap one
    # starting at minute 30
    ts2 = np.array([0, 30], dtype=np.int64) * MIN
    ds2 = ray.data.from_arrow(pa.table({
        "event_type": ["a", "a"],
        "ts": pa.array(ts2, pa.timestamp("us"))}))
    t2 = peak_concurrency(ds2).to_pandas()
    assert t2["peak"].iloc[0] == 1

    # empty input keeps schema
    t3 = peak_concurrency(ray.data.from_arrow(pa.table({
        "event_type": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us"))})))
    assert t3.num_rows == 0
    assert t3.column_names == ["event_type", "peak_ts", "peak"]


def test_peak_concurrency_brute_force():
    from python_graphblas_ray.pipelines.windows import peak_concurrency

    rng = np.random.RandomState(7)
    n = 2000
    ts = rng.randint(0, 600, n).astype(np.int64) * MIN \
        + rng.randint(0, MIN, n)
    ty = np.array(["x", "y", "z"])[rng.randint(0, 3, n)]
    ds = ray.data.from_arrow(pa.table({
        "event_type": ty.tolist(),
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(5)
    got = peak_concurrency(ds).to_pandas().set_index("event_type")
    for tt in "xyz":
        m = ts[ty == tt] // MIN
        grid = np.zeros(700, dtype=np.int64)
        for mm in m:
            grid[mm:mm + 30] += 1
        pk = grid.max()
        first = np.flatnonzero(grid == pk)[0]
        assert got.loc[tt, "peak"] == pk
        assert got.loc[tt, "peak_ts"].value == first * MIN * 1000
