"""Round-4 regression tests: the round-3 ADVICE fixes.

Each test pins one repaired boundary — the _mode_pairs pack-path dst
overflow, vector_compactify's k=0 padding, _normalize_sql_round's
string-literal blindness, and the grouped_agg composite-key exchange
collapse."""

import numpy as np
import pyarrow as pa
import pytest


def test_mode_pairs_big_dstl_takes_lexsort_path():
    """ADVICE r3 (medium): a partition local dst index >= 2^32 with
    SMALL labels used to take the shift-pack path and overflow int64
    (dstl<<31 went negative). Now it must route to the lexsort path
    and return exact counts with non-negative dst ids."""
    from collections import Counter

    from python_graphblas_ray.state.superstep import _mode_pairs

    rng = np.random.default_rng(7)
    base = (np.int64(1) << np.int64(32)) + np.int64(5)
    dstl = base + rng.integers(0, 40, 2000).astype(np.int64)
    lab = rng.integers(0, 90, 2000).astype(np.int64)  # labels < 2^31
    ud, ul, c = _mode_pairs(dstl, lab)
    assert (ud >= 0).all(), "overflowed dst ids leaked through"
    oracle = Counter(zip(dstl.tolist(), lab.tolist()))
    got = dict(zip(zip(ud.tolist(), ul.tolist()), c.tolist()))
    assert got == dict(oracle)


def test_mode_pairs_pack_path_still_used_when_in_range(monkeypatch):
    """Small dstl + small labels must still take the ONE-np.unique packed
    hot path (guard the guard: the fix must not demote the common case)."""
    from python_graphblas_ray.state import superstep

    calls = {"lexsort": 0}
    real = np.lexsort

    def spy(*a, **k):
        calls["lexsort"] += 1
        return real(*a, **k)

    monkeypatch.setattr(superstep.np, "lexsort", spy)
    dstl = np.array([3, 3, 1, 2, 3], dtype=np.int64)
    lab = np.array([5, 5, 9, 9, 7], dtype=np.int64)
    ud, ul, c = superstep._mode_pairs(dstl, lab)
    assert calls["lexsort"] == 0
    assert dict(zip(zip(ud.tolist(), ul.tolist()), c.tolist())) == {
        (1, 9): 1, (2, 9): 1, (3, 5): 2, (3, 7): 1}


def test_vector_compactify_k0_gives_size0(ray_session):
    """ADVICE r3: compactify(k=0) returned a size-1 vector; the
    reference yields size k = 0 exactly."""
    from python_graphblas_ray.core import GBVector
    from python_graphblas_ray.stages.perrow import vector_compactify

    v = GBVector.from_coo(np.array([2, 5, 9]), np.array([1.0, 2.0, 3.0]),
                          size=12)
    out = vector_compactify(v, "first", k=0)
    assert out.size == 0
    idx, _ = out.to_coo()
    assert len(idx) == 0
    # k=None on an EMPTY vector: size = survivor count = 0 as well
    empty = GBVector.from_coo(np.array([], dtype=np.int64),
                              np.array([], dtype=np.float64), size=4)
    out2 = vector_compactify(empty, "first", k=None)
    assert out2.size == 0
    # non-degenerate call unchanged
    out3 = vector_compactify(v, "largest", k=2)
    assert out3.size == 2
    i3, v3 = out3.to_coo()
    assert list(np.asarray(v3)) == [3.0, 2.0]


def test_normalize_sql_round_skips_string_literals():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "_entry_mod", pathlib.Path(__file__).parent.parent
        / "__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    f = mod._normalize_sql_round
    # a quoted literal holding an unbalanced '(' must not skew depth
    sql = "SELECT ROUND(concat(x, 'a(b'), 2) AS r FROM t"
    assert f(sql) == ("SELECT (ROUND(concat(x, 'a(b'), 2) + 0.0) "
                      "AS r FROM t")
    # escaped quote inside the literal
    sql2 = "SELECT ROUND(f('it''s (x'), 1) FROM t"
    assert f(sql2) == "SELECT (ROUND(f('it''s (x'), 1) + 0.0) FROM t"
    # genuinely unbalanced SQL now raises a clear error, not IndexError
    with pytest.raises(ValueError, match="unbalanced"):
        f("SELECT ROUND(x + (1 FROM t")


def test_grouped_agg_composite_key_exchange_spreads(ray_session):
    """ADVICE r3: the >threshold overflow exchange hashed only
    key_cols[0]; a 2-value leading column collapsed it to ~2
    partitions. Verify the composite-hash path is correct AND spreads
    across partitions."""
    import ray
    import ray.data

    from python_graphblas_ray.stages.reduce import grouped_agg

    rng = np.random.default_rng(3)
    n = 20_000
    flag = rng.integers(0, 2, n)              # low-cardinality lead key
    sub = rng.integers(0, 5_000, n)            # high-cardinality 2nd key
    val = rng.random(n)
    ds = ray.data.from_arrow(pa.table({
        "flag": flag, "sub": sub, "val": val})).repartition(8)
    out = grouped_agg(ds, ["flag", "sub"],
                      [("val", "sum", "s"), ("val", "count", "c")],
                      driver_merge_threshold=10)  # force the exchange
    got = out.to_pandas().sort_values(["flag", "sub"]).reset_index(
        drop=True)
    assert "__xkey" not in got.columns
    import pandas as pd

    oracle = (pd.DataFrame({"flag": flag, "sub": sub, "val": val})
              .groupby(["flag", "sub"], as_index=False)
              .agg(s=("val", "sum"), c=("val", "size"))
              .sort_values(["flag", "sub"]).reset_index(drop=True))
    assert len(got) == len(oracle)
    assert (got["flag"].to_numpy() == oracle["flag"].to_numpy()).all()
    assert (got["sub"].to_numpy() == oracle["sub"].to_numpy()).all()
    np.testing.assert_allclose(got["s"].to_numpy(),
                               oracle["s"].to_numpy(), rtol=1e-12)
    assert (got["c"].to_numpy() == oracle["c"].to_numpy()).all()
    # the exchange must actually spread: >2 non-empty output blocks
    nonempty = sum(1 for b in out.iter_batches(batch_format="pyarrow")
                   if b.num_rows)
    assert nonempty > 2
