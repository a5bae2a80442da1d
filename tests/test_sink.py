"""Resumable partitioned Parquet sink (write_partitioned): skip-done
semantics, dead-run cleanup, deterministic placement, no dup/lost rows."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from python_graphblas_ray.sources.parquet import write_partitioned


@pytest.fixture
def docs_ds():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": np.arange(500, dtype=np.int64),
        "text": [f"doc {i}" for i in range(500)]}))


def _read_all(path):
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "part=*", "*.parquet")))
    if not files:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return pa.concat_tables([pq.read_table(f, columns=["doc_id"])
                             for f in files])


def test_write_partitioned_roundtrip(tmp_path, docs_ds):
    out = str(tmp_path / "sink")
    written = write_partitioned(docs_ds, out, "doc_id",
                                num_partitions=8)
    assert sorted(written) == list(range(8))
    t = _read_all(out)
    assert sorted(t["doc_id"].to_pylist()) == list(range(500))
    for i in range(8):
        assert os.path.exists(os.path.join(out, f"part={i}", "_SUCCESS"))


def test_write_partitioned_resume_skips_done(tmp_path, docs_ds):
    out = str(tmp_path / "sink")
    write_partitioned(docs_ds, out, "doc_id", num_partitions=8)
    before = {}
    for i in range(8):
        d = os.path.join(out, f"part={i}")
        before[i] = {f: os.path.getmtime(os.path.join(d, f))
                     for f in os.listdir(d)}
    # simulate a dead run: partitions 2 and 5 lost their _SUCCESS and
    # part 5 also has a half-written file
    os.remove(os.path.join(out, "part=2", "_SUCCESS"))
    os.remove(os.path.join(out, "part=5", "_SUCCESS"))
    with open(os.path.join(out, "part=5", "garbage.parquet"), "w") as f:
        f.write("not parquet")
    written = write_partitioned(docs_ds, out, "doc_id",
                                num_partitions=8)
    assert sorted(written) == [2, 5]  # only unfinished parts rewritten
    # finished partitions untouched (same files, same mtimes)
    for i in set(range(8)) - {2, 5}:
        d = os.path.join(out, f"part={i}")
        now = {f: os.path.getmtime(os.path.join(d, f))
               for f in os.listdir(d)}
        assert now == before[i], i
    # garbage gone, full row set intact, no duplicates
    assert not os.path.exists(os.path.join(out, "part=5",
                                           "garbage.parquet"))
    t = _read_all(out)
    got = sorted(t["doc_id"].to_pylist())
    assert got == list(range(500))


def test_write_partitioned_fully_done_is_noop(tmp_path, docs_ds):
    out = str(tmp_path / "sink")
    write_partitioned(docs_ds, out, "doc_id", num_partitions=4)
    assert write_partitioned(docs_ds, out, "doc_id",
                             num_partitions=4) == []


def test_write_partitioned_deterministic_placement(tmp_path, docs_ds):
    import glob

    import pyarrow.parquet as pq

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_partitioned(docs_ds, a, "doc_id", num_partitions=8)
    write_partitioned(docs_ds, b, "doc_id", num_partitions=8)
    for i in range(8):
        fa = sorted(glob.glob(os.path.join(a, f"part={i}", "*.parquet")))
        fb = sorted(glob.glob(os.path.join(b, f"part={i}", "*.parquet")))
        ids_a = (sorted(pa.concat_tables(
            [pq.read_table(f, columns=["doc_id"]) for f in fa]
        )["doc_id"].to_pylist()) if fa else [])
        ids_b = (sorted(pa.concat_tables(
            [pq.read_table(f, columns=["doc_id"]) for f in fb]
        )["doc_id"].to_pylist()) if fb else [])
        assert ids_a == ids_b
