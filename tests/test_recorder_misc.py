"""Recorder, replace sentinel, exceptions module, backend/MAX_SIZE
(reference graphblas/__init__.py:5-42, core/recorder.py:34,
exceptions.py)."""

import numpy as np
import pytest

import python_graphblas_ray as gb
from python_graphblas_ray import GBMatrix, GBVector


def _A():
    return GBMatrix.from_coo([0, 1, 2], [1, 2, 0], [2.0, 3.0, 4.0],
                             nrows=3, ncols=3)


def test_recorder_context():
    A = _A()
    B = _A()
    with gb.Recorder() as rec:
        assert rec.is_recording
        C = A.mxm(B)
        _ = C.reduce_scalar("plus")
    assert not rec.is_recording
    assert any(e.startswith("mxm(Matrix<3x3:float64>") for e in rec.data)
    assert any(e.startswith("reduce_scalar(") for e in rec.data)
    n = len(rec.data)
    A.mxv(GBVector.from_dense(np.ones(3)))  # outside context: silent
    assert len(rec.data) == n
    rec.clear()
    assert rec.data == []
    assert "Recorder(is_recording=False)" in repr(rec)


def test_recorder_start_stop_nested():
    A = _A()
    rec = gb.Recorder(start=False)
    assert not rec.is_recording
    rec.start()
    A.select("tril")
    rec.stop()
    assert len(rec.data) == 1 and rec.data[0].startswith("select(")


def test_replace_sentinel():
    """C(mask, replace) << expr — the reference's argument style."""
    A = _A()
    C = _A()
    mask = GBMatrix.from_coo([0], [1], [1.0], nrows=3, ncols=3)
    C(mask.S, gb.replace) << A.apply("ainv")
    r, c, v = C.to_coo()
    # replace=True: unmasked old entries dropped, only masked cell kept
    assert list(zip(r.tolist(), c.tolist(), v.tolist())) == [(0, 1, -2.0)]
    assert repr(gb.replace) == "replace"


def test_exceptions_module():
    exc = gb.exceptions
    assert issubclass(exc.DimensionMismatch, exc.GraphblasException)
    assert issubclass(exc.DimensionMismatch, ValueError)
    assert issubclass(exc.IndexOutOfBound, IndexError)
    # raised classes are the SAME objects importable both ways
    from python_graphblas_ray import DimensionMismatch, OutputNotEmpty
    assert exc.DimensionMismatch is DimensionMismatch
    assert exc.OutputNotEmpty is OutputNotEmpty
    A = _A()
    with pytest.raises(exc.OutputNotEmpty):
        A.build([0], [0], [1.0])
    v = GBVector.from_coo([0], [1.0], size=2)
    with pytest.raises(exc.GraphblasException):
        v.build([5], [1.0], clear=True)


def test_backend_and_max_size():
    assert gb.backend == "ray-data"
    assert gb.MAX_SIZE == 2**60


def test_config():
    """gb.config (reference donfig mapping): scoped set, typo guard,
    and a call site actually honoring it."""
    assert gb.config["num_partitions"] == 8
    with gb.config.set(num_partitions=3):
        assert gb.config["num_partitions"] == 3
        from python_graphblas_ray.pipelines.algorithms import build_engine
        import ray.data
        import pyarrow as pa

        eds = ray.data.from_arrow(pa.table({
            "src": np.arange(6, dtype=np.int64),
            "dst": (np.arange(6, dtype=np.int64) + 1) % 6,
            "val": np.ones(6)}))
        eng = build_engine(eds, 6)
        try:
            assert eng.num_partitions == 3
        finally:
            eng.shutdown()
    assert gb.config["num_partitions"] == 8  # restored on exit
    with pytest.raises(KeyError, match="unknown config key"):
        gb.config["num_partitons"]
    with pytest.raises(KeyError):
        gb.config["nope"] = 1
    assert set(gb.config.keys()) >= {"num_partitions", "broadcast_limit",
                                     "hub_split_factor", "local_cc_limit"}
