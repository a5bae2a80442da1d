"""Recorder — capture engine kernel calls (reference
``graphblas/core/recorder.py:34``).

The reference records the GraphBLAS C calls an expression expands to
(``GrB_mxm(C, NULL, NULL, plus_times, A, B)``). The Ray-native analog
records the KERNEL METHOD calls with container shape/nnz-free
descriptors (never touching the distributed data):

>>> with Recorder() as rec:
...     C = A.mxm(B)
>>> rec.data[0]
'mxm(Matrix<7x7:float64>, Matrix<7x7:float64>)'

``start()``/``stop()`` or context manager; one recorder active at a
time per context (contextvars — safe under asyncio / threads the same
way the reference is). Instrumentation wraps the kernel methods of
GBMatrix/GBVector ONCE, on first Recorder construction; when no
recorder is active the overhead is a single contextvar lookup.
"""

import contextvars
import functools

_active = contextvars.ContextVar("pgr_recorder", default=None)
_instrumented = False

#: kernel methods captured (the reference records their GrB_* calls)
RECORDED_METHODS = (
    "mxm", "mxv", "vxm", "ewise_add", "ewise_mult", "ewise_union",
    "apply", "select", "reduce_rowwise", "reduce_columnwise",
    "reduce_scalar", "reduce", "extract", "assign", "kronecker",
    "power", "inner", "outer", "transpose", "diag", "reposition",
    "build",
)


def _desc(x):
    """Shape descriptor for a call argument — driver-local only."""
    from .core import GBMatrix, GBScalar, GBVector

    if isinstance(x, GBMatrix):
        return f"Matrix<{x.nrows}x{x.ncols}:{x.dtype}>"
    if isinstance(x, GBVector):
        return f"Vector<{x.size}:{x.dtype}>"
    if isinstance(x, GBScalar):
        return f"Scalar({x.value!r})"
    if hasattr(x, "name") and type(x).__module__.startswith(
            "python_graphblas_ray"):
        return str(x.name)  # ops / monoids / semirings
    r = repr(x)
    return r if len(r) <= 40 else r[:37] + "..."


def _instrument():
    """Wrap kernel methods with the record hook (idempotent)."""
    global _instrumented
    if _instrumented:
        return
    from .core import GBMatrix, GBVector

    for cls in (GBMatrix, GBVector):
        for name in RECORDED_METHODS:
            orig = cls.__dict__.get(name)
            if orig is None or getattr(orig, "_pgr_recorded", False):
                continue

            def make(orig, name):
                @functools.wraps(orig)
                def wrapper(self, *args, **kwargs):
                    rec = _active.get()
                    if rec is not None:
                        parts = [_desc(self)]
                        parts += [_desc(a) for a in args]
                        parts += [f"{k}={_desc(v)}"
                                  for k, v in kwargs.items()]
                        rec._append(f"{name}({', '.join(parts)})")
                    return orig(self, *args, **kwargs)

                wrapper._pgr_recorded = True
                return wrapper

            setattr(cls, name, make(orig, name))
    _instrumented = True


class Recorder:
    """Record kernel calls (reference ``core/recorder.py:34``): use as
    a context manager or via ``start()``/``stop()``; calls accumulate
    in ``.data`` as strings."""

    __slots__ = ("data", "_token", "max_rows")

    def __init__(self, *, start=True, max_rows=20):
        _instrument()
        self.data = []
        self._token = None
        self.max_rows = max_rows
        if start:
            self.start()

    def _append(self, text):
        self.data.append(text)

    record_raw = _append  # reference recorder.py:70

    def start(self):
        if self._token is None:
            self._token = _active.set(self)

    def stop(self):
        if self._token is not None:
            _active.reset(self._token)
            self._token = None

    def clear(self):
        self.data.clear()

    @property
    def is_recording(self):
        return self._token is not None and _active.get() is self

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, type_, value, traceback):
        self.stop()

    def __iter__(self):
        yield from self.data

    def __repr__(self):
        shown = self.data[: self.max_rows]
        more = len(self.data) - len(shown)
        body = "\n".join(shown) + (f"\n... ({more} more)" if more > 0
                                   else "")
        return f"Recorder(is_recording={self.is_recording})\n{body}"
