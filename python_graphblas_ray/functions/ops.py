"""Operator registries: UnaryOp / BinaryOp / IndexUnaryOp (select predicates).

Re-expresses python-graphblas's operator taxonomy (reference
``graphblas/core/operator/unary.py:132``, ``binary.py:425-457``,
``indexunary.py:76``) as plain vectorized numpy callables applied to whole
Arrow/numpy batches inside ``map_batches`` — no numba JIT needed because we
never apply ops per element.

Each op is a named object holding a vectorized ``fn``; user registration
mirrors the reference's ``register_new`` (``unary.py:331``,
``binary.py:724``) but accepts any numpy-vectorized Python callable.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "UnaryOp",
    "BinaryOp",
    "PositionalBinaryOp",
    "IndexUnaryOp",
    "unary",
    "binary",
    "indexunary",
    "binary_from_string",
    "unary_from_string",
]


def _adaptive_fn(fn, nargs=1):
    """Vectorize-or-fallback wrapper for USER UDFs (the reference
    numba-JITs plain SCALAR Python functions —
    ``core/operator/unary.py:172-239`` — while this engine hands UDFs
    the whole numpy value array of each batch). The first call probes
    the vectorized path; a UDF that raises on arrays (per-element
    ``if``/branching) or returns a shape that doesn't broadcast-match
    its inputs drops PERMANENTLY to an ``np.frompyfunc`` per-element
    loop with a ONE-TIME performance warning — semantically identical,
    orders of magnitude slower, so the warning tells users to rewrite
    with ``np.where``. Builtin ops never pass through this wrapper."""
    state = {"mode": None, "pyf": None}

    def run_scalar(args):
        if state["pyf"] is None:
            state["pyf"] = np.frompyfunc(fn, nargs, 1)
        out = np.asarray(state["pyf"](*args))
        if out.dtype == object:
            out = np.array(out.tolist())
        return out

    def wrapped(*args):
        if state["mode"] == "scalar":
            return run_scalar(args)
        try:
            want = np.broadcast_shapes(*[np.shape(a) for a in args])
            out = np.asarray(fn(*args))
            if out.shape == want:
                state["mode"] = "vector"
                return out
        except Exception:
            pass
        if state["mode"] is None:
            import warnings

            warnings.warn(
                f"UDF {getattr(fn, '__name__', '<udf>')!r} is not "
                "vectorizable over numpy arrays; falling back to a "
                "per-element np.frompyfunc loop (slow). Rewrite with "
                "numpy kernels (np.where instead of if/else) for "
                "vectorized execution.", stacklevel=2)
            state["mode"] = "scalar"
        return run_scalar(args)

    wrapped.__name__ = getattr(fn, "__name__", "<udf>")
    return wrapped


class _Namespace:
    """Attribute/dict hybrid namespace like ``gb.unary`` / ``gb.binary``."""

    def __init__(self):
        self._ops: dict[str, object] = {}

    def _register(self, op):
        self._ops[op.name] = op
        setattr(self, op.name, op)
        return op

    def __getitem__(self, name):
        return self._ops[name]

    def __contains__(self, name):
        return name in self._ops

    def __iter__(self):
        return iter(self._ops.values())

    def names(self):
        return sorted(self._ops)


class UnaryOp:
    """Vectorized elementwise op ``z = f(x)``.

    Mirrors reference ``core/operator/unary.py:132``; builtin inventory from
    the parse regexes at ``unary.py:144-168``.
    """

    def __init__(self, name, fn):
        self.name = name
        self.fn = fn

    def __call__(self, x):
        if hasattr(x, "apply"):  # unary.exp(A) — expression-call style
            return x.apply(self)
        return self.fn(np.asarray(x))

    def __repr__(self):
        return f"unary.{self.name}"

    @staticmethod
    def register_new(name, fn, *, parameterized=False):
        """User extension hook (reference ``unary.py:331``);
        ``parameterized=True`` registers an op FACTORY (reference
        ``base.py:646``) — ``fn(*params)`` must return the value fn."""
        op = (ParameterizedOp(
            name, fn, lambda n, f: UnaryOp(n, _adaptive_fn(f)))
            if parameterized else UnaryOp(name, _adaptive_fn(fn)))
        unary._register(op)
        return op


class BinaryOp:
    """Vectorized elementwise op ``z = f(x, y)``.

    Mirrors reference ``core/operator/binary.py``; builtin inventory from the
    parse regexes at ``binary.py:425-457``.
    """

    def __init__(self, name, fn, commutes_to=None):
        self.name = name
        self.fn = fn
        self.commutes_to = commutes_to if commutes_to is not None else name

    def __call__(self, x, y=None):
        if y is None:  # op.first(A & B) — infix-pair call (HPEC2022 style)
            if hasattr(x, "with_op"):
                return x.with_op(self)
            raise TypeError(f"binary.{self.name} needs two operands or "
                            "an `A & B` / `A | B` infix pair")
        return self.fn(np.asarray(x), np.asarray(y))

    def __repr__(self):
        return f"binary.{self.name}"

    @staticmethod
    def register_new(name, fn, commutes_to=None, *, parameterized=False):
        op = (ParameterizedOp(
            name, fn, lambda n, f: BinaryOp(n, _adaptive_fn(f, 2), None))
            if parameterized
            else BinaryOp(name, _adaptive_fn(fn, 2), commutes_to))
        binary._register(op)
        return op


class PositionalBinaryOp(BinaryOp):
    """Positional multiply op (reference ``core/operator/binary.py:470-480``
    ``firsti/firsti1/firstj/firstj1/secondi/secondi1/secondj/secondj1``):
    the result is an INDEX of one operand, not a function of the values.
    Kernels (mxm / mxv / vxm / ewise) special-case on ``.positional`` to
    source the index columns; calling ``fn`` directly raises."""

    def __init__(self, name, which, offset, commutes_to=None):
        def _no_fn(x, y):
            raise TypeError(
                f"binary.{name} is positional — only usable inside "
                "mxm/mxv/vxm/ewise kernels, not as a value function")

        super().__init__(name, _no_fn, commutes_to)
        self.positional = which  # 'firsti' | 'firstj' | 'secondi' | 'secondj'
        self.offset = offset

    def index_values(self, i1, j1, i2, j2):
        """Pick the index array this op denotes. ``i1/j1``: row/col of the
        first operand's entries; ``i2/j2``: second operand's."""
        base = {"firsti": i1, "firstj": j1,
                "secondi": i2, "secondj": j2}[self.positional]
        out = np.asarray(base, dtype=np.int64)
        return out + self.offset if self.offset else out


class IndexUnaryOp:
    """Positional op ``z = f(val, row, col, thunk)`` (vectorized).

    Mirrors reference ``core/operator/indexunary.py:76``; bool-valued ones
    double as SelectOps (``core/operator/select.py:62``).
    """

    def __init__(self, name, fn, bool_valued=True):
        self.name = name
        self.fn = fn
        self.bool_valued = bool_valued

    def __call__(self, val, row=None, col=None, thunk=0):
        if row is None and hasattr(val, "apply"):
            # indexunary.rowindex(A, thunk) — expression-call style
            return val.apply(self, thunk=thunk)
        return self.fn(np.asarray(val), np.asarray(row), np.asarray(col),
                       thunk)

    def __repr__(self):
        return f"indexunary.{self.name}"

    @staticmethod
    def register_new(name, fn, bool_valued=True, *, parameterized=False):
        op = (ParameterizedOp(
            name, fn,
            lambda n, f: IndexUnaryOp(n, _adaptive_fn(f, 4), bool_valued))
            if parameterized
            else IndexUnaryOp(name, _adaptive_fn(fn, 4), bool_valued))
        indexunary._register(op)
        return op


class PositionalUnaryOp(UnaryOp):
    """Positional unary (reference ``unary.py`` ``positioni/positionj``
    (+1 variants)): result is the entry's row/col index, not a value
    function. ``_apply`` special-cases on ``.positional``."""

    def __init__(self, name, which, offset):
        def _no_fn(x):
            raise TypeError(f"unary.{name} is positional — usable only in "
                            "apply, not as a value function")

        super().__init__(name, _no_fn)
        self.positional = which  # 'i' | 'j'
        self.offset = offset

    def index_values(self, rows, cols):
        base = rows if self.positional == "i" else cols
        out = np.asarray(base, dtype=np.int64)
        return out + self.offset if self.offset else out


class IndexBinaryOp:
    """Vectorized ``z = f(x, ix, jx, y, iy, jy, theta)`` (reference
    ``core/operator/indexbinary.py:456`` ``register_new``; theta binding
    ``:63-70``). Calling ``iop(theta)`` binds theta and returns a
    :class:`BoundIndexBinaryOp` — a BinaryOp usable in ``ewise_mult`` /
    ``ewise_add`` and as a Semiring multiplier (``Semiring.register_new``
    accepts it), exactly the reference's ``GxB_BinaryOp_new_IndexOp``
    surface."""

    def __init__(self, name, fn):
        self.name = name
        self.fn = fn

    def __call__(self, theta=0):
        return BoundIndexBinaryOp(self, theta)

    def __repr__(self):
        return f"indexbinary.{self.name}"

    @staticmethod
    def register_new(name, fn, *, parameterized=False):
        if parameterized:
            op = ParameterizedOp(
                name, fn, lambda n, f: IndexBinaryOp(n, f))
            indexbinary._register(op)
            return op
        op = IndexBinaryOp(name, fn)
        indexbinary._register(op)
        return op


class BoundIndexBinaryOp(BinaryOp):
    """``iop(theta)`` — monomorphic BinaryOp wrapping an IndexBinaryOp
    with theta baked in (reference ``indexbinary.py:63-70``
    ``_BoundIndexBinaryOp``). Value-only call raises; kernels dispatch on
    ``.index_binary`` and call :meth:`index_fn` with the index columns."""

    def __init__(self, parent: IndexBinaryOp, theta):
        def _no_fn(x, y):
            raise TypeError(
                f"binary from indexbinary.{parent.name} needs index "
                "columns — usable inside ewise/mxm/mxv/vxm kernels only")

        super().__init__(f"{parent.name}[theta={theta!r}]", _no_fn,
                         commutes_to=None)
        self.index_binary = parent
        self.theta = theta

    def index_fn(self, x, ix, jx, y, iy, jy):
        return self.index_binary.fn(x, ix, jx, y, iy, jy, self.theta)


class ParameterizedOp:
    """Op factory (reference ``core/operator/base.py:646``
    ``ParameterizedUdf``, lru-cached ``:660``): ``register_new(name,
    factory, parameterized=True)`` stores the factory; calling it with
    parameters builds (and caches) a concrete anonymous op:

        >>> bshift = unary.register_new(
        ...     "shift", lambda n: (lambda x: x << n), parameterized=True)
        >>> bshift(3)          # a concrete UnaryOp
    """

    def __init__(self, name, factory, build):
        self.name = name
        self.factory = factory
        self._build = build
        self._cache: dict = {}

    def __call__(self, *args, **kwargs):
        try:
            key = (args, tuple(sorted(kwargs.items())))
            hash(key)
        except TypeError:
            key = None
        if key is not None and key in self._cache:
            return self._cache[key]
        fn = self.factory(*args, **kwargs)
        op = self._build(f"{self.name}{args!r}", fn)
        if key is not None:
            self._cache[key] = op
        return op

    def __repr__(self):
        return f"parameterized.{self.name}"


unary = _Namespace()
binary = _Namespace()
indexunary = _Namespace()
indexbinary = _Namespace()


def _safe_minv(x):
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(x != 0, 1.0 / np.where(x == 0, 1, x), np.inf * np.sign(1))


_UNARY_BUILTINS = {
    # reference regex inventory: unary.py:144-168
    "identity": lambda x: x,
    "ainv": np.negative,
    "minv": lambda x: np.divide(1.0, x, where=np.asarray(x) != 0,
                                out=np.full(np.shape(x), np.inf, dtype="float64")),
    "abs": np.abs,
    "lnot": np.logical_not,
    "bnot": np.invert,
    "one": lambda x: np.ones_like(np.asarray(x)) if np.asarray(x).dtype != np.bool_
    else np.ones(np.shape(x), dtype=bool),
    "sqrt": np.sqrt,
    "log": np.log,
    "exp": np.exp,
    "log2": np.log2,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "acos": np.arccos,
    "asin": np.arcsin,
    "atan": np.arctan,
    "sinh": np.sinh,
    "cosh": np.cosh,
    "tanh": np.tanh,
    "acosh": np.arccosh,
    "asinh": np.arcsinh,
    "atanh": np.arctanh,
    "signum": np.sign,
    "ceil": np.ceil,
    "floor": np.floor,
    "round": np.round,
    "trunc": np.trunc,
    "exp2": np.exp2,
    "expm1": np.expm1,
    "log10": np.log10,
    "log1p": np.log1p,
    "cbrt": np.cbrt,
    "isinf": np.isinf,
    "isnan": np.isnan,
    "isfinite": np.isfinite,
    "lgamma": lambda x: _scipy_or_math("gammaln", x),
    "tgamma": lambda x: _scipy_or_math("gamma", x),
    "erf": lambda x: _scipy_or_math("erf", x),
    "erfc": lambda x: _scipy_or_math("erfc", x),
}


def _scipy_or_math(name, x):
    try:  # scipy may not be present; fall back to vectorized math.*
        import scipy.special as sp

        return getattr(sp, name)(x)
    except ImportError:  # pragma: no cover
        import math

        fn = {"gammaln": math.lgamma, "gamma": math.gamma,
              "erf": math.erf, "erfc": math.erfc}[name]
        return np.vectorize(fn)(x)


for _name, _fn in _UNARY_BUILTINS.items():
    unary._register(UnaryOp(_name, _fn))


def _cdiv(x, y):
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.divide(x, y)


_BINARY_BUILTINS = {
    # reference regex inventory: binary.py:425-457 (+ commutes-to table :459+)
    "first": (lambda x, y: x, "second"),
    "second": (lambda x, y: np.broadcast_to(np.asarray(y), np.shape(x)).copy()
               if np.ndim(y) == 0 else y, "first"),
    "pair": (lambda x, y: np.ones(np.broadcast_shapes(np.shape(x), np.shape(y)),
                                  dtype="int64"), "pair"),
    "plus": (np.add, "plus"),
    "minus": (np.subtract, "rminus"),
    "rminus": (lambda x, y: np.subtract(y, x), "minus"),
    "times": (np.multiply, "times"),
    "truediv": (_cdiv, "rtruediv"),
    "div": (_cdiv, "rdiv"),
    "rdiv": (lambda x, y: _cdiv(y, x), "div"),
    "rtruediv": (lambda x, y: _cdiv(y, x), "truediv"),
    "floordiv": (lambda x, y: np.floor_divide(x, y), "rfloordiv"),
    "rfloordiv": (lambda x, y: np.floor_divide(y, x), "floordiv"),
    "min": (np.minimum, "min"),
    "max": (np.maximum, "max"),
    "pow": (np.power, "rpow"),
    "rpow": (lambda x, y: np.power(y, x), "pow"),
    "any": (lambda x, y: x, "any"),  # 'any' may return either; we pick first
    "iseq": (lambda x, y: (np.asarray(x) == y).astype("int64"), "iseq"),
    "isne": (lambda x, y: (np.asarray(x) != y).astype("int64"), "isne"),
    "isgt": (lambda x, y: (np.asarray(x) > y).astype("int64"), "islt"),
    "islt": (lambda x, y: (np.asarray(x) < y).astype("int64"), "isgt"),
    "isge": (lambda x, y: (np.asarray(x) >= y).astype("int64"), "isle"),
    "isle": (lambda x, y: (np.asarray(x) <= y).astype("int64"), "isge"),
    "lor": (np.logical_or, "lor"),
    "land": (np.logical_and, "land"),
    "lxor": (np.logical_xor, "lxor"),
    "lxnor": (lambda x, y: np.logical_not(np.logical_xor(x, y)), "lxnor"),
    "eq": (lambda x, y: np.asarray(x) == y, "eq"),
    "ne": (lambda x, y: np.asarray(x) != y, "ne"),
    "gt": (lambda x, y: np.asarray(x) > y, "lt"),
    "lt": (lambda x, y: np.asarray(x) < y, "gt"),
    "ge": (lambda x, y: np.asarray(x) >= y, "le"),
    "le": (lambda x, y: np.asarray(x) <= y, "ge"),
    "atan2": (np.arctan2, None),
    "hypot": (np.hypot, "hypot"),
    "fmod": (np.fmod, None),
    "remainder": (np.remainder, None),
    "ldexp": (np.ldexp, None),
    "copysign": (np.copysign, None),
    "bor": (np.bitwise_or, "bor"),
    "band": (np.bitwise_and, "band"),
    "bxor": (np.bitwise_xor, "bxor"),
    "bxnor": (lambda x, y: np.invert(np.bitwise_xor(x, y)), "bxnor"),
    # Python-UDF extras from graphblas/binary/__init__.py:14-22
    "absfirst": (lambda x, y: np.abs(x), "abssecond"),
    "abssecond": (lambda x, y: np.abs(np.broadcast_to(np.asarray(y), np.shape(x))
                                      if np.ndim(y) == 0 else y), "absfirst"),
}

for _name, (_fn, _comm) in _BINARY_BUILTINS.items():
    binary._register(BinaryOp(_name, _fn, _comm))

# positional binaries (reference binary.py:470-480; offset +1 variants)
for _which in ("firsti", "firstj", "secondi", "secondj"):
    _comm = {"firsti": "secondi", "firstj": "secondj",
             "secondi": "firsti", "secondj": "firstj"}[_which]
    binary._register(PositionalBinaryOp(_which, _which, 0, _comm))
    binary._register(PositionalBinaryOp(_which + "1", _which, 1,
                                        _comm + "1"))


_INDEXUNARY_BUILTINS = {
    # reference regex inventory: indexunary.py:98-109
    "rowindex": (lambda v, r, c, t: r + t, False),
    "colindex": (lambda v, r, c, t: c + t, False),
    "diagindex": (lambda v, r, c, t: c - r + t, False),
    "tril": (lambda v, r, c, t: c <= r + t, True),
    "triu": (lambda v, r, c, t: c >= r + t, True),
    "diag": (lambda v, r, c, t: c == r + t, True),
    "offdiag": (lambda v, r, c, t: c != r + t, True),
    "rowle": (lambda v, r, c, t: r <= t, True),
    "rowgt": (lambda v, r, c, t: r > t, True),
    "colle": (lambda v, r, c, t: c <= t, True),
    "colgt": (lambda v, r, c, t: c > t, True),
    "valueeq": (lambda v, r, c, t: v == t, True),
    "valuene": (lambda v, r, c, t: v != t, True),
    "valuegt": (lambda v, r, c, t: v > t, True),
    "valuege": (lambda v, r, c, t: v >= t, True),
    "valuelt": (lambda v, r, c, t: v < t, True),
    "valuele": (lambda v, r, c, t: v <= t, True),
}

for _name, (_fn, _bool) in _INDEXUNARY_BUILTINS.items():
    indexunary._register(IndexUnaryOp(_name, _fn, _bool))


# ---------------------------------------------------------------------------
# inventory extensions (reference parity)
# ---------------------------------------------------------------------------

def _bshift(x, y):
    """SuiteSparse GxB_BSHIFT: y > 0 shifts left, y < 0 shifts right
    (reference ``binary.py`` parse regexes :425-457)."""
    x = np.asarray(x)
    y = np.broadcast_to(np.asarray(y), x.shape).astype(np.int64)
    left = np.left_shift(x, np.maximum(y, 0))
    right = np.right_shift(x, np.maximum(-y, 0))
    return np.where(y >= 0, left, right)


for _name, _fn, _comm in [
    # bit-field binaries (reference binary.py regexes :425-457)
    ("bget", lambda x, y: (np.asarray(x) >> np.asarray(y).astype(
        np.asarray(x).dtype)) & np.asarray(x).dtype.type(1), None),
    ("bset", lambda x, y: np.asarray(x) | (np.asarray(x).dtype.type(1)
                                           << np.asarray(y).astype(
                                               np.asarray(x).dtype)), None),
    ("bclr", lambda x, y: np.asarray(x) & ~(np.asarray(x).dtype.type(1)
                                            << np.asarray(y).astype(
                                                np.asarray(x).dtype)), None),
    ("bshift", _bshift, None),
]:
    binary._register(BinaryOp(_name, _fn, _comm))

def _binom(N, k):
    """Exact int64 binomial coefficient, 0 on overflow or out-of-bounds
    (reference ``core/operator/binary.py:337`` ``_binom`` — same sequential
    multiply/divide recurrence, vectorized with per-lane active masks)."""
    N = np.asarray(N, dtype=np.int64)
    k = np.asarray(k, dtype=np.int64)
    N, k = np.broadcast_arrays(N, k)
    N, k = N.copy(), k.copy()
    ok = (k >= 0) & (k <= N)
    val = np.where(ok, np.int64(1), np.int64(0))
    m = np.where(ok, np.minimum(k, N - k), 0)
    max_i64 = np.iinfo(np.int64).max
    mmax = int(m.max()) if m.size else 0
    for i in range(mmax):
        act = np.flatnonzero((m > i) & (val > 0))
        if not len(act):
            break
        Ni = N[act] - i
        over = val[act] > max_i64 // Ni
        val[act[over]] = 0
        live = act[~over]
        val[live] = (val[live] * (N[live] - i)) // (i + 1)
    return val


binary._register(BinaryOp("binom", _binom))

# cmplx(re, im) → FC64 (reference binary.py FP→FC row): pairs two real
# operands into one complex value column
binary._register(BinaryOp(
    "cmplx", lambda x, y: np.asarray(x, dtype=np.float64)
    + 1j * np.asarray(y, dtype=np.float64)))


def _isclose_factory(rel_tol=1e-7, abs_tol=0.0):
    """Reference ``binary.py:327`` ``_isclose`` — a PARAMETERIZED op
    factory; ``binary.isclose(rel_tol, abs_tol)`` yields a concrete
    boolean BinaryOp (used by ``isclose`` comparisons)."""

    def inner(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        return (x == y) | (np.abs(x - y) <= np.maximum(
            rel_tol * np.maximum(np.abs(x), np.abs(y)), abs_tol))

    return inner


BinaryOp.register_new("isclose", _isclose_factory, parameterized=True)

# frexp mantissa/exponent halves (reference unary.py fp inventory)
unary._register(UnaryOp("frexpx", lambda x: np.frexp(x)[0]))
unary._register(UnaryOp("frexpe", lambda x: np.frexp(x)[1].astype(np.int64)))

# complex inventory (reference unary.py FC rows: conj/creal/cimag/carg;
# binary.py cmplx). FC32/FC64 value columns are struct<_c_re,_c_im> Arrow
# columns (``functions/dtypes.py``) and numpy complex inside kernels, so
# these are plain vectorized ufuncs. creal/cimag/carg return FP dtypes.
unary._register(UnaryOp("conj", np.conj))
unary._register(UnaryOp("creal", lambda x: np.ascontiguousarray(
    np.real(np.asarray(x)))))
unary._register(UnaryOp("cimag", lambda x: np.ascontiguousarray(
    np.imag(np.asarray(x)))))
unary._register(UnaryOp("carg", lambda x: np.angle(np.asarray(x))))

# positional unaries (reference unary positioni/positionj (+1))
for _which in ("i", "j"):
    unary._register(PositionalUnaryOp(f"position{_which}", _which, 0))
    unary._register(PositionalUnaryOp(f"position{_which}1", _which, 1))

# ``op.numpy`` namespaces (reference graphblas/unary/numpy.py:18-120 and
# graphblas/binary/numpy.py) — numpy-named lookups ``unary["numpy.cbrt"]``
_NUMPY_UNARY = [
    "negative", "abs", "absolute", "cbrt", "fabs", "rint", "sign", "exp",
    "exp2", "log", "log2", "log10", "expm1", "log1p", "positive", "sqrt",
    "square", "reciprocal", "sin", "cos", "tan", "arcsin", "arccos",
    "arctan", "sinh", "cosh", "tanh", "arcsinh", "arccosh", "arctanh",
    "deg2rad", "rad2deg", "degrees", "radians", "bitwise_not", "invert",
    "logical_not", "isfinite", "isinf", "isnan", "signbit", "floor",
    "ceil", "trunc", "spacing",
]
_NUMPY_BINARY = [
    "add", "subtract", "multiply", "divide", "logaddexp", "logaddexp2",
    "true_divide", "floor_divide", "power", "float_power", "remainder",
    "mod", "fmod", "gcd", "lcm", "arctan2", "hypot", "bitwise_and",
    "bitwise_or", "bitwise_xor", "left_shift", "right_shift", "greater",
    "greater_equal", "less", "less_equal", "not_equal", "equal",
    "logical_and", "logical_or", "logical_xor", "maximum", "minimum",
    "fmax", "fmin", "copysign", "nextafter", "ldexp", "around",
]
unary.numpy = _Namespace()
binary.numpy = _Namespace()
for _name in _NUMPY_UNARY:
    _op = UnaryOp(f"numpy.{_name}", getattr(np, _name))
    unary._ops[_op.name] = _op                 # unary["numpy.cbrt"]
    unary.numpy._register(UnaryOp(_name, _op.fn))   # unary.numpy.cbrt
for _name in _NUMPY_BINARY:
    _op = BinaryOp(f"numpy.{_name}", getattr(np, _name))
    binary._ops[_op.name] = _op
    binary.numpy._register(BinaryOp(_name, _op.fn))


_STRING_TO_BINARY = {
    "+": "plus", "-": "minus", "*": "times", "/": "truediv", "//": "floordiv",
    "%": "remainder", "**": "pow", "&": "land", "|": "lor", "^": "lxor",
    "==": "eq", "!=": "ne", ">": "gt", "<": "lt", ">=": "ge", "<=": "le",
}

_STRING_TO_SELECT = {
    "==": "valueeq", "!=": "valuene", ">": "valuegt",
    ">=": "valuege", "<": "valuelt", "<=": "valuele",
}


def binary_from_string(s):
    """``"+"``-style shorthand (reference ``core/operator/utils.py``;
    accum parsing ``base.py:222-223``)."""
    if isinstance(s, BinaryOp):
        return s
    name = _STRING_TO_BINARY.get(s, s)
    return binary[name]


def unary_from_string(s):
    if isinstance(s, UnaryOp):
        return s
    return unary[s]


def select_from_string(s):
    """``A.select(">=", 1)`` string dispatch (reference ``matrix.py:2564``)."""
    if isinstance(s, SelectCall):
        return s.op
    if isinstance(s, IndexUnaryOp):
        return s
    name = _STRING_TO_SELECT.get(s, s)
    return indexunary[name]


class SelectCall:
    """Module-call select style — ``gb.select.tril(A, 0)`` (reference
    ``graphblas/select/__init__.py``: SelectOp wrappers over the
    bool-valued IndexUnaryOps). Calling with a container delegates to
    ``target.select(op, thunk)``; the object is also accepted anywhere
    ``A.select(...)`` takes an op."""

    __slots__ = ("op", "name")

    def __init__(self, op):
        self.op = op
        self.name = op.name

    def __call__(self, target, thunk=0):
        sel = getattr(target, "select", None)
        if sel is None:
            raise TypeError(
                f"select.{self.name} expects a GBMatrix/GBVector, got "
                f"{type(target).__name__}")
        return sel(self.op, thunk)

    def __repr__(self):
        return f"select.{self.name}"


select = _Namespace()
for _n, _o in list(indexunary._ops.items()):
    if getattr(_o, "bool_valued", False):
        select._register(SelectCall(_o))


class _CombinedNamespace:
    """Unified ``gb.op`` lookup across the operator namespaces
    (reference ``graphblas/op/__init__.py``): ``op.plus`` → binary,
    ``op.abs`` → unary, ``op.min_plus`` → semiring, ``op.numpy.*`` →
    the numpy sub-namespaces."""

    def __init__(self, *spaces):
        self._spaces = spaces

    def __getitem__(self, name):
        for s in self._spaces:
            if name in s:
                return s[name]
        raise KeyError(name)

    def __contains__(self, name):
        return any(name in s for s in self._spaces)

    def __getattr__(self, name):
        for s in self._spaces:
            if name in s:
                return s[name]
        for s in self._spaces:
            v = getattr(s, name, None)
            if v is not None:
                return v
        raise AttributeError(name)

    def names(self):
        out = set()
        for s in self._spaces:
            out.update(s.names())
        return sorted(out)
