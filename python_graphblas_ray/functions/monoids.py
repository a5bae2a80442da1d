"""Monoids and Semirings.

Mirrors reference ``core/operator/monoid.py`` (builtin inventory from parse
regexes ``monoid.py:244-254``, ``is_idempotent`` flag ``:258``) and
``core/operator/semiring.py`` (regexes ``:190-218``); user registration
mirrors ``monoid.py:373`` / ``semiring.py:370`` and ``get_semiring``
(``core/operator/utils.py:184``).

A Monoid drives every distributed reduction (``groupby.aggregate`` combine
fn); ``idempotent`` marks which re-aggregations are safe under task retry
(non-idempotent ones need exactly-once per-partition outputs — see
``state/checkpoint.py``).
"""

from __future__ import annotations

import numpy as np

from . import ops as _ops
from .ops import BinaryOp, binary

__all__ = ["Monoid", "Semiring", "monoid", "semiring", "get_semiring"]


class _Namespace:
    def __init__(self):
        self._ops = {}

    def _register(self, op):
        self._ops[op.name] = op
        setattr(self, op.name, op)
        return op

    def __getitem__(self, name):
        return self._ops[name]

    def __contains__(self, name):
        return name in self._ops

    def names(self):
        return sorted(self._ops)


class Monoid:
    """Associative+commutative binary op with identity.

    ``reduce_np`` folds a numpy array; ``binaryop.fn`` combines two arrays
    elementwise (the groupby combine step).
    """

    def __init__(self, name, binaryop: BinaryOp, identity, idempotent=False,
                 np_reduce=None, terminal=None):
        self.name = name
        self.binaryop = binaryop
        self.identity = identity
        self.is_idempotent = idempotent
        # fast whole-array fold (np.add.reduce etc.); fallback is pairwise
        self._np_reduce = np_reduce
        self.terminal = terminal  # early-exit value (e.g. lor: True)

    def __call__(self, x, y=None):
        if y is None:  # monoid.min(A | B) — infix-pair call
            if hasattr(x, "with_op"):
                return x.with_op(self.binaryop)
            raise TypeError(f"monoid.{self.name} needs two operands or "
                            "an `A & B` / `A | B` infix pair")
        return self.binaryop(x, y)

    def reduce_np(self, arr):
        arr = np.asarray(arr)
        if arr.size == 0:
            return self.identity
        if self._np_reduce is not None:
            return self._np_reduce(arr)
        out = arr[0]
        for v in arr[1:]:
            out = self.binaryop.fn(out, v)
        return out

    def __repr__(self):
        return f"monoid.{self.name}"

    @staticmethod
    def register_new(name, binaryop, identity, idempotent=False):
        """Reference ``monoid.py:373``."""
        if isinstance(binaryop, str):
            binaryop = binary[binaryop]
        m = Monoid(name, binaryop, identity, idempotent)
        monoid._register(m)
        return m


class Semiring:
    """``(add_monoid, multiply_binaryop)`` pair driving join+aggregate
    kernels (mxm/mxv/vxm). Reference ``core/operator/semiring.py``."""

    def __init__(self, name, add: Monoid, mult: BinaryOp):
        self.name = name
        self.monoid = add
        self.binaryop = mult

    def multiply(self, a, b):
        return self.binaryop(a, b)

    def __repr__(self):
        return f"semiring.{self.name}"

    @staticmethod
    def register_new(name, add, mult):
        """Reference ``semiring.py:370``."""
        if isinstance(add, str):
            add = monoid[add]
        if isinstance(mult, str):
            mult = binary[mult]
        s = Semiring(name, add, mult)
        semiring._register(s)
        return s


monoid = _Namespace()
semiring = _Namespace()

_MONOID_DEFS = {
    # name: (binaryop, identity, idempotent, np whole-array reduce, terminal)
    "plus": ("plus", 0, False, lambda a: np.add.reduce(a), None),
    "times": ("times", 1, False, lambda a: np.multiply.reduce(a), 0),
    "min": ("min", np.inf, True, lambda a: np.minimum.reduce(a), None),
    "max": ("max", -np.inf, True, lambda a: np.maximum.reduce(a), None),
    "any": ("any", None, True, lambda a: a[0], None),
    "lor": ("lor", False, True, lambda a: np.logical_or.reduce(a), True),
    "land": ("land", True, True, lambda a: np.logical_and.reduce(a), False),
    "lxor": ("lxor", False, False, lambda a: np.logical_xor.reduce(a), None),
    "lxnor": ("lxnor", True, False, None, None),
    "eq": ("eq", True, False, None, None),
    "bor": ("bor", 0, True, lambda a: np.bitwise_or.reduce(a), None),
    "band": ("band", ~0, True, lambda a: np.bitwise_and.reduce(a), None),
    "bxor": ("bxor", 0, False, lambda a: np.bitwise_xor.reduce(a), None),
    "bxnor": ("bxnor", ~0, False, None, None),
}

for _name, (_b, _id, _idem, _red, _term) in _MONOID_DEFS.items():
    monoid._register(Monoid(_name, binary[_name], _id, _idem, _red, _term))


def get_semiring(add, mult, name=None):
    """Compose/lookup ``<monoid>_<binaryop>`` (reference
    ``core/operator/utils.py:184``)."""
    if isinstance(add, str):
        add = monoid[add]
    if isinstance(mult, str):
        mult = binary[mult]
    name = name or f"{add.name}_{mult.name}"
    if name in semiring:
        return semiring[name]
    return semiring._register(Semiring(name, add, mult))


# The named semirings the algorithms need (SURVEY.md §2.4), plus the full
# generic composition surface via get_semiring().
for _add, _mult in [
    ("plus", "times"),   # default matmul
    ("min", "plus"),     # SSSP
    ("plus", "second"),  # PageRank pull step
    ("min", "second"),   # FastSV CC
    ("plus", "first"),
    ("min", "first"),
    ("max", "second"),
    ("max", "first"),
    ("plus", "pair"),    # triangle count
    ("any", "pair"),     # BFS reachability
    ("lor", "land"),     # boolean matmul
    ("land", "lor"),
    ("min", "times"),
    ("max", "plus"),
    ("max", "times"),
    ("max", "min"),      # widest / bottleneck path
    ("min", "max"),      # minimax path

    ("plus", "plus"),
    ("plus", "min"),
    ("plus", "max"),
]:
    get_semiring(_add, _mult)

# positional semiring families (reference semiring.py:190-218
# ``min_firsti``-style) — parent BFS (min_secondi), argmin recipes
for _add in ("min", "max", "any"):
    for _pos in ("firsti", "firstj", "secondi", "secondj"):
        get_semiring(_add, _pos)
        get_semiring(_add, _pos + "1")


# unified operator namespace (reference ``graphblas/op/__init__.py``):
# one lookup across binary/unary/indexunary/monoid/semiring + the
# ``numpy`` sub-namespaces
op = _ops._CombinedNamespace(binary, _ops.unary, _ops.indexunary,
                             monoid, semiring)
op.numpy = _ops._CombinedNamespace(_ops.unary.numpy, binary.numpy)
