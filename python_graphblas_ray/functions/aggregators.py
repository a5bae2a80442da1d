"""Aggregators: multi-step reductions with partial+final structure.

Mirrors reference ``core/operator/agg.py:31`` (instances ``:347-756``).
The reference documents composite aggregators as "N parallel partial
aggregations + finalize expression" (``agg.py:233-259``) — exactly Ray
Data's partial+final aggregate protocol, which we adopt literally:

- ``partial(vals, idx) -> dict[str, scalar]`` runs per (batch, group) inside
  ``map_batches`` — the combiner that shrinks data before the shuffle;
- ``final(partials: dict[str, np.ndarray]) -> scalar`` runs once per group
  over all that group's partial rows (small), combining and finalizing.

This two-level shape is what makes a ``reduce_rowwise(agg.mean)`` a
pre-aggregated shuffle instead of an all-rows shuffle at 100 TB.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Aggregator", "agg"]


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


class Aggregator:
    def __init__(self, name, partial, final, dtype=None):
        self.name = name
        self.partial = partial  # (vals, idx) -> dict of partial scalars
        self.final = final      # dict[str, np.ndarray] -> scalar
        self.dtype = dtype

    def __repr__(self):
        return f"agg.{self.name}"

    def reduce_np(self, vals, idx=None):
        """Driver-side whole-array reduction (used by reduce_scalar and
        tests): partial over the full array, then final over 1-row partials."""
        vals = np.asarray(vals)
        if idx is None:
            idx = np.arange(len(vals), dtype=np.int64)
        p = self.partial(vals, np.asarray(idx))
        return self.final({k: np.asarray([v]) for k, v in p.items()})

    @staticmethod
    def register_new(name, partial, final, dtype=None):
        a = Aggregator(name, partial, final, dtype)
        agg._register(a)
        return a


agg = _Namespace()


def _monoid_agg(name, np_reduce, np_combine, dtype=None):
    return Aggregator(
        name,
        lambda v, i, _r=np_reduce: {"p": _r(v)},
        lambda d, _c=np_combine: _c(d["p"]),
        dtype,
    )


# --- monoid-based (reference agg.py:347-355) ---
agg._register(_monoid_agg("sum", np.add.reduce, np.add.reduce))
agg._register(_monoid_agg("prod", np.multiply.reduce, np.multiply.reduce))
agg._register(_monoid_agg("all", lambda v: bool(np.all(v)), lambda p: bool(np.all(p)), bool))
agg._register(_monoid_agg("any", lambda v: bool(np.any(v)), lambda p: bool(np.any(p)), bool))
agg._register(_monoid_agg("min", np.minimum.reduce, np.minimum.reduce))
agg._register(_monoid_agg("max", np.maximum.reduce, np.maximum.reduce))
agg._register(_monoid_agg("any_value", lambda v: v[0], lambda p: p[0]))
agg._register(_monoid_agg("bitwise_all", np.bitwise_and.reduce, np.bitwise_and.reduce))
agg._register(_monoid_agg("bitwise_any", np.bitwise_or.reduce, np.bitwise_or.reduce))

# --- semiring-based (reference agg.py:359-380: reduction = SpMV vs ones) ---
agg._register(Aggregator(
    "count", lambda v, i: {"n": len(v)}, lambda d: int(np.add.reduce(d["n"])), np.int64))
agg._register(Aggregator(
    "count_nonzero", lambda v, i: {"n": int(np.count_nonzero(v))},
    lambda d: int(np.add.reduce(d["n"])), np.int64))
agg._register(Aggregator(
    "count_zero", lambda v, i: {"n": int(len(v) - np.count_nonzero(v))},
    lambda d: int(np.add.reduce(d["n"])), np.int64))
agg._register(Aggregator(
    "sum_of_squares", lambda v, i: {"s": np.add.reduce(np.square(v, dtype="float64"))},
    lambda d: np.add.reduce(d["s"]), np.float64))
agg._register(Aggregator(
    "sum_of_inverses", lambda v, i: {"s": np.add.reduce(1.0 / np.asarray(v, dtype="float64"))},
    lambda d: np.add.reduce(d["s"]), np.float64))
agg._register(Aggregator(
    "exists", lambda v, i: {"e": 1}, lambda d: 1, np.int64))

# --- numeric composites (reference agg.py:382-422) ---
agg._register(Aggregator(
    "hypot", lambda v, i: {"s": np.add.reduce(np.square(v, dtype="float64"))},
    lambda d: float(np.sqrt(np.add.reduce(d["s"]))), np.float64))
agg._register(Aggregator(
    "logaddexp", lambda v, i: {"s": np.logaddexp.reduce(np.asarray(v, dtype="float64"))},
    lambda d: float(np.logaddexp.reduce(d["s"])), np.float64))
agg._register(Aggregator(
    "logaddexp2", lambda v, i: {"s": np.logaddexp2.reduce(np.asarray(v, dtype="float64"))},
    lambda d: float(np.logaddexp2.reduce(d["s"])), np.float64))
agg._register(Aggregator(
    "L0norm", lambda v, i: {"n": int(np.count_nonzero(v))},
    lambda d: int(np.add.reduce(d["n"])), np.int64))
agg._register(Aggregator(
    "L1norm", lambda v, i: {"s": np.add.reduce(np.abs(np.asarray(v, dtype="float64")))},
    lambda d: float(np.add.reduce(d["s"])), np.float64))
agg._register(Aggregator(
    "L2norm", lambda v, i: {"s": np.add.reduce(np.square(v, dtype="float64"))},
    lambda d: float(np.sqrt(np.add.reduce(d["s"]))), np.float64))
agg._register(Aggregator(
    "Linfnorm", lambda v, i: {"m": np.maximum.reduce(np.abs(np.asarray(v, dtype="float64")))},
    lambda d: float(np.maximum.reduce(d["m"])), np.float64))

# --- composite statistics (reference agg.py:478-526) ---


def _mean_partial(v, i):
    v = np.asarray(v, dtype="float64")
    return {"s": np.add.reduce(v), "n": len(v)}


def _var_partial(v, i):
    v = np.asarray(v, dtype="float64")
    return {"s": np.add.reduce(v), "s2": np.add.reduce(np.square(v)), "n": len(v)}


def _var_final(d, ddof):
    n = np.add.reduce(d["n"])
    s = np.add.reduce(d["s"])
    s2 = np.add.reduce(d["s2"])
    denom = n - ddof
    if denom <= 0:
        return np.nan
    return float((s2 - s * s / n) / denom)


agg._register(Aggregator("mean", _mean_partial,
                         lambda d: float(np.add.reduce(d["s"]) / np.add.reduce(d["n"])),
                         np.float64))
agg._register(Aggregator(
    "peak_to_peak",
    lambda v, i: {"mn": np.minimum.reduce(v), "mx": np.maximum.reduce(v)},
    lambda d: np.maximum.reduce(d["mx"]) - np.minimum.reduce(d["mn"])))
agg._register(Aggregator("varp", _var_partial, lambda d: _var_final(d, 0), np.float64))
agg._register(Aggregator("vars", _var_partial, lambda d: _var_final(d, 1), np.float64))
agg._register(Aggregator("stdp", _var_partial,
                         lambda d: float(np.sqrt(max(_var_final(d, 0), 0.0))), np.float64))
agg._register(Aggregator("stds", _var_partial,
                         lambda d: float(np.sqrt(max(_var_final(d, 1), 0.0))), np.float64))
agg._register(Aggregator(
    "geometric_mean",
    lambda v, i: {"ls": np.add.reduce(np.log(np.asarray(v, dtype="float64"))), "n": len(v)},
    lambda d: float(np.exp(np.add.reduce(d["ls"]) / np.add.reduce(d["n"]))), np.float64))
agg._register(Aggregator(
    "harmonic_mean",
    lambda v, i: {"si": np.add.reduce(1.0 / np.asarray(v, dtype="float64")), "n": len(v)},
    lambda d: float(np.add.reduce(d["n"]) / np.add.reduce(d["si"])), np.float64))
agg._register(Aggregator(
    "root_mean_square",
    lambda v, i: {"s2": np.add.reduce(np.square(np.asarray(v, dtype="float64"))), "n": len(v)},
    lambda d: float(np.sqrt(np.add.reduce(d["s2"]) / np.add.reduce(d["n"]))), np.float64))

# --- positional (reference agg.py:627-737; argmin/argmax = (extreme, arg)
#     pairs, first/last = (index, value-at-index) pairs) ---


def _argext_partial(reduce_fn, argfn):
    def partial(v, i):
        k = argfn(v)
        return {"m": v[k], "a": i[k]}
    return partial


def _argext_final(cmp):
    def final(d):
        k = cmp(d["m"])
        return int(d["a"][k])
    return final


agg._register(Aggregator("argmin", _argext_partial(np.minimum.reduce, np.argmin),
                         _argext_final(np.argmin), np.int64))
agg._register(Aggregator("argmax", _argext_partial(np.maximum.reduce, np.argmax),
                         _argext_final(np.argmax), np.int64))
agg._register(Aggregator(
    "first",
    lambda v, i: {"i": i[np.argmin(i)], "v": v[np.argmin(i)]},
    lambda d: d["v"][np.argmin(d["i"])]))
agg._register(Aggregator(
    "last",
    lambda v, i: {"i": i[np.argmax(i)], "v": v[np.argmax(i)]},
    lambda d: d["v"][np.argmax(d["i"])]))
agg._register(Aggregator(
    "first_index", lambda v, i: {"i": np.minimum.reduce(i)},
    lambda d: int(np.minimum.reduce(d["i"])), np.int64))
agg._register(Aggregator(
    "last_index", lambda v, i: {"i": np.maximum.reduce(i)},
    lambda d: int(np.maximum.reduce(d["i"])), np.int64))
