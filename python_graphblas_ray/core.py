"""Core sparse containers re-expressed over Ray Data.

Reference data model (SURVEY.md §1; ``graphblas/core/matrix.py:167``,
``vector.py:141``, ``scalar.py:45``):

- ``GBMatrix``  — 2-D sparse map ``(row, col) → value`` = a ``ray.data.Dataset``
  with columns ``(src:int64, dst:int64, val:T)``; rows absent = structurally
  missing (missing ≠ zero).
- ``GBVector``  — 1-D sparse map = Dataset ``(vid:int64, val:T)``.
- ``GBScalar``  — 0-D, possibly empty (reference ``scalar.py:317``): a plain
  driver-side value or None.

Every operator returns a NEW container wrapping a lazy Dataset — Ray Data's
lazy plan plays the role of the reference's delayed expressions
(``core/base.py:535``); execution happens on consumption (``nvals``,
``to_coo``, ``write_parquet``). Masks/accum/replace are explicit kwargs
(``update`` / ``merge_into``) implementing the invariant of
``docs/user_guide/fundamentals.rst:10-38``: result = accum(old, computed) on
masked positions; unmasked kept (or dropped when ``replace=True``).

Scale notes: joins are hash-partitioned shuffles (``stages/join.py``); small
sides (vectors in mxv, mask key sets) are broadcast once via ``ray.put`` and
read zero-copy per task. Iterative algorithms do NOT run through these
generic kernels — they use the pinned CSR actor engine in
``state/superstep.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .functions.aggregators import Aggregator
from .functions.monoids import Monoid, Semiring, monoid as _monoid_ns
from .functions.ops import (
    BinaryOp,
    IndexUnaryOp,
    PositionalUnaryOp,
    UnaryOp,
    binary,
    binary_from_string,
    select_from_string,
    unary_from_string,
)
from .stages.join import (
    broadcast_key_set,
    hash_join,
    semi_join_filter,
)
from .stages.reduce import (
    global_monoid_reduce,
    groupby_aggregator,
    groupby_monoid,
    np_group_reduce,
)


# canonical definitions live in exceptions.py (reference-parity
# hierarchy); re-exported here for the package's historical import path
from .exceptions import (  # noqa: F401
    DimensionMismatch,
    DuplicateIndexError,
    IndexOutOfBound,
    OutputNotEmpty,
)


class _ReplaceSingleton:
    """``gb.replace`` sentinel: ``C(mask, replace) << expr`` means
    ``replace=True`` (reference ``__init__.py:5-19``)."""

    def __repr__(self):
        return "replace"

    def __bool__(self):
        return True


replace_singleton = _ReplaceSingleton()


def _arrow_val_type(dtype) -> pa.DataType:
    """Arrow type for a value column of numpy dtype ``dtype`` (complex →
    marker struct, UDT → struct; see ``functions/dtypes.py``)."""
    from .functions.dtypes import _arrow_type_for

    return _arrow_type_for(np.dtype(dtype))


def _infer_val_dtype(ds) -> np.dtype:
    """Numpy dtype of a dataset's ``val`` column (float64 when absent or
    unknowable)."""
    try:
        s = ds.schema(fetch_if_missing=True)
        t = dict(zip(s.names, s.types)).get("val")
        if t is not None:
            from .functions.dtypes import np_dtype_for_arrow

            return np_dtype_for_arrow(t)
    except Exception:
        pass
    return np.dtype("float64")


def _empty_ds(val_dtype="float64", vector=False):
    if vector:
        schema = {"vid": pa.array([], type=pa.int64()),
                  "val": pa.array([], type=_arrow_val_type(val_dtype))}
    else:
        schema = {"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64()),
                  "val": pa.array([], type=_arrow_val_type(val_dtype))}
    return ray.data.from_arrow(pa.table(schema))


def _np(col, batch):
    arr = batch[col]
    typ = arr.type if not isinstance(arr, pa.ChunkedArray) else arr.type
    if pa.types.is_struct(typ) or pa.types.is_fixed_size_list(typ):
        from .functions.dtypes import arrow_to_np_values

        return arrow_to_np_values(arr)  # UDT → numpy structured array
    return arr.to_numpy(zero_copy_only=False)


def _pa_val(values) -> pa.Array:
    """Numpy value column → Arrow array; structured dtypes (UDTs) become
    struct arrays (``functions/dtypes.py``)."""
    values = np.asarray(values)
    if (values.dtype.names is not None or values.ndim > 1
            or values.dtype.kind == "c"):
        from .functions.dtypes import np_to_arrow_values

        return np_to_arrow_values(values)
    return pa.array(values)


def _to_table(ds) -> pa.Table:
    """Materialize a (small) Dataset to one Arrow table on the driver."""
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    if not batches:
        return None
    return pa.concat_tables(batches, promote_options="permissive")


class GBScalar:
    """0-D container; ``value is None`` = structurally empty
    (reference ``core/scalar.py:317``)."""

    __slots__ = ("value", "dtype")

    def __init__(self, value=None, dtype=None):
        self.value = value
        self.dtype = dtype

    @classmethod
    def from_value(cls, value, dtype=None):
        """Reference ``scalar.py:529``."""
        return cls(value, dtype)

    @property
    def is_empty(self):
        return self.value is None

    @property
    def nvals(self):
        return 0 if self.value is None else 1

    def __bool__(self):
        return bool(self.value) if self.value is not None else False

    def __eq__(self, other):
        if isinstance(other, GBScalar):
            other = other.value
        return self.value == other

    def isclose(self, other, rel_tol=1e-7, abs_tol=0.0):
        if isinstance(other, GBScalar):
            other = other.value
        if self.value is None or other is None:
            return self.value is None and other is None
        return abs(self.value - other) <= abs_tol + rel_tol * abs(other)

    # ---- 0-D operation surface (reference scalar.py:186-1003) ----
    # Scalars are driver-local plain values; these never touch Ray.

    def isequal(self, other, *, check_dtype=False):
        """Reference ``scalar.py:186``."""
        if not isinstance(other, GBScalar):
            other = GBScalar(other)
        if self.value is None or other.value is None:
            return self.value is None and other.value is None
        return bool(self.value == other.value)

    def clear(self):
        """Empty in place (reference ``scalar.py:304``); returns self."""
        self.value = None
        return self

    def dup(self, dtype=None, *, clear=False):
        """Reference ``scalar.py:434``."""
        return GBScalar(None if clear else self.value,
                        self.dtype if dtype is None else dtype)

    def wait(self, how="materialize"):
        """No-op — a scalar is always materialized (reference
        ``scalar.py:485``)."""
        return self

    def get(self, default=None):
        """Reference ``scalar.py:513``."""
        return default if self.value is None else self.value

    @property
    def is_cscalar(self):
        return True  # always a plain driver value here

    @property
    def is_grbscalar(self):
        return False

    @staticmethod
    def _coerce(x):
        return x if isinstance(x, GBScalar) else GBScalar(x)

    @staticmethod
    def _binop(op):
        return binary_from_string(op) if isinstance(op, str) else op

    def _apply1(self, fn, *vals):
        out = np.asarray(fn(*[np.asarray([v]) for v in vals]))[0]
        return out.item() if hasattr(out, "item") else out

    def ewise_add(self, other, op="plus"):
        """Union semantics on 0-D (reference ``scalar.py:630``): empty
        inputs pass the other side through."""
        other = self._coerce(other)
        op = self._binop(op)
        if self.value is None:
            return GBScalar(other.value, self.dtype)
        if other.value is None:
            return GBScalar(self.value, self.dtype)
        return GBScalar(self._apply1(op.fn, self.value, other.value))

    def ewise_mult(self, other, op="times"):
        """Intersection semantics on 0-D (reference ``scalar.py:700``):
        any empty input empties the result."""
        other = self._coerce(other)
        op = self._binop(op)
        if self.value is None or other.value is None:
            return GBScalar(None, self.dtype)
        return GBScalar(self._apply1(op.fn, self.value, other.value))

    def ewise_union(self, other, op, left_default, right_default):
        """Reference ``scalar.py:772``: empty sides take the defaults,
        both-empty stays empty."""
        other = self._coerce(other)
        op = self._binop(op)
        if self.value is None and other.value is None:
            return GBScalar(None, self.dtype)
        lv = left_default if self.value is None else self.value
        rv = right_default if other.value is None else other.value
        return GBScalar(self._apply1(op.fn, lv, rv))

    def apply(self, op, right=None, *, left=None):
        """Reference ``scalar.py:913``: unary, or binary with a bound
        left/right scalar."""
        if self.value is None:
            return GBScalar(None, self.dtype)
        if right is None and left is None:
            op = unary_from_string(op) if isinstance(op, str) else op
            return GBScalar(self._apply1(op.fn, self.value))
        if right is not None and left is not None:
            raise TypeError("Cannot provide both `left` and `right`")
        op = self._binop(op)
        if left is not None:
            return GBScalar(self._apply1(
                op.fn, self._coerce(left).value, self.value))
        return GBScalar(self._apply1(
            op.fn, self.value, self._coerce(right).value))

    def select(self, op, thunk=0):
        """Value predicate on the 0-D entry (reference
        ``scalar.py:964``); row/col indices are 0."""
        if self.value is None:
            return GBScalar(None, self.dtype)
        op = select_from_string(op)
        keep = np.asarray(op.fn(np.asarray([self.value]),
                                np.zeros(1, np.int64),
                                np.zeros(1, np.int64), thunk),
                          dtype=bool)[0]
        return GBScalar(self.value if keep else None, self.dtype)

    def __repr__(self):
        try:
            from .formatting import scalar_repr
            return scalar_repr(self)
        except Exception:  # terse fallback: repr must never raise
            return f"GBScalar({self.value!r})"


class _Base:
    """Shared masked-update protocol (the ``C(mask, accum, replace) << expr``
    idiom — reference ``core/base.py:200-263`` + ``core/expr.py:404``)."""

    def update(self, computed, mask=None, accum=None, replace=False,
               complement=False, mask_structure=True):
        """result = accum(old, computed) on masked positions; unmasked kept
        (dropped when ``replace``). Returns a NEW container."""
        keys = self._key_cols
        old = self.ds
        new = computed.ds
        if accum is not None:
            accum = binary_from_string(accum)
        if mask is None:
            # no mask: without accum the result is just `computed`;
            # with accum we merge old and new over the full key space
            if accum is None:
                return self._wrap(new)
            return self._wrap(_accum_outer(old, new, keys, accum))
        mask, complement, mask_structure = _resolve_mask(
            mask, complement, mask_structure)
        mset = mask._mask_keyset(structure=mask_structure)
        new = semi_join_filter(new, keys, mset, anti=complement)
        kept_old = (None if replace
                    else semi_join_filter(old, keys, mset, anti=not complement))
        if accum is None:
            masked_new = new
        else:
            masked_old = semi_join_filter(old, keys, mset, anti=complement)
            masked_new = _accum_outer(masked_old, new, keys, accum)
        if kept_old is None:
            return self._wrap(masked_new)
        return self._wrap(kept_old.union(masked_new))

    def __call__(self, *args, mask=None, accum=None, replace=False,
                 complement=False, mask_structure=True):
        """``C(mask, accum, replace) << expr`` sugar — reference
        ``core/base.py:200`` (``__call__`` → ``Updater``). Positional
        arguments are classified by type exactly the way the reference
        does (``base.py:210-236``): containers / ``_MaskView`` → mask,
        BinaryOp / string → accum, bool → replace."""
        from .functions.ops import BinaryOp
        for a in args:
            if isinstance(a, bool) or a is replace_singleton:
                replace = bool(a) if isinstance(a, bool) else True
            elif isinstance(a, (_MaskView, GBMatrix, GBVector)):
                if mask is not None:
                    raise TypeError("got multiple values for mask")
                mask = a
            elif isinstance(a, (BinaryOp, str)):
                if accum is not None:
                    raise TypeError("got multiple values for accum")
                accum = a
            else:
                raise TypeError(f"unexpected positional argument: {a!r}")
        return _Updater(self, mask, accum, replace, complement,
                        mask_structure)

    def __lshift__(self, expr):
        """``C << expr`` — whole-value in-place replacement (reference
        ``base.py:262`` ``update``). Containers here are immutable Dataset
        wrappers, so "in place" = rebind ``self.ds`` (same Python object,
        same shape; the Dataset itself is never mutated)."""
        self._rebind(expr)
        return self

    def _mask_keyset(self, structure=True):
        """Broadcast key set for use as a structural (``M.S``) or value
        (``M.V``) mask — reference ``core/mask.py:133,:151``."""
        ds = self.ds
        if not structure:
            def truthy(batch: pa.Table) -> pa.Table:
                return batch.filter(pa.array(np.asarray(
                    _np("val", batch), dtype=bool)))
            ds = ds.map_batches(truthy, batch_format="pyarrow")
        return broadcast_key_set(ds, self._key_cols)


class _Updater:
    """Pending masked update: ``C(mask, accum, replace) << expr``
    (reference ``core/expr.py:404`` ``Updater.__lshift__``)."""

    __slots__ = ("parent", "mask", "accum", "replace", "complement",
                 "mask_structure")

    def __init__(self, parent, mask, accum, replace, complement,
                 mask_structure):
        self.parent = parent
        self.mask = mask
        self.accum = accum
        self.replace = replace
        self.complement = complement
        self.mask_structure = mask_structure

    def __lshift__(self, expr):
        res = self.parent.update(
            expr, mask=self.mask, accum=self.accum, replace=self.replace,
            complement=self.complement, mask_structure=self.mask_structure)
        self.parent._rebind(res)
        return self.parent


def _accum_outer(old_ds, new_ds, keys, accum):
    """Full outer join old/new on keys; accum(old, new) where both, else the
    present side. Uses native join suffixing (no pre-rename: Ray skips
    0-row blocks in map_batches, so schemas must never depend on a UDF)."""
    keys = tuple(keys)
    joined = hash_join(old_ds, new_ds, on=keys, how="full_outer",
                       left_suffix="_l", right_suffix="_r")

    def combine(batch: pa.Table) -> pa.Table:
        lv = _np("val_l", batch)   # struct-aware (UDT ewise_mult)
        rv = _np("val_r", batch)
        l_null = np.asarray(batch["val_l"].is_null())
        r_null = np.asarray(batch["val_r"].is_null())
        both = ~l_null & ~r_null
        out = np.where(r_null, lv, rv)
        if both.any():
            out = out.copy()
            out[both] = accum.fn(lv[both], rv[both])
        cols = {c: batch[c] for c in keys}
        cols["val"] = _pa_val(out)
        return pa.table(cols)

    return joined.map_batches(combine, batch_format="pyarrow")


def _rename_arrow(ds, mapping):
    """Column rename as an Arrow map_batches (zero-copy metadata op).
    Ray's native ``rename_columns`` Project operator fails on pandas blocks
    emitted by ``map_groups``, so we normalize to Arrow while renaming."""

    def r(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(r, batch_format="pyarrow")


def _resolve_mask(mask, complement, structure):
    """Accept a container (GBMatrix/GBVector) or a ``_MaskView`` (``A.S`` /
    ``~A.V``) as the mask argument; a view's own flags win."""
    if isinstance(mask, _MaskView):
        return mask.parent, complement or mask.complement, mask.structure
    return mask, complement, structure


def _resolve_indices(sel, dim):
    """Normalize an extract/assign index selector (int | slice | list/array)
    to an int64 index array. Reference ``core/expr.py:100`` IndexerResolver /
    ``core/slice.py:20``."""
    if isinstance(sel, slice):
        return np.arange(*sel.indices(dim), dtype=np.int64)
    if np.isscalar(sel) or isinstance(sel, (int, np.integer)):
        i = int(sel)
        if i < 0:
            i += dim
        return np.array([i], dtype=np.int64)
    arr = np.asarray(sel, dtype=np.int64)
    arr = np.where(arr < 0, arr + dim, arr)
    return arr


def _expand_index_map(old_vals, sel):
    """For extract: each input index ``old_vals[r]`` maps to every output
    position p with ``sel[p] == old_vals[r]`` (handles repeats). Returns
    ``(row_take, new_positions)`` — fully vectorized."""
    order = np.argsort(sel, kind="stable")
    sorted_sel = sel[order]
    left = np.searchsorted(sorted_sel, old_vals, "left")
    right = np.searchsorted(sorted_sel, old_vals, "right")
    counts = right - left
    total = int(counts.sum())
    row_take = np.repeat(np.arange(len(old_vals)), counts)
    if total == 0:
        return row_take, np.array([], dtype=np.int64)
    csum = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=csum[1:])
    flat = np.repeat(left, counts) + (np.arange(total) - np.repeat(csum, counts))
    return row_take, order[flat]


class GBVector(_Base):
    """1-D sparse vector over a ``(vid, val)`` Dataset.
    Reference ``core/vector.py:141``."""

    _key_cols = ("vid",)
    ndim = 1  # reference vector.py:156

    def __init__(self, ds, size, dtype="float64"):
        if not hasattr(ds, "map_batches"):
            # reference ctor style: Vector(dtype, size) → EMPTY vector
            from .functions.dtypes import lookup_dtype
            dtype = lookup_dtype(ds).np_dtype
            ds = _empty_ds(dtype, vector=True)
        self.ds = ds
        self.size = int(size)
        from .functions.dtypes import DType
        self.dtype = (dtype.np_dtype if isinstance(dtype, DType)
                      else np.dtype(dtype))

    def _wrap(self, ds):
        return GBVector(ds, self.size, self.dtype)

    def _rebind(self, res):
        if not isinstance(res, GBVector):
            raise TypeError(f"cannot assign {type(res).__name__} to GBVector")
        if res.size != self.size:
            raise DimensionMismatch(f"{res.size} != {self.size}")
        self.ds = res.ds
        self.dtype = res.dtype

    def __matmul__(self, other):
        """``v @ A`` → vxm, ``v @ w`` → inner product, both over the
        default plus_times semiring (reference ``core/infix.py``)."""
        if isinstance(other, GBMatrix):
            return self.vxm(other)
        if isinstance(other, GBVector):
            return self.inner(other)
        return NotImplemented

    # ---- construction (reference vector.py:682,:740,:789,:849,:2051) ----
    @classmethod
    def from_coo(cls, indices, values=1.0, size=None, dup_op=None, dtype=None):
        indices = np.asarray(indices, dtype=np.int64)
        if np.isscalar(values) or np.ndim(values) == 0:
            values = np.full(len(indices), values)
        else:
            values = np.asarray(values)
        if dtype is not None:
            from .functions.dtypes import DType
            values = values.astype(dtype.np_dtype
                                   if isinstance(dtype, DType) else dtype)
        if size is None:
            size = int(indices.max()) + 1 if len(indices) else 0
        if len(indices) and len(np.unique(indices)) != len(indices):
            if dup_op is None:
                raise DuplicateIndexError("duplicate indices and dup_op=None")
            m = dup_op if isinstance(dup_op, Monoid) else _monoid_ns[
                binary_from_string(dup_op).name]
            (indices,), values = np_group_reduce((indices,), values, m)
        if len(indices) == 0:
            return cls(_empty_ds(values.dtype if hasattr(values, "dtype")
                                 else "float64", vector=True), size,
                       values.dtype if hasattr(values, "dtype") else "float64")
        t = pa.table({"vid": pa.array(indices), "val": _pa_val(values)})
        return cls(ray.data.from_arrow(t), size, values.dtype)

    @classmethod
    def from_pairs(cls, pairs, size=None, dup_op=None):
        arr = np.asarray(list(pairs))
        if arr.size == 0:
            return cls(_empty_ds(vector=True), size or 0)
        return cls.from_coo(arr[:, 0].astype(np.int64), arr[:, 1],
                            size=size, dup_op=dup_op)

    @classmethod
    def from_scalar(cls, value, size, dtype=None):
        return cls.from_dense(np.full(size, value, dtype=dtype))

    @classmethod
    def from_dense(cls, values, missing_value=None):
        values = np.asarray(values)
        full_size = len(values)
        idx = np.arange(full_size, dtype=np.int64)
        if missing_value is not None:
            keep = values != missing_value
            idx, values = idx[keep], values[keep]
        return cls.from_coo(idx, values, size=full_size)

    @classmethod
    def from_dict(cls, d, size=None):
        idx = np.fromiter(d.keys(), dtype=np.int64, count=len(d))
        vals = np.array(list(d.values()))
        return cls.from_coo(idx, vals, size=size)

    @classmethod
    def from_dataset(cls, ds, size, vid="vid", val="val", dtype="float64"):
        if vid != "vid" or val != "val":
            ds = _rename_arrow(ds, {vid: "vid", val: "val"})
        return cls(ds, size, dtype)

    # ---- exports (reference vector.py:465,:903,:2093) ----
    def to_table(self):
        t = _to_table(self.ds)
        if t is None:
            t = pa.table({"vid": pa.array([], pa.int64()),
                          "val": pa.array([], _arrow_val_type(self.dtype))})
        return t

    def to_coo(self, sort=True):
        t = self.to_table()
        idx = t["vid"].to_numpy(zero_copy_only=False)
        vals = _np("val", t)
        if sort:
            o = np.argsort(idx, kind="stable")
            idx, vals = idx[o], vals[o]
        return idx, vals

    def head(self, n=10, sort=False):
        """First n entries (reference ``Vector.ss.head``)."""
        ds = self.ds
        if sort:
            ds = ds.sort("vid")
        batches = (list(ds.limit(n).iter_batches(batch_format="pyarrow"))
                   if n else [])
        if batches:
            t = pa.concat_tables(batches, promote_options="permissive")
        else:
            t = pa.table({"vid": pa.array([], pa.int64()),
                          "val": pa.array([], _arrow_val_type(self.dtype))})
        return (t["vid"].to_numpy(zero_copy_only=False), _np("val", t))

    def to_numpy_pair(self):
        """(sorted ids, vals) for broadcast lookup in mxv/vxm kernels."""
        return self.to_coo(sort=True)

    def to_dense(self, fill_value=0, dtype=None):
        idx, vals = self.to_coo()
        out = np.full(self.size, fill_value,
                      dtype=dtype or np.result_type(vals.dtype if len(vals)
                                                    else self.dtype,
                                                    type(fill_value)))
        out[idx] = vals
        return out

    def to_dict(self):
        idx, vals = self.to_coo()
        return {int(i): v for i, v in zip(idx, vals.tolist())}

    @property
    def nvals(self):
        return self.ds.count()

    def dup(self, dtype=None):
        if dtype is None:
            return GBVector(self.ds, self.size, self.dtype)
        def cast(batch: pa.Table) -> pa.Table:
            return pa.table({"vid": batch["vid"],
                             "val": _np("val", batch).astype(dtype)})
        return GBVector(self.ds.map_batches(cast, batch_format="pyarrow"),
                        self.size, dtype)

    @property
    def shape(self):
        return (self.size,)

    def get(self, index, default=None):
        """Point lookup (reference ``vector.py:657``)."""
        s = self[index]
        return default if s.is_empty else s.value

    def build(self, indices, values=1.0, *, dup_op=None, clear=False,
              size=None):
        """Insert values into an existing EMPTY Vector, in place
        (reference ``vector.py:522``): non-empty without ``clear=True``
        raises :class:`OutputNotEmpty`; default ``dup_op`` is plus
        (reference ``vector.py:658``)."""
        if not clear and self.nvals != 0:
            raise OutputNotEmpty(
                "build into non-empty Vector without clear=True")
        if size is not None:
            self.size = int(size)
        indices = np.asarray(indices, dtype=np.int64)
        if len(indices) and (indices.min() < 0
                             or indices.max() >= self.size):
            raise IndexOutOfBound(
                f"index out of range for size {self.size}")
        new = GBVector.from_coo(
            indices, values, size=self.size,
            dup_op="plus" if dup_op is None else dup_op,
            dtype=self.dtype)
        self.ds = new.ds

    def clear(self):
        """Empty the vector in place (reference mutating ``clear``);
        also returns the (now empty) vector for chaining."""
        self.ds = _empty_ds(self.dtype, vector=True)
        return self

    def resize(self, size):
        if size >= self.size:
            return GBVector(self.ds, size, self.dtype)
        def filt(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(_np("vid", batch) < size))
        return GBVector(self.ds.map_batches(filt, batch_format="pyarrow"),
                        size, self.dtype)

    # ---- elementwise (reference vector.py:968,:1060,:1150) ----
    def ewise_add(self, other, op="plus"):
        return _ewise(self, other, binary_from_string(op), how="full_outer")

    def ewise_mult(self, other, op="times"):
        return _ewise(self, other, binary_from_string(op), how="inner")

    def ewise_union(self, other, op, left_default, right_default):
        return _ewise(self, other, binary_from_string(op), how="full_outer",
                      left_default=left_default, right_default=right_default)

    def __or__(self, other):
        return _EwiseInfix(self, other, "full_outer")

    def __and__(self, other):
        return _EwiseInfix(self, other, "inner")

    # ---- apply / select (reference vector.py:1536; matrix analogue) ----
    def apply(self, op, right=None, left=None, thunk=None):
        return _apply(self, op, right, left, thunk)

    def select(self, op, thunk=0):
        return _select(self, op, thunk)

    # ---- reductions (reference vector.py:1635,:1684,:1746) ----
    def reduce(self, op="plus", allow_empty=True):
        if isinstance(op, Aggregator):
            val = op.reduce_np(*_vals_and_ids(self))
            return GBScalar(val)
        m = _as_monoid(op)
        val = global_monoid_reduce(self.ds, "val", m)
        if val is None:
            return GBScalar(None if allow_empty else m.identity)
        return GBScalar(val)

    def inner(self, other, op=None):
        """Dot product (reference ``vector.py:1684``)."""
        from .functions.monoids import semiring as _sr
        op = op or _sr.plus_times
        prod = self.ewise_mult(other, op.binaryop)
        return prod.reduce(op.monoid, allow_empty=True)

    def outer(self, other, op="times"):
        """Outer product → Matrix (reference ``vector.py:1746``). The other
        side is broadcast — only valid when it fits in memory (guarded small
        in the reference too)."""
        op = binary_from_string(op)
        oidx, ovals = other.to_numpy_pair()
        ref = ray.put((oidx, ovals))

        def kern(batch: pa.Table) -> pa.Table:
            vi = _np("vid", batch)
            vv = _np("val", batch)
            oi, ov = ray.get(ref)
            n, m = len(vi), len(oi)
            src = np.repeat(vi, m)
            dst = np.tile(oi, n)
            vals = op.fn(np.repeat(vv, m), np.tile(ov, n))
            return pa.table({"src": src, "dst": dst, "val": vals})

        return GBMatrix(self.ds.map_batches(kern, batch_format="pyarrow"),
                        self.size, other.size, self.dtype)

    def vxm(self, B, op=None, mask=None, complement=False, mask_structure=True):
        """Row-vector × matrix (reference ``vector.py:1309``)."""
        from .functions.monoids import semiring as _sr
        op = op or _sr.plus_times
        if self.size != B.nrows:
            raise DimensionMismatch(f"{self.size} != {B.nrows}")
        out = _spmv(B.ds, self, op, lookup_col="src", group_col="dst",
                    out_size=B.ncols, mode="vxm")
        if mask is not None:
            out = _apply_vec_mask(out, mask, complement, mask_structure)
        return out

    def diag(self, k=0):
        """Vector → diagonal Matrix (reference ``vector.py:605``)."""
        def kern(batch: pa.Table) -> pa.Table:
            vi = _np("vid", batch)
            row = vi + (-k if k < 0 else 0)
            col = vi + (k if k > 0 else 0)
            return pa.table({"src": row, "dst": col, "val": batch["val"]})
        n = self.size + abs(k)
        return GBMatrix(self.ds.map_batches(kern, batch_format="pyarrow"),
                        n, n, self.dtype)

    def reposition(self, offset, size=None):
        """Reference ``vector.py:1789``."""
        size = size if size is not None else self.size

        def kern(batch: pa.Table) -> pa.Table:
            vi = _np("vid", batch) + offset
            keep = (vi >= 0) & (vi < size)
            return pa.table({"vid": vi[keep],
                             "val": _np("val", batch)[keep]})

        return GBVector(self.ds.map_batches(kern, batch_format="pyarrow"),
                        size, self.dtype)

    # ---- extract / assign ----
    def extract(self, sel):
        idx = _resolve_indices(sel, self.size)
        ref = ray.put(idx)

        def kern(batch: pa.Table) -> pa.Table:
            sel_arr = ray.get(ref)
            vi = _np("vid", batch)
            take, newpos = _expand_index_map(vi, sel_arr)
            return pa.table({"vid": newpos,
                             "val": _np("val", batch)[take]})

        return GBVector(self.ds.map_batches(kern, batch_format="pyarrow"),
                        len(idx), self.dtype)

    def __getitem__(self, sel):
        if np.isscalar(sel) or isinstance(sel, (int, np.integer)):
            v = self.extract(sel)
            t = v.to_table()
            return GBScalar(t["val"][0].as_py() if t.num_rows else None)
        return self.extract(sel)

    def __contains__(self, index):
        """``15 in v`` — entry present at index (reference
        ``vector.py:308``)."""
        if not isinstance(index, (int, np.integer)):
            raise TypeError(
                f"Invalid index to Vector contains: {index!r}.  "
                "An integer is expected.")
        return not self[int(index)].is_empty

    def __iter__(self):
        """Iterate over present indices (reference ``vector.py:328``).
        Materializes the index column — driver convenience, small
        vectors only."""
        indices, _ = self.to_coo(sort=True)
        return iter(indices.tolist())

    def __setitem__(self, sel, value):
        """``v[sel] = scalar | Vector`` — mutating assign sugar (reference
        ``vector.py`` ``__setitem__``); in-place Dataset rebind."""
        self._rebind(self.assign(sel, value))

    def delete_element(self, idx):
        """``del v[i]`` (reference ``vector.py`` ``__delitem__``)."""
        def filt(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(_np("vid", batch) != idx))
        return self._wrap(self.ds.map_batches(filt, batch_format="pyarrow"))

    def __delitem__(self, idx):
        """``del v[i]`` mutating sugar — in-place Dataset rebind."""
        self._rebind(self.delete_element(idx))

    def assign(self, sel, value, accum=None, mask=None, replace=False,
               complement=False, mask_structure=True, subassign=False):
        """v[sel] = value (vector or scalar); reference assign path.
        ``mask``/``replace``/``subassign`` follow the matrix assign
        semantics (v-shaped mask for assign, region-shaped for
        subassign)."""
        idx = _resolve_indices(sel, self.size)
        idx_ref = ray.put(np.sort(idx))

        def drop_region(batch: pa.Table) -> pa.Table:
            s = ray.get(idx_ref)
            vi = _np("vid", batch)
            pos = np.searchsorted(s, vi)
            pos_c = np.minimum(pos, len(s) - 1) if len(s) else pos
            inr = (s[pos_c] == vi) if len(s) else np.zeros(len(vi), bool)
            return batch.filter(pa.array(~inr))

        if isinstance(value, GBVector):
            ref = ray.put(idx)

            def remap(batch: pa.Table) -> pa.Table:
                m = ray.get(ref)
                p = _np("vid", batch)
                return pa.table({"vid": m[p], "val": batch["val"]})

            new_rows = value.ds.map_batches(remap, batch_format="pyarrow")
        else:
            new_rows = ray.data.from_arrow(pa.table({
                "vid": idx, "val": np.full(len(idx), value)}))
        keys = ("vid",)
        kept = self.ds.map_batches(drop_region, batch_format="pyarrow")
        old_region = semi_join_filter(
            self.ds, keys, ray.put(np.sort(idx.astype(np.int64))))
        if accum is not None:
            region_z = _accum_outer(old_region, new_rows, keys,
                                    binary_from_string(accum))
        else:
            region_z = new_rows
        if mask is None:
            return GBVector(kept.union(region_z), self.size, self.dtype)

        mparent, complement, mask_structure = _resolve_mask(
            mask, complement, mask_structure)
        m_ds = mparent.ds
        if not mask_structure:
            def truthy(batch: pa.Table) -> pa.Table:
                return batch.filter(pa.array(np.asarray(
                    _np("val", batch), dtype=bool)))
            m_ds = m_ds.map_batches(truthy, batch_format="pyarrow")
        if subassign:
            ref2 = ray.put(idx)

            def remap_mask(batch: pa.Table) -> pa.Table:
                m = ray.get(ref2)
                return pa.table({"vid": m[_np("vid", batch)],
                                 "val": batch["val"]})

            m_ds = m_ds.map_batches(remap_mask, batch_format="pyarrow")
        mset = broadcast_key_set(m_ds, keys)
        parts = [semi_join_filter(region_z, keys, mset, anti=complement)]
        if not replace:
            parts.append(semi_join_filter(old_region, keys, mset,
                                          anti=not complement))
        if not subassign and replace:
            kept = semi_join_filter(kept, keys, mset, anti=complement)
        parts.append(kept)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return GBVector(out, self.size, self.dtype)

    # ---- comparison (reference vector.py:340,:381; recipe :102) ----
    def isequal(self, other, check_dtype=False):
        return _isequal(self, other, exact=True)

    def isclose(self, other, rel_tol=1e-7, abs_tol=0.0):
        return _isequal(self, other, exact=False, rel_tol=rel_tol,
                        abs_tol=abs_tol)

    def wait(self):
        """Reference ``matrix.py:764`` — force completion."""
        self.ds = self.ds.materialize()
        return self

    def write_parquet(self, path, num_partitions=None):
        """Partitioned Parquet sink (checkpoint/export parity with the
        matrix container)."""
        ds = self.ds
        if num_partitions:
            ds = ds.repartition(num_partitions)
        ds.write_parquet(path)
        return path

    @classmethod
    def read_parquet(cls, path, size=None, dtype=None):
        """``dtype=None`` infers from the file's ``val`` column type
        (complex/UDT struct columns round-trip)."""
        import pyarrow.compute as pc_
        import ray.data

        ds = ray.data.read_parquet(path)
        if dtype is None:
            dtype = _infer_val_dtype(ds)
        if size is None:
            mx = -1
            for b in ds.select_columns(["vid"]).iter_batches(
                    batch_format="pyarrow", batch_size=1 << 20):
                if b.num_rows:
                    mx = max(mx, pc_.max(b["vid"]).as_py())
            size = mx + 1
        return cls(ds, size, dtype)

    def __repr__(self):
        try:
            from .formatting import vector_repr
            return vector_repr(self)
        except Exception:  # terse fallback: repr must never raise
            return f"GBVector(size={self.size}, dtype={self.dtype})"


class _EwiseInfix:
    """Delayed ``a | b`` / ``a & b`` awaiting the op — mirrors reference
    infix expressions (``core/infix.py:48-487``): ``op.min(f | gp)``."""

    def __init__(self, left, right, how):
        self.left, self.right, self.how = left, right, how

    def with_op(self, op):
        if self.how == "inner":
            return self.left.ewise_mult(self.right, op)
        return self.left.ewise_add(self.right, op)


def _as_monoid(op):
    if isinstance(op, Monoid):
        return op
    if isinstance(op, BinaryOp):
        return _monoid_ns[op.name]
    if isinstance(op, str):
        name = binary_from_string(op).name
        return _monoid_ns[name]
    raise TypeError(op)


def _vals_and_ids(vec):
    idx, vals = vec.to_coo(sort=True)
    return vals, idx


def _ewise(a, b, op, how, left_default=None, right_default=None):
    """Element-wise union/intersection via hash join (SURVEY §2.3:
    ewise_add = full outer join with pass-through; ewise_mult = inner)."""
    keys = a._key_cols
    if isinstance(a, GBVector):
        if a.size != b.size:
            raise DimensionMismatch(f"{a.size} != {b.size}")
    else:
        if (a.nrows, a.ncols) != (b.nrows, b.ncols):
            raise DimensionMismatch("shape mismatch")

    # UDT/complex values: Acero joins reject struct payload columns — pack
    # the struct to fixed-size binary through the join, unpack per batch
    udt_dtype = (a.dtype if (a.dtype.names is not None
                             or a.dtype.kind == "c") else None)
    a_ds, b_ds = a.ds, b.ds
    if udt_dtype is not None:
        from .functions.dtypes import pack_values, unpack_values

        def pack(batch: pa.Table) -> pa.Table:
            cols = {c: batch[c] for c in keys}
            cols["val"] = pack_values(_np("val", batch))
            return pa.table(cols)

        a_ds = a_ds.map_batches(pack, batch_format="pyarrow")
        b_ds = b_ds.map_batches(pack, batch_format="pyarrow")

    joined = hash_join(a_ds, b_ds, on=keys, how=how,
                       left_suffix="_l", right_suffix="_r")
    pos_op = op if getattr(op, "positional", None) else None
    ibo = op if getattr(op, "index_binary", None) else None

    def combine(batch: pa.Table) -> pa.Table:
        if udt_dtype is not None:
            lv = unpack_values(batch["val_l"], udt_dtype)
            rv = unpack_values(batch["val_r"], udt_dtype)
        else:
            lv = _np("val_l", batch)
            rv = _np("val_r", batch)
        l_null = np.asarray(batch["val_l"].is_null())
        r_null = np.asarray(batch["val_r"].is_null())

        def indices(sel=None):
            i = _np(keys[0], batch)
            j = (_np(keys[1], batch) if len(keys) > 1
                 else np.zeros(len(i), dtype=np.int64))
            return (i, j) if sel is None else (i[sel], j[sel])

        def op_vals(sel=None, lvals=None, rvals=None):
            """op over aligned entries (positional/index-binary: both
            operands share (i, j) — the join keys)."""
            lx = lv if lvals is None else lvals
            rx = rv if rvals is None else rvals
            if sel is not None:
                lx, rx = lx[sel], rx[sel]
            if pos_op is not None:
                i, j = indices(sel)
                return pos_op.index_values(i, j, i, j)
            if ibo is not None:
                i, j = indices(sel)
                return ibo.index_fn(lx, i, j, rx, i, j)
            return op.fn(lx, rx)

        if how == "inner":
            out = op_vals()
        elif left_default is not None or right_default is not None:
            # ewise_union (reference matrix.py:2043): fill missing side
            if pos_op is not None:
                out = op_vals()
            elif udt_dtype is not None:
                lf = lv.copy()
                lf[l_null] = left_default
                rf = rv.copy()
                rf[r_null] = right_default
                out = op_vals(lvals=lf, rvals=rf)
            else:
                lf = np.where(l_null, left_default, lv)
                rf = np.where(r_null, right_default, rv)
                out = op_vals(lvals=lf, rvals=rf)
        else:
            # ewise_add: op where both, pass-through where one
            both = ~l_null & ~r_null
            if udt_dtype is not None:
                out = lv.copy()
                out[l_null] = rv[l_null]
            else:
                out = np.where(l_null, rv, lv)
            if both.any():
                out = np.asarray(out)
                res = op_vals(both)
                if udt_dtype is None:
                    out = out.astype(np.result_type(
                        out.dtype, np.asarray(res).dtype))
                out[both] = res
        cols = {c: batch[c] for c in keys}
        cols["val"] = _pa_val(out)
        return pa.table(cols)

    out_ds = joined.map_batches(combine, batch_format="pyarrow")
    return a._wrap(out_ds)


def _apply(obj, op, right=None, left=None, thunk=None):
    """Stateless ``map_batches`` over the value column (reference
    ``matrix.py:2375``); index-unary ops also read the index columns."""
    from .functions.ops import indexunary, unary

    is_vec = isinstance(obj, GBVector)
    if isinstance(op, str):
        if right is not None or left is not None:
            op = binary_from_string(op)
        elif op in unary:
            op = unary[op]
        elif op in indexunary:
            op = indexunary[op]
        else:
            op = binary_from_string(op)
    elif (callable(op) and not hasattr(op, "fn")
          and not isinstance(op, (IndexUnaryOp, PositionalUnaryOp))):
        # raw callable (HPEC2022 `A.apply(lambda v: ...)` style): wrap as
        # an anonymous UnaryOp; the callable receives the numpy VALUE
        # ARRAY of each batch, so plain arithmetic / field access
        # (`v * 2`, `v["x"]` on UDT records) vectorizes as-is. A
        # NON-vectorizable scalar fn (per-element branching) falls back
        # to np.frompyfunc with a one-time perf warning — matching
        # reference register_new semantics for plain Python fns
        # (``core/operator/unary.py:331``).
        from .functions.ops import UnaryOp, _adaptive_fn
        op = UnaryOp(getattr(op, "__name__", "<lambda>"),
                     _adaptive_fn(op))

    def kern(batch: pa.Table) -> pa.Table:
        vals = _np("val", batch)
        if isinstance(op, (IndexUnaryOp, PositionalUnaryOp)):
            if is_vec:
                rows = _np("vid", batch)
                cols_ = np.zeros(len(rows), dtype=np.int64)
            else:
                rows = _np("src", batch)
                cols_ = _np("dst", batch)
            if isinstance(op, PositionalUnaryOp):
                # unary.positioni/j (reference positional unary family)
                out = op.index_values(rows, cols_)
            else:
                out = op.fn(vals, rows, cols_,
                            thunk if thunk is not None else 0)
        elif isinstance(op, BinaryOp):
            if right is not None:
                out = op.fn(vals, right)
            else:
                out = op.fn(np.broadcast_to(np.asarray(left), vals.shape)
                            if np.ndim(left) == 0 else left, vals)
        else:
            out = op.fn(vals)
        cols = {c: batch[c] for c in obj._key_cols}
        cols["val"] = _pa_val(out)
        return pa.table(cols)

    return obj._wrap(obj.ds.map_batches(kern, batch_format="pyarrow"))


def _select(obj, op, thunk=0):
    """Filter by positional/value predicate (reference ``matrix.py:2534``,
    ops ``core/operator/select.py:62``); mask-select = semi-join."""
    if isinstance(op, (GBMatrix, GBVector, _MaskView)):
        # A.select(B.S) — mask select (matrix.py:2579-2595)
        parent, comp, structure = _resolve_mask(op, False, True)
        mset = parent._mask_keyset(structure=structure)
        return obj._wrap(semi_join_filter(obj.ds, obj._key_cols, mset,
                                          anti=comp))
    op = select_from_string(op)  # str shorthand / select.* / IndexUnaryOp
    is_vec = isinstance(obj, GBVector)

    def kern(batch: pa.Table) -> pa.Table:
        vals = _np("val", batch)
        if is_vec:
            rows = _np("vid", batch)
            cols_ = np.zeros(len(rows), dtype=np.int64)
        else:
            rows = _np("src", batch)
            cols_ = _np("dst", batch)
        keep = np.asarray(op.fn(vals, rows, cols_, thunk), dtype=bool)
        return batch.filter(pa.array(keep))

    return obj._wrap(obj.ds.map_batches(kern, batch_format="pyarrow"))


def _spmv(mat_ds, vec, sr: Semiring, lookup_col, group_col, out_size,
          mode="mxv"):
    """The SpMV kernel: broadcast the vector once (``ray.put``), per-batch
    lookup + multiply + per-batch group-reduce (combiner), then one
    ``groupby(vid).aggregate(monoid)`` shuffle merging partials.

    ``mxv``: w[i] = ⊕_j A[i,j] ⊗ v[j] → lookup on ``dst``, group on ``src``.
    ``vxm``: w[j] = ⊕_i v[i] ⊗ A[i,j] → lookup on ``src``, group on ``dst``.

    Scale path: v is O(#vertices) — broadcast is the right call whenever the
    frontier fits a node (it is re-used zero-copy by every task); beyond
    that, co-partition v with the edge table on ``lookup_col`` ranges (the
    superstep engine in ``state/superstep.py`` does exactly this)."""
    ids, vals = vec.to_numpy_pair()
    ref = ray.put((ids, vals))
    mult = sr.binaryop.fn
    second = sr.binaryop.name == "second"
    first = sr.binaryop.name == "first"
    pair = sr.binaryop.name == "pair"
    pos_op = sr.binaryop if getattr(sr.binaryop, "positional",
                                    None) else None
    ibo = sr.binaryop if getattr(sr.binaryop, "index_binary",
                                 None) else None

    def kern(batch: pa.Table) -> pa.Table:
        look = _np(lookup_col, batch)
        grp = _np(group_col, batch)
        av = _np("val", batch)
        vids, vvals = ray.get(ref)
        if len(vids) == 0:
            return pa.table({"vid": np.array([], dtype=np.int64),
                             "val": _pa_val(np.array(
                                 [], dtype=np.result_type(av.dtype,
                                                          vvals.dtype)))})
        pos = np.searchsorted(vids, look)
        pos_c = np.minimum(pos, len(vids) - 1)
        hit = vids[pos_c] == look
        grp = grp[hit]
        if pos_op is not None or ibo is not None:
            lk = look[hit]
            zero = np.zeros(len(lk), dtype=np.int64)
            if mode == "mxv":  # A[i,k] ⊗ u[k]: first=(i,k), second=(k,0)
                prod = (pos_op.index_values(grp, lk, lk, zero)
                        if pos_op is not None
                        else ibo.index_fn(av[hit], grp, lk,
                                          vvals[pos_c[hit]], lk, zero))
            else:              # u[k] ⊗ A[k,j]: first=(k,0), second=(k,j)
                prod = (pos_op.index_values(lk, zero, lk, grp)
                        if pos_op is not None
                        else ibo.index_fn(vvals[pos_c[hit]], lk, zero,
                                          av[hit], lk, grp))
        elif second:
            prod = vvals[pos_c[hit]]
        elif first:
            prod = av[hit]
        elif pair:
            prod = np.ones(int(hit.sum()), dtype=np.int64)
        else:
            prod = mult(av[hit], vvals[pos_c[hit]])
        (k,), pv = np_group_reduce((grp,), prod, sr.monoid)
        return pa.table({"vid": pa.array(k), "val": _pa_val(pv)})

    partials = mat_ds.map_batches(kern, batch_format="pyarrow")
    out = groupby_monoid(partials, ["vid"], "val", sr.monoid,
                         pre_aggregate=False)
    return GBVector(out, out_size)


def _apply_vec_mask(vec, mask, complement, structure):
    mask, complement, structure = _resolve_mask(mask, complement, structure)
    mset = mask._mask_keyset(structure=structure)
    return vec._wrap(semi_join_filter(vec.ds, ("vid",), mset, anti=complement))


def _isequal(a, b, exact=True, rel_tol=1e-7, abs_tol=0.0):
    """Structure + value comparison via full outer join (reference
    ``matrix.py:373,:417``; recipe ``vector.py:102``). isclose:
    ``|a-b| <= abs_tol + rel_tol*|b|``."""
    if isinstance(a, GBVector):
        if a.size != b.size:
            return False
    else:
        if (a.nrows, a.ncols) != (b.nrows, b.ncols):
            return False
    keys = a._key_cols
    pack_dt = (a.dtype if (a.dtype.names is not None
                           or a.dtype.kind == "c") else None)
    a_ds, b_ds = a.ds, b.ds
    if pack_dt is not None:  # struct values can't ride an Acero join
        from .functions.dtypes import pack_values, unpack_values

        def pack(batch: pa.Table) -> pa.Table:
            cols = {c: batch[c] for c in keys}
            cols["val"] = pack_values(_np("val", batch))
            return pa.table(cols)

        a_ds = a_ds.map_batches(pack, batch_format="pyarrow")
        b_ds = b_ds.map_batches(pack, batch_format="pyarrow")
    joined = hash_join(a_ds, b_ds, on=keys, how="full_outer",
                       left_suffix="_l", right_suffix="_r")

    def check(batch: pa.Table) -> pa.Table:
        l_null = np.asarray(batch["val_l"].is_null())
        r_null = np.asarray(batch["val_r"].is_null())
        if (l_null | r_null).any():
            return pa.table({"ok": [False]})
        if pack_dt is not None:
            from .functions.dtypes import unpack_values

            lv = unpack_values(batch["val_l"], pack_dt)
            rv = unpack_values(batch["val_r"], pack_dt)
        else:
            lv = _np("val_l", batch)
            rv = _np("val_r", batch)
        if exact:
            ok = bool(np.all(lv == rv))
        else:
            ok = bool(np.all(np.abs(lv - rv) <= abs_tol + rel_tol * np.abs(rv)))
        return pa.table({"ok": [ok]})

    for batch in joined.map_batches(check, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        arr = batch["ok"].to_numpy(zero_copy_only=False)
        if len(arr) and not arr.all():
            return False
    return True


class GBMatrix(_Base):
    """2-D sparse matrix over a ``(src, dst, val)`` edge-table Dataset.
    Reference ``core/matrix.py:167``."""

    _key_cols = ("src", "dst")
    ndim = 2  # reference matrix.py:184

    def __init__(self, ds, nrows, ncols=None, dtype="float64"):
        if not hasattr(ds, "map_batches"):
            # reference ctor style: Matrix(dtype, nrows, ncols) → EMPTY
            # matrix of that dtype (matrix.py:167; incl. dict UDTs —
            # HPEC2022 `Matrix({"x": int, "y": float}, 5, 5)`)
            from .functions.dtypes import lookup_dtype
            dtype = lookup_dtype(ds).np_dtype
            ds = _empty_ds(dtype)
        if ncols is None:
            raise TypeError("GBMatrix requires nrows and ncols")
        self.ds = ds
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        from .functions.dtypes import DType
        self.dtype = (dtype.np_dtype if isinstance(dtype, DType)
                      else np.dtype(dtype))

    def _wrap(self, ds):
        return GBMatrix(ds, self.nrows, self.ncols, self.dtype)

    def _rebind(self, res):
        if not isinstance(res, GBMatrix):
            raise TypeError(f"cannot assign {type(res).__name__} to GBMatrix")
        if (res.nrows, res.ncols) != (self.nrows, self.ncols):
            raise DimensionMismatch(
                f"{res.shape} != {(self.nrows, self.ncols)}")
        self.ds = res.ds
        self.dtype = res.dtype

    def __matmul__(self, other):
        """``A @ B`` → mxm, ``A @ v`` → mxv, over the default plus_times
        semiring (reference ``core/infix.py``)."""
        if isinstance(other, GBMatrix):
            return self.mxm(other)
        if isinstance(other, GBVector):
            return self.mxv(other)
        return NotImplemented

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def nvals(self):
        return self.ds.count()

    # ---- construction (reference matrix.py:818,:897,:1337,:1398,:1519) ----
    @classmethod
    def from_coo(cls, rows, cols, values=1.0, nrows=None, ncols=None,
                 dup_op=None, dtype=None):
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        if np.isscalar(values) or np.ndim(values) == 0:
            values = np.full(len(rows), values)  # iso build (matrix.py:880)
        else:
            values = np.asarray(values)
        if dtype is not None:
            from .functions.dtypes import DType
            values = values.astype(dtype.np_dtype
                                   if isinstance(dtype, DType) else dtype)
        if nrows is None:
            nrows = int(rows.max()) + 1 if len(rows) else 0
        if ncols is None:
            ncols = int(cols.max()) + 1 if len(cols) else 0
        if len(rows):
            packed = (rows.astype(np.int64) << np.int64(32)) | cols \
                if ncols < (1 << 32) else None
            uniq = (len(np.unique(packed)) if packed is not None
                    else len(np.unique(np.stack([rows, cols]), axis=1)[0]))
            if uniq != len(rows):
                if dup_op is None:
                    raise DuplicateIndexError(
                        "duplicate (row, col) indices and dup_op=None "
                        "(reference matrix.py:850)")
                m = _as_monoid(dup_op)
                (rows, cols), values = np_group_reduce((rows, cols), values, m)
        if len(rows) == 0:
            return cls(_empty_ds(values.dtype if hasattr(values, "dtype")
                                 else "float64"), nrows, ncols)
        t = pa.table({"src": pa.array(rows), "dst": pa.array(cols),
                      "val": _pa_val(values)})
        return cls(ray.data.from_arrow(t), nrows, ncols, values.dtype)

    @classmethod
    def from_edgelist(cls, edgelist, values=1.0, nrows=None, ncols=None,
                      dup_op=None):
        arr = np.asarray(list(edgelist))
        if arr.size == 0:
            return cls(_empty_ds(), nrows or 0, ncols or 0)
        if arr.shape[1] == 3:
            return cls.from_coo(arr[:, 0].astype(np.int64),
                                arr[:, 1].astype(np.int64), arr[:, 2],
                                nrows=nrows, ncols=ncols, dup_op=dup_op)
        return cls.from_coo(arr[:, 0].astype(np.int64),
                            arr[:, 1].astype(np.int64), values,
                            nrows=nrows, ncols=ncols, dup_op=dup_op)

    @classmethod
    def from_csr(cls, indptr, col_indices, values=1.0, ncols=None):
        """Reference ``matrix.py:1071`` (``_from_csx :992``)."""
        indptr = np.asarray(indptr, dtype=np.int64)
        rows = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                         np.diff(indptr))
        return cls.from_coo(rows, col_indices, values,
                            nrows=len(indptr) - 1, ncols=ncols)

    @classmethod
    def from_csc(cls, indptr, row_indices, values=1.0, nrows=None):
        indptr = np.asarray(indptr, dtype=np.int64)
        cols = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                         np.diff(indptr))
        return cls.from_coo(row_indices, cols, values,
                            nrows=nrows, ncols=len(indptr) - 1)

    @classmethod
    def from_dcsr(cls, compressed_rows, indptr, col_indices, values=1.0,
                  nrows=None, ncols=None):
        """Hypersparse build (reference ``matrix.py:1167``)."""
        indptr = np.asarray(indptr, dtype=np.int64)
        rows = np.repeat(np.asarray(compressed_rows, dtype=np.int64),
                         np.diff(indptr))
        return cls.from_coo(rows, col_indices, values, nrows=nrows, ncols=ncols)

    @classmethod
    def from_dcsc(cls, compressed_cols, indptr, row_indices, values=1.0,
                  nrows=None, ncols=None):
        indptr = np.asarray(indptr, dtype=np.int64)
        cols = np.repeat(np.asarray(compressed_cols, dtype=np.int64),
                         np.diff(indptr))
        return cls.from_coo(row_indices, cols, values, nrows=nrows, ncols=ncols)

    @classmethod
    def from_scalar(cls, value, nrows, ncols):
        """Dense iso matrix (reference ``matrix.py:1337`` ``is_iso``). The
        reference stores one value + shape (O(1)); here the rows are
        GENERATED lazily from a range dataset — O(1) driver memory, blocks
        produced in parallel only when a downstream kernel consumes them
        (never a driver-side n×m materialization)."""
        total = int(nrows) * int(ncols)
        val_dtype = np.asarray(value).dtype
        if total == 0:
            return cls(_empty_ds(val_dtype), nrows, ncols, val_dtype)
        ds = ray.data.range(total)

        def expand(batch: pa.Table) -> pa.Table:
            i = batch["id"].to_numpy(zero_copy_only=False)
            return pa.table({"src": i // ncols, "dst": i % ncols,
                             "val": np.full(len(i), value)})

        return cls(ds.map_batches(expand, batch_format="pyarrow"),
                   nrows, ncols, val_dtype)

    @classmethod
    def from_dense(cls, values, missing_value=None):
        """Reference ``matrix.py:1398``."""
        values = np.asarray(values)
        nr, nc = values.shape
        rows, cols = np.nonzero(np.ones_like(values, dtype=bool))
        vals = values.ravel()
        if missing_value is not None:
            keep = vals != missing_value
            rows, cols, vals = rows[keep], cols[keep], vals[keep]
        return cls.from_coo(rows, cols, vals, nrows=nr, ncols=nc)

    @classmethod
    def from_dicts(cls, d, order="rowwise", nrows=None, ncols=None):
        """dict-of-dicts (reference ``matrix.py:1519``)."""
        rows, cols, vals = [], [], []
        for r, inner in d.items():
            for c, v in inner.items():
                rows.append(r)
                cols.append(c)
                vals.append(v)
        if order == "columnwise":
            rows, cols = cols, rows
        return cls.from_coo(np.array(rows, dtype=np.int64),
                            np.array(cols, dtype=np.int64),
                            np.array(vals), nrows=nrows, ncols=ncols)

    @classmethod
    def from_dataset(cls, ds, nrows, ncols, src="src", dst="dst", val="val",
                     default_value=1.0, dtype="float64"):
        """Adopt an existing edge-table Dataset (the 100 TB ingest path —
        no analogue in the reference, which starts at ``from_coo``)."""
        schema = ds.schema()
        if schema is None:
            # materialized-empty upstream (0-row blocks skip map_batches
            # UDFs, so the schema is unrecoverable) — an empty matrix
            return cls.from_coo(np.array([], dtype=np.int64),
                                np.array([], dtype=np.int64),
                                np.array([], dtype=np.float64),
                                nrows=nrows, ncols=ncols, dtype=dtype)
        cols = schema.names

        def norm(batch: pa.Table) -> pa.Table:
            out = {"src": batch[src].to_numpy(zero_copy_only=False).astype(np.int64),
                   "dst": batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)}
            if val in cols:
                out["val"] = batch[val]
            else:
                out["val"] = np.full(batch.num_rows, default_value)
            return pa.table(out)

        return cls(ds.map_batches(norm, batch_format="pyarrow"),
                   nrows, ncols, dtype)

    def dedup(self, dup_op="plus"):
        """Distributed duplicate-(src,dst) resolution — the Dataset-scale
        version of ``from_coo``'s ``dup_op`` (reference ``matrix.py:850``):
        per-batch combine then one groupby shuffle."""
        m = _as_monoid(dup_op)
        out = groupby_monoid(self.ds, ["src", "dst"], "val", m)
        return self._wrap(out)

    # ---- exports (reference matrix.py:525,:596,:1601-1754,:1461,:1801) ----
    def to_table(self):
        t = _to_table(self.ds)
        if t is None:
            t = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64()),
                          "val": pa.array([], _arrow_val_type(self.dtype))})
        return t

    def to_coo(self, sort=True):
        t = self.to_table()
        rows = t["src"].to_numpy(zero_copy_only=False)
        cols = t["dst"].to_numpy(zero_copy_only=False)
        vals = _np("val", t)
        if sort:  # row-major (reference matrix.py:525 sort=True)
            o = np.lexsort((cols, rows))
            rows, cols, vals = rows[o], cols[o], vals[o]
        return rows, cols, vals

    def to_edgelist(self):
        r, c, v = self.to_coo()
        return np.stack([r, c], axis=1), v

    def to_csr(self):
        r, c, v = self.to_coo(sort=True)
        indptr = np.zeros(self.nrows + 1, dtype=np.int64)
        np.add.at(indptr, r + 1, 1)
        np.cumsum(indptr, out=indptr)
        return indptr, c, v

    def to_csc(self):
        r, c, v = self.to_coo(sort=False)
        o = np.lexsort((r, c))
        r, c, v = r[o], c[o], v[o]
        indptr = np.zeros(self.ncols + 1, dtype=np.int64)
        np.add.at(indptr, c + 1, 1)
        np.cumsum(indptr, out=indptr)
        return indptr, r, v

    def to_dcsr(self):
        indptr, c, v = self.to_csr()
        nnz_rows = np.flatnonzero(np.diff(indptr))
        new_indptr = np.concatenate([[0], np.cumsum(np.diff(indptr)[nnz_rows])])
        return nnz_rows, new_indptr, c, v

    def to_dcsc(self):
        indptr, r, v = self.to_csc()
        nnz_cols = np.flatnonzero(np.diff(indptr))
        new_indptr = np.concatenate([[0], np.cumsum(np.diff(indptr)[nnz_cols])])
        return nnz_cols, new_indptr, r, v

    def to_dense(self, fill_value=0, dtype=None):
        r, c, v = self.to_coo()
        out = np.full((self.nrows, self.ncols), fill_value,
                      dtype=dtype or np.result_type(
                          v.dtype if len(v) else self.dtype, type(fill_value)))
        out[r, c] = v
        return out

    def to_dicts(self, order="rowwise"):
        r, c, v = self.to_coo()
        if order == "columnwise":
            r, c = c, r
        out = {}
        for i, j, x in zip(r.tolist(), c.tolist(), v.tolist()):
            out.setdefault(i, {})[j] = x
        return out

    def dup(self, dtype=None):
        if dtype is None:
            return GBMatrix(self.ds, self.nrows, self.ncols, self.dtype)

        def cast(batch: pa.Table) -> pa.Table:
            return pa.table({"src": batch["src"], "dst": batch["dst"],
                             "val": _pa_val(_np("val", batch).astype(dtype))})

        return GBMatrix(self.ds.map_batches(cast, batch_format="pyarrow"),
                        self.nrows, self.ncols, dtype)

    def build(self, rows, columns, values=1.0, *, dup_op=None,
              clear=False, nrows=None, ncols=None):
        """Insert values into an existing EMPTY Matrix, in place
        (reference ``matrix.py:627``): non-empty without ``clear=True``
        raises :class:`OutputNotEmpty`; default ``dup_op`` is plus."""
        if not clear and self.nvals != 0:
            raise OutputNotEmpty(
                "build into non-empty Matrix without clear=True")
        if nrows is not None:
            self.nrows = int(nrows)
        if ncols is not None:
            self.ncols = int(ncols)
        rows = np.asarray(rows, dtype=np.int64)
        columns = np.asarray(columns, dtype=np.int64)
        if len(rows) and (rows.min() < 0 or rows.max() >= self.nrows
                          or columns.min() < 0
                          or columns.max() >= self.ncols):
            raise IndexOutOfBound(
                f"index out of range for shape {self.shape}")
        new = GBMatrix.from_coo(
            rows, columns, values, nrows=self.nrows, ncols=self.ncols,
            dup_op="plus" if dup_op is None else dup_op,
            dtype=self.dtype)
        self.ds = new.ds

    def clear(self):
        """Empty the matrix in place (reference mutating ``clear``);
        also returns the (now empty) matrix for chaining."""
        self.ds = _empty_ds(self.dtype)
        return self

    def resize(self, nrows, ncols):
        if nrows >= self.nrows and ncols >= self.ncols:
            return GBMatrix(self.ds, nrows, ncols, self.dtype)

        def filt(batch: pa.Table) -> pa.Table:
            keep = (_np("src", batch) < nrows) & (_np("dst", batch) < ncols)
            return batch.filter(pa.array(keep))

        return GBMatrix(self.ds.map_batches(filt, batch_format="pyarrow"),
                        nrows, ncols, self.dtype)

    # ---- transpose (reference matrix.py:497,:3825) ----
    @property
    def T(self):
        def swap(batch: pa.Table) -> pa.Table:
            return pa.table({"src": batch["dst"], "dst": batch["src"],
                             "val": batch["val"]})
        return GBMatrix(self.ds.map_batches(swap, batch_format="pyarrow"),
                        self.ncols, self.nrows, self.dtype)

    # ---- core compute (SURVEY §2.3) ----
    def mxv(self, v, op=None, mask=None, complement=False, mask_structure=True):
        """w[i] = ⊕_j A[i,j] ⊗ v[j] (reference ``matrix.py:2203``)."""
        from .functions.monoids import semiring as _sr
        op = op or _sr.plus_times
        if self.ncols != v.size:
            raise DimensionMismatch(f"{self.ncols} != {v.size}")
        out = _spmv(self.ds, v, op, lookup_col="dst", group_col="src",
                    mode="mxv",
                    out_size=self.nrows)
        if mask is not None:
            out = _apply_vec_mask(out, mask, complement, mask_structure)
        return out

    def mxm(self, other, op=None, mask=None, complement=False,
            mask_structure=True, mask_mode="broadcast"):
        """C = A ⊕.⊗ B over a semiring (reference ``matrix.py:2264``).

        Edge-table join ``A.dst == B.src`` (hash-partitioned shuffle) →
        multiply → pre-aggregated ``groupby(i,j)`` with the monoid. A
        structural mask is pushed INTO the pipeline as a broadcast semi-join
        *before* aggregation — the masked-mxm fusion the reference gets from
        the C descriptor path (``base.py:468-503``); this is what keeps
        triangle counting from materializing Ω(n²) products."""
        from .functions.monoids import semiring as _sr
        op = op or _sr.plus_times
        if self.ncols != other.nrows:
            raise DimensionMismatch(f"{self.ncols} != {other.nrows}")

        # UDT/complex values can't ride an Acero join as struct columns —
        # pack to fixed-size binary through the shuffle (functions/dtypes)
        pack_l = (self.dtype if (self.dtype.names is not None
                                 or self.dtype.kind == "c") else None)
        pack_r = (other.dtype if (other.dtype.names is not None
                                  or other.dtype.kind == "c") else None)
        left_ds, right_ds = self.ds, other.ds
        if pack_l is not None or pack_r is not None:
            from .functions.dtypes import pack_values, unpack_values

            def _packer(keys):
                def pack(batch: pa.Table) -> pa.Table:
                    cols = {c: batch[c] for c in keys}
                    cols["val"] = pack_values(_np("val", batch))
                    return pa.table(cols)
                return pack

            if pack_l is not None:
                left_ds = left_ds.map_batches(_packer(("src", "dst")),
                                              batch_format="pyarrow")
            if pack_r is not None:
                right_ds = right_ds.map_batches(_packer(("src", "dst")),
                                                batch_format="pyarrow")

        # natural suffix join A.dst == B.src: output columns are
        # src (=i), dst_l (=k), val_l (=a), dst_r (=j), val_r (=b)
        joined = hash_join(left_ds, right_ds, on=("dst",), right_on=("src",),
                           how="inner", left_suffix="_l", right_suffix="_r")
        mult = op.binaryop.fn
        name = op.binaryop.name
        pos_op = op.binaryop if getattr(op.binaryop, "positional",
                                        None) else None
        ibo = op.binaryop if getattr(op.binaryop, "index_binary",
                                     None) else None

        def multiply(batch: pa.Table) -> pa.Table:
            if pack_l is not None or pack_r is not None:
                from .functions.dtypes import unpack_values
            av = (unpack_values(batch["val_l"], pack_l)
                  if pack_l is not None else _np("val_l", batch))
            bv = (unpack_values(batch["val_r"], pack_r)
                  if pack_r is not None else _np("val_r", batch))
            if pos_op is not None or ibo is not None:
                # A[i,k] ⊗ B[k,j]: first = A (i, k), second = B (k, j)
                i = _np("src", batch)
                k = _np("dst_l", batch)
                j = _np("dst_r", batch)
                val = (pos_op.index_values(i, k, k, j)
                       if pos_op is not None
                       else ibo.index_fn(av, i, k, bv, k, j))
            elif name == "pair":
                val = np.ones(len(av), dtype=np.int64)
            elif name == "first":
                val = av
            elif name == "second":
                val = bv
            else:
                val = mult(av, bv)
            return pa.table({"src": batch["src"], "dst": batch["dst_r"],
                             "val": _pa_val(val)})

        prod = joined.map_batches(multiply, batch_format="pyarrow")
        if mask is not None:
            mask, complement, mask_structure = _resolve_mask(
                mask, complement, mask_structure)
            if mask_mode == "shuffle":
                # scale path: mask key set too big to broadcast — apply
                # it as a hash-partitioned semi join instead
                from .stages.join import semi_join_shuffle

                mask_keys = mask.ds
                if not mask_structure:
                    def truthy(batch: pa.Table) -> pa.Table:
                        return batch.filter(pa.array(np.asarray(
                            _np("val", batch), dtype=bool)))
                    mask_keys = mask_keys.map_batches(
                        truthy, batch_format="pyarrow")
                prod = semi_join_shuffle(prod, ("src", "dst"),
                                         mask_keys, anti=complement)
            else:
                mset = mask._mask_keyset(structure=mask_structure)
                prod = semi_join_filter(prod, ("src", "dst"), mset,
                                        anti=complement)
        out = groupby_monoid(prod, ["src", "dst"], "val", op.monoid)
        return GBMatrix(out, self.nrows, other.ncols, self.dtype)

    def kronecker(self, other, op="times"):
        """Reference ``matrix.py:2333``. B is broadcast (small side)."""
        op = binary_from_string(op)
        br, bc, bv = other.to_coo(sort=False)
        ref = ray.put((br, bc, bv))
        nb_r, nb_c = other.nrows, other.ncols

        def kern(batch: pa.Table) -> pa.Table:
            ar = _np("src", batch)
            ac = _np("dst", batch)
            av = _np("val", batch)
            rb, cb, vb = ray.get(ref)
            n, m = len(ar), len(rb)
            src = np.repeat(ar, m) * nb_r + np.tile(rb, n)
            dst = np.repeat(ac, m) * nb_c + np.tile(cb, n)
            val = op.fn(np.repeat(av, m), np.tile(vb, n))
            return pa.table({"src": src, "dst": dst, "val": val})

        return GBMatrix(self.ds.map_batches(kern, batch_format="pyarrow"),
                        self.nrows * nb_r, self.ncols * nb_c, self.dtype)

    def power(self, n, op=None):
        """Repeated-squaring A^n (reference ``matrix.py:2840``, recipe
        ``:101-164``) — a driver loop of mxm supersteps."""
        from .functions.monoids import semiring as _sr
        op = op or _sr.plus_times
        if self.nrows != self.ncols:
            raise DimensionMismatch("power needs a square matrix")
        if n < 1:
            raise ValueError("n must be >= 1 (reference requires positive)")
        result = None
        base = self
        while n:
            if n & 1:
                result = base if result is None else result.mxm(base, op)
                if result is not base:
                    result.ds = result.ds.materialize()
            n >>= 1
            if n:
                base = base.mxm(base, op)
                base.ds = base.ds.materialize()
        return result

    # ---- elementwise ----
    def ewise_add(self, other, op="plus"):
        return _ewise(self, other, binary_from_string(op), how="full_outer")

    def ewise_mult(self, other, op="times"):
        return _ewise(self, other, binary_from_string(op), how="inner")

    def ewise_union(self, other, op, left_default, right_default):
        return _ewise(self, other, binary_from_string(op), how="full_outer",
                      left_default=left_default, right_default=right_default)

    def __or__(self, other):
        return _EwiseInfix(self, other, "full_outer")

    def __and__(self, other):
        return _EwiseInfix(self, other, "inner")

    # ---- apply / select ----
    def apply(self, op, right=None, left=None, thunk=None):
        return _apply(self, op, right, left, thunk)

    def select(self, op, thunk=0):
        return _select(self, op, thunk)

    # ---- reductions (reference matrix.py:2636,:2674,:2712) ----
    def reduce_rowwise(self, op="plus"):
        if isinstance(op, Aggregator):
            out = groupby_aggregator(self.ds, ["src"], "val", op,
                                     idx_col="dst")
            return GBVector(_rename_arrow(out, {"src": "vid"}), self.nrows)
        m = _as_monoid(op)
        out = groupby_monoid(self.ds, ["src"], "val", m)
        return GBVector(_rename_arrow(out, {"src": "vid"}), self.nrows)

    def reduce_columnwise(self, op="plus"):
        if isinstance(op, Aggregator):
            out = groupby_aggregator(self.ds, ["dst"], "val", op,
                                     idx_col="src")
            return GBVector(_rename_arrow(out, {"dst": "vid"}), self.ncols)
        m = _as_monoid(op)
        out = groupby_monoid(self.ds, ["dst"], "val", m)
        return GBVector(_rename_arrow(out, {"dst": "vid"}), self.ncols)

    def reduce_scalar(self, op="plus", allow_empty=True):
        m = _as_monoid(op)
        val = global_monoid_reduce(self.ds, "val", m)
        if val is None:
            return GBScalar(None if allow_empty else m.identity)
        return GBScalar(val)

    # ---- diag / reposition ----
    def diag(self, k=0):
        """Extract k-th diagonal → Vector (reference ``matrix.py:720``;
        GxB semantics: v[i] = A[i - min(0,k), i + max(0,k)])."""
        size = (min(self.nrows, self.ncols - k) if k >= 0
                else min(self.nrows + k, self.ncols))

        def kern(batch: pa.Table) -> pa.Table:
            r = _np("src", batch)
            c = _np("dst", batch)
            keep = (c - r) == k
            vid = r[keep] - (0 if k >= 0 else -k) if k < 0 else r[keep]
            return pa.table({"vid": vid, "val": _np("val", batch)[keep]})

        return GBVector(self.ds.map_batches(kern, batch_format="pyarrow"),
                        max(size, 0))

    def setdiag(self, v, k=0):
        """Assign diagonal from vector/scalar (reference ``matrix.py:2905``)."""
        if isinstance(v, GBVector):
            diag_mat = v.diag(k).resize(self.nrows, self.ncols)
        else:
            size = (min(self.nrows, self.ncols - k) if k >= 0
                    else min(self.nrows + k, self.ncols))
            diag_mat = GBVector.from_scalar(v, size).diag(k).resize(
                self.nrows, self.ncols)

        def drop_diag(batch: pa.Table) -> pa.Table:
            keep = (_np("dst", batch) - _np("src", batch)) != k
            return batch.filter(pa.array(keep))

        kept = self.ds.map_batches(drop_diag, batch_format="pyarrow")
        return self._wrap(kept.union(diag_mat.ds))

    def reposition(self, row_offset, col_offset, nrows=None, ncols=None):
        """Reference ``matrix.py:2764``."""
        nrows = nrows if nrows is not None else self.nrows
        ncols = ncols if ncols is not None else self.ncols

        def kern(batch: pa.Table) -> pa.Table:
            r = _np("src", batch) + row_offset
            c = _np("dst", batch) + col_offset
            keep = (r >= 0) & (r < nrows) & (c >= 0) & (c < ncols)
            return pa.table({"src": r[keep], "dst": c[keep],
                             "val": _np("val", batch)[keep]})

        return GBMatrix(self.ds.map_batches(kern, batch_format="pyarrow"),
                        nrows, ncols, self.dtype)

    # ---- extract / assign (reference matrix.py:305,:327,:3116) ----
    def extract(self, rows, cols):
        row_idx = _resolve_indices(rows, self.nrows)
        col_idx = _resolve_indices(cols, self.ncols)
        r_ref = ray.put(row_idx)
        c_ref = ray.put(col_idx)

        def kern(batch: pa.Table) -> pa.Table:
            rsel = ray.get(r_ref)
            csel = ray.get(c_ref)
            r = _np("src", batch)
            c = _np("dst", batch)
            v = _np("val", batch)
            take_r, new_r = _expand_index_map(r, rsel)
            c2, v2 = c[take_r], v[take_r]
            take_c, new_c = _expand_index_map(c2, csel)
            return pa.table({"src": new_r[take_c], "dst": new_c,
                             "val": _pa_val(v2[take_c])})

        return GBMatrix(self.ds.map_batches(kern, batch_format="pyarrow"),
                        len(row_idx), len(col_idx), self.dtype)

    def __contains__(self, index):
        """``(10, 15) in M`` — entry present at (row, col) (reference
        ``matrix.py:342``)."""
        if (not isinstance(index, tuple) or len(index) != 2
                or not all(isinstance(i, (int, np.integer))
                           for i in index)):
            raise TypeError(
                f"Invalid index to Matrix contains: {index!r}.  "
                "A 2-tuple of ints is expected.")
        return not self[int(index[0]), int(index[1])].is_empty

    def __iter__(self):
        """Iterate over present (row, col) indices (reference
        ``matrix.py:361``). Materializes the key columns — driver
        convenience, small matrices only."""
        rows, cols, _ = self.to_coo(sort=True)
        return zip(rows.tolist(), cols.tolist())

    def __setitem__(self, key, value):
        """``C[rows, cols] = scalar | Matrix`` — mutating assign sugar
        (reference ``matrix.py`` ``__setitem__`` / HPEC2022 notebook
        ``A[:, :] = v``, ``A[0, 0] = v``): runs :meth:`assign` and
        rebinds ``self.ds`` in place, like the ``C << expr`` protocol."""
        rows, cols = key
        self._rebind(self.assign(rows, cols, value))

    def __getitem__(self, key):
        rows, cols = key
        r_scalar = np.isscalar(rows) or isinstance(rows, (int, np.integer))
        c_scalar = np.isscalar(cols) or isinstance(cols, (int, np.integer))
        sub = self.extract(rows, cols)
        if r_scalar and c_scalar:
            t = sub.to_table()
            return GBScalar(t["val"][0].as_py() if t.num_rows else None)
        if r_scalar:
            return sub._row_vector()
        if c_scalar:
            return sub._col_vector()
        return sub

    def _row_vector(self):
        def kern(batch: pa.Table) -> pa.Table:
            return pa.table({"vid": batch["dst"], "val": batch["val"]})
        return GBVector(self.ds.map_batches(kern, batch_format="pyarrow"),
                        self.ncols, self.dtype)

    def _col_vector(self):
        def kern(batch: pa.Table) -> pa.Table:
            return pa.table({"vid": batch["src"], "val": batch["val"]})
        return GBVector(self.ds.map_batches(kern, batch_format="pyarrow"),
                        self.nrows, self.dtype)

    def get(self, row, col, default=None):
        """Point lookup (reference ``matrix.py:791``) — driver convenience."""
        s = self[row, col]
        return default if s.is_empty else s.value

    def assign(self, rows, cols, value, accum=None, mask=None,
               replace=False, complement=False, mask_structure=True,
               subassign=False):
        """C[rows, cols] = A | scalar (reference ``_prep_for_assign``
        ``matrix.py:3116``): anti-join out the target region ∪ remapped
        insert; scalar assign = upsert of constant rows.

        ``mask`` (GBMatrix or ``M.S``/``M.V`` view) + ``replace`` follow
        GraphBLAS assign semantics (reference ``matrix.py:3116``
        mask/submask handling):

        - **assign** (``subassign=False``, GrB_Matrix_assign): the mask is
          C-shaped and governs the WHOLE output — masked positions take
          the region update, unmasked positions keep C (deleted when
          ``replace=True``, including entries OUTSIDE the region).
        - **subassign** (``subassign=True``, GxB_subassign): the mask is
          REGION-shaped (``len(rows) × len(cols)``); masking and
          ``replace`` apply only inside the region, entries outside are
          always kept.

        Masks are broadcast key sets (``ray.put`` once, probed per batch);
        at scale swap ``semi_join_filter`` for ``semi_join_shuffle``.
        """
        row_idx = _resolve_indices(rows, self.nrows)
        col_idx = _resolve_indices(cols, self.ncols)
        rs_ref = ray.put(np.sort(row_idx))
        cs_ref = ray.put(np.sort(col_idx))

        def in_region(batch: pa.Table):
            rs = ray.get(rs_ref)
            cs = ray.get(cs_ref)
            r = _np("src", batch)
            c = _np("dst", batch)

            def member(sorted_a, x):
                if len(sorted_a) == 0:
                    return np.zeros(len(x), dtype=bool)
                p = np.minimum(np.searchsorted(sorted_a, x), len(sorted_a) - 1)
                return sorted_a[p] == x

            return member(rs, r) & member(cs, c)

        def drop_region(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(~in_region(batch)))

        def keep_region(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(in_region(batch)))

        if isinstance(value, GBMatrix):
            r_ref = ray.put(row_idx)
            c_ref = ray.put(col_idx)

            def remap(batch: pa.Table) -> pa.Table:
                rm = ray.get(r_ref)
                cm = ray.get(c_ref)
                return pa.table({"src": rm[_np("src", batch)],
                                 "dst": cm[_np("dst", batch)],
                                 "val": batch["val"]})

            new_rows = value.ds.map_batches(remap, batch_format="pyarrow")
        else:
            nr, nc = len(row_idx), len(col_idx)
            if self.dtype.names is not None:  # UDT scalar (tuple/dict)
                if isinstance(value, dict):
                    value = tuple(value[f] for f in self.dtype.names)
                vals = np.empty(nr * nc, dtype=self.dtype)
                vals[:] = np.array(tuple(value), dtype=self.dtype)[()]
            else:
                vals = np.full(nr * nc, value)
            new_rows = ray.data.from_arrow(pa.table({
                "src": np.repeat(row_idx, nc),
                "dst": np.tile(col_idx, nr),
                "val": _pa_val(vals)}))
        kept = self.ds.map_batches(drop_region, batch_format="pyarrow")
        keys = ("src", "dst")
        old_region = self.ds.map_batches(keep_region,
                                         batch_format="pyarrow")
        if accum is not None:
            region_z = _accum_outer(old_region, new_rows, keys,
                                    binary_from_string(accum))
        else:
            region_z = new_rows
        if mask is None:
            return self._wrap(kept.union(region_z))

        mparent, complement, mask_structure = _resolve_mask(
            mask, complement, mask_structure)
        m_ds = mparent.ds
        if not mask_structure:
            def truthy(batch: pa.Table) -> pa.Table:
                return batch.filter(pa.array(np.asarray(
                    _np("val", batch), dtype=bool)))
            m_ds = m_ds.map_batches(truthy, batch_format="pyarrow")
        if subassign:
            # region-shaped mask → C coordinates
            mr_ref = ray.put(row_idx)
            mc_ref = ray.put(col_idx)

            def remap_mask(batch: pa.Table) -> pa.Table:
                rm = ray.get(mr_ref)
                cm = ray.get(mc_ref)
                return pa.table({"src": rm[_np("src", batch)],
                                 "dst": cm[_np("dst", batch)],
                                 "val": batch["val"]})

            m_ds = m_ds.map_batches(remap_mask, batch_format="pyarrow")
        mset = broadcast_key_set(m_ds, keys)

        parts = [semi_join_filter(region_z, keys, mset, anti=complement)]
        if not replace:  # unmasked region positions keep old C
            parts.append(semi_join_filter(old_region, keys, mset,
                                          anti=not complement))
        if not subassign and replace:
            # GrB_assign + replace: unmasked entries OUTSIDE the region
            # are deleted too
            kept = semi_join_filter(kept, keys, mset, anti=complement)
        parts.append(kept)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return self._wrap(out)

    def delete_element(self, row, col):
        """``del A[i, j]`` (reference ``matrix.py:3529``)."""
        def filt(batch: pa.Table) -> pa.Table:
            keep = ~((_np("src", batch) == row) & (_np("dst", batch) == col))
            return batch.filter(pa.array(keep))
        return self._wrap(self.ds.map_batches(filt, batch_format="pyarrow"))

    def __delitem__(self, key):
        """``del A[i, j]`` mutating sugar — in-place Dataset rebind."""
        row, col = key
        self._rebind(self.delete_element(row, col))

    # ---- comparison ----
    def isequal(self, other, check_dtype=False):
        return _isequal(self, other, exact=True)

    def isclose(self, other, rel_tol=1e-7, abs_tol=0.0):
        return _isequal(self, other, exact=False, rel_tol=rel_tol,
                        abs_tol=abs_tol)

    def wait(self):
        self.ds = self.ds.materialize()
        return self

    # ---- parquet sink/source (the Dataset-scale serialize/deserialize;
    #      reference core/ss/matrix.py:4050,:4120) ----
    def write_parquet(self, path, num_partitions=None):
        """Partitioned Parquet sink (resumable output — one file per
        block, never one giant file)."""
        ds = self.ds
        if num_partitions:
            ds = ds.repartition(num_partitions)
        ds.write_parquet(path)
        return path

    @classmethod
    def read_parquet(cls, path, nrows=None, ncols=None, dtype=None):
        """``dtype=None`` infers from the file's ``val`` column type
        (complex/UDT struct columns round-trip)."""
        import ray.data

        ds = ray.data.read_parquet(path)
        if dtype is None:
            dtype = _infer_val_dtype(ds)
        if nrows is None or ncols is None:
            import pyarrow.compute as pc_
            mx_r = mx_c = -1
            for b in ds.select_columns(["src", "dst"]).iter_batches(
                    batch_format="pyarrow", batch_size=1 << 20):
                if b.num_rows:
                    mx_r = max(mx_r, pc_.max(b["src"]).as_py())
                    mx_c = max(mx_c, pc_.max(b["dst"]).as_py())
            nrows = nrows if nrows is not None else mx_r + 1
            ncols = ncols if ncols is not None else mx_c + 1
        return cls(ds, nrows, ncols, dtype)

    # ---- streaming access (reference core/ss/matrix.py:3686,:428) ----
    def head(self, n=10, sort=False):
        """First n entries (reference ``ss.head``)."""
        ds = self.ds
        if sort:
            ds = ds.sort(["src", "dst"])
        batches = (list(ds.limit(n).iter_batches(batch_format="pyarrow"))
                   if n else [])
        if batches:
            t = pa.concat_tables(batches, promote_options="permissive")
        else:  # n == 0, or an empty matrix yields zero batches
            t = pa.table({
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "val": pa.array([], _arrow_val_type(self.dtype)),
            })
        return (t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False),
                _np("val", t))

    def iteritems(self, batch_size=1 << 16):
        """Stream ((row, col), value) without materializing (reference
        ``ss.iteritems`` ``core/ss/matrix.py:499``)."""
        for b in self.ds.iter_batches(batch_format="pyarrow",
                                      batch_size=batch_size):
            r = b["src"].to_numpy(zero_copy_only=False)
            c = b["dst"].to_numpy(zero_copy_only=False)
            v = b["val"].to_numpy(zero_copy_only=False)
            for i in range(len(r)):
                yield (int(r[i]), int(c[i])), v[i]

    def iterkeys(self, batch_size=1 << 16):
        for k, _ in self.iteritems(batch_size):
            yield k

    def itervalues(self, batch_size=1 << 16):
        for _, v in self.iteritems(batch_size):
            yield v

    # ---- masks: A.S / A.V views (reference matrix.py:286,:291) ----
    @property
    def S(self):
        return _MaskView(self, structure=True)

    @property
    def V(self):
        return _MaskView(self, structure=False)

    def __repr__(self):
        try:
            from .formatting import matrix_repr
            return matrix_repr(self)
        except Exception:  # terse fallback: repr must never raise
            return f"GBMatrix({self.nrows}x{self.ncols}, " \
                   f"dtype={self.dtype})"


class _MaskView:
    """Structural/value mask view (reference ``core/mask.py:9``); ``~`` for
    complement; ``&`` / ``|`` / ``new`` compose masks (reference
    ``core/mask.py:36,:85,:111``).

    Composition is computed SPARSELY over applied-position sets:
    ``A & B`` = semi-join, ``A & ~B`` = anti-join, ``~A & ~B`` =
    ``~(A | B)`` (stays lazy-complemented), ``~A | B`` = ``~(A & ~B)``,
    ``~A | ~B`` = ``~(A & B)`` — so a complement never materializes the
    dense position set (the reference materializes it; at 10^12 vertices
    that is not an option)."""

    def __init__(self, parent, structure=True, complement=False):
        self.parent = parent
        self.structure = structure
        self.complement = complement

    def __repr__(self):
        try:
            from .formatting import mask_repr
            return mask_repr(self)
        except Exception:  # terse fallback: repr must never raise
            kind = ("StructuralMask" if self.structure else "ValueMask")
            return f"{'~' if self.complement else ''}{kind}"

    def __invert__(self):
        return _MaskView(self.parent, self.structure, not self.complement)

    def keyset(self):
        return self.parent._mask_keyset(structure=self.structure)

    # ---- composition (reference core/mask.py:36 __and__, :85 __or__) ----
    def _positions(self):
        """Dataset of (keys..., val=True) where this non-complemented view
        applies (truthy entries for value masks, all entries for
        structural)."""
        p = self.parent
        ds = p.ds
        keys = p._key_cols

        structure = self.structure

        def to_bool(batch: pa.Table) -> pa.Table:
            if not structure:
                batch = batch.filter(pa.array(np.asarray(
                    _np("val", batch), dtype=bool)))
            cols = {c: batch[c] for c in keys}
            cols["val"] = pa.array(np.ones(batch.num_rows, dtype=bool))
            return pa.table(cols)

        return ds.map_batches(to_bool, batch_format="pyarrow")

    def _bool_container(self, ds):
        p = self.parent
        if isinstance(p, GBVector):
            return GBVector(ds, p.size, "bool")
        return GBMatrix(ds, p.nrows, p.ncols, "bool")

    def _check_shape(self, other):
        a, b = self.parent, other.parent

        def shp(x):
            return (x.size,) if isinstance(x, GBVector) else x.shape

        if shp(a) != shp(b):
            raise DimensionMismatch("mask shapes differ")

    def __and__(self, other):
        if not isinstance(other, _MaskView):
            return NotImplemented
        self._check_shape(other)
        if self.complement and other.complement:
            # ~A & ~B = ~(A | B)
            return ~((~self) | (~other))
        if self.complement:
            return other.__and__(self)
        if other.complement:  # A & ~B: anti semi-join
            pos = semi_join_filter(self._positions(), self.parent._key_cols,
                                   (~other).keyset(), anti=True)
        else:                 # A & B: semi-join
            pos = semi_join_filter(self._positions(), self.parent._key_cols,
                                   other.keyset(), anti=False)
        return _MaskView(self._bool_container(pos), structure=True)

    __rand__ = __and__

    def __or__(self, other):
        if not isinstance(other, _MaskView):
            return NotImplemented
        self._check_shape(other)
        if self.complement and other.complement:
            # ~A | ~B = ~(A & B)
            return ~((~self) & (~other))
        if self.complement:   # ~A | B = ~(A & ~B)
            return ~((~self) & (~other))
        if other.complement:
            return other.__or__(self)
        both = self._positions().union(other._positions())
        deduped = groupby_monoid(both, list(self.parent._key_cols), "val",
                                 _monoid_ns["lor"])
        return _MaskView(self._bool_container(deduped), structure=True)

    __ror__ = __or__

    def new(self, complement=False):
        """Materialize the mask as a bool container (reference
        ``mask.py:36``): True wherever the mask would apply; with
        ``complement=True`` (or on an already-complemented view) True
        wherever it would NOT. The complement is inherently DENSE —
        O(shape) entries — so it is shape-bounded by
        ``config["complement_materialize_limit"]``; above the bound it
        raises (keep passing the lazy ``~mask`` to ops instead, which
        stays sparse at any scale)."""
        effective = self.complement ^ bool(complement)
        if not effective:
            return self._bool_container(self._positions())
        import ray.data as _rd

        from ._config import config as _cfg

        p = self.parent
        keys = p._key_cols
        if isinstance(p, GBVector):
            shape_n = p.size
        else:
            shape_n = p.nrows * p.ncols
        limit = _cfg["complement_materialize_limit"]
        if shape_n > limit:
            raise NotImplementedError(
                f"materializing a complemented mask is dense: shape has "
                f"{shape_n} entries > "
                f"config['complement_materialize_limit']={limit}; pass "
                "the lazy ~mask to the op instead")
        base = _MaskView(p, self.structure, complement=False)
        if isinstance(p, GBVector):
            kname = keys[0]

            def to_pos(batch: pa.Table) -> pa.Table:
                ids = batch["id"].to_numpy(zero_copy_only=False)
                return pa.table({
                    kname: ids.astype(np.int64),
                    "val": np.ones(len(ids), dtype=bool)})
        else:
            ncols = p.ncols

            def to_pos(batch: pa.Table) -> pa.Table:
                ids = batch["id"].to_numpy(zero_copy_only=False)
                return pa.table({
                    keys[0]: (ids // ncols).astype(np.int64),
                    keys[1]: (ids % ncols).astype(np.int64),
                    "val": np.ones(len(ids), dtype=bool)})

        full = _rd.range(shape_n).map_batches(to_pos,
                                              batch_format="pyarrow")
        pos = semi_join_filter(full, keys, base.keyset(), anti=True)
        return self._bool_container(pos)


# Vector also gets S/V mask views
GBVector.S = property(lambda self: _MaskView(self, structure=True))
GBVector.V = property(lambda self: _MaskView(self, structure=False))


def _ds_iso_value(ds):
    """The single stored value when every entry is identical (ONE
    streaming per-block (min, max) fold), else None. Empty → None."""
    import pyarrow.compute as pc

    lo = hi = None
    for b in ds.map_batches(
            lambda t: pa.table({"lo": [None] if t.num_rows == 0
                                else [pc.min(t["val"]).as_py()],
                                "hi": [None] if t.num_rows == 0
                                else [pc.max(t["val"]).as_py()]}),
            batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
        for blo, bhi in zip(b["lo"].to_pylist(), b["hi"].to_pylist()):
            if blo is None:
                continue
            lo = blo if lo is None else min(lo, blo)
            hi = bhi if hi is None else max(hi, bhi)
    if lo is None or lo != hi:
        return None
    return lo


def _ds_is_iso(ds):
    return _ds_iso_value(ds) is not None


class _MatrixSS:
    """``A.ss`` — per-matrix extension-method accessor (the reference's
    SuiteSparse ``Matrix.ss``, ``core/ss/matrix.py``): binds the
    per-row kernels from ``stages/perrow`` plus the streaming/serialize
    extras to this matrix. Module-level forms live at ``gb.ss``."""

    def __init__(self, A):
        self._A = A

    def scan(self, op="plus", order="rowwise"):
        from .stages.perrow import row_scan
        return row_scan(self._A, op, order)

    def selectk(self, how, k, seed=0):
        from .stages.perrow import row_selectk
        return row_selectk(self._A, how, k, seed=seed)

    def compactify(self, how="first", k=None, seed=0, reverse=False,
                   asindex=False):
        from .stages.perrow import row_compactify
        return row_compactify(self._A, how, k, seed=seed,
                              reverse=reverse, asindex=asindex)

    def sort(self, ascending=True):
        from .stages.perrow import row_sort
        return row_sort(self._A, ascending)

    def split(self, row_chunks, col_chunks):
        from .stages.perrow import split
        return split(self._A, row_chunks, col_chunks)

    def flatten(self, order="rowwise"):
        from .stages.perrow import flatten
        return flatten(self._A, order)

    def reshape(self, nrows, ncols, order="rowwise"):
        from .stages.perrow import reshape
        return reshape(self._A, nrows, ncols, order)

    def head(self, n=10, sort=False):
        return self._A.head(n, sort)

    @property
    def is_iso(self):
        """Reference ``ss.is_iso`` (``core/ss/matrix.py``): True when
        every stored value is identical — ONE streaming (min, max) fold
        over the value column, no materialization."""
        return _ds_is_iso(self._A.ds)

    @property
    def iso_value(self):
        """Reference ``ss.iso_value``: the single stored value (raises
        when not iso — same contract as the reference)."""
        v = _ds_iso_value(self._A.ds)
        if v is None:
            raise ValueError("Matrix is not iso-valued")
        return GBScalar.from_value(v)

    @property
    def format(self):
        """Storage description (the reference reports the SuiteSparse
        layout; here the storage is always a distributed COO Arrow
        Dataset)."""
        return "coo-dataset"

    @property
    def nbytes(self):
        """Approximate pinned bytes of the backing Dataset (Arrow block
        sizes — the reference reports the GxB memory footprint)."""
        return int(self._A.ds.size_bytes() or 0)

    def serialize(self, path, num_partitions=None):
        """Reference ``ss.serialize`` analogue: the partitioned Parquet
        container sink (resume with ``GBMatrix.read_parquet``)."""
        return self._A.write_parquet(path, num_partitions)

    def export(self, format=None, sort=True):
        """Explicit physical-format export (reference ``ss.export``,
        ``core/ss/matrix.py:525-741`` ``raw=False`` shapes): returns a
        plain dict with a ``format`` key and the format's arrays —
        csr / csc / hypercsr / hypercsc / bitmapr / bitmapc / fullr /
        fullc / coor / cooc / coo. ``format=None`` picks ``fullr`` when
        every cell is present, else ``csr`` (the reference exports its
        current internal layout; this engine's storage is always the
        COO dataset, so the default is the canonical sparse form).

        Driver-memory interchange surface — like ``to_csr``/``to_dense``
        it materializes to numpy; at engine scale use the Parquet
        container (``serialize``) instead."""
        A = self._A
        nr, nc = A.nrows, A.ncols
        if format is None:
            format = "fullr" if A.nvals == nr * nc else "csr"
        f = format.lower()
        out = {"format": f, "nrows": nr, "ncols": nc}
        if f in ("fullr", "fullc"):
            if A.nvals != nr * nc:
                raise ValueError(
                    f"export format {f!r} requires a FULL matrix "
                    f"({A.nvals} of {nr * nc} cells present)")
            dense = A.to_dense()
            out["values"] = (np.ascontiguousarray(dense) if f == "fullr"
                             else np.asfortranarray(dense))
            return out
        if f in ("bitmapr", "bitmapc"):
            r, c, v = A.to_coo(sort=False)
            bitmap = np.zeros((nr, nc), dtype=bool)
            vals = np.zeros((nr, nc),
                            dtype=v.dtype if len(v) else np.float64)
            bitmap[r, c] = True
            vals[r, c] = v
            conv = (np.ascontiguousarray if f == "bitmapr"
                    else np.asfortranarray)
            out["bitmap"] = conv(bitmap)
            out["values"] = conv(vals)
            out["nvals"] = int(len(r))
            return out
        if f == "csr":
            indptr, col_indices, values = A.to_csr()
            out.update(indptr=indptr, col_indices=col_indices,
                       values=values, sorted_cols=bool(sort))
            return out
        if f == "csc":
            indptr, row_indices, values = A.to_csc()
            out.update(indptr=indptr, row_indices=row_indices,
                       values=values, sorted_rows=bool(sort))
            return out
        if f == "hypercsr":
            rows, indptr, col_indices, values = A.to_dcsr()
            out.update(rows=rows, indptr=indptr,
                       col_indices=col_indices, values=values,
                       sorted_cols=bool(sort))
            return out
        if f == "hypercsc":
            cols, indptr, row_indices, values = A.to_dcsc()
            out.update(cols=cols, indptr=indptr,
                       row_indices=row_indices, values=values,
                       sorted_rows=bool(sort))
            return out
        if f in ("coo", "coor", "cooc"):
            r, c, v = A.to_coo(sort=sort)
            if f == "cooc":
                o = np.lexsort((r, c))
                r, c, v = r[o], c[o], v[o]
            out.update(rows=r, cols=c, values=v,
                       sorted_rows=f != "cooc", sorted_cols=f == "cooc")
            return out
        raise ValueError(f"unknown export format {format!r}")


def matrix_import_any(**d):
    """Rebuild a GBMatrix from an ``ss.export``-shaped dict (reference
    ``ss.import_any`` — ``core/ss/matrix.py:1987,:2371,:2686`` family).
    Dispatches on ``format``; per-format wrappers live in ``gb.ss``."""
    f = d["format"].lower()
    nr, nc = d.get("nrows"), d.get("ncols")
    if f in ("fullr", "fullc"):
        return GBMatrix.from_dense(np.ascontiguousarray(d["values"]))
    if f in ("bitmapr", "bitmapc"):
        bitmap = np.asarray(d["bitmap"], dtype=bool)
        vals = np.asarray(d["values"])
        r, c = np.nonzero(bitmap)
        return GBMatrix.from_coo(r, c, vals[r, c],
                                 nrows=nr or bitmap.shape[0],
                                 ncols=nc or bitmap.shape[1])
    if f == "csr":
        return GBMatrix.from_csr(d["indptr"], d["col_indices"],
                                 d["values"], ncols=nc)
    if f == "csc":
        indptr = np.asarray(d["indptr"], dtype=np.int64)
        rows = np.asarray(d["row_indices"], dtype=np.int64)
        cols = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                         np.diff(indptr))
        return GBMatrix.from_coo(rows, cols, d["values"],
                                 nrows=nr, ncols=len(indptr) - 1)
    if f == "hypercsr":
        return GBMatrix.from_dcsr(d["rows"], d["indptr"],
                                  d["col_indices"], d["values"],
                                  nrows=nr, ncols=nc)
    if f == "hypercsc":
        cols_p = np.asarray(d["cols"], dtype=np.int64)
        indptr = np.asarray(d["indptr"], dtype=np.int64)
        rows = np.asarray(d["row_indices"], dtype=np.int64)
        cols = np.repeat(cols_p, np.diff(indptr))
        return GBMatrix.from_coo(rows, cols, d["values"],
                                 nrows=nr, ncols=nc)
    if f in ("coo", "coor", "cooc"):
        return GBMatrix.from_coo(d["rows"], d["cols"], d["values"],
                                 nrows=nr, ncols=nc)
    raise ValueError(f"unknown import format {d['format']!r}")


GBMatrix.ss = property(_MatrixSS)


class _VectorSS:
    """``v.ss`` — per-vector extension accessor (reference
    ``Vector.ss``): the distributed two-pass prefix scan plus the
    container serialize."""

    def __init__(self, v):
        self._v = v

    def scan(self, op="plus"):
        from .stages.perrow import vector_scan
        return vector_scan(self._v, op)

    def selectk(self, how, k, seed=0):
        from .stages.perrow import vector_selectk
        return vector_selectk(self._v, how, k, seed=seed)

    def compactify(self, how="first", k=None, seed=0, reverse=False,
                   asindex=False):
        from .stages.perrow import vector_compactify
        return vector_compactify(self._v, how, k, seed=seed,
                                 reverse=reverse, asindex=asindex)

    def sort(self, ascending=True, values=True, permutation=True):
        from .stages.perrow import vector_sort
        return vector_sort(self._v, ascending, values, permutation)

    def split(self, chunks):
        from .stages.perrow import vector_split
        return vector_split(self._v, chunks)

    def head(self, n=10, sort=False):
        return self._v.head(n, sort)

    @property
    def is_iso(self):
        return _ds_is_iso(self._v.ds)

    @property
    def iso_value(self):
        v = _ds_iso_value(self._v.ds)
        if v is None:
            raise ValueError("Vector is not iso-valued")
        return GBScalar.from_value(v)

    @property
    def format(self):
        return "coo-dataset"

    @property
    def nbytes(self):
        return int(self._v.ds.size_bytes() or 0)

    def serialize(self, path, num_partitions=None):
        ds = self._v.ds
        if num_partitions:
            ds = ds.repartition(num_partitions)
        ds.write_parquet(path)
        return path

    def export(self, format=None, sort=True):
        """Vector physical-format export (reference ``core/ss/
        vector.py`` ``raw=False`` shapes): ``sparse`` (indices +
        values), ``bitmap`` (dense bool mask + values) or ``full``
        (every entry present). ``format=None`` picks ``full`` when the
        vector is dense, else ``sparse``."""
        v = self._v
        n = v.size
        if format is None:
            format = "full" if v.nvals == n else "sparse"
        f = format.lower()
        out = {"format": f, "size": n}
        if f == "full":
            if v.nvals != n:
                raise ValueError(
                    f"export format 'full' requires a FULL vector "
                    f"({v.nvals} of {n} entries present)")
            out["values"] = v.to_dense()
            return out
        idx, vals = v.to_coo(sort=sort)
        idx = np.asarray(idx)
        vals = np.asarray(vals)
        if f == "bitmap":
            bitmap = np.zeros(n, dtype=bool)
            dense = np.zeros(
                n, dtype=vals.dtype if len(vals) else np.float64)
            bitmap[idx] = True
            dense[idx] = vals
            out.update(bitmap=bitmap, values=dense,
                       nvals=int(len(idx)))
            return out
        if f == "sparse":
            out.update(indices=idx, values=vals, nvals=int(len(idx)),
                       sorted_index=bool(sort))
            return out
        raise ValueError(f"unknown export format {format!r}")


def vector_import_any(**d):
    """Rebuild a GBVector from a ``Vector.ss.export`` dict (reference
    ``import_any`` family)."""
    f = d["format"].lower()
    n = d.get("size")
    if f == "full":
        return GBVector.from_dense(np.asarray(d["values"]))
    if f == "bitmap":
        bitmap = np.asarray(d["bitmap"], dtype=bool)
        vals = np.asarray(d["values"])
        idx = np.flatnonzero(bitmap)
        return GBVector.from_coo(idx, vals[idx],
                                 size=n or len(bitmap))
    if f == "sparse":
        return GBVector.from_coo(d["indices"], d["values"], size=n)
    raise ValueError(f"unknown import format {d['format']!r}")


GBVector.ss = property(_VectorSS)
