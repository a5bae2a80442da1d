"""Dtype registry, including user-defined record types (UDTs).

Re-expresses the reference's dtype surface (``graphblas/core/dtypes.py:165``
``register_new``, ``:195`` ``register_anonymous``) Arrow-natively: a UDT is
a numpy structured dtype stored as a ``pa.struct`` value column — per-field
zero-copy, no opaque byte blobs. Builtins map 1:1 to numpy/Arrow scalars.

UDT values flow through construction (``from_coo(values=<structured
array>)``), ``to_coo``, ``apply`` with user UnaryOps, ``ewise_*`` with user
BinaryOps, and reductions with user Monoids — every kernel that touches
``val`` converts struct columns to numpy structured arrays (see
``core._np`` / ``core._pa_val``) so user fns stay vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["DType", "register_new", "register_anonymous", "lookup_dtype",
           "np_to_arrow_values", "arrow_to_np_values", "dtypes"]


class DType:
    """A named dtype: numpy dtype + Arrow type pair."""

    def __init__(self, name, np_dtype, arrow_type=None):
        self.name = name
        self.np_dtype = np.dtype(np_dtype)
        self.arrow_type = (arrow_type if arrow_type is not None
                           else _arrow_type_for(self.np_dtype))

    @property
    def is_udt(self):
        return self.np_dtype.names is not None

    def __repr__(self):
        return f"dtypes.{self.name}"

    def __eq__(self, other):
        if isinstance(other, DType):
            return self.np_dtype == other.np_dtype
        return self.np_dtype == np.dtype(other)

    def __hash__(self):
        return hash(self.np_dtype)


#: Arrow field names marking a struct column as a complex value column
#: (FC32/FC64). Deliberately non-identifier-ish so user UDT field names
#: can never collide.
_COMPLEX_FIELDS = ("_c_re", "_c_im")


def _arrow_type_for(np_dtype: np.dtype) -> pa.DataType:
    if np_dtype.names is None:
        if np_dtype.kind == "c":  # FC32/FC64 → struct<_c_re, _c_im>
            half = pa.float32() if np_dtype.itemsize == 8 else pa.float64()
            return pa.struct([(f, half) for f in _COMPLEX_FIELDS])
        if np_dtype.subdtype is not None:
            base, shape = np_dtype.subdtype
            n = int(np.prod(shape))
            return pa.list_(pa.from_numpy_dtype(base), n)
        return pa.from_numpy_dtype(np_dtype)
    return pa.struct([(f, _arrow_type_for(np_dtype[f]))
                      for f in np_dtype.names])


class _Registry(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:  # pragma: no cover
            raise AttributeError(name) from exc


dtypes = _Registry()

_BUILTINS = {
    "BOOL": np.bool_, "INT8": np.int8, "INT16": np.int16,
    "INT32": np.int32, "INT64": np.int64, "UINT8": np.uint8,
    "UINT16": np.uint16, "UINT32": np.uint32, "UINT64": np.uint64,
    "FP32": np.float32, "FP64": np.float64,
    "FC32": np.complex64, "FC64": np.complex128,
}
for _name, _np in _BUILTINS.items():
    dtypes[_name] = DType(_name, _np)
    # module-level names too: ``gb.dtypes.FC64`` (reference
    # ``graphblas/dtypes/__init__.py`` exposes each builtin directly)
    globals()[_name] = dtypes[_name]


def register_anonymous(dtype_spec, name=None) -> DType:
    """Build a (possibly unnamed) UDT from a numpy structured dtype spec
    (reference ``core/dtypes.py:195``). Accepts anything ``np.dtype``
    accepts — ``[("x", "<f8"), ("y", "<f8")]``, ``"(3,)uint16"``, dicts."""
    np_dtype = np.dtype(dtype_spec)
    return DType(name or str(np_dtype), np_dtype)


def register_new(name, dtype_spec) -> DType:
    """Register a named UDT under ``dtypes.<name>`` (reference
    ``core/dtypes.py:165``)."""
    if not name.isidentifier():
        raise ValueError(f"dtype name must be an identifier: {name!r}")
    dt = register_anonymous(dtype_spec, name)
    dtypes[name] = dt
    return dt


def lookup_dtype(key) -> DType:
    """Name / numpy dtype / DType → DType."""
    if isinstance(key, DType):
        return key
    if isinstance(key, str) and key in dtypes:
        return dtypes[key]
    if isinstance(key, dict):  # {"x": int, "y": float} — HPEC2022 style
        return lookup_dtype(np.dtype([(k, np.dtype(v))
                                      for k, v in key.items()]))
    np_dtype = np.dtype(key)
    for dt in dtypes.values():
        if dt.np_dtype == np_dtype:
            return dt
    return register_anonymous(np_dtype)


def np_dtype_for_arrow(t: pa.DataType) -> np.dtype:
    """Inverse of ``_arrow_type_for``: value-column Arrow type → numpy
    dtype (complex marker struct → complex, struct → structured,
    fixed-size list → subarray). Used to infer a container's dtype from
    a Parquet schema on read."""
    if pa.types.is_struct(t):
        names = [t.field(i).name for i in range(t.num_fields)]
        if tuple(names) == _COMPLEX_FIELDS:
            return np.dtype(np.complex64 if t.field(0).type == pa.float32()
                            else np.complex128)
        return np.dtype([(f, np_dtype_for_arrow(t.field(i).type))
                         for i, f in enumerate(names)])
    if pa.types.is_fixed_size_list(t):
        base = np_dtype_for_arrow(t.value_type)
        return np.dtype((base, (t.list_size,)))
    return np.dtype(t.to_pandas_dtype())


def np_to_arrow_values(values: np.ndarray) -> pa.Array:
    """Numpy values → Arrow array; structured dtypes become struct arrays
    (recursively per field; fixed-shape subarrays become fixed-size
    lists)."""
    values = np.asarray(values)
    if values.dtype.names is None:
        if values.dtype.kind == "c":  # complex → struct<_c_re, _c_im>
            return pa.StructArray.from_arrays(
                [pa.array(np.ascontiguousarray(values.real)),
                 pa.array(np.ascontiguousarray(values.imag))],
                names=list(_COMPLEX_FIELDS))
        if values.ndim == 2:  # subarray field flattened by indexing
            n, w = values.shape
            return pa.FixedSizeListArray.from_arrays(
                pa.array(values.reshape(-1)), w)
        return pa.array(values)
    return pa.StructArray.from_arrays(
        [np_to_arrow_values(values[f]) for f in values.dtype.names],
        names=list(values.dtype.names))


def pack_values(values: np.ndarray) -> pa.Array:
    """Structured numpy values → fixed-size-binary Arrow array (one row's
    raw bytes per cell). Joins (Acero) reject struct payload columns, so
    UDT value columns are packed through shuffle boundaries and unpacked
    on the far side — zero-copy byte views, no per-row Python."""
    values = np.ascontiguousarray(values)
    w = values.dtype.itemsize
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(w), len(values),
        [None, pa.py_buffer(values.view(np.uint8).reshape(-1))])


def unpack_values(arr, np_dtype: np.dtype) -> np.ndarray:
    """Fixed-size-binary Arrow array → structured numpy (null rows hold
    unspecified bytes — callers overwrite them via their null masks)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    w = np.dtype(np_dtype).itemsize
    buf = arr.buffers()[1]
    if buf is None:
        return np.zeros(len(arr), dtype=np_dtype)
    out = np.frombuffer(buf, dtype=np.uint8,
                        count=(arr.offset + len(arr)) * w)
    return out[arr.offset * w:].view(np_dtype)


def arrow_to_np_values(arr) -> np.ndarray:
    """Arrow array → numpy; struct arrays become structured arrays."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_struct(arr.type):
        if pa.types.is_fixed_size_list(arr.type):
            w = arr.type.list_size
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(-1, w)
        return arr.to_numpy(zero_copy_only=False)
    fields = [arr.type.field(i).name for i in range(arr.type.num_fields)]
    if tuple(fields) == _COMPLEX_FIELDS:  # complex marker struct → numpy
        re = arr.field(0).to_numpy(zero_copy_only=False)
        im = arr.field(1).to_numpy(zero_copy_only=False)
        out = np.empty(len(arr), dtype=(np.complex64 if re.dtype ==
                                        np.float32 else np.complex128))
        out.real, out.imag = re, im
        return out
    children = {f: arrow_to_np_values(arr.field(f)) for f in fields}
    np_dtype = np.dtype([
        (f, (children[f].dtype, children[f].shape[1:])
            if children[f].ndim > 1 else children[f].dtype)
        for f in fields])
    out = np.empty(len(arr), dtype=np_dtype)
    for f in fields:
        out[f] = children[f]
    return out
