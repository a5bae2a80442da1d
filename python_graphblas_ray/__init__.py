"""python_graphblas_ray — a Ray-Data-native sparse linear-algebra graph
engine with the query/data-processing capabilities of python-graphblas.

Built from scratch on ``ray.data.Dataset`` pipelines: edge tables as
partitioned Arrow datasets, semiring SpMV as map_batches + groupby
shuffles, iterative graph algorithms (PageRank / connected components /
label propagation / triangle count) over pinned CSR partition actors.

See SURVEY.md for the reference→Ray mapping.

The top-level namespace is LAZY (PEP 562): importing a submodule (e.g.
``python_graphblas_ray.state.superstep`` inside each of a pool's actor
worker processes) must NOT drag in ``ray.data`` — the eager import chain
(``__init__`` → ``core`` → ``ray.data``) is what made a 32-actor pool's
cold start pay a parallel import storm (~10 s on a busy node, measured).
Attribute access on the package still resolves the full public API.
"""

_CORE = ("DimensionMismatch", "DuplicateIndexError", "GBMatrix",
         "GBScalar", "GBVector", "IndexOutOfBound", "Matrix",
         "OutputNotEmpty", "Vector", "Scalar")
_OPS = ("BinaryOp", "IndexBinaryOp", "IndexUnaryOp", "ParameterizedOp",
        "UnaryOp", "binary", "binary_from_string", "indexbinary",
        "indexunary", "select", "unary")
_MONOIDS = ("Monoid", "Semiring", "get_semiring", "monoid", "op",
            "semiring")

__all__ = [*_CORE, *_OPS, *_MONOIDS, "MAX_SIZE", "Recorder", "agg",
           "backend", "config", "dtypes", "exceptions", "io",
           "replace", "ss", "viz"]

__version__ = "0.1.0"

#: which execution backend this package is built on (reference exposes
#: ``gb.backend`` = "suitesparse"); useful for feature-gating user code
backend = "ray-data"

#: maximum Vector size / Matrix dimension (reference ``GrB_INDEX_MAX+1``
#: = 2**60); int64 row ids bound ours the same way
MAX_SIZE = 2**60

_ALIASES = {"Matrix": "GBMatrix", "Vector": "GBVector", "Scalar": "GBScalar"}


def __getattr__(name):
    import importlib

    if name in _CORE:
        mod = importlib.import_module(".core", __name__)
        return getattr(mod, _ALIASES.get(name, name))
    if name in _OPS:
        return getattr(importlib.import_module(".functions.ops", __name__),
                       name)
    if name in _MONOIDS:
        return getattr(
            importlib.import_module(".functions.monoids", __name__), name)
    if name == "agg":
        return importlib.import_module(".functions.aggregators",
                                       __name__).agg
    if name == "dtypes":
        return importlib.import_module(".functions.dtypes", __name__)
    if name == "io":
        return importlib.import_module(".io", __name__)
    if name == "viz":
        return importlib.import_module(".viz", __name__)
    if name == "exceptions":
        return importlib.import_module(".exceptions", __name__)
    if name == "ss":
        return importlib.import_module(".ss", __name__)
    if name == "Recorder":
        return importlib.import_module(".recorder", __name__).Recorder
    if name == "replace":
        return importlib.import_module(".core", __name__).replace_singleton
    if name == "config":
        return importlib.import_module("._config", __name__).config
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(__all__)
