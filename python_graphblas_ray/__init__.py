"""python_graphblas_ray — a Ray-Data-native sparse linear-algebra graph
engine with the query/data-processing capabilities of python-graphblas.

Built from scratch on ``ray.data.Dataset`` pipelines: edge tables as
partitioned Arrow datasets, semiring SpMV as map_batches + groupby
shuffles, iterative graph algorithms (PageRank / connected components /
label propagation / triangle count) over pinned CSR partition actors.

See SURVEY.md for the reference→Ray mapping.
"""

from .core import (
    DimensionMismatch,
    DuplicateIndexError,
    GBMatrix,
    GBScalar,
    GBVector,
)
from .functions.aggregators import agg
from .functions.monoids import Monoid, Semiring, get_semiring, monoid, semiring
from .functions.ops import (
    BinaryOp,
    IndexUnaryOp,
    UnaryOp,
    binary,
    binary_from_string,
    indexunary,
    unary,
)

Matrix = GBMatrix
Vector = GBVector
Scalar = GBScalar

__all__ = [
    "GBMatrix", "GBVector", "GBScalar", "Matrix", "Vector", "Scalar",
    "unary", "binary", "indexunary", "monoid", "semiring", "agg",
    "UnaryOp", "BinaryOp", "IndexUnaryOp", "Monoid", "Semiring",
    "get_semiring", "binary_from_string",
    "DuplicateIndexError", "DimensionMismatch",
]

__version__ = "0.1.0"
