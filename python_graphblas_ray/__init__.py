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
from .functions import dtypes
from .functions.aggregators import agg
from .functions.monoids import Monoid, Semiring, get_semiring, monoid, semiring
from .functions.ops import (
    BinaryOp,
    IndexBinaryOp,
    IndexUnaryOp,
    ParameterizedOp,
    UnaryOp,
    binary,
    binary_from_string,
    indexbinary,
    indexunary,
    unary,
)

Matrix = GBMatrix
Vector = GBVector
Scalar = GBScalar

__all__ = [
    "GBMatrix", "GBVector", "GBScalar", "Matrix", "Vector", "Scalar",
    "unary", "binary", "indexunary", "indexbinary", "monoid", "semiring",
    "agg", "dtypes",
    "UnaryOp", "BinaryOp", "IndexUnaryOp", "IndexBinaryOp",
    "ParameterizedOp", "Monoid", "Semiring",
    "get_semiring", "binary_from_string",
    "DuplicateIndexError", "DimensionMismatch",
]

__version__ = "0.1.0"
