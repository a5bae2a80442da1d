"""``gb.ss`` — the backend-extension namespace.

The reference exposes ``graphblas.ss`` only when the backend is
SuiteSparse (``/root/reference/graphblas/__init__.py:70-74``) and parks
its engine-specific extras there (serialize, per-row kernels, config).
This package's backend is Ray Data, so ``gb.ss`` exposes the
Ray-engine equivalents:

- the pinned-partition :class:`SuperstepEngine` and
  :func:`build_engine` (the distributed iteration substrate),
- the per-row ``.ss`` kernels (scan / selectk / compactify / sort /
  split / concat / flatten / reshape — also reachable as methods on
  ``Matrix.ss``),
- the global engine :data:`config`.
"""

from ._config import config
from .core import matrix_import_any, vector_import_any
from .pipelines.algorithms import build_engine
from .stages.perrow import (concat, flatten, reshape, row_compactify,
                            row_scan, row_selectk, row_sort, split,
                            vector_compactify, vector_concat,
                            vector_scan, vector_selectk, vector_sort,
                            vector_split)
from .state.superstep import SuperstepEngine

__all__ = ["SuperstepEngine", "build_engine", "concat", "config",
           "flatten", "import_any", "matrix_import_any", "reshape",
           "row_compactify", "row_scan", "row_selectk", "row_sort",
           "split", "vector_compactify", "vector_concat",
           "vector_import_any", "vector_scan", "vector_selectk",
           "vector_sort", "vector_split"]


def import_any(**d):
    """Reference ``ss.import_any`` dispatch: a ``size`` key marks a
    Vector export, everything else a Matrix export."""
    return (vector_import_any(**d) if "size" in d
            else matrix_import_any(**d))
