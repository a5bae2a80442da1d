"""Exception inventory (reference ``graphblas/exceptions.py``).

The classes this engine actually raises double-inherit the reference's
``GraphblasException`` hierarchy AND the Python builtin their call
sites historically caught (ValueError / IndexError), so both
``except gb.exceptions.DimensionMismatch`` and ``except ValueError``
keep working. The remaining reference names exist for API parity —
they describe C-runtime conditions (null pointers, JIT failures) a
Ray/Arrow engine has no analog for and are never raised here.
"""


class GraphblasException(Exception):
    """Base for all engine exceptions (reference ``exceptions.py:7``)."""


class DimensionMismatch(GraphblasException, ValueError):
    """Shapes incompatible for the requested operation."""


class OutputNotEmpty(GraphblasException, ValueError):
    """``build`` into a non-empty object without ``clear=True``
    (reference ``tests/test_matrix.py:225``, GrB_OUTPUT_NOT_EMPTY)."""


class IndexOutOfBound(GraphblasException, IndexError):
    """Index beyond the object's dimensions (GrB_INDEX_OUT_OF_BOUND)."""


class DuplicateIndexError(GraphblasException, ValueError):
    """``from_coo`` with ``dup_op=None`` saw duplicate indices
    (reference ``matrix.py:850``)."""


class EmptyObject(GraphblasException, ValueError):
    """An empty Scalar used where a value is required
    (reference ``exceptions.py:73``)."""


class NoValue(GraphblasException):
    """Entry absent at the requested index (reference
    ``exceptions.py:11``); this engine returns empty Scalars instead."""


class InvalidValue(GraphblasException, ValueError):
    """Reference ``exceptions.py:29`` — parity name."""


class InvalidIndex(GraphblasException, IndexError):
    """Reference ``exceptions.py:33`` — parity name."""


class DomainMismatch(GraphblasException, TypeError):
    """Operator domain incompatible with the value dtype
    (reference ``exceptions.py:40``)."""


class NotImplementedException(GraphblasException, NotImplementedError):
    """Reference ``exceptions.py:81`` — parity name."""


class UdfParseError(GraphblasException, ValueError):
    """User-defined function could not be vectorized
    (reference ``exceptions.py:93``)."""
