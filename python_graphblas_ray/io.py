"""``gb.io``-shaped module (reference ``graphblas/io/__init__.py``):
MatrixMarket read/write and ecosystem bridges under the names a
python-graphblas user expects. Implementations live in ``sources/``.
"""

from .sources.interop import (
    from_networkx,
    from_scipy_sparse,
    to_networkx,
    to_scipy_sparse,
)
from .sources.matrixmarket import mmread, mmwrite

__all__ = ["from_networkx", "from_scipy_sparse", "mmread", "mmwrite",
           "to_networkx", "to_scipy_sparse"]
