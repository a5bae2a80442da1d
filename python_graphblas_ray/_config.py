"""Global engine configuration (reference ``gb.config``,
``graphblas/__init__.py:22-36`` — a donfig-backed mapping with
``autocompute`` / ``mapnumpy``).

The Ray-native analog holds the ENGINE knobs that would otherwise be
threaded through every call: default superstep partition count,
driver-broadcast size ceiling, hub-split factor, and the local-CC
routing limit. Mapping-style access plus a context manager for scoped
overrides, donfig-style:

>>> from python_graphblas_ray import config
>>> config["num_partitions"]
8
>>> with config.set(num_partitions=32):
...     eng = build_engine(edges, n)          # picks up 32

Call sites read the config when their keyword is left at ``None``
(explicit arguments always win). Unknown keys raise — typos must not
silently no-op.
"""

import contextlib
import threading

_DEFAULTS = {
    # superstep engine: CSC-block partitions per matrix
    "num_partitions": 8,
    # max elements a small-side lookup may broadcast via ray.put before
    # pipelines switch to a shuffle semi-join route
    "broadcast_limit": 50_000_000,
    # hub splitting factor for power-law dst skew (None = engine default)
    "hub_split_factor": None,
    # pair graphs at or below this edge count collapse with driver-local
    # FastSV instead of spinning up the distributed engine
    "local_cc_limit": 2_000_000,
    # Mask.new(complement=True) materializes the DENSE complement of a
    # mask — inherently O(shape) entries; allowed only when the full
    # shape (nrows*ncols / size) is at or below this bound, else raise
    # (pass the lazy ~mask to the op instead)
    "complement_materialize_limit": 10_000_000,
    # hash_join route when the call leaves ``streaming`` unset:
    # "materialize" (count-and-prune — measured faster single-node:
    # the count collapses tiny joins to one partition) or "streaming"
    # (sentinel-guarded, barrier-free — the multi-node scale mode where
    # the barrier would buffer both sides and stall pipelining). The
    # full 50-entry driver window is parity-swept green in BOTH modes.
    "join_mode": "materialize",
}


class Config:
    """Thread-safe mapping with donfig-style scoped ``set``."""

    def __init__(self):
        self._values = dict(_DEFAULTS)
        self._lock = threading.Lock()

    def _check(self, key):
        if key not in _DEFAULTS:
            raise KeyError(
                f"unknown config key {key!r}; known: {sorted(_DEFAULTS)}")

    def __getitem__(self, key):
        self._check(key)
        return self._values[key]

    def __setitem__(self, key, value):
        self._check(key)
        with self._lock:
            self._values[key] = value

    def get(self, key, default=None):
        self._check(key)
        return self._values.get(key, default)

    def __contains__(self, key):
        return key in _DEFAULTS

    def __iter__(self):
        return iter(_DEFAULTS)

    def keys(self):
        return _DEFAULTS.keys()

    def to_dict(self):
        return dict(self._values)

    @contextlib.contextmanager
    def set(self, **kwargs):
        """Scoped override: ``with config.set(num_partitions=32): ...``
        (donfig ``Config.set`` shape). Also usable non-scoped by
        ignoring the context result — values persist until reset."""
        for k in kwargs:
            self._check(k)
        with self._lock:
            old = {k: self._values[k] for k in kwargs}
            self._values.update(kwargs)
        try:
            yield self
        finally:
            with self._lock:
                self._values.update(old)

    def reset(self):
        with self._lock:
            self._values = dict(_DEFAULTS)

    def __repr__(self):
        body = ", ".join(f"{k}={v!r}" for k, v in
                         sorted(self._values.items()))
        return f"Config({body})"


config = Config()
