"""Per-partition checkpoint/resume with lineage + metrics (north-rule
requirement; the reference's analogue is ``ss.serialize/deserialize``,
``core/ss/matrix.py:4050,:4120``).

Layout (resumable output — a failed run skips finished work):

    <dir>/<run_id>/iter=<k>/part=<p>.parquet     vertex-vector slices
    <dir>/<run_id>/iter=<k>/manifest.json        written LAST, atomically

A checkpoint is complete iff its manifest exists (write-temp-then-rename,
so a crash mid-write never yields a manifest pointing at partial data —
this is the exactly-once story for non-idempotent monoids like plus:
re-running a superstep overwrites slices before the manifest commits).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class CheckpointManager:
    def __init__(self, root: str, run_id: str, num_partitions: int = 8):
        self.dir = os.path.join(root, run_id)
        self.num_partitions = num_partitions
        os.makedirs(self.dir, exist_ok=True)

    def _iter_dir(self, it):
        return os.path.join(self.dir, f"iter={it}")

    def save(self, it: int, vectors: dict, metrics: dict | None = None,
             lineage: list | None = None):
        """Write named vertex vectors split into P range slices + manifest."""
        d = self._iter_dir(it)
        tmp = d + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        n = len(next(iter(vectors.values())))
        bounds = np.linspace(0, n, self.num_partitions + 1).astype(np.int64)
        for p in range(self.num_partitions):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            cols = {"vid": np.arange(lo, hi, dtype=np.int64)}
            for name, arr in vectors.items():
                cols[name] = np.asarray(arr)[lo:hi]
            pq.write_table(pa.table(cols), os.path.join(tmp, f"part={p}.parquet"))
        manifest = {
            "iter": it,
            "n": n,
            "num_partitions": self.num_partitions,
            "vectors": sorted(vectors),
            "written_at": time.time(),
            "metrics": metrics or {},
            "lineage": lineage or [],
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(d):  # stale partial from a previous crash
            import shutil
            shutil.rmtree(d)
        os.rename(tmp, d)  # atomic commit

    def begin_slices(self, it: int) -> str:
        """Start a PER-PARTITION checkpoint: returns the tmp directory
        the partition owners write their ``part=<g>.parquet`` slices
        into (each actor writes its own range — the driver never
        materializes the vectors). Finish with :meth:`commit_slices`."""
        tmp = self._iter_dir(it) + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        return tmp

    def commit_slices(self, it: int, n: int, vectors: list,
                      num_partitions: int, metrics: dict | None = None,
                      lineage: list | None = None):
        """Atomically commit a slice-written checkpoint (same manifest
        and layout contract as :meth:`save` — :meth:`load` reassembles
        by vid, so readers are layout-agnostic)."""
        d = self._iter_dir(it)
        tmp = d + ".tmp"
        manifest = {
            "iter": it,
            "n": int(n),
            "num_partitions": int(num_partitions),
            "vectors": sorted(vectors),
            "written_at": time.time(),
            "metrics": metrics or {},
            "lineage": lineage or [],
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(d):
            import shutil
            shutil.rmtree(d)
        os.rename(tmp, d)

    def latest(self):
        """(iter, manifest) of the newest COMPLETE checkpoint, or None."""
        if not os.path.isdir(self.dir):
            return None
        iters = []
        for name in os.listdir(self.dir):
            if name.startswith("iter=") and not name.endswith(".tmp"):
                mpath = os.path.join(self.dir, name, "manifest.json")
                if os.path.exists(mpath):
                    iters.append(int(name.split("=")[1]))
        if not iters:
            return None
        it = max(iters)
        with open(os.path.join(self._iter_dir(it), "manifest.json")) as f:
            return it, json.load(f)

    def load(self, it: int):
        """Reassemble the named vectors of checkpoint ``it``."""
        d = self._iter_dir(it)
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        n = manifest["n"]
        out = {}
        for p in range(manifest["num_partitions"]):
            t = pq.read_table(os.path.join(d, f"part={p}.parquet"))
            vid = t["vid"].to_numpy()
            for name in manifest["vectors"]:
                if name not in out:
                    out[name] = np.empty(n, dtype=t[name].to_numpy(
                        zero_copy_only=False).dtype)
                out[name][vid] = t[name].to_numpy(zero_copy_only=False)
        return out, manifest


class SuperstepMetrics:
    """Per-superstep lineage/metrics log (the reference's ``Recorder``
    analogue, ``core/recorder.py:34``): one record per superstep with
    edges processed, wall time and the convergence scalar."""

    def __init__(self):
        self.records = []
        self._t0 = time.perf_counter()

    def record(self, superstep: int, **kw):
        rec = {"superstep": superstep,
               "elapsed_sec": time.perf_counter() - self._t0, **kw}
        self.records.append(rec)
        return rec

    def dump(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")

    @property
    def total_sec(self):
        return time.perf_counter() - self._t0
