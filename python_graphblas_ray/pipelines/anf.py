"""Approximate Neighborhood Function / HyperANF (Palmer–Gibbons–
Faloutsos 2002; Boldi–Rosa–Vigna 2011) — the web-graph distance tool:
``N(t)`` = number of ordered pairs (u, v) with ``dist(u→v) ≤ t``
(self-pairs counted at t = 0), from which the effective diameter (the
smallest t covering ≥ q of all reachable pairs) falls out. This is the
measurement behind "four degrees of separation" and the Common-Crawl /
web-graph diameter studies — exactly the analysis a 10¹²-page link
graph needs, where exact all-pairs BFS is impossible.

Both modes iterate ONE register row per vertex to a fixpoint with the
engine's ``register_step`` (a vectorized per-partition reduceat over the
pinned CSC blocks — the spmv kernel with a matrix-valued x):

- **exact bitsets** (n ≤ ``exact_limit``): register = n-bit reachability
  set in uint64 words, ⊕ = bitwise OR. N(t) is exact — this is the
  driver-checkable oracle mode (⌈n/64⌉ words per vertex: fine at test
  scale, quadratic memory at web scale).
- **HyperANF HLL** (beyond): register = 2^b HyperLogLog byte-registers
  seeded with each vertex's own hash, ⊕ = elementwise max (HLL union is
  register-wise max — the reason ANF composes with BFS at all). Memory
  O(n·2^b), one superstep per distance level, relative error
  ≈ 1.04/√2^b per ball.

The register matrix rides one object-store broadcast per superstep in
this implementation; the documented 10¹²-scale path keeps registers
partitioned in the actors (pagerank_inactor's fused-state shape).

Reference surface: the reference ships no ANF, but its building blocks
(lor_second BFS semiring, ``/root/reference/graphblas/semiring`` bool
family) are what the bitset mode vectorizes 64-wide.
"""

from __future__ import annotations

import numpy as np

from ..state.superstep import SuperstepEngine, _splitmix64

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def _hll_init(n: int, b: int, seed: int, lo: int = 0,
              hi: int | None = None) -> np.ndarray:
    """One HLL sketch per vertex containing only the vertex itself:
    bucket = low b hash bits, register value = 1 + leading-zero rank of
    the remaining 64-b bits (the standard HLL insert, vectorized).
    ``lo/hi`` build only that vertex-id range's rows (the in-actor
    partitioned-state path) — row i is vertex lo+i either way."""
    hi = n if hi is None else hi
    m = 1 << b
    k = hi - lo
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        h = _splitmix64(np.arange(lo, hi, dtype=np.uint64) +
                        np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    bucket = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(b)
    # rho = (64-b) - floor(log2(w)) for w>0; 64-b+1 for w == 0
    bits = np.zeros(k, dtype=np.int64)
    nz = w > 0
    bits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
    rho = np.where(nz, (64 - b) - bits, (64 - b) + 1).astype(np.uint8)
    regs = np.zeros((k, m), dtype=np.uint8)
    regs[np.arange(k), bucket] = rho
    return regs


def _hll_count(regs: np.ndarray) -> np.ndarray:
    """Per-row HLL cardinality estimates with the standard small-range
    (linear-counting) correction — vectorized over all n sketches."""
    n, m = regs.shape
    est = _hll_alpha(m) * m * m / np.power(
        2.0, -regs.astype(np.float64)).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, lin, est)


def _bitset_init(n: int, lo: int = 0, hi: int | None = None) -> np.ndarray:
    """Identity reachability bitsets for vertex ids lo..hi (row i =
    vertex lo+i; the full matrix when lo/hi default)."""
    hi = n if hi is None else hi
    words = (n + 63) // 64
    regs = np.zeros((hi - lo, words), dtype=np.uint64)
    idx = np.arange(lo, hi)
    regs[np.arange(hi - lo), idx // 64] = (np.uint64(1) <<
                                           (idx % 64).astype(np.uint64))
    return regs


def _popcount_total(regs: np.ndarray) -> int:
    return int(np.unpackbits(regs.view(np.uint8)).sum())


def neighborhood_function(engine: SuperstepEngine, tmax: int = 64,
                          mode: str = "auto", b: int = 6, seed: int = 7,
                          exact_limit: int = 1 << 20, inactor: bool = False):
    """Compute N(0..T) where T is the first level at which every ball
    stops growing (T = the graph's maximum finite distance) or ``tmax``.

    Counts IN-reachability balls (pairs (u, v) with a ≤t path u→v,
    accumulated at v) — the pair TOTAL is identical to the out-ball sum,
    so N(t) and the effective diameter need no transposed engine.

    ``inactor=True`` routes through ``SuperstepEngine.anf_inactor`` —
    registers pinned in the partition actors, slice exchange through the
    object store, O(P) driver per superstep (the 10¹²-vertex path;
    bit-identical results, parity-tested).

    Returns ``(counts, exact)``: counts[t] = N(t) (float for HLL, int
    for exact), len(counts) = T+1.
    """
    n = engine.n
    exact = mode == "exact" or (mode == "auto" and n <= exact_limit)
    if inactor:
        counts = engine.anf_inactor(tmax=tmax,
                                    mode="exact" if exact else "hll",
                                    b=b, seed=seed)
        return counts, exact
    if exact:
        regs = _bitset_init(n)
        counts = [_popcount_total(regs)]
    else:
        regs = _hll_init(n, b, seed)
        counts = [float(_hll_count(regs).sum())]
    op = "or" if exact else "max"
    merge = np.bitwise_or if exact else np.maximum
    for _ in range(tmax):
        nxt = merge(regs, engine.register_step(regs, op))
        if (nxt == regs).all():
            break
        regs = nxt
        counts.append(_popcount_total(regs) if exact
                      else float(_hll_count(regs).sum()))
    return np.asarray(counts), exact


def effective_diameter(engine: SuperstepEngine, q: float = 0.9,
                       tmax: int = 64, mode: str = "auto", b: int = 6,
                       seed: int = 7, exact_limit: int = 1 << 20,
                       inactor: bool = False) -> int:
    """Smallest t with N(t) ≥ q · N(T) (discrete, no interpolation —
    keeps the exact mode SQL-reproducible)."""
    counts, _ = neighborhood_function(engine, tmax=tmax, mode=mode, b=b,
                                      seed=seed, exact_limit=exact_limit,
                                      inactor=inactor)
    total = counts[-1]
    return int(np.argmax(counts >= q * total))


def neighborhood_function_numpy(src, dst, n, tmax: int = 64):
    """Single-process oracle: BFS min-distance matrix → pair counts per
    level (dist(u→v) accumulated at v from in-edges, like the engine)."""
    INF = n + 1
    dist = np.full((n, n), INF, dtype=np.int64)  # dist[u, v] = u → v
    dist[np.arange(n), np.arange(n)] = 0
    s, d = np.asarray(src), np.asarray(dst)
    for _ in range(min(tmax, n)):
        # relax: dist[u, d] <= dist[u, s] + 1 for each edge (s, d)
        cand = dist[:, s] + 1
        new = dist.copy()
        np.minimum.at(new.T, d, cand.T)
        if (new == dist).all():
            break
        dist = new
    finite = dist <= n
    maxd = int(dist[finite].max())
    return np.array([(dist <= t).sum() for t in range(maxd + 1)])


def _popcount_rows(regs: np.ndarray) -> np.ndarray:
    """Per-row popcount of a (rows, words) uint64 bitset matrix —
    SWAR per word (reuses dedup's vectorized popcount), summed per row;
    no n²-bit unpack."""
    from .dedup import _popcount64

    return _popcount64(regs).sum(axis=1)


def hyperball_harmonic(engine: SuperstepEngine, tmax: int = 64,
                       mode: str = "auto", b: int = 6, seed: int = 7,
                       exact_limit: int = 1 << 20):
    """HyperBall (Boldi-Vigna 2013 "In-core computation of geometric
    centralities with HyperBall") — harmonic centrality of EVERY vertex
    in O(effective-diameter) register supersteps:
    ``C(v) = Σ_{u≠v} 1/d(u→v) = Σ_t (|B_in(v,t)| − |B_in(v,t−1)|)/t``,
    the method behind the Facebook four-degrees measurement and the
    web-scale alternative to per-source BFS (``closeness_centrality``
    samples sources; HyperBall covers all of them at sketch precision).

    Same register fixpoint as :func:`neighborhood_function` (exact
    uint64 bitsets ≤ ``exact_limit`` — then bit-identical to
    all-sources ``closeness_centrality(harmonic=True)`` — or HLL byte
    registers at scale, where ball-size deltas are counter-estimate
    differences exactly as in the paper); the only addition is a
    per-vertex ball-size readout per round. Scale notes of the ANF
    dense-broadcast path apply (the in-actor fused form is the
    10¹²-vertex route).

    Returns ``(scores float64[n], exact flag)``; exact scores rounded
    to 8 decimals (oracle-stable)."""
    n = engine.n
    exact = mode == "exact" or (mode == "auto" and n <= exact_limit)
    if exact:
        regs = _bitset_init(n)
        count = _popcount_rows(regs).astype(np.float64)
    else:
        regs = _hll_init(n, b, seed)
        count = _hll_count(regs)
    op = "or" if exact else "max"
    merge = np.bitwise_or if exact else np.maximum
    scores = np.zeros(n, dtype=np.float64)
    for t in range(1, tmax + 1):
        nxt = merge(regs, engine.register_step(regs, op))
        if (nxt == regs).all():
            break
        regs = nxt
        c = (_popcount_rows(regs).astype(np.float64) if exact
             else _hll_count(regs))
        scores += (c - count) / t
        count = c
    return (np.round(scores, 8) + 0.0 if exact else scores), exact


def hyperball_eccentricity(engine: SuperstepEngine, tmax: int = 64,
                           mode: str = "auto", b: int = 6, seed: int = 7,
                           exact_limit: int = 1 << 20):
    """In-eccentricity of EVERY vertex off the same register fixpoint:
    ``ecc_in(v) = max_{u: u→v reachable} d(u→v)`` = the last round where
    ``B_in(v, t)`` grew (Boldi-Vigna HyperBall §5 reads radius/diameter
    bounds off exactly this per-vertex signal). Exact in bitset mode
    (registers grow monotonically, so "changed this round" ⇔ a new
    vertex entered the ball at distance t); in HLL mode a register
    change is the sketch's growth signal (per-vertex estimates, still
    monotone). A vertex nothing reaches has eccentricity 0.

    Returns ``(ecc int64[n], exact flag)``."""
    n = engine.n
    exact = mode == "exact" or (mode == "auto" and n <= exact_limit)
    regs = _bitset_init(n) if exact else _hll_init(n, b, seed)
    op = "or" if exact else "max"
    merge = np.bitwise_or if exact else np.maximum
    ecc = np.zeros(n, dtype=np.int64)
    for t in range(1, tmax + 1):
        nxt = merge(regs, engine.register_step(regs, op))
        grew = (nxt != regs).any(axis=1)
        if not grew.any():
            break
        ecc[grew] = t
        regs = nxt
    return ecc, exact


def ball_sizes(engine: SuperstepEngine, t: int = 2):
    """Exact ``|B_in(v, t)|`` for every vertex (self included) — the
    t-hop neighborhood-size readout of the same bitset register
    fixpoint (t=2 is the classic friend-of-friend / 2-hop audience
    metric of a link graph). Runs exactly ``t`` register supersteps."""
    n = engine.n
    regs = _bitset_init(n)
    for _ in range(int(t)):
        regs = np.bitwise_or(regs, engine.register_step(regs, "or"))
    return _popcount_rows(regs)
