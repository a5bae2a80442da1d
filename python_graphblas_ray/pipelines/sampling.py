"""Deterministic sampling, splitting, and sequence packing for
training-data preparation.

No reference analogue (python-graphblas is a linear-algebra library);
these are the dataset-side operations a 100-TB training pipeline needs
next to dedup/ANN: reproducible train/val/test splits, per-stratum
subsampling and exact quotas, and token-budget sequence packing.

Scale notes:
- ``split_column`` / ``hash_split`` / ``stratified_sample`` are pure
  ``map_batches`` — zero shuffles, stream at read bandwidth, and every
  decision derives from a hash of a stable key, so re-running on the
  same input yields the same sample at ANY cluster size, partitioning,
  or block order.
- ``quota_sample`` needs each stratum's rows co-located once: ONE
  hash-exchange on the stratum column, then a cross-strata vectorized
  rank pass per partition (no per-group Python).
- ``pack_sequences`` packs within each input block (= shard), so packs
  never cross shard boundaries — the property a resumable sharded
  pipeline wants — and the only driver state is nothing at all.

Hash methods:
- ``"splitmix64"`` (default): full-avalanche 64-bit mix of the key.
- ``"knuth32"``: Knuth multiplicative hash mod 2^32 — weaker mixing but
  expressible as ONE plain-SQL expression
  ``((key % 4294967296) * 2654435761) % 4294967296``, used by the
  DuckDB-oracle contract query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TWO64 = float(2**64)
_TWO32 = float(2**32)
_KNUTH = np.uint64(2654435761)


def _key_u01(col: pa.ChunkedArray | pa.Array, salt: int,
             method: str) -> np.ndarray:
    """Map a key column to deterministic uniforms in [0, 1)."""
    from ..stages.sketch import _hash64, _hash_any
    if method == "knuth32":
        # raw integer key (NOT pre-mixed) so the mapping stays the one
        # plain-SQL expression documented above
        if not pa.types.is_integer(col.type):
            raise TypeError("knuth32 needs an integer key column")
        k = np.asarray(col)
        if pa.types.is_signed_integer(col.type) and len(k) and \
                k.min() < 0:
            # DuckDB's % is sign-preserving, so the documented SQL
            # expression diverges on negatives — reject rather than
            # silently disagree with the oracle
            raise ValueError("knuth32 needs non-negative keys")
        k = k.astype(np.uint64)
        if salt:
            with np.errstate(over="ignore"):
                k = k + np.uint64(salt)
        with np.errstate(over="ignore"):
            h = ((k % np.uint64(2**32)) * _KNUTH) % np.uint64(2**32)
        return h.astype(np.float64) / _TWO32
    if method != "splitmix64":
        raise ValueError(f"unknown hash method: {method!r}")
    h = _hash_any(col)
    if salt:
        h = _hash64(h ^ np.uint64(salt))
    return h.astype(np.float64) / _TWO64


def _norm_fractions(fractions: dict[str, float]) -> tuple[list, np.ndarray]:
    names = list(fractions)
    fracs = np.asarray([fractions[n] for n in names], dtype=np.float64)
    if (fracs < 0).any() or abs(fracs.sum() - 1.0) > 1e-9:
        raise ValueError("fractions must be >= 0 and sum to 1")
    return names, np.cumsum(fracs)


def split_column(ds, fractions: dict[str, float], key_col: str,
                 salt: int = 0, out_col: str = "split",
                 method: str = "splitmix64"):
    """Append a deterministic split label column (train/val/test…).

    Row → ``names[searchsorted(cum_fractions, u(key))]`` where ``u`` is
    the key's hash mapped to [0, 1). One streaming pass, no shuffle;
    write with ``partition_cols=[out_col]`` for split-partitioned output.
    """
    names, cum = _norm_fractions(fractions)
    labels = np.asarray(names, dtype=object)

    def tag(batch: pa.Table) -> pa.Table:
        u = _key_u01(batch[key_col], salt, method)
        idx = np.minimum(np.searchsorted(cum, u, side="right"),
                         len(labels) - 1)
        return batch.append_column(out_col, pa.array(labels[idx],
                                                     type=pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def hash_split(ds, fractions: dict[str, float], key_col: str,
               salt: int = 0, method: str = "splitmix64") -> dict:
    """Deterministic disjoint-and-complete split → ``{name: Dataset}``.

    Each returned Dataset filters lazily by the same key hash, so the
    splits are consistent regardless of how many are consumed. (For a
    single-pass materialization of all splits at once, use
    ``split_column`` + a partitioned write instead.)
    """
    names, cum = _norm_fractions(fractions)
    lo = np.concatenate(([0.0], cum[:-1]))

    def pick(i):
        a, b = float(lo[i]), float(cum[i])
        last = i == len(names) - 1

        def f(batch: pa.Table) -> pa.Table:
            u = _key_u01(batch[key_col], salt, method)
            keep = (u >= a) & (u < b) if not last else (u >= a)
            return batch.filter(pa.array(keep))

        return f

    return {n: ds.map_batches(pick(i), batch_format="pyarrow")
            for i, n in enumerate(names)}


def stratified_sample(ds, strata_col: str, fraction, key_col: str,
                      salt: int = 0, default_fraction: float = 0.0,
                      method: str = "splitmix64"):
    """Deterministic Bernoulli sample with a per-stratum rate.

    ``fraction`` is a scalar (same rate everywhere) or a dict
    ``{stratum: rate}`` (strata not listed fall back to
    ``default_fraction``) — the standard corpus-balancing move
    (downsample over-represented languages/sources). Pure map_batches.
    """
    if np.isscalar(fraction):
        table = None
        scalar = float(fraction)
    else:
        table = {k: float(v) for k, v in fraction.items()}
        scalar = None

    def keep(batch: pa.Table) -> pa.Table:
        u = _key_u01(batch[key_col], salt, method)
        if table is None:
            rate = scalar
        else:
            enc = pa.chunked_array([batch[strata_col]]).combine_chunks() \
                    .dictionary_encode()
            cats = enc.dictionary.to_pylist()
            # null strata take table[None] if given, else the default
            rates = np.asarray([table.get(c, default_fraction)
                                for c in cats]
                               + [table.get(None, default_fraction)],
                               dtype=np.float64)
            idx = pc.fill_null(enc.indices, len(cats))
            rate = rates[np.asarray(idx).astype(np.int64)]
        return batch.filter(pa.array(u < rate))

    return ds.map_batches(keep, batch_format="pyarrow")


def quota_sample(ds, strata_col: str, k: int, key_col: str,
                 salt: int = 0, num_partitions=None,
                 method: str = "splitmix64"):
    """Exactly ``min(k, |stratum|)`` rows per stratum — the ``k`` rows
    with the smallest key hash (deterministic uniform-without-
    replacement). ONE hash-exchange on the stratum column, then a
    cross-strata lexsort + segment-rank pass per partition."""
    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import segments
    kk = int(k)

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        u = _key_u01(t[key_col], salt, method)
        enc = t[strata_col].combine_chunks().dictionary_encode()
        # nulls form their own stratum (SQL PARTITION BY semantics)
        codes = np.asarray(pc.fill_null(
            enc.indices, len(enc.dictionary))).astype(np.int64)
        if pa.types.is_integer(t[key_col].type):
            # deterministic hash-collision tie-break on the key itself
            # (matches a ROW_NUMBER() OVER (ORDER BY hash, key) oracle)
            order = np.lexsort((np.asarray(t[key_col]), u, codes))
        else:
            order = np.lexsort((u, codes))
        _, _, rank = segments(codes[order])
        take = order[rank < kk]
        return t.take(pa.array(np.sort(take)))

    return hash_exchange_apply(ds, strata_col, per_part,
                               num_partitions=num_partitions)


def pack_sequences(ds, length_col: str, budget: int, id_col: str,
                   out_pack_col: str = "pack_id",
                   out_pos_col: str = "pack_pos"):
    """Greedy sequential sequence packing: walk each block in ``id_col``
    order, open a new pack whenever adding the next document would
    exceed ``budget`` tokens. A document longer than ``budget`` gets a
    pack of its own. Packs never cross input blocks (= shards), so a
    resumable sharded pipeline can pack shard-by-shard; ``pack_id`` is
    the first document id in the pack (globally unique, content-
    addressed — independent of block numbering).

    Emits the input columns + ``(pack_id, pack_pos)``. The per-block
    loop is over PACKS (one ``searchsorted`` each), not rows — O(#packs
    · log n) per block.
    """
    b = int(budget)
    if b <= 0:
        raise ValueError("budget must be positive")

    def pack(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            t = batch.append_column(out_pack_col, pa.array(
                [], type=batch[id_col].type))
            return t.append_column(out_pos_col, pa.array([],
                                                         type=pa.int32()))
        order = pc.sort_indices(batch[id_col])
        t = batch.take(order)
        lens = np.asarray(t[length_col], dtype=np.int64)
        # clip over-budget docs to b: they fill (and so get) a pack alone
        cs = np.cumsum(np.minimum(lens, b))
        starts = []
        pos = 0
        while pos < n:
            starts.append(pos)
            base = cs[pos - 1] if pos else 0
            # widest end with (cumsum - base) <= budget; always advance
            pos = max(int(np.searchsorted(cs, base + b, side="right")),
                      pos + 1)
        starts = np.asarray(starts, dtype=np.int64)
        counts = np.diff(np.append(starts, n))
        ids = np.asarray(t[id_col])
        pack_ids = np.repeat(ids[starts], counts)
        pack_pos = (np.arange(n) - np.repeat(starts, counts)).astype(
            np.int32)
        t = t.append_column(out_pack_col, pa.array(pack_ids,
                                                   type=t[id_col].type))
        return t.append_column(out_pos_col, pa.array(pack_pos))

    return ds.map_batches(pack, batch_format="pyarrow")


def mixture_sample(ds, strata_col: str, total: int, key_col: str,
                   temperature: float = 1.0, salt: int = 0,
                   num_partitions=None, method: str = "splitmix64"):
    """Temperature-based corpus mixing (the multilingual / multi-source
    ``w_i ∝ n_i^τ`` rule — τ < 1 upsamples small sources relative to
    their share, the standard blending move for LLM training mixes):

    1. one small grouped count per stratum;
    2. target quotas = largest-remainder rounding of
       ``total · n_i^τ / Σ n_j^τ`` (deterministic — remainder ties break
       by stratum name), capped at ``n_i`` (no replacement, so the
       result can undershoot ``total`` when a stratum runs dry);
    3. the EXACT deterministic pick: each stratum's ``q_i`` rows with
       the smallest key hash (same one-exchange segment-rank kernel as
       :func:`quota_sample`, per-stratum k).

    Returns the sampled Dataset (all input columns)."""
    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import segments

    rows = ds.groupby(strata_col).count().take_all()
    counts = {r[strata_col]: int(r["count()"]) for r in rows}
    names = sorted(counts, key=lambda s: (s is None, s))
    n = np.array([counts[s] for s in names], dtype=np.float64)
    w = np.power(n, float(temperature))
    w /= w.sum()
    raw = w * float(total)
    base = np.floor(raw).astype(np.int64)
    rem = int(total - base.sum())
    if rem > 0:
        order = np.lexsort((np.arange(len(names)), -(raw - base)))
        base[order[:rem]] += 1
    quota = {s: int(min(b, counts[s])) for s, b in zip(names, base)}

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        u = _key_u01(t[key_col], salt, method)
        enc = t[strata_col].combine_chunks().dictionary_encode()
        codes = np.asarray(pc.fill_null(
            enc.indices, len(enc.dictionary))).astype(np.int64)
        ks = np.array([quota.get(v, 0)
                       for v in enc.dictionary.to_pylist()] + [0],
                      dtype=np.int64)
        if pa.types.is_integer(t[key_col].type):
            order = np.lexsort((np.asarray(t[key_col]), u, codes))
        else:
            order = np.lexsort((u, codes))
        _, _, rank = segments(codes[order])
        take = order[rank < ks[codes[order]]]
        return t.take(pa.array(np.sort(take)))

    return hash_exchange_apply(ds, strata_col, per_part,
                               num_partitions=num_partitions)


def priority_sample(ds, key_col: str, k: int, num_partitions=None):
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): a size-k
    weighted sample-without-replacement of the per-key row counts that
    supports UNBIASED subset-sum estimation — each key gets priority
    ``q = w / u`` (``u`` uniform from a splitmix64 of the key), the
    top-k priorities are kept, and each kept key's estimator is
    ``max(w, τ)`` with τ the (k+1)-th priority. The expected sum of
    estimates over any subset equals that subset's true weight.

    Determinism contract (bit-exact, NO rounding grain):
    ``u = ((h >> 11) + 1) · 2⁻⁵³`` is EXACTLY representable (53-bit
    integer scaled by a power of two), so ``q`` and the estimates are
    single exactly-rounded IEEE divisions a SQL twin reproduces
    bit-for-bit; ties break by key.

    Scale shape: ONE count exchange (``grouped_agg``), then per-block
    top-(k+1) candidate cuts (the ``ann_topk`` posture) and an
    O(k·blocks) driver merge — the counts table itself never sorts
    globally. Returns an Arrow table ``(rank, key, w, est)``.
    """
    from ..stages.reduce import grouped_agg
    from ..stages.sketch import _hash64

    counts = grouped_agg(ds.select_columns([key_col]), [key_col],
                         [(key_col, "count", "w")])

    def cand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "q": pa.array([], pa.float64())})
        key = t[key_col].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _hash64(key.astype(np.uint64))
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(2**53)
        q = w.astype(np.float64) / u
        order = np.lexsort((key, -q))[:k + 1]
        return pa.table({key_col: key[order].astype(np.int64),
                         "w": w[order], "q": q[order]})

    parts = [b for b in counts.map_batches(
        cand, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None) if b.num_rows]
    if not parts:
        return pa.table({"rank": pa.array([], pa.int64()),
                         key_col: pa.array([], pa.int64()),
                         "w": pa.array([], pa.int64()),
                         "est": pa.array([], pa.float64())})
    t = pa.concat_tables(parts, promote_options="permissive")
    key = t[key_col].to_numpy(zero_copy_only=False)
    w = t["w"].to_numpy(zero_copy_only=False)
    q = t["q"].to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -q))
    tau = float(q[order[k]]) if len(order) > k else 0.0
    sel = order[:k]
    est = np.maximum(w[sel].astype(np.float64), tau)
    return pa.table({
        "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
        key_col: key[sel].astype(np.int64),
        "w": w[sel].astype(np.int64),
        "est": est,
    })
