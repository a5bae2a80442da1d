"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
tokenizer-fitting half of a training-data pipeline (the counting side of
what ``stages/text.py``'s BPE-style pre-tokenizer estimates).

Scale shape (the part that matters at 100 TB):

- The corpus collapses to its WORD-FREQUENCY VOCABULARY in one streaming
  ``map_batches`` pass (per-batch Arrow dictionary-encode + bincount
  partials) merged by the two-level hash aggregate (`grouped_agg`).
  Everything after runs over the vocabulary — bounded by |vocab|
  (Heaps' law: ~millions for 100 TB of web text), never by corpus size.
- Each merge round is ONE vectorized pass over the vocabulary's symbol
  arrays: adjacent-pair codes bincounted with word-frequency weights
  (driver-side numpy here; the identical per-batch partial + grouped
  sum runs distributed when the vocabulary outgrows a node), then one
  broadcast merge rule applied with a pure-numpy greedy
  left-to-right non-overlapping replacement.
- Encoding a corpus with a fitted merge list is an actor-pool
  ``map_batches`` stage: merges broadcast once via ``ray.put``, each
  batch dictionary-encodes its words and applies the merges to the
  (far smaller) set of DISTINCT words only.

Determinism contract (what the DuckDB oracle replays): ties on the
best-pair count break to the lexicographically smallest ``(a, b)``;
merging is greedy left-to-right non-overlapping — exactly SQL
``replace()`` semantics over a delimited symbol string, which the
fixed-round oracle uses (see ``__ray_entry__`` ``docs_bpe_merges``).

No reference analogue (the reference has no text surface); first-class
training-data-pipeline surface per the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["word_counts", "bpe_fit", "bpe_encode"]


def _word_count_partial(text_col):
    """map_batches fn: one (word, cnt) row per distinct word per batch —
    Arrow split + dictionary-encode + bincount, no Python row loop."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        # house tokenizer: RE2 '\s+' split (byte-matched by DuckDB's
        # string_split_regex), empties filtered
        flat = pc.list_flatten(pc.split_pattern_regex(texts, r"\s+"))
        flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.table({"w": enc.dictionary,
                         "cnt": pa.array(cnt.astype(np.int64))})

    return fn


def word_counts(docs_ds, text_col="text"):
    """Corpus → (w, cnt) word-frequency Dataset. One streaming pass;
    output bounded by vocabulary size."""
    from ..stages.reduce import grouped_agg

    partials = docs_ds.map_batches(_word_count_partial(text_col),
                                   batch_format="pyarrow",
                                   batch_size=4096)
    return grouped_agg(partials, ["w"], [("cnt", "sum", "cnt")])


def _split_chars(words):
    """List of words → flat symbol array + offsets (symbol i belongs to
    the word whose offset range covers i). Initial symbols are single
    characters; vectorized via Arrow's codepoint split."""
    arr = pa.array(words, type=pa.string())
    # split into unicode characters: utf8_split by '' is unsupported —
    # use the regex split on the empty boundary between codepoints
    lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    joined = "".join(words)
    flat = np.array(list(joined), dtype=object)
    return flat, offsets


def _pair_counts(sym, offsets, weights):
    """Weighted adjacent-pair counts over per-word symbol arrays —
    one factorize + one packed bincount, no per-word Python."""
    n = len(sym)
    if n == 0:
        return np.array([], dtype=object), np.array([], dtype=object), \
            np.array([], dtype=np.int64)
    # positions whose successor is in the same word
    last = offsets[1:] - 1  # last symbol of each word
    is_last = np.zeros(n, dtype=bool)
    is_last[last[offsets[1:] > offsets[:-1]]] = True
    left = np.flatnonzero(~is_last[:-1]) if n > 1 else \
        np.array([], dtype=np.int64)
    if len(left) == 0:
        return np.array([], dtype=object), np.array([], dtype=object), \
            np.array([], dtype=np.int64)
    # word id of every symbol -> per-pair weight
    wid = np.searchsorted(offsets, left, side="right") - 1
    uniq, codes = np.unique(sym, return_inverse=True)
    a, b = codes[left], codes[left + 1]
    packed = a * len(uniq) + b
    u_packed, inv = np.unique(packed, return_inverse=True)
    w = np.zeros(len(u_packed), dtype=np.int64)
    np.add.at(w, inv, weights[wid])
    return uniq[u_packed // len(uniq)], uniq[u_packed % len(uniq)], w


def _best_pair(pa_, pb, w):
    """Argmax count, ties to the lexicographically smallest (a, b) —
    the oracle's ORDER BY cnt DESC, a, b LIMIT 1."""
    m = w == w.max()
    ia = np.flatnonzero(m)
    order = np.lexsort((pb[ia].astype(str), pa_[ia].astype(str)))
    j = ia[order[0]]
    return str(pa_[j]), str(pb[j]), int(w[j])


def _merge_pair(sym, offsets, a, b):
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    within words — SQL ``replace()`` semantics. Returns new (sym,
    offsets). Vectorized: conflicting matches only ever occupy
    CONSECUTIVE positions (a match spans 2 symbols), so within each run
    of consecutive match positions keeping every other one — starting at
    the run head — is exactly the left-to-right scan."""
    n = len(sym)
    if n < 2:
        return sym, offsets
    last = offsets[1:] - 1
    is_last = np.zeros(n, dtype=bool)
    is_last[last[offsets[1:] > offsets[:-1]]] = True
    hit = np.flatnonzero((sym[:-1] == a) & (sym[1:] == b)
                         & ~is_last[:-1])
    if len(hit) == 0:
        return sym, offsets
    run_start = np.concatenate([[True], np.diff(hit) != 1])
    run_id = np.cumsum(run_start) - 1
    first_of_run = hit[run_start][run_id]
    keep = ((hit - first_of_run) % 2) == 0
    pos = hit[keep]  # merge starts (consume pos and pos+1)
    merged = np.array([a + b], dtype=object)
    out = sym.copy()
    out[pos] = merged[0]
    drop = np.zeros(n, dtype=bool)
    drop[pos + 1] = True
    new_sym = out[~drop]
    # each boundary shifts left by the number of CONSUMED symbols
    # (positions pos+1) strictly before it; a merge never straddles a
    # boundary (pos+1 is within pos's word by construction)
    new_offsets = offsets - np.searchsorted(pos + 1, offsets, side="left")
    return new_sym, new_offsets


def bpe_fit(docs_ds, num_merges=8, text_col="text",
            driver_vocab_limit=4_000_000):
    """Fit ``num_merges`` BPE merge rules over the corpus.

    Returns ``(merges, counts)``: the ordered list of ``(a, b)`` symbol
    pairs and the pair count each rule was chosen at. The vocabulary is
    collected to the driver (bounded by |vocab| — guarded by
    ``driver_vocab_limit``); each round is two vectorized numpy passes
    over the vocabulary's symbol arrays."""
    wc = word_counts(docs_ds, text_col=text_col)
    batches = [b for b in wc.iter_batches(batch_format="pyarrow",
                                          batch_size=None) if b.num_rows]
    if not batches:  # legitimately-empty corpus → no merge rules
        return [], []
    t = pa.concat_tables(batches)
    if t.num_rows > driver_vocab_limit:
        raise ValueError(
            f"vocabulary {t.num_rows} exceeds driver_vocab_limit "
            f"{driver_vocab_limit}: raise the limit or pre-prune "
            "(min_count) before fitting")
    words = t["w"].to_pylist()
    weights = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    sym, offsets = _split_chars(words)
    merges, counts = [], []
    for _ in range(int(num_merges)):
        a_arr, b_arr, w = _pair_counts(sym, offsets, weights)
        if len(w) == 0 or w.max() <= 0:
            break
        a, b, cnt = _best_pair(a_arr, b_arr, w)
        merges.append((a, b))
        counts.append(cnt)
        sym, offsets = _merge_pair(sym, offsets, a, b)
    return merges, counts


class _BPEEncoder:
    """Actor-pool encode stage: merge list resolved once per actor;
    per batch, merges apply to the batch's DISTINCT words only (an
    in-actor LRU of word→tokens would further amortize across
    batches at production scale)."""

    def __init__(self, merges_ref, text_col="text"):
        import ray

        self.merges = ray.get(merges_ref) if not isinstance(
            merges_ref, list) else merges_ref
        self.text_col = text_col

    def _encode_words(self, words):
        sym, offsets = _split_chars(words)
        for a, b in self.merges:
            sym, offsets = _merge_pair(sym, offsets, a, b)
        return offsets[1:] - offsets[:-1]  # tokens per word

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        toks = pc.split_pattern_regex(texts, r"\s+")
        flat = pc.list_flatten(toks)
        word_per_doc = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(
            zero_copy_only=False)
        did = np.repeat(np.arange(len(word_per_doc)), word_per_doc)[keep]
        flat = flat.filter(pa.array(keep))
        enc = flat.dictionary_encode()
        distinct = enc.dictionary.to_pylist()
        per_word = self._encode_words(distinct) if distinct else \
            np.array([], dtype=np.int64)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        n_tok = np.zeros(len(word_per_doc), dtype=np.int64)
        np.add.at(n_tok, did, per_word[idx] if len(idx) else 0)
        return batch.append_column("n_bpe_tokens",
                                   pa.array(n_tok, type=pa.int64()))


def bpe_encode(docs_ds, merges, text_col="text", concurrency=4):
    """Append ``n_bpe_tokens`` (token count under the fitted merges)
    per document — merges broadcast once, distinct-word encode per
    batch."""
    import ray

    ref = ray.put(list(merges))
    return docs_ds.map_batches(
        _BPEEncoder, fn_constructor_kwargs=dict(
            merges_ref=ref, text_col=text_col),
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=4096)
