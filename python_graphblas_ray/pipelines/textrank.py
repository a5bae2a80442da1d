"""TextRank keyword extraction (Mihalcea & Tarau 2004) — the corpus →
word-co-occurrence-graph → PageRank composition, run end-to-end on the
engine's own pieces: the webtext side (vectorized Arrow RE2 tokenize,
distributed pair counting) feeds the link-graph side (pinned-actor
weighted PageRank) with zero new kernels.

Scale shape: the co-occurrence EDGE stream never leaves the cluster —
pairs are emitted per batch and flow straight into the engine build
exchange (duplicate pair rows ARE the co-occurrence weights: the
weighted spmv sums them, so no dedup shuffle is needed). The only
driver-side state is the sorted vocabulary (distinct words — ~10⁷ even
at web scale), broadcast once as the word→vid map; word-hash vids would
remove even that at the cost of a join for the readout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def cooccurrence_pairs(docs_ds, text_col="text"):
    """documents → symmetric consecutive-word pair stream ``(a, b)``
    (both directions, self-pairs dropped). Whitespace tokenization is
    one Arrow RE2 ``split_pattern_regex`` pass per batch — byte-matched
    by DuckDB's ``string_split_regex(text, '\\s+')`` (same RE2)."""
    import pyarrow.compute as pc

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.fill_null(texts, ""), r"\s+")
        words = lists.flatten().to_numpy(zero_copy_only=False)
        counts = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        doc = np.repeat(np.arange(len(counts)), counts)
        keep = words != ""
        words, doc = words[keep], doc[keep]
        if len(words) < 2:
            return empty
        same = doc[1:] == doc[:-1]
        a, b = words[:-1][same], words[1:][same]
        ne = a != b
        a, b = a[ne], b[ne]
        return pa.table({"a": np.concatenate([a, b]),
                         "b": np.concatenate([b, a])})

    return docs_ds.map_batches(pairs, batch_format="pyarrow")


def textrank_keywords(docs_ds, text_col="text", damping=0.85, iters=5,
                      tol=0.0, num_partitions=4):
    """Corpus-level TextRank: weighted PageRank over the undirected
    consecutive-word co-occurrence graph; a word's score is its
    stationary visiting probability — the classic unsupervised keyword
    ranking. Fixed ``iters`` supersteps with ``tol=0`` keeps the result
    SQL-reproducible at the 8-decimal grain (the convergent form is
    ``tol>0`` as usual for :func:`..algorithms.pagerank`).

    Returns a pyarrow Table ``(word, rank)`` over the words that appear
    in at least one (non-self) co-occurrence, rounded to 8 decimals."""
    from .algorithms import build_engine, pagerank

    pairs = cooccurrence_pairs(docs_ds, text_col).materialize()

    # vocabulary = distinct words — the one driver-side collect (O(|V|))
    vocab_parts = [b["a"].to_numpy(zero_copy_only=False)
                   for b in pairs.select_columns(["a"]).iter_batches(
                       batch_format="pyarrow", batch_size=None)]
    vocab = np.unique(np.concatenate(vocab_parts)) if vocab_parts \
        else np.array([], dtype=object)
    n = len(vocab)
    if n == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "rank": pa.array([], pa.float64())})
    vmap_ref = ray.put(vocab)

    def to_edges(batch: pa.Table) -> pa.Table:
        v = ray.get(vmap_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": np.searchsorted(v, a).astype(np.int64),
            "dst": np.searchsorted(v, b).astype(np.int64),
            "val": np.ones(len(a), dtype=np.float64),
        })

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    # duplicate pair rows ARE the weights: the weighted spmv sums them
    eng = build_engine(edges.materialize(), n,
                       num_partitions=num_partitions, weighted=True)
    try:
        r, _, _ = pagerank(eng, damping=damping, tol=tol, itermax=iters,
                           weighted=True)
    finally:
        eng.shutdown()
    return pa.table({"word": pa.array(vocab, pa.string()),
                     "rank": np.round(r, 8) + 0.0})


def collocations(docs_ds, text_col="text", min_count=5):
    """PMI collocations (Church & Hanks 1990): pointwise mutual
    information of consecutive word pairs —
    ``pmi(a,b) = ln( (c_ab/N) / ((c_a/T)·(c_b/T)) )`` with ``c_ab``
    the DIRECTED bigram count (N bigrams total) and ``c_w`` unigram
    counts (T tokens total) — the standard collocation / multi-word-
    expression detector over a corpus. ``min_count`` prunes noise pairs
    (PMI famously explodes on hapax pairs).

    Scale shape: bigram and unigram counts are two-level Arrow hash
    aggregates (per-batch combiners, partials bounded by vocabulary —
    never the token stream); the unigram table (O(|V|)) is broadcast
    once for the final per-batch PMI finish over the distributed bigram
    counts. Totals are two scalar sums.

    Returns a Dataset ``(w1, w2, c, pmi)`` with ``c ≥ min_count``,
    pmi rounded to 8 decimals."""
    import pyarrow.compute as pc

    from ..stages.reduce import grouped_agg

    def toks(batch: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "kind": pa.array([], pa.int8())})
        if batch.num_rows == 0:
            return empty
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.fill_null(texts, ""), r"\s+")
        words = lists.flatten().to_numpy(zero_copy_only=False)
        counts = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        doc = np.repeat(np.arange(len(counts)), counts)
        keep = words != ""
        words, doc = words[keep], doc[keep]
        if not len(words):
            return empty
        same = doc[1:] == doc[:-1]
        a, b = words[:-1][same], words[1:][same]
        # kind 0 = unigram occurrence, kind 1 = bigram
        return pa.table({
            "w1": np.concatenate([words, a]),
            "w2": np.concatenate([np.full(len(words), "", dtype=object),
                                  b]),
            "kind": np.concatenate([np.zeros(len(words), dtype=np.int8),
                                    np.ones(len(a), dtype=np.int8)]),
        })

    stream = docs_ds.map_batches(toks, batch_format="pyarrow") \
                    .materialize()
    cnt = grouped_agg(stream, ["kind", "w1", "w2"],
                      [("w1", "count", "c")]).materialize()

    uni = {}
    total_tokens = 0
    total_bigrams = 0
    for b in cnt.iter_batches(batch_format="pyarrow", batch_size=None):
        kind = b["kind"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        w1 = b["w1"].to_numpy(zero_copy_only=False)
        um = kind == 0
        for w, k in zip(w1[um], c[um]):
            uni[w] = uni.get(w, 0) + int(k)
        total_tokens += int(c[um].sum())
        total_bigrams += int(c[~um].sum())
    uni_ref = ray.put(uni)
    T, N = float(total_tokens), float(total_bigrams)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64()),
                          "pmi": pa.array([], pa.float64())})
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (kind == 1) & (c >= min_count)
        if not m.any():
            return empty
        u = ray.get(uni_ref)
        w1 = batch["w1"].to_numpy(zero_copy_only=False)[m]
        w2 = batch["w2"].to_numpy(zero_copy_only=False)[m]
        cb = c[m]
        ca = np.array([u[w] for w in w1], dtype=np.float64)
        cb2 = np.array([u[w] for w in w2], dtype=np.float64)
        pmi = np.log(cb * T * T / (N * ca * cb2))
        return pa.table({"w1": w1, "w2": w2, "c": cb,
                         "pmi": np.round(pmi, 8) + 0.0})

    return cnt.map_batches(finish, batch_format="pyarrow")
