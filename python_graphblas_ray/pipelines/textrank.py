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
                     "rank": np.round(r, 8)})
