"""End-to-end training-corpus preparation — the flagship composition of
the engine's training-data operators:

    documents → quality gate → exact dedup → MinHash-LSH near-dup
    removal → feature-hash embedding

Each stage is the already-tested operator; this module only wires them
(filters are broadcast semi-joins on id sets, never driver-side row
loops) and reports per-stage survivor counts — the lineage a data-prep
run needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..stages.join import semi_join_filter, semi_join_shuffle
from ..stages.text import embed_text, quality_score
from .dedup import exact_dedup, minhash_lsh_pairs


def _collect_ids(ds, col) -> np.ndarray:
    out = []
    for b in ds.select_columns([col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20):
        out.append(b[col].to_numpy(zero_copy_only=False))
    return (np.sort(np.unique(np.concatenate(out))) if out
            else np.array([], dtype=np.int64))


def _id_semi_join(ds, id_col, ids_ds, ids_col, anti=False,
                  broadcast_limit=50_000_000):
    """Filter ``ds`` by an id set: broadcast (``ray.put`` once, probed per
    batch) while the set fits the driver comfortably, hash-shuffle semi
    join beyond — the exact-dedup keep-set is ~one id per distinct doc,
    which outgrows any single node at corpus scale."""
    if ids_ds.count() <= broadcast_limit:
        ids = _collect_ids(ids_ds, ids_col)
        return semi_join_filter(ds, (id_col,), ray.put(ids), anti=anti)
    keys = ids_ds.select_columns([ids_col])
    if ids_col != id_col:
        keys = keys.map_batches(
            lambda b: b.rename_columns([id_col]), batch_format="pyarrow")
    return semi_join_shuffle(ds, (id_col,), keys, anti=anti)


def prepare_corpus(docs_ds, id_col="doc_id", text_col="text",
                   min_words=20, min_quality=0.2, neardup_threshold=0.7,
                   embed_dim=64, broadcast_limit=50_000_000):
    """Returns ``(clean_ds, stats)``: the surviving documents with an
    ``embedding`` column, and per-stage survivor counts.

    Near-dup policy: for every verified pair (ia < ib) the larger id is
    dropped (keep-first) — greedy but deterministic; transitive clusters
    collapse to their smallest id across LSH rounds.

    Id-set filters broadcast below ``broadcast_limit`` ids and switch to
    the hash-shuffle semi join above it (see ``_id_semi_join``).
    """
    stats = {"input": docs_ds.count()}

    # 1. quality gate (vectorized score columns + filter)
    scored = quality_score(docs_ds)

    def gate(batch: pa.Table) -> pa.Table:
        ok = ((batch["q_words"].to_numpy(zero_copy_only=False)
               >= min_words) &
              (batch["quality_score"].to_numpy(zero_copy_only=False)
               >= min_quality))
        return batch.filter(pa.array(ok)).select(
            [c for c in batch.column_names if not c.startswith("q_")
             and c != "quality_score"])

    gated = scored.map_batches(gate, batch_format="pyarrow").materialize()
    stats["after_quality"] = gated.count()

    # 2. exact dedup → keep-set semi join (broadcast or shuffle by size)
    kept = exact_dedup(gated, key_col=text_col, id_col=id_col).materialize()
    gated = _id_semi_join(gated, id_col, kept, "keep_id",
                          broadcast_limit=broadcast_limit)
    gated = gated.materialize()
    stats["after_exact_dedup"] = gated.count()

    # 3. near-dup removal: drop the larger id of every verified pair
    pairs = minhash_lsh_pairs(gated, threshold=neardup_threshold,
                              text_col=text_col, id_col=id_col)
    pairs = pairs.materialize()
    clean = _id_semi_join(gated, id_col, pairs, "ib", anti=True,
                          broadcast_limit=broadcast_limit).materialize()
    stats["after_neardup"] = clean.count()

    # 4. embeddings for downstream ANN / clustering
    final = embed_text(clean, dim=embed_dim)
    return final, stats


def decontaminate(docs_ds, bench_ds, id_col="doc_id", text_col="text",
                  ngram=3, broadcast_limit=50_000_000, method="auto"):
    """Benchmark decontamination: drop every training document that
    shares ANY word ``ngram``-gram with a document in ``bench_ds`` (the
    GPT-3 appendix-C / Pile-style n-gram overlap rule; 13-grams are the
    published norm for natural text — pick ``ngram`` to taste).

    Returns ``(clean_ds, stats)`` with per-stage counts. All three
    routes produce the IDENTICAL exact result (route-parity tested):

    - ``"broadcast"`` — benchmark suites are tiny next to training
      corpora, so the default collects the benchmark's DISTINCT gram
      hashes to the driver, broadcasts the sorted array once
      (``ray.put``), and each corpus batch searchsorted-probes it —
      ONE streaming corpus pass, no shuffle.
    - ``"bloom"`` — the gram set compressed to a Bloom bitmap (~16 bits
      per gram vs 64, ~0.24% false positives, NO false negatives):
      bloom-negative docs are definitively clean after the same single
      streaming pass; only the bloom-positive CANDIDATES (true hits +
      the sub-percent FP tail) pay the exact shuffle semi-join verify.
      4× more benchmark grams per byte of broadcast, still exact.
    - ``"shuffle"`` — corpus gram rows hash-shuffle-semi-join against
      the benchmark grams (two exchanges: gram match →
      contaminated-id anti filter). No driver-side gram state at all.

    ``auto``: broadcast while the raw grams fit ``broadcast_limit``,
    bloom while the BITMAP does (≤ 4× limit), else shuffle. Docs with
    fewer than ``ngram`` words can't share a full gram and are always
    kept.
    """
    from .dedup import _shingle_hashes

    def bench_grams(batch: pa.Table) -> pa.Table:
        sh, _ = _shingle_hashes(batch[text_col], ngram, full_only=True)
        return pa.table({"gram": np.unique(sh).view(np.int64)})

    stats = {"input": docs_ds.count(), "bench_docs": bench_ds.count()}
    bg = bench_ds.map_batches(bench_grams, batch_format="pyarrow")
    n_grams = bg.count()
    stats["bench_grams"] = n_grams
    if method == "auto":
        method = ("broadcast" if n_grams <= broadcast_limit else
                  "bloom" if n_grams <= 4 * broadcast_limit else
                  "shuffle")
    stats["method"] = method

    def corpus_grams(batch: pa.Table) -> pa.Table:
        sh, offs = _shingle_hashes(batch[text_col], ngram,
                                   full_only=True)
        counts = offs[1:] - offs[:-1]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: np.repeat(ids, counts),
                         "gram": sh.view(np.int64)})

    if method == "bloom":
        from ..stages.sketch import bloom_build, bloom_contains

        bits, m_bits, kh = bloom_build(bg, "gram", n_hint=n_grams)
        bits_ref = ray.put(bits)

        def split_flag(batch: pa.Table) -> pa.Table:
            b = ray.get(bits_ref)
            sh, offs = _shingle_hashes(batch[text_col], ngram,
                                       full_only=True)
            hit = bloom_contains(b, m_bits, kh, sh)
            counts = offs[1:] - offs[:-1]
            seg = np.repeat(np.arange(batch.num_rows), counts)
            bad = np.bincount(seg[hit], minlength=batch.num_rows)
            return batch.append_column("_bloom_pos",
                                       pa.array(bad > 0))

        flagged = docs_ds.map_batches(split_flag,
                                      batch_format="pyarrow").materialize()
        clean_sure = flagged.filter(expr="_bloom_pos == False")
        candidates = flagged.filter(expr="_bloom_pos == True")
        stats["bloom_candidates"] = candidates.count()
        cg = candidates.map_batches(corpus_grams, batch_format="pyarrow")
        contaminated = semi_join_shuffle(
            cg, ("gram",), bg).select_columns([id_col])
        verified = _id_semi_join(candidates, id_col, contaminated,
                                 id_col, anti=True,
                                 broadcast_limit=broadcast_limit)
        clean = clean_sure.union(verified).drop_columns(
            ["_bloom_pos"]).materialize()
        stats["clean"] = clean.count()
        return clean, stats

    if method == "broadcast":
        parts = [b["gram"].to_numpy(zero_copy_only=False)
                 for b in bg.iter_batches(batch_format="pyarrow",
                                          batch_size=1 << 20)]
        gram_set = (np.sort(np.unique(np.concatenate(parts))) if parts
                    else np.array([], dtype=np.int64))
        gram_ref = ray.put(gram_set)

        def drop_contaminated(batch: pa.Table) -> pa.Table:
            grams = ray.get(gram_ref)
            sh, offs = _shingle_hashes(batch[text_col], ngram,
                                       full_only=True)
            sh = sh.view(np.int64)
            if len(grams) and len(sh):
                pos = np.minimum(np.searchsorted(grams, sh),
                                 len(grams) - 1)
                hit = grams[pos] == sh
            else:
                hit = np.zeros(len(sh), dtype=bool)
            # doc kept iff none of its grams hit (bincount over the
            # doc-segment vector — robust to zero-gram docs)
            counts = offs[1:] - offs[:-1]
            seg = np.repeat(np.arange(batch.num_rows), counts)
            bad = np.bincount(seg[hit], minlength=batch.num_rows)
            return batch.filter(pa.array(bad == 0))

        clean = docs_ds.map_batches(drop_contaminated,
                                    batch_format="pyarrow").materialize()
    else:  # benchmark grams too big even for the bloom: full semi-join
        cg = docs_ds.map_batches(corpus_grams, batch_format="pyarrow")
        contaminated = semi_join_shuffle(
            cg, ("gram",), bg).select_columns([id_col])
        clean = _id_semi_join(docs_ds, id_col, contaminated, id_col,
                              anti=True,
                              broadcast_limit=broadcast_limit)
        clean = clean.materialize()
    stats["clean"] = clean.count()
    return clean, stats


def neardup_clusters(docs_ds, threshold=0.7, id_col="doc_id",
                     text_col="text", num_partitions=4,
                     **minhash_kwargs):
    """Near-duplicate CLUSTERS (the Lee et al. 2022 / SlimPajama
    clustering step): verified MinHash-LSH pairs form an undirected
    graph; the engine's own FastSV connected components collapse
    transitive chains (a~b, b~c ⇒ one cluster even when a~c was never
    emitted); each doc maps to the smallest doc id of its cluster
    (singletons map to themselves — keep ``cluster == doc_id`` rows for
    the dedup-keep policy).

    A composition showcase: the training-data operator reuses the graph
    engine (pinned-actor supersteps) on the pair graph, which is tiny
    next to the corpus — no extra corpus pass beyond MinHash itself.
    Auto-routing: a pair graph under ``local_cc_limit`` edges is
    collapsed with the same FastSV recipe driver-locally (vectorized
    numpy ``minimum.at`` hooking) — the distributed engine's sort
    shuffle + actor spin-up is pure fixed overhead at that size; the
    pinned-actor engine takes over past the limit, where the pair graph
    itself is distributed-scale.
    Returns a Dataset ``(doc_id, cluster)``.
    """
    from .dedup import minhash_lsh_pairs

    local_cc_limit = minhash_kwargs.pop("local_cc_limit", None)
    mx = docs_ds.max(id_col)
    if mx is None:  # legitimately-empty corpus
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64())}))
    n = int(mx) + 1
    pairs = minhash_lsh_pairs(docs_ds, threshold=threshold,
                              text_col=text_col, id_col=id_col,
                              **minhash_kwargs)
    f = collapse_pairs(pairs, n, num_partitions=num_partitions,
                       local_cc_limit=local_cc_limit)
    f_ref = ray.put(f)

    def label(batch: pa.Table) -> pa.Table:
        fv = ray.get(f_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: ids, "cluster": fv[ids]})

    return docs_ds.select_columns([id_col]).map_batches(
        label, batch_format="pyarrow")


def collapse_pairs(pairs_ds, n, a_col="ia", b_col="ib",
                   num_partitions=4, local_cc_limit=None):
    """Pair table → per-id cluster labels (smallest member id) via the
    engine's FastSV components — the shared finish of every near-dup
    clustering flavour (MinHash, SimHash, embedding). Auto-routes tiny
    pair graphs to the driver-local vectorized FastSV (the distributed
    engine's sort shuffle + actor spin-up is pure fixed overhead there);
    the pinned-actor engine takes over past ``local_cc_limit``."""
    from .._config import config as _cfg
    from .algorithms import (build_engine, connected_components,
                             connected_components_numpy)

    if local_cc_limit is None:
        local_cc_limit = _cfg["local_cc_limit"]
    pairs = pairs_ds.materialize()
    npairs = pairs.count()
    if npairs == 0:
        return np.arange(n, dtype=np.int64)
    if npairs <= local_cc_limit:
        t = pa.concat_tables(
            list(pairs.iter_batches(batch_format="pyarrow")),
            promote_options="permissive")
        return connected_components_numpy(
            t[a_col].to_numpy(zero_copy_only=False),
            t[b_col].to_numpy(zero_copy_only=False), n)

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch[a_col], "dst": batch[b_col],
            "val": np.ones(batch.num_rows, dtype=np.float64)})

    eng = build_engine(pairs.map_batches(as_edges, batch_format="pyarrow"),
                       n, num_partitions=num_partitions, undirected=True)
    f, _, _ = connected_components(eng)
    eng.shutdown()
    return f


def semantic_dedup(emb_ds, threshold=0.9, id_col="vec_id",
                   emb_col="embedding", num_partitions=4,
                   **neardup_kwargs):
    """SemDeDup (Abbas et al. 2023): drop documents that are SEMANTIC
    near-duplicates — same meaning, different surface form — keeping one
    representative per embedding-cosine cluster.

    Composition of existing scale paths: ``embedding_neardup_pairs``
    (k-means IVF buckets + within-bucket matmul above the brute limit,
    exact broadcast matmul below) emits cosine-≥threshold pairs; the
    pair graph — tiny next to the corpus — collapses to clusters through
    the engine's FastSV components (:func:`collapse_pairs`); the kept
    representative is each cluster's smallest id.

    Returns a Dataset ``(id_col, cluster, keep)`` — filter ``keep`` for
    the deduplicated corpus."""
    from .dedup import embedding_neardup_pairs

    mx = emb_ds.max(id_col)
    if mx is None:  # legitimately-empty corpus
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64()),
             "keep": pa.array([], pa.bool_())}))
    n = int(mx) + 1
    pairs = embedding_neardup_pairs(emb_ds, threshold=threshold,
                                    id_col=id_col, emb_col=emb_col,
                                    **neardup_kwargs)
    f = collapse_pairs(pairs, n, num_partitions=num_partitions)
    f_ref = ray.put(f)

    def label(batch: pa.Table) -> pa.Table:
        fv = ray.get(f_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: ids, "cluster": fv[ids],
                         "keep": fv[ids] == ids})

    return emb_ds.select_columns([id_col]).map_batches(
        label, batch_format="pyarrow")


def jaccard_dedup_groups(docs_ds, threshold=0.8, id_col="doc_id",
                         text_col="text", max_word_df=None,
                         num_partitions=4):
    """Near-duplicate TEXT clustering with exact semantics: the
    df-capped word-set Jaccard pair graph (``word_jaccard_pairs`` —
    SQL-replayable) collapses to canonical clusters through the
    engine's FastSV components (:func:`collapse_pairs`); the kept
    representative is each cluster's smallest id. The exact twin of
    :func:`semantic_dedup` for the lexical signal — the final
    "assign every document to its duplicate group" step of a
    dedup pipeline, under full oracle verification (the LSH pair set
    may legitimately MISS pairs, so the oracle-grade clustering rides
    the exact formulation; route MinHash pairs through
    :func:`collapse_pairs` directly for the at-scale variant).

    Returns ``(id_col, cluster, keep)``."""
    from .dedup import word_jaccard_pairs

    mx = docs_ds.max(id_col)
    if mx is None:
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64()),
             "keep": pa.array([], pa.bool_())}))
    n = int(mx) + 1
    pairs = word_jaccard_pairs(docs_ds, threshold=threshold,
                               text_col=text_col, id_col=id_col,
                               max_word_df=max_word_df)
    f = collapse_pairs(pairs, n, num_partitions=num_partitions)
    f_ref = ray.put(f)

    def label(batch: pa.Table) -> pa.Table:
        fv = ray.get(f_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: ids, "cluster": fv[ids],
                         "keep": fv[ids] == ids})

    return docs_ds.select_columns([id_col]).map_batches(
        label, batch_format="pyarrow")
