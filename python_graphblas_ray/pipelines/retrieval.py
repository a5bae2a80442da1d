"""Lexical retrieval: BM25 / TF-IDF top-k search over a document table.

The lexical counterpart to ``pipelines/similarity.py`` (embedding ANN):
given a handful of term queries, score every matching document with BM25
and return the top-k per query.

Scale shape (the part that matters at 100 TB):
- The corpus is tokenized ONCE in a streaming ``map_batches`` pass that
  immediately filters the (doc, term, tf) postings down to the QUERY
  vocabulary — only postings of query terms ever leave the map stage, so
  there is no full-corpus inverted-index shuffle (that's
  ``dedup.word_jaccard_pairs``'s job).
- Global corpus stats (N, avgdl) come from a cheap vectorized count
  (``\\S+`` regex matches per doc — no list materialization).
- Document frequencies for the few query terms are per-batch partials
  merged on the driver (bounded by |query vocab|).
- Scoring is a broadcast idf lookup inside ``map_batches``, then ONE
  small ``(qid, doc)`` grouped sum over matching postings, a per-batch
  local top-k, and a driver merge of ≤ k rows per (batch, query).

Scores are rounded to 6 decimals so results are reproducible across
summation orders (and match the DuckDB SQL oracle exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _query_vocab(queries: dict[str, str]) -> list[str]:
    vocab = set()
    for q in queries.values():
        vocab.update(w for w in q.split() if w)
    return sorted(vocab)


def _postings_stage(id_col, text_col, vocab):
    """map_batches fn: (doc_id, term, tf, dl) rows for query-vocab terms,
    plus ONE sentinel stats row per batch (``term`` null, ``tf`` = batch
    doc count, ``dl`` = batch token total) so N/avgdl come from the SAME
    tokenization in the SAME single pass over the corpus text."""
    vocab_arr = pa.array(vocab, type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        toks = pc.utf8_split_whitespace(texts)
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = pc.greater(pc.binary_length(flat), 0)
        keep_np = keep.to_numpy(zero_copy_only=False)
        did = np.repeat(np.arange(len(ids), dtype=np.int64),
                        counts)[keep_np]
        flat = flat.filter(keep)
        dl = np.bincount(did, minlength=len(ids))  # true doc lengths
        # restrict to query vocabulary BEFORE the expensive unique
        m = pc.is_in(flat, value_set=vocab_arr).to_numpy(
            zero_copy_only=False)
        did = did[m]
        enc = flat.filter(pa.array(m)).dictionary_encode()
        widx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = max(len(enc.dictionary), 1)
        packed, tf = np.unique(did * nv + widx, return_counts=True)
        u_did, u_widx = packed // nv, packed % nv
        post = pa.table({
            id_col: ids[u_did],
            "term": enc.dictionary.take(pa.array(u_widx)),
            "tf": pa.array(tf.astype(np.int64)),
            "dl": pa.array(dl[u_did].astype(np.int64)),
        })
        if len(ids) == 0:
            return post
        stats = pa.table({
            id_col: batch[id_col].slice(0, 1),
            "term": pa.array([None], type=pa.string()),
            "tf": pa.array([len(ids)], type=pa.int64()),
            "dl": pa.array([int(dl.sum())], type=pa.int64()),
        })
        return pa.concat_tables([post, stats])

    return fn


def corpus_stats(docs_ds, text_col="text"):
    """(N, avgdl): document count and mean whitespace-token count —
    the SAME ``utf8_split_whitespace`` + non-empty tokenization the
    postings stage uses (a regex ``\\S+`` count disagrees on Unicode
    whitespace), reduced to one partial row per batch."""

    def part(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        flat = pc.list_flatten(pc.utf8_split_whitespace(texts))
        n_tok = int(pc.sum(pc.greater(pc.binary_length(flat), 0)
                           .cast(pa.int64())).as_py() or 0)
        return pa.table({"n": pa.array([len(texts)], type=pa.int64()),
                         "s": pa.array([n_tok], type=pa.int64())})

    parts = docs_ds.select_columns([text_col]).map_batches(
        part, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    s = sum(p["s"] for p in parts)
    return int(n), (s / n if n else 0.0)


def bm25_topk(docs_ds, queries: dict[str, str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              round_to: int = 6) -> pa.Table:
    """BM25 top-k per query → ``(qid, doc_id, score)`` (score desc,
    ``doc_id`` tie-break). ``queries`` maps qid → whitespace-separated
    terms. idf = ln(1 + (N - df + 0.5) / (df + 0.5)) (Lucene form, never
    negative); tf component = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).
    """
    vocab = _query_vocab(queries)
    if not vocab:
        raise ValueError("queries contain no terms")
    raw = docs_ds.select_columns([id_col, text_col]).map_batches(
        _postings_stage(id_col, text_col, vocab),
        batch_format="pyarrow").materialize()

    # split the single pass's output: sentinel stats rows (term null)
    # vs real postings
    def stats_part(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch["term"]))

    def post_part(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch["term"]))

    N, sum_dl = 0, 0
    for r in raw.map_batches(stats_part, batch_format="pyarrow") \
               .take_all():
        N += r["tf"]
        sum_dl += r["dl"]
    avgdl = sum_dl / N if N else 0.0
    post = raw.map_batches(post_part, batch_format="pyarrow") \
              .materialize()

    # document frequency per query term: per-batch partials (bounded by
    # |vocab|) merged on the driver
    def df_part(batch: pa.Table) -> pa.Table:
        t = batch["term"].combine_chunks() if isinstance(
            batch["term"], pa.ChunkedArray) else batch["term"]
        enc = t.dictionary_encode()
        c = np.bincount(np.asarray(enc.indices),
                        minlength=len(enc.dictionary))
        return pa.table({"term": enc.dictionary,
                         "df": pa.array(c.astype(np.int64))})

    df = {}
    for row in post.map_batches(df_part, batch_format="pyarrow").take_all():
        df[row["term"]] = df.get(row["term"], 0) + row["df"]
    idf = {t: float(np.log1p((N - df.get(t, 0) + 0.5)
                             / (df.get(t, 0) + 0.5)))
           for t in vocab}

    # broadcast idf + query membership; score postings per query
    qids = sorted(queries)
    qterms = {q: set(w for w in queries[q].split() if w) for q in qids}

    def score(batch: pa.Table) -> pa.Table:
        tcol = batch["term"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        enc = tcol.dictionary_encode()
        cats = enc.dictionary.to_pylist()      # ≤ |query vocab|
        codes = np.asarray(enc.indices)
        tf = np.asarray(batch["tf"], dtype=np.float64)
        dl = np.asarray(batch["dl"], dtype=np.float64)
        ids = np.asarray(batch[id_col])
        w_idf = np.asarray([idf[c] for c in cats],
                           dtype=np.float64)[codes] if cats else \
            np.zeros(0)
        denom = tf + k1 * (1.0 - b + b * dl / (avgdl or 1.0))
        contrib = w_idf * tf * (k1 + 1.0) / denom
        out_q, out_d, out_s = [], [], []
        for q in qids:
            in_q = np.asarray([c in qterms[q] for c in cats], dtype=bool)
            m = in_q[codes] if cats else np.zeros(0, dtype=bool)
            if m.any():
                out_q.append(np.full(int(m.sum()), q, dtype=object))
                out_d.append(ids[m])
                out_s.append(contrib[m])
        if not out_q:
            return pa.table({"qid": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=batch[id_col].type),
                             "score": pa.array([], type=pa.float64())})
        return pa.table({"qid": pa.array(np.concatenate(out_q),
                                         type=pa.string()),
                         id_col: pa.array(np.concatenate(out_d)),
                         "score": pa.array(np.concatenate(out_s))})

    from ..stages.reduce import grouped_agg
    scored = grouped_agg(post.map_batches(score, batch_format="pyarrow"),
                         ["qid", id_col], [("score", "sum", "score")])

    # local top-k per (batch, qid), tiny driver merge
    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        q = np.asarray(batch["qid"].to_pylist(), dtype=object)
        d = np.asarray(batch[id_col])
        s = np.asarray(batch["score"], dtype=np.float64)
        _, codes = np.unique(q, return_inverse=True)
        order = np.lexsort((d, -s, codes))
        from ..stages.reduce import segments
        _, _, rank = segments(codes[order])
        return batch.take(pa.array(np.sort(order[rank < k])))

    rows = scored.map_batches(local_topk,
                              batch_format="pyarrow").take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    out_q, out_d, out_s = [], [], []
    for q in qids:
        cand = sorted(by_q.get(q, ()),
                      key=lambda r: (-r["score"], r[id_col]))[:k]
        for r in cand:
            out_q.append(q)
            out_d.append(r[id_col])
            out_s.append(round(float(r["score"]), round_to) + 0.0)
    return pa.table({"qid": pa.array(out_q, type=pa.string()),
                     id_col: pa.array(out_d),
                     "score": pa.array(out_s, type=pa.float64())})


def tfidf_topk(docs_ds, queries: dict[str, str], k: int = 10,
               id_col: str = "doc_id", text_col: str = "text",
               round_to: int = 6) -> pa.Table:
    """Plain TF-IDF (tf · Lucene-idf summed over query terms) top-k —
    BM25 in the k1→∞, b=0 limit where the saturation/length terms
    degenerate to raw tf. Same streaming shape as BM25."""
    return bm25_topk(docs_ds, queries, k=k, k1=1e9, b=0.0,
                     id_col=id_col, text_col=text_col, round_to=round_to)


def rrf_fuse(topk_table: pa.Table, quality_ds, k0: int = 60,
             id_col="doc_id", q_col="qid", score_col="score",
             quality_col="lm_score", round_to: int = 8) -> pa.Table:
    """Reciprocal-rank fusion (Cormack et al. 2009) of a per-query
    lexical top-k with a corpus-wide quality ranking — the hybrid
    retrieval/curation op (relevance × quality re-ranking):
    ``rrf = 1/(k0 + r_lex) + 1/(k0 + r_quality)``.

    - ``r_lex``: rank within the query's top-k by (ROUNDED score DESC,
      id) — ranking on the rounded score keeps the order replayable by
      an oracle that reproduces the rounded scores exactly.
    - ``r_quality``: the candidate's rank among ALL corpus docs by
      (quality DESC, id), computed WITHOUT a global sort: the
      O(k·|queries|) candidate list broadcasts once (``ray.put``) and
      ONE streaming pass over the quality dataset counts, per
      candidate, the docs that beat it (one vectorized batch×candidate
      comparison per batch; int64 partials sum on the driver) —
      rank = 1 + beat-count. The corpus never shuffles, never sorts,
      never materializes.
    """
    import ray

    if topk_table.num_rows == 0:  # empty corpus → no candidates
        return pa.table({q_col: pa.array([], pa.string()),
                         id_col: pa.array([], pa.int64()),
                         "rrf": pa.array([], pa.float64())})
    qv = np.asarray(topk_table[q_col].to_pylist(), dtype=object)
    dv = topk_table[id_col].to_numpy(zero_copy_only=False)
    sv = topk_table[score_col].to_numpy(zero_copy_only=False)

    # lexical rank within each query by (rounded score desc, id)
    _, qcodes = np.unique(qv, return_inverse=True)
    order = np.lexsort((dv, -sv, qcodes))
    from ..stages.reduce import segments
    _, _, within = segments(qcodes[order])
    r_lex = np.empty(len(dv), dtype=np.int64)
    r_lex[order] = within + 1

    # quality rank of each candidate among ALL docs, by beat-counting
    cand = np.unique(dv)
    cand_ref = ray.put(cand)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, ray.get(cand_ref))))

    picked = pa.concat_tables(
        list(quality_ds.map_batches(pick, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")),
        promote_options="permissive")
    pid = picked[id_col].to_numpy(zero_copy_only=False)
    pqs = picked[quality_col].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(cand, pid)
    cand_qs = np.empty(len(cand), dtype=np.float64)
    cand_qs[pos] = pqs
    pair_ref = ray.put((cand, cand_qs))

    def beats(batch: pa.Table) -> pa.Table:
        c_ids, c_qs = ray.get(pair_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        qs = batch[quality_col].to_numpy(zero_copy_only=False)
        gt = ((qs[None, :] > c_qs[:, None]) |
              ((qs[None, :] == c_qs[:, None]) &
               (ids[None, :] < c_ids[:, None]))).sum(axis=1)
        return pa.table({"c": [gt.astype(np.int64)]})

    beat = np.zeros(len(cand), dtype=np.int64)
    for b in quality_ds.map_batches(beats, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        c = b["c"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        beat += c.flatten().to_numpy(
            zero_copy_only=False).reshape(-1, len(cand)).sum(axis=0)
    r_qual = beat[np.searchsorted(cand, dv)] + 1

    rrf = 1.0 / (k0 + r_lex) + 1.0 / (k0 + r_qual)
    return pa.table({
        q_col: pa.array(list(qv), type=pa.string()),
        id_col: dv,
        "rrf": np.round(rrf, round_to) + 0.0,
    })
