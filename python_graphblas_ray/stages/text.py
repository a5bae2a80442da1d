"""Text-analysis stages for large-scale training-data pipelines.

All stages are actor-pool ``map_batches`` classes: regexes/tables compiled
ONCE per actor in ``__init__``, vectorized work per batch. Operate on the
``documents`` table ``(doc_id, text, lang, source, n_chars)``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Minimal public stopword lists per language (top function words).
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "je", "pas", "pour", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "por", "una", "para", "con"},
    "it": {"il", "la", "e", "che", "di", "non", "per", "una", "con", "sono"},
}


class TokenCounter:
    """Whitespace tokens + a BPE-ish sub-word estimate (len/4 heuristic on
    non-space chars, the public rule-of-thumb)."""

    def __init__(self):
        self.ws = re.compile(r"\S+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ws_counts = np.fromiter((len(self.ws.findall(t)) for t in texts),
                                dtype=np.int64, count=len(texts))
        nonspace = np.fromiter((sum(len(w) for w in self.ws.findall(t))
                                for t in texts), dtype=np.int64,
                               count=len(texts))
        bpe_est = (nonspace + 3) // 4
        return batch.append_column("ws_tokens", pa.array(ws_counts)) \
                    .append_column("bpe_tokens_est", pa.array(bpe_est))


class QualityScorer:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0, 1] (C4/Gopher-style heuristics, public recipes)."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.punct = re.compile(r"[.!?]")
        self.stop_en = _STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        length = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        words = [self.word.findall(t.lower()) for t in texts]
        n_words = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
        mean_wlen = np.fromiter(
            ((sum(len(x) for x in w) / len(w)) if w else 0.0 for w in words),
            dtype=np.float64, count=n)
        punct = np.fromiter((len(self.punct.findall(t)) for t in texts),
                            dtype=np.int64, count=n)
        stop_ratio = np.fromiter(
            ((sum(1 for x in w if x in self.stop_en) / len(w)) if w else 0.0
             for w in words), dtype=np.float64, count=n)
        punct_ratio = punct / np.maximum(length, 1)
        score = (np.clip(n_words / 100.0, 0, 1) * 0.4
                 + np.clip(stop_ratio / 0.4, 0, 1) * 0.3
                 + np.clip(mean_wlen / 8.0, 0, 1) * 0.3)
        out = batch
        for name, arr in [("q_len", length), ("q_words", n_words),
                          ("q_mean_word_len", mean_wlen),
                          ("q_punct_ratio", punct_ratio),
                          ("q_stop_ratio", stop_ratio),
                          ("quality_score", score)]:
            out = out.append_column(name, pa.array(arr))
        return out


class LangId:
    """N-gram/stopword-vote language id over the stopword tables — a
    heuristic classifier (no external models). Emits ``lang_pred`` and a
    confidence = vote margin."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Zäöüéèêàìí]+")
        self.tables = {k: v for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds, confs = [], []
        for t in texts:
            ws = self.word.findall(t.lower())
            votes = {lang: sum(1 for w in ws if w in tbl)
                     for lang, tbl in self.tables.items()}
            best = max(votes, key=lambda k: (votes[k], -ord(k[0])))
            total = sum(votes.values())
            preds.append(best if total else "und")
            confs.append(votes[best] / total if total else 0.0)
        return batch.append_column("lang_pred", pa.array(preds)) \
                    .append_column("lang_conf", pa.array(confs, pa.float64()))


class Fingerprinter:
    """Rolling-hash document fingerprint (Rabin-Karp over bytes, window 8)
    → 64-bit content fingerprint + winnowed min-sample; deterministic."""

    B = 257
    MOD = (1 << 61) - 1

    def __init__(self, window=8):
        self.window = window

    def _rolling(self, data: bytes) -> np.ndarray:
        if len(data) < self.window:
            data = data + b"\x00" * (self.window - len(data))
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        n = len(arr) - self.window + 1
        with np.errstate(over="ignore"):
            h = np.zeros(n, dtype=np.int64)
            acc = 0
            for k in range(self.window):  # window is tiny constant (8)
                acc = (acc * self.B + int(arr[k])) % self.MOD
            h[0] = acc
            if n > 1:
                pw = pow(self.B, self.window - 1, self.MOD)
                prev = acc
                lead = arr[: n - 1]
                trail = arr[self.window:]
                for i in range(1, n):  # per-byte loop bounded by doc length
                    prev = ((prev - int(lead[i - 1]) * pw) * self.B
                            + int(trail[i - 1])) % self.MOD
                    h[i] = prev
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        fps = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = self._rolling(t.encode("utf-8"))
            fps[i] = int(h.min()) if len(h) else 0
        return batch.append_column("fingerprint", pa.array(fps))


class HashingEmbedder:
    """Deterministic text → dense vector via feature hashing (the public
    'hashing trick'): each token hashes to a dimension and a ±1 sign;
    the vector is the L2-normalized signed bag-of-words. No model files —
    the stand-in for a learned embedder with identical Ray plumbing
    (actor-pool stage, list<float> output column ready for ANN / near-dup
    cosine stages)."""

    def __init__(self, dim=64, text_col="text"):
        self.dim = int(dim)
        self.text_col = text_col

    @staticmethod
    def _h(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h ^= b
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        word_lists = [t.split() for t in texts]
        lens = np.fromiter((len(w) for w in word_lists), dtype=np.int64,
                           count=len(word_lists))
        out = np.zeros((len(texts), self.dim))
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            flat = [w for i in nonempty for w in word_lists[i]]
            H = np.fromiter((self._h(w) for w in flat), dtype=np.uint64,
                            count=len(flat))
            dims = (H % np.uint64(self.dim)).astype(np.int64)
            signs = np.where((H >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
            doc_idx = np.repeat(nonempty, lens[nonempty])
            np.add.at(out, (doc_idx, dims), signs)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        out = out / np.maximum(norms, 1e-30)
        cols = {c: batch[c] for c in batch.column_names}
        cols["embedding"] = pa.array(
            [row.astype(np.float32).tolist() for row in out],
            type=pa.list_(pa.float32()))
        return pa.table(cols)


class RepetitionScorer:
    """Gopher/MassiveText-style intra-document repetition metrics
    (Rae et al. 2021, table A1 public rules): per doc, the fraction of
    duplicate words, the top-word fraction, and the fraction of
    duplicate word bigrams — the standard "remove repetitious documents"
    quality gate for LLM training corpora.

    Fully vectorized: ONE whitespace tokenize + FNV-1a hash pass per
    batch (shared with the dedup stages), then segment-sorted run-length
    counting over (doc, token-hash) — no per-doc Python loop. Bigram
    hashes reuse the shingle chain (`splitmix64(h_i ^ splitmix64(h))`),
    so boundary positions between docs are excluded by construction.
    """

    def __init__(self):
        from ..pipelines.dedup import (_ranges, _splitmix64,
                                       _tokenize_hashes)
        self._tokenize = _tokenize_hashes
        self._splitmix = _splitmix64
        self._ranges = _ranges

    @staticmethod
    def _uniq_top_per_seg(vals, seg, n):
        """(#distinct values, max multiplicity) per segment, vectorized."""
        uniq = np.zeros(n, dtype=np.int64)
        top = np.zeros(n, dtype=np.int64)
        if len(vals):
            order = np.lexsort((vals, seg))
            vs, ss = vals[order], seg[order]
            new = np.ones(len(vs), dtype=bool)
            new[1:] = (vs[1:] != vs[:-1]) | (ss[1:] != ss[:-1])
            run_ids = np.cumsum(new) - 1
            run_counts = np.bincount(run_ids)
            run_seg = ss[new]
            uniq = np.bincount(run_seg, minlength=n)
            np.maximum.at(top, run_seg, run_counts)
        return uniq, top

    def __call__(self, batch: pa.Table) -> pa.Table:
        wh, offs = self._tokenize(batch["text"])
        n = batch.num_rows
        counts = offs[1:] - offs[:-1]
        seg = np.repeat(np.arange(n, dtype=np.int64), counts)
        uniq, top = self._uniq_top_per_seg(wh, seg, n)
        total = counts.astype(np.float64)
        safe = np.maximum(counts, 1).astype(np.float64)
        dup_word_frac = np.where(counts > 0, 1.0 - uniq / safe, 0.0)
        top_word_frac = np.where(counts > 0, top / safe, 0.0)
        # bigram chain hashes; valid starts are within-doc only
        bc = np.maximum(counts - 1, 0)
        chain1 = self._splitmix(wh)
        chain2 = (self._splitmix(wh[:len(chain1) - 1] ^ chain1[1:])
                  if len(chain1) > 1 else np.array([], dtype=np.uint64))
        pos = np.repeat(offs[:-1], bc) + self._ranges(bc)
        bseg = np.repeat(np.arange(n, dtype=np.int64), bc)
        buniq, _ = self._uniq_top_per_seg(chain2[pos], bseg, n)
        bsafe = np.maximum(bc, 1).astype(np.float64)
        dup_bigram_frac = np.where(bc > 0, 1.0 - buniq / bsafe, 0.0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "words": counts,
            "dup_word_frac": dup_word_frac,
            "top_word_frac": top_word_frac,
            "dup_bigram_frac": dup_bigram_frac,
        })


class PIIRedactor:
    """Regex PII scrubbing (emails → ``<EMAIL>``, IPv4 → ``<IP>``,
    phone-like digit runs → ``<PHONE>``) — the standard redaction stage
    of a training-data pipeline. Patterns are RE2-compatible and applied
    in a fixed order (emails first: they contain dots and digits that
    the later patterns would chew up), each with a per-doc match count,
    entirely in Arrow kernels (``replace_substring_regex`` /
    ``count_substring_regex``) — no Python row loop.
    """

    # (count column, RE2 pattern, replacement) — applied in order
    PATTERNS = (
        ("n_email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
         "<EMAIL>"),
        ("n_ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
        ("n_phone", r"\+?\d[\d\-\s()]{7,}\d", "<PHONE>"),
    )

    def __init__(self, text_col="text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        counts = {}
        for col, pat, repl in self.PATTERNS:
            counts[col] = pc.count_substring_regex(texts, pat)
            texts = pc.replace_substring_regex(texts, pat,
                                               replacement=repl)
        out = {c: batch[c] for c in batch.column_names}
        out[self.text_col] = texts
        out.update(counts)
        return pa.table(out)


def redact_pii(docs_ds, text_col="text", concurrency=4):
    """documents → text with PII placeholders + per-type match counts
    (``n_email``, ``n_ip``, ``n_phone``)."""
    return docs_ds.map_batches(PIIRedactor,
                               fn_constructor_kwargs=dict(
                                   text_col=text_col),
                               batch_format="pyarrow",
                               concurrency=(1, concurrency),
                               batch_size=4096)


def repetition_score(docs_ds, concurrency=4):
    """documents → (doc_id, words, dup_word_frac, top_word_frac,
    dup_bigram_frac) — the Gopher repetition-rule inputs."""
    return docs_ds.map_batches(RepetitionScorer, batch_format="pyarrow",
                               concurrency=(1, concurrency),
                               batch_size=4096)


def embed_text(docs_ds, dim=64, concurrency=4, batch_size=2048):
    """documents → + embedding column (feature-hashing embedder)."""
    return docs_ds.map_batches(
        HashingEmbedder, fn_constructor_kwargs=dict(dim=dim),
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=batch_size)


def token_count(docs_ds, concurrency=4):
    return docs_ds.map_batches(TokenCounter, batch_format="pyarrow",
                               concurrency=(1, concurrency), batch_size=4096)


def quality_score(docs_ds, concurrency=4):
    return docs_ds.map_batches(QualityScorer, batch_format="pyarrow",
                               concurrency=(1, concurrency), batch_size=4096)


def lang_id(docs_ds, concurrency=4):
    return docs_ds.map_batches(LangId, batch_format="pyarrow",
                               concurrency=(1, concurrency), batch_size=4096)


def fingerprint(docs_ds, concurrency=4):
    return docs_ds.map_batches(Fingerprinter, batch_format="pyarrow",
                               concurrency=(1, concurrency), batch_size=2048)


# ---------------------------------------------------------------------------
# n-gram language-model quality scoring (CCNet-style, Wenzek et al. 2020:
# score each document by a reference n-gram LM and gate on perplexity)
# ---------------------------------------------------------------------------

def _bigram_chain(wh: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Order-sensitive bigram hashes ``splitmix64(h2 ^ splitmix64(h1))``
    for every in-document adjacent pair; doc boundaries excluded by
    construction (pairs are formed inside each offset segment)."""
    from ..pipelines.dedup import _splitmix64

    if len(wh) == 0:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    counts = np.diff(offsets)
    # positions whose successor is in the same doc
    pos = np.arange(len(wh), dtype=np.int64)
    last = np.repeat(offsets[1:] - 1, counts)  # per-token: its doc's last
    keep = pos < last
    h1 = wh[keep]
    h2 = wh[pos[keep] + 1]
    bg = _splitmix64(h2 ^ _splitmix64(h1))
    did = np.repeat(np.arange(len(counts), dtype=np.int64), counts)[keep]
    return bg, did


class _NgramCountPartial:
    """Per-batch combiner: (kind, key, cnt) partial counts — kind 0 =
    unigram token hash, kind 1 = bigram chain hash. Emits one row per
    distinct key per batch, so the downstream aggregate is bounded by
    vocab × blocks, never corpus size."""

    def __init__(self, text_col="text"):
        from ..pipelines.dedup import _tokenize_hashes
        self._tok = _tokenize_hashes
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        wh, offsets = self._tok(batch[self.text_col])
        bg, _ = _bigram_chain(wh, offsets)
        u_keys, u_cnt = np.unique(wh, return_counts=True)
        b_keys, b_cnt = np.unique(bg, return_counts=True)
        return pa.table({
            "kind": np.concatenate([np.zeros(len(u_keys), dtype=np.int8),
                                    np.ones(len(b_keys), dtype=np.int8)]),
            "key": np.concatenate([u_keys, b_keys]).astype(np.uint64),
            "cnt": np.concatenate([u_cnt, b_cnt]).astype(np.int64)})


def ngram_lm_fit(docs_ds, text_col="text", min_count=1):
    """Train a Laplace-smoothed bigram LM over the corpus: EXACT unigram
    and bigram counts via per-batch combiners + one vocab-bounded grouped
    sum (`grouped_agg`) — the corpus itself is never shuffled.

    Returns a model dict of SORTED flat arrays (searchsorted-ready,
    ``ray.put``-broadcastable): ``u_keys/u_cnt`` (unigrams),
    ``b_keys/b_cnt`` (bigrams), ``vocab`` (#distinct unigrams BEFORE
    pruning — the smoothing denominator). ``min_count`` prunes rare
    n-grams from the broadcast model (at 100 TB the full bigram table
    outgrows a node; pruned entries fall back to the smoothing floor,
    which only LOWERS their probability — the standard truncated-LM
    tradeoff)."""
    from .reduce import grouped_agg

    partials = docs_ds.map_batches(
        _NgramCountPartial, fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pyarrow", concurrency=(1, 8), batch_size=4096)
    counts = grouped_agg(partials, ["kind", "key"],
                         [("cnt", "sum", "cnt")])
    batches = [b for b in counts.iter_batches(batch_format="pyarrow",
                                              batch_size=None)
               if b.num_rows]
    if not batches:  # legitimately-empty corpus → empty (floor-only) LM
        z64 = np.array([], dtype=np.uint64)
        zi = np.array([], dtype=np.int64)
        return {"vocab": 0, "u_keys": z64, "u_cnt": zi,
                "b_keys": z64.copy(), "b_cnt": zi.copy()}
    t = pa.concat_tables(batches)
    kind = t["kind"].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    cnt = t["cnt"].to_numpy(zero_copy_only=False)
    model = {}
    for k, pre in ((0, "u"), (1, "b")):
        m = kind == k
        keys, cs = key[m], cnt[m]
        if k == 0:
            model["vocab"] = int(len(keys))
        if min_count > 1:
            keep = cs >= min_count
            keys, cs = keys[keep], cs[keep]
        order = np.argsort(keys)
        model[f"{pre}_keys"] = keys[order]
        model[f"{pre}_cnt"] = cs[order]
    return model


class _LMScorer:
    """Actor-pool scoring stage: model arrays resolved from the object
    store ONCE per actor; per batch one tokenize + two searchsorted
    lookups. Score = mean over bigrams of
    ``ln((c2 + 1) / (c1 + vocab))`` (Laplace), rounded to 8 decimals so
    a SQL oracle reproduces it; empty/1-token docs score 0."""

    def __init__(self, model_ref, text_col="text"):
        import ray

        model = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.m = model
        from ..pipelines.dedup import _tokenize_hashes
        self._tok = _tokenize_hashes
        self.text_col = text_col

    @staticmethod
    def _lookup(keys_sorted, cnts, q):
        if len(keys_sorted) == 0:
            return np.zeros(len(q), dtype=np.int64)
        idx = np.clip(np.searchsorted(keys_sorted, q), 0,
                      len(keys_sorted) - 1)
        return np.where(keys_sorted[idx] == q, cnts[idx], 0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        wh, offsets = self._tok(batch[self.text_col])
        bg, did = _bigram_chain(wh, offsets)
        n = len(batch)
        c2 = self._lookup(self.m["b_keys"], self.m["b_cnt"], bg)
        # context = the FIRST token of each bigram (same positions kept
        # by _bigram_chain)
        counts = np.diff(offsets)
        pos = np.arange(len(wh), dtype=np.int64)
        last = np.repeat(offsets[1:] - 1, counts)
        c1 = self._lookup(self.m["u_keys"], self.m["u_cnt"],
                          wh[pos < last])
        lp = np.log((c2 + 1.0) / (c1 + float(self.m["vocab"])))
        s = np.zeros(n)
        np.add.at(s, did, lp)
        nb = np.bincount(did, minlength=n)
        score = np.where(nb > 0, s / np.maximum(nb, 1), 0.0)
        return pa.table({"doc_id": batch["doc_id"],
                         "lm_score": np.round(score, 8) + 0.0})


def ngram_lm_score(docs_ds, model, text_col="text", concurrency=8):
    """documents → (doc_id, lm_score): mean Laplace bigram log-prob under
    ``model`` (from :func:`ngram_lm_fit`). The model rides the object
    store once (``ray.put``); each actor resolves it in ``__init__``."""
    import ray

    ref = ray.put(model)
    return docs_ds.map_batches(
        _LMScorer, fn_constructor_kwargs=dict(model_ref=ref,
                                              text_col=text_col),
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=4096)


def ccnet_buckets(docs_ds, model=None, text_col="text", id_col="doc_id",
                  cuts=(1.0 / 3, 2.0 / 3), cap=1 << 17):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score each
    doc under the bigram LM, cut the score distribution at ``cuts``
    (tertiles by default) and label ``tail`` (worst) / ``middle`` /
    ``head`` (best — CCNet keeps head+middle for training). The cut
    values come from the mergeable quantile sketch (exact when ``cap``
    covers the corpus — the oracle regime; fixed memory beyond), so the
    whole operator is two streaming passes + one O(1) broadcast.

    Returns a Dataset ``(id_col, lm_score, bucket)``."""
    import ray

    from ..stages.sketch import quantile_query, quantile_sketch

    if model is None:
        model = ngram_lm_fit(docs_ds, text_col=text_col)
    scored = ngram_lm_score(docs_ds, model, text_col=text_col).materialize()
    vals, wts, total = quantile_sketch(scored, "lm_score", cap=cap)
    qcuts = quantile_query(vals, wts, total, list(cuts))
    names = np.array(["tail", "middle", "head"], dtype=object)
    c_ref = ray.put(qcuts)

    def label(batch: pa.Table) -> pa.Table:
        cs = ray.get(c_ref)
        s = batch["lm_score"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cs, s, side="left")  # s < cut → below it
        return batch.append_column(
            "bucket", pa.array(names[np.clip(idx, 0, len(names) - 1)],
                               type=pa.string()))

    return scored.map_batches(label, batch_format="pyarrow")


def type_token_ratio(docs_ds, text_col="text", id_col="doc_id"):
    """Lexical diversity (type-token ratio): distinct whitespace tokens
    ÷ total tokens per document — the Gopher-style repetition/quality
    signal next to ``repetition_score`` (templated or keyword-stuffed
    pages score low, prose high). One Arrow RE2 ``split_pattern_regex``
    pass per batch (byte-matched by DuckDB ``string_split_regex``), then
    a fully vectorized per-batch distinct count: lexsort (doc, token) +
    first-occurrence mask + bincount — no per-row Python. Docs with no
    tokens (null/whitespace-only text) get 0.0.

    Emits ``(id_col, ttr float64)`` rounded to 8 decimals."""
    import pyarrow.compute as pc

    def ttr(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.fill_null(texts, ""), r"\s+")
        words = lists.flatten().to_numpy(zero_copy_only=False)
        counts = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        doc = np.repeat(np.arange(len(counts)), counts)
        keep = words != ""
        words, doc = words[keep], doc[keep]
        n = np.bincount(doc, minlength=len(ids)).astype(np.float64)
        order = np.lexsort((words, doc))
        dw, dd = words[order], doc[order]
        first = np.empty(len(dw), dtype=bool)
        if len(dw):
            first[0] = True
            first[1:] = (dd[1:] != dd[:-1]) | (dw[1:] != dw[:-1])
        d = np.bincount(dd[first], minlength=len(ids)).astype(np.float64)
        out = np.zeros(len(ids), dtype=np.float64)
        nz = n > 0
        out[nz] = np.round(d[nz] / n[nz], 8) + 0.0
        return pa.table({id_col: ids, "ttr": out})

    return docs_ds.map_batches(ttr, batch_format="pyarrow")


def readability(docs_ds, text_col="text", id_col="doc_id",
                round_to=6):
    """Flesch reading-ease per document — the classic readability
    quality signal (Flesch 1948; a Gopher-style filter axis):
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`` with
    the standard heuristics: words = ``\\S+`` runs, sentences =
    ``[.!?]+`` runs (min 1), syllables = ``[aeiouyAEIOUY]+`` vowel
    groups. All three counts are ONE Arrow RE2 kernel each over the
    whole batch (``count_substring_regex`` — no Python row loop), and
    each has a byte-identical DuckDB ``regexp_extract_all`` twin, so
    the rounded score is cell-exactly oracle-replayable (half-AWAY
    rounding, matching DuckDB ROUND — banker's ``np.round`` would
    diverge on exact half-grain ties). Empty docs score 0. Returns
    ``(id_col, flesch)``."""

    def _round_half_away(x, k):
        p = 10.0 ** k
        # + 0.0 pins -0.0 to +0.0 (the driver hashes the sign bit)
        return np.copysign(np.floor(np.abs(x) * p + 0.5) / p, x) + 0.0

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        w = pc.count_substring_regex(texts, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = pc.count_substring_regex(texts, r"[.!?]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        syl = pc.count_substring_regex(
            texts, r"[aeiouyAEIOUY]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        score = np.where(
            w > 0,
            206.835 - 1.015 * (w / np.maximum(s, 1.0))
            - 84.6 * (syl / np.maximum(w, 1.0)),
            0.0)
        return pa.table({
            id_col: batch[id_col],
            "flesch": _round_half_away(score, round_to),
        })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096)


def char_entropy(docs_ds, text_col="text", id_col="doc_id",
                 round_to=8):
    """Character-level Shannon entropy per document (nats) — the
    classic gibberish / encoding-noise quality axis (low-entropy docs
    are repeated boilerplate, high-entropy docs are binary junk).

    Vectorized: the batch's texts concatenate once into a UTF-32
    codepoint array; per-(doc, char) counts come from ONE ``np.unique``
    over packed (doc, codepoint) keys — no per-row Python loop. H =
    Σ −(c/n)·ln(c/n) with the identical per-term double-op order as
    the DuckDB twin, round-8 over summation-order noise. Empty docs
    score 0. Returns ``(id_col, entropy)``."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        joined = "".join(texts.to_pylist())
        cp = np.frombuffer(
            joined.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64)
        did = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        out = np.zeros(len(lens))
        if len(cp):
            key = did * (1 << 21) + cp  # codepoints < 2^21
            uk, cnt = np.unique(key, return_counts=True)
            ud = uk >> 21
            n = lens[ud].astype(np.float64)
            p = cnt / n
            np.add.at(out, ud, -p * np.log(p))
        return pa.table({id_col: batch[id_col],
                         "entropy": np.round(out, round_to) + 0.0})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096)


def blocklist_hits(docs_ds, blocklist, text_col="text", id_col="doc_id"):
    """Safety/blocklist filter counts: per document, the number of
    whole-word occurrences of any blocklist term — the word-list
    screening stage of a curation pipeline (flag = ``n_hits > 0``).
    The list compiles ONCE into a single alternation RE2 pattern
    (``\\b(t1|t2|…)\\b``) evaluated by one Arrow kernel per batch; a
    DuckDB ``regexp_extract_all`` twin replays it byte-identically.
    Returns ``(id_col, n_hits)`` for EVERY document (zeros included —
    the caller filters), so drop decisions stay auditable."""
    pat = r"\b(" + "|".join(re.escape(t) for t in sorted(blocklist)) \
        + r")\b"

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        hits = pc.count_substring_regex(texts, pat)
        return pa.table({id_col: batch[id_col],
                         "n_hits": hits.cast(pa.int64())})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096)


def chunk_windows(docs_ds, window=64, stride=48, id_col="doc_id",
                  text_col="text"):
    """Fixed token-window chunk boundaries with overlap — the
    context-window packing prep step (split every document into
    ``window``-token training chunks advancing by ``stride``, so
    consecutive chunks share ``window − stride`` tokens of context).

    Chunk ``j`` of a doc with ``n`` whitespace tokens covers the token
    span ``[j·stride, min(j·stride + window, n))`` for every
    ``j·stride < n`` — ceil(n/stride) chunks per non-empty doc, none
    for empty docs; the trailing chunk may be short. Emits boundaries
    ``(doc_id, chunk, start, len)`` rather than sliced text: ONE
    vectorized Arrow RE2 token-count kernel + np.repeat/arange
    expansion per batch, no per-doc Python (the actual slice runs in
    whatever downstream actor consumes the chunk — tokenizer, packer —
    against the boundary table)."""
    import pyarrow.compute as pc

    def chunks(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.fill_null(batch[text_col], ""), r"\S+").to_numpy(
                zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        k = -(-n // stride)  # ceil(n / stride); 0 stays 0
        tot = int(k.sum())
        doc = np.repeat(ids, k)
        nn = np.repeat(n, k)
        seg0 = np.concatenate([[0], np.cumsum(k)[:-1]])
        j = np.arange(tot, dtype=np.int64) - np.repeat(seg0, k)
        start = j * stride
        return pa.table({"doc_id": doc, "chunk": j, "start": start,
                         "len": np.minimum(window, nn - start)})

    return docs_ds.map_batches(chunks, batch_format="pyarrow")


def pack_offsets(docs_ds, budget=256, id_col="doc_id", text_col="text"):
    """Global concat-and-chunk sequence packing layout (the GPT-style
    pretraining packer: concatenate every document's tokens in doc-id
    order, then cut fixed ``budget``-token training sequences): each
    doc's global token offset comes from the distributed
    :func:`~python_graphblas_ray.stages.exchange.ordered_prefix_sum`
    SCAN, and the doc spans sequences ``off // budget`` through
    ``(off + n - 1) // budget``. Complements :func:`chunk_windows`
    (per-doc overlapping windows) and ``pipelines.sampling
    .pack_sequences`` (within-shard first-fit): this is the layout
    where sequences CROSS document boundaries and nothing is padded.

    Pure integer arithmetic end to end — bit-exact vs a SQL window-sum
    twin at any partition count or block order. Empty docs occupy no
    tokens and emit no row. Returns
    ``(doc_id, n_tokens, offset, first_seq, last_seq)``."""
    import pyarrow.compute as pc

    from .exchange import ordered_prefix_sum

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.fill_null(batch[text_col], ""), r"\S+").to_numpy(
                zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: batch[id_col], "n_tokens": n})

    off = ordered_prefix_sum(
        docs_ds.select_columns([id_col, text_col]).map_batches(
            counts, batch_format="pyarrow"),
        id_col, "n_tokens", out_col="offset")

    def spans(batch: pa.Table) -> pa.Table:
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        o = batch["offset"].to_numpy(zero_copy_only=False)
        keep = n > 0
        n, o = n[keep], o[keep]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table({id_col: ids, "n_tokens": n, "offset": o,
                         "first_seq": o // budget,
                         "last_seq": (o + n - 1) // budget})

    return off.map_batches(spans, batch_format="pyarrow")


def zipf_slope(docs_ds, text_col="text", top_n=100):
    """Zipf-law slope of the corpus term-frequency distribution: the
    least-squares slope of ``ln(count)`` on ``ln(rank)`` over the top
    ``top_n`` terms (rank = 1-based position in the deterministic
    ``(count DESC, term)`` order) — the dataset-card readout for
    "does this corpus look like natural language?" (web text sits
    near −1; templated/log spam flattens, deduped boilerplate
    steepens).

    Scale shape: the corpus collapses to its word-frequency vocabulary
    in ONE streaming pass (``bpe.word_counts`` — per-batch Arrow
    dictionary-encode + bincount partials, vocab-bounded); each vocab
    block then emits only its own top-``top_n`` candidate cut (the
    global top-n is contained in the union of per-block top-ns since
    rows are unique per word), so the driver never sees more than
    ``top_n × #blocks`` rows.

    Determinism: ranking ties break on the term string; the slope is
    the fixed formula ``(n·Σxy − Σx·Σy) / (n·Σxx − Σx²)``; callers
    wanting oracle comparison round to 8 decimals (SQL SUM order is
    unspecified). Degenerate corpora (n < 2 terms or zero variance)
    pin slope = 0.0. Returns a 1-row table ``(n_terms, slope)``."""
    from ..pipelines.bpe import word_counts

    counts = word_counts(docs_ds, text_col=text_col)

    def block_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cnt" not in batch.column_names:
            return pa.table({"w": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        w = np.asarray(batch["w"].to_pylist(), dtype=object)
        order = np.lexsort((w, -c))[:top_n]
        return pa.table({"w": pa.array(w[order].tolist(), pa.string()),
                         "cnt": pa.array(c[order], pa.int64())})

    tabs = [b for b in counts.map_batches(
                block_top, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None)
            if b.num_rows]
    if tabs:
        t = pa.concat_tables(tabs, promote_options="permissive")
        c = t["cnt"].to_numpy(zero_copy_only=False)
        w = np.asarray(t["w"].to_pylist(), dtype=object)
        order = np.lexsort((w, -c))[:top_n]
        c = c[order].astype(np.float64)
    else:
        c = np.array([], dtype=np.float64)
    n = len(c)
    slope = 0.0
    if n >= 2:
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(c)
        den = n * np.sum(x * x) - np.sum(x) * np.sum(x)
        if den > 0:
            slope = (n * np.sum(x * y) - np.sum(x) * np.sum(y)) / den
    return pa.table({"n_terms": pa.array([n], pa.int64()),
                     "slope": pa.array([slope], pa.float64())})


def heaps_fit(docs_ds, id_col="doc_id", text_col="text",
              n_checkpoints=16):
    """Heaps'-law vocabulary-growth fit ``V(T) ≈ K·T^β``: the
    dataset-card readout for "is the corpus still yielding new
    vocabulary?" (natural web text sits near β ≈ 0.5; heavily deduped
    or templated corpora flatten, OCR noise inflates). The growth
    curve is sampled at ``n_checkpoints`` doc-id thresholds
    ``th_i = (max_id·(i+1)) // n_checkpoints``: ``T_i`` = total
    whitespace tokens of docs with id ≤ th_i, ``V_i`` = distinct terms
    whose FIRST occurrence (min doc id) is ≤ th_i; β is the
    least-squares slope of ``ln V`` on ``ln T`` over the positive
    checkpoints.

    Scale shape: one max-reduction over the id column, ONE streaming
    token-count pass emitting per-block ``n_checkpoints``-bin
    histograms, and ONE vocab-bounded grouped-min exchange for the
    first occurrences (each block pre-collapses to its distinct terms
    — the ``word_counts`` posture) finished by a second tiny bucketed
    count; the O(n_checkpoints) fit runs on the driver.

    Determinism: thresholds, T and V are pure integers (bit-exact at
    any partition count); β is the fixed ``(m·Σxy − Σx·Σy)/(m·Σxx −
    Σx²)`` formula — callers comparing against a SQL twin round to 8
    decimals (SUM order is unspecified). Degenerate corpora (<2
    positive checkpoints or zero variance) pin β = 0.0. Returns
    ``(ck, tokens, vocab, beta)`` — one row per checkpoint, β repeated
    — or 0 rows for an empty corpus."""
    from ..stages.reduce import grouped_agg

    empty = pa.table({"ck": pa.array([], pa.int64()),
                      "tokens": pa.array([], pa.int64()),
                      "vocab": pa.array([], pa.int64()),
                      "beta": pa.array([], pa.float64())})

    def id_max(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([int(ids.max())], pa.int64())})

    mx = None
    for b in docs_ds.select_columns([id_col]).map_batches(
            id_max, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
        if b.num_rows and "m" in b.column_names:
            bm = int(b["m"].to_numpy(zero_copy_only=False).max())
            mx = bm if mx is None else max(mx, bm)
    if mx is None:
        return empty
    k = n_checkpoints
    th = (mx * (np.arange(1, k + 1, dtype=np.int64))) // k

    def tok_hist(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.fill_null(batch[text_col], ""), r"\S+").to_numpy(
                zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bins = np.searchsorted(th, ids, side="left")
        return pa.table({"ck": np.arange(k, dtype=np.int64),
                         "t": np.bincount(bins, weights=n,
                                          minlength=k)
                         .astype(np.int64)})

    tok = np.zeros(k, dtype=np.int64)
    for b in docs_ds.select_columns([id_col, text_col]).map_batches(
            tok_hist, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
        if b.num_rows and "t" in b.column_names:
            np.add.at(tok, b["ck"].to_numpy(zero_copy_only=False),
                      b["t"].to_numpy(zero_copy_only=False))

    def first_partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(texts, ""), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(
            zero_copy_only=False)
        ids = batch[id_col].to_numpy(
            zero_copy_only=False)[parent[keep]]
        enc = flat.filter(pa.array(keep)).dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        fd = np.full(len(enc.dictionary), np.iinfo(np.int64).max,
                     dtype=np.int64)
        np.minimum.at(fd, idx, ids)
        return pa.table({"w": enc.dictionary,
                         "fd": pa.array(fd, pa.int64())})

    firsts = grouped_agg(
        docs_ds.select_columns([id_col, text_col]).map_batches(
            first_partial, batch_format="pyarrow", batch_size=4096),
        ["w"], [("fd", "min", "fd")])

    def voc_hist(batch: pa.Table) -> pa.Table:
        fd = batch["fd"].to_numpy(zero_copy_only=False)
        bins = np.searchsorted(th, fd, side="left")
        return pa.table({"ck": np.arange(k, dtype=np.int64),
                         "v": np.bincount(bins, minlength=k)
                         .astype(np.int64)})

    voc = np.zeros(k, dtype=np.int64)
    for b in firsts.map_batches(
            voc_hist, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
        if b.num_rows and "v" in b.column_names:
            np.add.at(voc, b["ck"].to_numpy(zero_copy_only=False),
                      b["v"].to_numpy(zero_copy_only=False))

    T = np.cumsum(tok)
    V = np.cumsum(voc)
    pos = (T > 0) & (V > 0)
    beta = 0.0
    m = int(pos.sum())
    if m >= 2:
        x = np.log(T[pos].astype(np.float64))
        y = np.log(V[pos].astype(np.float64))
        den = m * np.sum(x * x) - np.sum(x) * np.sum(x)
        if den > 0:
            beta = float((m * np.sum(x * y) - np.sum(x) * np.sum(y))
                         / den)
    return pa.table({"ck": pa.array(np.arange(k, dtype=np.int64)),
                     "tokens": pa.array(T, pa.int64()),
                     "vocab": pa.array(V, pa.int64()),
                     "beta": pa.array(np.full(k, beta), pa.float64())})


def js_source_divergence(docs_ds, text_col="text", source_col="source"):
    """Pairwise Jensen-Shannon divergence between the unigram
    term distributions of every source pair — the dataset-card "which
    crawl sources have divergent content profiles?" readout (0 =
    identical mix, ln 2 ≈ 0.693 = disjoint vocabularies; mixture
    weighting decisions key off exactly this).

    Scale shape: the corpus collapses to its (source, term) frequency
    table in ONE streaming pass (per-batch dictionary-encode + packed
    bincount partials — the ``word_counts`` posture, bounded by
    |sources| × vocabulary); per-source totals are a second tiny
    grouped sum (≤ |sources| rows, broadcast in-closure); then ONE
    term-keyed exchange co-locates each term's per-source counts and
    every partition emits k×k JS partial sums — the corpus never
    returns to the driver, which only adds |pairs| partials.

    Determinism: counts and totals are integers; each term's
    contribution is the fixed IEEE sequence ``p = n/t``,
    ``0.5·(p·ln(2p/(p+q)) + q·ln(2q/(p+q)))`` (zero sides contribute
    their ``q·ln 2`` half only); callers comparing against a SQL twin
    round to 8 decimals (term summation order is unspecified, and
    numpy/DuckDB ``ln`` may differ in the last ulp). Sources with zero
    tokens take part in no pair. Returns ``(sa, sb, js)`` for
    ``sa < sb`` lexicographic; <2 live sources → 0 rows."""
    from ..stages.exchange import hash_exchange_apply
    from ..stages.reduce import grouped_agg

    empty = pa.table({"sa": pa.array([], pa.string()),
                      "sb": pa.array([], pa.string()),
                      "js": pa.array([], pa.float64())})

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        toks = pc.split_pattern_regex(texts, r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(
            zero_copy_only=False)
        src = pc.fill_null(batch[source_col].cast(pa.string()), "")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        senc = src.dictionary_encode()
        sidx = senc.indices.to_numpy(
            zero_copy_only=False)[parent[keep]]
        wenc = flat.filter(pa.array(keep)).dictionary_encode()
        widx = wenc.indices.to_numpy(zero_copy_only=False)
        nw = len(wenc.dictionary)
        packed = sidx.astype(np.int64) * nw + widx
        cnt = np.bincount(packed, minlength=len(senc.dictionary) * nw)
        live = np.flatnonzero(cnt)
        return pa.table({
            "s": senc.dictionary.take(pa.array(live // nw)),
            "w": wenc.dictionary.take(pa.array(live % nw)),
            "cnt": pa.array(cnt[live], pa.int64())})

    counts = grouped_agg(
        docs_ds.select_columns([source_col, text_col]).map_batches(
            partial, batch_format="pyarrow", batch_size=4096),
        ["s", "w"], [("cnt", "sum", "cnt")])

    totals = {}
    tot_ds = grouped_agg(counts, ["s"], [("cnt", "sum", "t")])
    for b in tot_ds.iter_batches(batch_format="pyarrow",
                                 batch_size=None):
        if b.num_rows and "t" in b.column_names:
            for s, t in zip(b["s"].to_pylist(),
                            b["t"].to_pylist()):
                totals[s] = totals.get(s, 0) + int(t)
    sources = np.array(sorted(totals), dtype=object)
    k = len(sources)
    if k < 2:
        return empty
    tot = np.array([totals[s] for s in sources], dtype=np.float64)
    ia, ib = np.triu_indices(k, k=1)

    def part_js(t: pa.Table) -> pa.Table:
        out_sa = sources[ia]
        out_sb = sources[ib]
        js = np.zeros(len(ia))
        if t.num_rows:
            s = np.asarray(t["s"].to_pylist(), dtype=object)
            w = np.asarray(t["w"].to_pylist(), dtype=object)
            c = t["cnt"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            _, iw = np.unique(w, return_inverse=True)
            si = np.searchsorted(sources, s)
            M = np.zeros((int(iw.max()) + 1, k))
            M[iw, si] = c
            P = M / tot[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                for x, (i, j) in enumerate(zip(ia, ib)):
                    pi, pj = P[:, i], P[:, j]
                    m2 = pi + pj
                    ta = np.where(pi > 0,
                                  pi * np.log((2.0 * pi) / m2), 0.0)
                    tb = np.where(pj > 0,
                                  pj * np.log((2.0 * pj) / m2), 0.0)
                    js[x] = (0.5 * (ta + tb)).sum()
        return pa.table({"sa": pa.array(out_sa.tolist(), pa.string()),
                         "sb": pa.array(out_sb.tolist(), pa.string()),
                         "js": pa.array(js, pa.float64())})

    acc = np.zeros(len(ia))
    for b in hash_exchange_apply(counts, "w", part_js).iter_batches(
            batch_format="pyarrow", batch_size=None):
        if b.num_rows and "js" in b.column_names:
            sa = np.asarray(b["sa"].to_pylist(), dtype=object)
            sb = np.asarray(b["sb"].to_pylist(), dtype=object)
            v = b["js"].to_numpy(zero_copy_only=False)
            idx = (np.searchsorted(sources, sa) * k
                   + np.searchsorted(sources, sb))
            flat_idx = {int(a) * k + int(bb): x
                        for x, (a, bb) in enumerate(zip(ia, ib))}
            pos = np.array([flat_idx[int(i)] for i in idx],
                           dtype=np.int64)
            np.add.at(acc, pos, v)
    return pa.table({"sa": pa.array(sources[ia].tolist(), pa.string()),
                     "sb": pa.array(sources[ib].tolist(), pa.string()),
                     "js": pa.array(acc, pa.float64())})


def tfidf_top_terms(docs_ds, n_docs, id_col="doc_id", text_col="text",
                    top_k=20):
    """Corpus-level TF-IDF term ranking: the top-``top_k`` terms by
    ``tfidf = cnt · ln(N / df)`` where ``cnt`` is the corpus-wide term
    frequency, ``df`` the number of distinct documents containing the
    term, and ``N = n_docs`` the corpus size — the dataset-card
    "which terms carry signal vs boilerplate" readout (reference
    semantics family: salient-term extraction next to textrank /
    collocations; ref graphblas has no text ops — this is the
    training-data-pipeline extension surface).

    Scale shape: each document lives in ONE row, so the (term, cnt,
    df) triple is computable with per-batch Arrow kernels — split +
    dictionary-encode + bincount for ``cnt``, a packed (row, code)
    ``np.unique`` for the per-batch distinct-doc count — and both
    partials SUM exactly across batches (no doc spans two batches).
    ONE vocab-bounded grouped exchange merges them; each vocab block
    then emits only its own top-``top_k`` candidate cut (score is a
    per-row function of (cnt, df), so the global top-k is contained
    in the union of per-block top-ks) — the driver never sees the
    vocabulary, same posture as ``zipf_slope``.

    Determinism: score is ROUNDED to 8 decimals before ranking (ln's
    last-ulp is the only cross-engine hazard; ranking on the rounded
    value keeps the order oracle-replayable — the ``docs_rrf``
    convention), ties break on the term string ascending. Returns
    ``(term, cnt, df, tfidf)`` in (tfidf DESC, term) order."""
    from .reduce import grouped_agg

    empty = pa.table({"term": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64()),
                      "df": pa.array([], pa.int64()),
                      "tfidf": pa.array([], pa.float64())})
    if n_docs <= 0:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(texts, ""), r"\s+")
        flat = pc.list_flatten(toks)
        row = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(
            zero_copy_only=False)
        enc = flat.filter(pa.array(keep)).dictionary_encode()
        row = row[keep]
        nvocab = len(enc.dictionary)
        if nvocab == 0:
            return pa.table({"w": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        code = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        cnt = np.bincount(code, minlength=nvocab)
        # distinct (doc, term) within the batch: docs never span
        # batches, so these partials sum exactly across batches
        dd = np.unique(row.astype(np.int64) * nvocab + code) % nvocab
        df_ = np.bincount(dd, minlength=nvocab)
        return pa.table({"w": enc.dictionary,
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "df": pa.array(df_.astype(np.int64))})

    merged = grouped_agg(
        docs_ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=4096),
        ["w"], [("cnt", "sum", "cnt"), ("df", "sum", "df")])

    nd = float(n_docs)

    def block_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cnt" not in batch.column_names:
            return empty
        c = batch["cnt"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.asarray(batch["w"].to_pylist(), dtype=object)
        raw = c.astype(np.float64) * np.log(nd / d)
        # DuckDB-compatible ROUND (half away from zero; np.round is
        # banker's — they differ only on exact half-grain ties)
        score = np.copysign(np.floor(np.abs(raw) * 1e8 + 0.5) / 1e8,
                            raw) + 0.0
        order = np.lexsort((w, -score))[:top_k]
        return pa.table({"term": pa.array(w[order].tolist(),
                                          pa.string()),
                         "cnt": pa.array(c[order], pa.int64()),
                         "df": pa.array(d[order], pa.int64()),
                         "tfidf": pa.array(score[order], pa.float64())})

    tabs = [b for b in merged.map_batches(
                block_top, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None)
            if b.num_rows and "term" in b.column_names]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="permissive")
    s = t["tfidf"].to_numpy(zero_copy_only=False)
    w = np.asarray(t["term"].to_pylist(), dtype=object)
    order = np.lexsort((w, -s))[:top_k]
    return pa.table({"term": pa.array(w[order].tolist(), pa.string()),
                     "cnt": t["cnt"].take(pa.array(order)),
                     "df": t["df"].take(pa.array(order)),
                     "tfidf": t["tfidf"].take(pa.array(order))})
