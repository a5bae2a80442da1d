"""Session-4 operators vs independent pure-Python/numpy oracles:
product quantization (fit / encode / ADC top-k), time-decayed counts,
Flesch readability, blocklist screening, and BPE tokenizer training."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from python_graphblas_ray.pipelines.bpe import (
    bpe_encode,
    bpe_fit,
    word_counts,
)
from python_graphblas_ray.pipelines.similarity import (
    _matrix,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    pq_onehot_codebooks,
)
from python_graphblas_ray.pipelines.windows import decayed_counts
from python_graphblas_ray.stages.text import (
    blocklist_hits,
    char_entropy,
    readability,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(SF + "/embeddings.parquet",
                         columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"])


# ---------------------------------------------------------------- PQ --


def test_pq_onehot_assign_is_argmax(emb_table):
    cb = pq_onehot_codebooks(64, 8)
    ds = ray.data.from_arrow(emb_table)
    codes = {}
    for r in pq_encode(ds, cb).take_all():
        codes[(r["vec_id"], r["sub"])] = r["code"]
    x = _matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy(zero_copy_only=False)
    xs = x.reshape(len(x), 8, 8)
    want = np.argmax(xs, axis=2)  # first max == lowest code on ties
    for i, vid in enumerate(ids):
        for s in range(8):
            assert codes[(vid, s)] == want[i, s]


def test_pq_adc_topk_matches_numpy_ref(emb_table):
    cb = pq_onehot_codebooks(64, 8)
    ds = ray.data.from_arrow(emb_table)
    got = {}
    for r in pq_adc_topk(ds, cb, query_ids=[0, 5, 9], k=7).take_all():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"]))
    x = _matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    x, ids = x[order], ids[order]
    xs = x.reshape(len(x), 8, 8)
    codes = np.argmax(xs, axis=2)
    for q in (0, 5, 9):
        qv = x[np.searchsorted(ids, q)].reshape(8, 8)
        # lut[s, j] = ||q_s - e_j||^2
        lut = ((qv[:, None, :] - np.eye(8)[None, :, :]) ** 2).sum(2)
        d = lut[np.arange(8)[None, :], codes].sum(1)
        want = [ids[i] for i in np.lexsort((ids, d))[:7]]
        have = [n for _, n in sorted(got[q])]
        assert have == want, q


def test_pq_fit_reduces_quantization_error(emb_table):
    ds = ray.data.from_arrow(emb_table)
    x = _matrix(emb_table["embedding"])

    def qerr(cb):
        xs = x.reshape(len(x), 8, -1)
        sc = np.einsum("nsd,sjd->nsj", xs, cb)
        c2 = np.einsum("sjd,sjd->sj", cb, cb)
        codes = np.argmin(c2[None] - 2 * sc, axis=2)
        rec = cb[np.arange(8)[None, :], codes]
        return ((xs - rec) ** 2).sum()

    cb1 = pq_fit(ds, m=8, ksub=8, iters=1)
    cb5 = pq_fit(ds, m=8, ksub=8, iters=5)
    assert cb5.shape == (8, 8, 8)
    assert qerr(cb5) <= qerr(cb1) + 1e-9
    # fitted centroids beat the arbitrary one-hot codebooks
    assert qerr(cb5) < qerr(pq_onehot_codebooks(64, 8))


def test_pq_fit_deterministic(emb_table):
    ds = ray.data.from_arrow(emb_table)
    a = pq_fit(ds, m=8, ksub=4, iters=2, seed=7)
    b = pq_fit(ds, m=8, ksub=4, iters=2, seed=7)
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------ decayed_counts --


def test_decayed_counts_vs_numpy():
    ts = pa.array([0, 1, 25, 49, 50], pa.int64()).cast(
        pa.timestamp("us"))
    # as_of = 50us with an hour half-life -> every event is age-0
    t = pa.table({"user_id": pa.array([1, 1, 2, 2, 1], pa.int64()),
                  "ts": ts})
    out = {r["user_id"]: r["score"] for r in decayed_counts(
        ray.data.from_arrow(t), half_life="hour").take_all()}
    assert out == {1: 3.0, 2: 2.0}


def test_decayed_counts_day_buckets():
    day = 86_400_000_000
    ts = pa.array([0, day, 2 * day, 3 * day], pa.int64()).cast(
        pa.timestamp("us"))
    t = pa.table({"user_id": pa.array([7, 7, 7, 7], pa.int64()),
                  "ts": ts})
    out = decayed_counts(ray.data.from_arrow(t),
                         half_life="day").take_all()
    # ages (days before max=3d): 3, 2, 1, 0 -> 1/8 + 1/4 + 1/2 + 1
    assert out == [{"user_id": 7, "score": 1.875}]


def test_decayed_counts_max_exponent():
    day = 86_400_000_000
    ts = pa.array([0, 100 * day], pa.int64()).cast(pa.timestamp("us"))
    t = pa.table({"user_id": pa.array([1, 1], pa.int64()), "ts": ts})
    out = decayed_counts(ray.data.from_arrow(t), half_life="day",
                         max_exponent=60).take_all()
    assert out == [{"user_id": 1, "score": 1.0}]  # age-100 weighs 0


# --------------------------------------------------------- readability --


def _flesch_ref(text):
    w = len(re.findall(r"\S+", text))
    s = len(re.findall(r"[.!?]+", text))
    syl = len(re.findall(r"[aeiouyAEIOUY]+", text))
    if w == 0:
        return 0.0
    raw = 206.835 - 1.015 * (w / max(s, 1.0)) - 84.6 * (syl / max(w, 1.0))
    return np.floor(abs(raw) * 1e6 + 0.5) / 1e6 * np.sign(raw)


def test_readability_vs_re(docs_table):
    ds = ray.data.from_arrow(docs_table)
    got = {r["doc_id"]: r["flesch"] for r in readability(ds).take_all()}
    ids = docs_table["doc_id"].to_pylist()
    texts = docs_table["text"].to_pylist()
    for i, t in zip(ids[:50], texts[:50]):
        assert got[i] == pytest.approx(_flesch_ref(t or ""), abs=0)


def test_readability_empty_doc():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["", "Run. Go now!"])})
    got = {r["doc_id"]: r["flesch"] for r in readability(
        ray.data.from_arrow(t)).take_all()}
    assert got[1] == 0.0
    assert got[2] == pytest.approx(_flesch_ref("Run. Go now!"), abs=0)


# ------------------------------------------------------ blocklist_hits --


def test_blocklist_hits_vs_re(docs_table):
    terms = ["click", "error", "free", "winner"]
    pat = re.compile(r"\b(" + "|".join(terms) + r")\b")
    ds = ray.data.from_arrow(docs_table)
    got = {r["doc_id"]: r["n_hits"]
           for r in blocklist_hits(ds, terms).take_all()}
    ids = docs_table["doc_id"].to_pylist()
    texts = docs_table["text"].to_pylist()
    assert len(got) == len(ids)  # zeros included
    for i, t in zip(ids[:100], texts[:100]):
        assert got[i] == len(pat.findall(t or "")), i


def test_blocklist_whole_word_only():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["clicker click clicks click."])})
    got = blocklist_hits(ray.data.from_arrow(t), ["click"]).take_all()
    assert got == [{"doc_id": 1, "n_hits": 2}]


# -------------------------------------------------------- char_entropy --


def _entropy_ref(text):
    from collections import Counter
    n = len(text)
    if n == 0:
        return 0.0
    h = 0.0
    for c in sorted(Counter(text)):
        p = Counter(text)[c] / n
        h += -p * np.log(p)
    return round(h, 8)


def test_char_entropy_vs_counter(docs_table):
    ds = ray.data.from_arrow(docs_table)
    got = {r["doc_id"]: r["entropy"]
           for r in char_entropy(ds).take_all()}
    ids = docs_table["doc_id"].to_pylist()
    texts = docs_table["text"].to_pylist()
    for i, t in zip(ids[:30], texts[:30]):
        assert got[i] == pytest.approx(_entropy_ref(t or ""), abs=1e-8)


def test_char_entropy_edges():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", "aaaa", "ab\nba"])})
    got = {r["doc_id"]: r["entropy"]
           for r in char_entropy(ray.data.from_arrow(t)).take_all()}
    assert got[1] == 0.0 and got[2] == 0.0
    assert got[3] == pytest.approx(_entropy_ref("ab\nba"), abs=1e-8)


# ------------------------------------------------------------- winnow --


def _winnow_ref(docs, gram, window):
    """Brute-force winnowing over vocabulary-rank g-gram splitmix64."""
    from python_graphblas_ray.state.superstep import _splitmix64
    vocab = sorted({w for d in docs for w in re.split(r"\s+", d) if w})
    V = len(vocab)
    rk = {w: i for i, w in enumerate(vocab)}
    out = []
    for did, d in enumerate(docs):
        ws = [w for w in re.split(r"\s+", d) if w]
        if len(ws) < gram:
            continue
        gh = []
        for i in range(len(ws) - gram + 1):
            code = 0
            for j in range(gram):
                code = code * V + rk[ws[i + j]]
            gh.append(int(_splitmix64(np.uint64(code))))
        sel = set()
        for s in range(max(len(gh) - window + 1, 1)):
            wv = gh[s:s + window]
            mn = min(wv)
            ri = max(i for i, v in enumerate(wv) if v == mn)
            sel.add((s + ri + 1, wv[ri]))
        out.extend((did, p, f if f < 2 ** 63 else f - 2 ** 64)
                   for p, f in sel)
    return sorted(out)


def test_winnow_vs_brute_force():
    from python_graphblas_ray.pipelines.dedup import winnow_fingerprints
    docs = ["a b c a b c a b c d e f", "x y",
            "a a a a a a a a a a", "",
            "q w e r t y u i o p a s d f g h"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = sorted((r["doc_id"], r["pos"], r["fp"])
                 for r in winnow_fingerprints(
                     ray.data.from_arrow(t), gram=3, window=4).take_all())
    assert got == _winnow_ref(docs, 3, 4)


def test_winnow_locality_guarantee(docs_table):
    # any shared run of window+gram-1 tokens must share a fingerprint:
    # plant the same 12-token passage into two otherwise-unrelated docs
    from python_graphblas_ray.pipelines.dedup import winnow_fingerprints
    passage = "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10 zq11 zq12"
    texts = docs_table["text"].to_pylist()[:20]
    texts[3] = texts[3] + " " + passage
    texts[17] = passage + " " + texts[17]
    t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                  "text": pa.array(texts)})
    fps = {}
    for r in winnow_fingerprints(ray.data.from_arrow(t), gram=3,
                                 window=8).take_all():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[3] & fps[17], "planted passage must share a fingerprint"


def test_winnow_short_doc_gets_fingerprint():
    from python_graphblas_ray.pipelines.dedup import winnow_fingerprints
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["only three words", "ab"])})
    got = winnow_fingerprints(ray.data.from_arrow(t), gram=3,
                              window=8).take_all()
    assert {r["doc_id"] for r in got} == {1}  # doc 2: < gram tokens
    assert len(got) == 1  # one truncated window -> one fingerprint


# ----------------------------------------------------------------- BPE --


def _bpe_ref(word_cnt, num_merges):
    """Pure-Python reference: greedy left-to-right non-overlap merge,
    ties to lexicographically smallest pair."""
    vocab = {w: list(w) for w in word_cnt}
    merges, counts = [], []
    for _ in range(num_merges):
        pc_ = {}
        for w, syms in vocab.items():
            i = 0
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] = pc_.get(
                    (syms[i], syms[i + 1]), 0) + word_cnt[w]
        if not pc_:
            break
        best = min(pc_, key=lambda p: (-pc_[p], p))
        merges.append(best)
        counts.append(pc_[best])
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and \
                        syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, counts, vocab


def test_bpe_fit_vs_pure_python(docs_table):
    ds = ray.data.from_arrow(docs_table)
    merges, counts = bpe_fit(ds, num_merges=6)
    wc = {}
    for t in docs_table["text"].to_pylist():
        for w in re.split(r"\s+", t or ""):
            if w:
                wc[w] = wc.get(w, 0) + 1
    want_m, want_c, _ = _bpe_ref(wc, 6)
    assert merges == want_m
    assert counts == want_c


def test_bpe_encode_vs_pure_python(docs_table):
    sub = docs_table.slice(0, 40)
    ds = ray.data.from_arrow(sub)
    merges, _ = bpe_fit(ds, num_merges=5)
    wc = {}
    per_doc = []
    for t in sub["text"].to_pylist():
        ws = [w for w in re.split(r"\s+", t or "") if w]
        per_doc.append(ws)
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
    _, _, vocab = _bpe_ref(wc, 5)
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode(ds, merges, concurrency=2).take_all()}
    ids = sub["doc_id"].to_pylist()
    for i, ws in zip(ids, per_doc):
        assert got[i] == sum(len(vocab[w]) for w in ws), i


def test_bpe_merge_overlap_semantics():
    # [a,a,a] merges only the FIRST pair (greedy left-to-right);
    # [a,b,a,b] merges BOTH (non-adjacent matches)
    t = pa.table({"text": pa.array(["aaa abab abab aaa aaa abab"])})
    ds = ray.data.from_arrow(t)
    merges, counts = bpe_fit(ds, num_merges=1)
    # pairs: 'aa' appears 2/word in aaa but only leftmost merges;
    # count ties: ('a','a') 2*3=6 vs ('a','b') 2*3=6 vs ('b','a') 1*3=3
    # -> tie between ('a','a') and ('a','b') -> lexicographic: ('a','a')
    assert merges == [("a", "a")]
    assert counts == [6]
    wcnt = {r["w"]: r["cnt"] for r in word_counts(ds).iter_rows()}
    assert wcnt == {"aaa": 3, "abab": 3}


def test_bpe_fit_runs_out_of_pairs():
    t = pa.table({"text": pa.array(["x y z", "x y"])})
    merges, counts = bpe_fit(ray.data.from_arrow(t), num_merges=8)
    assert merges == [] and counts == []  # all words single-symbol
