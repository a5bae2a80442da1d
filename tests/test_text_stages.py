"""Text-analysis stage unit tests against hand oracles."""

import numpy as np
import pyarrow as pa
import ray.data

from python_graphblas_ray.stages.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def _run(fn, texts):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))
    return pa.concat_tables(list(fn(ds).iter_batches(
        batch_format="pyarrow")), promote_options="permissive") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_token_count_oracle():
    texts = ["one two  three", "  spaced   out ", "", "single"]
    out = _run(token_count, texts)
    assert list(out.ws_tokens) == [3, 2, 0, 1]
    # bpe estimate = ceil(nonspace_chars / 4)
    assert out.bpe_tokens_est[0] == (len("onetwothree") + 3) // 4


def test_quality_score_components():
    texts = ["The cat and the dog ran to the house.", "zzz"]
    out = _run(quality_score, texts)
    assert out.q_len[0] == len(texts[0])
    assert out.q_words[0] == 9
    assert out.q_punct_ratio[0] > 0
    assert 0 <= out.quality_score[0] <= 1
    assert out.quality_score[0] > out.quality_score[1]


def test_lang_id_votes():
    texts = [
        "the cat and the dog in a house for it is that",  # en stopwords
        "der hund und die katze ist nicht mit einem zu",  # de stopwords
        "xyzzy qwerty",                                   # no votes
    ]
    out = _run(lang_id, texts)
    assert out.lang_pred[0] == "en"
    assert out.lang_pred[1] == "de"
    assert out.lang_pred[2] == "und"
    assert out.lang_conf[0] > 0.5


def test_fingerprint_deterministic_and_content_sensitive():
    texts = ["hello world document", "hello world document",
             "completely different content here"]
    out = _run(fingerprint, texts)
    assert out.fingerprint[0] == out.fingerprint[1]
    # min-of-rolling-hashes is robust to small edits by design; disjoint
    # content must differ
    assert out.fingerprint[0] != out.fingerprint[2]


def test_vector_parquet_roundtrip(tmp_path):
    from python_graphblas_ray.core import GBVector
    v = GBVector.from_coo([1, 5, 9], [1.0, 2.0, 3.0], size=12)
    p = str(tmp_path / "vec")
    v.write_parquet(p, num_partitions=2)
    w = GBVector.read_parquet(p, size=12)
    assert v.isequal(w)
    w2 = GBVector.read_parquet(p)
    assert w2.size == 10


def test_hashing_embedder_end_to_end():
    """Text → embedding → ANN chain: deterministic, unit-norm, and
    near-dup texts land close in cosine space."""
    from python_graphblas_ray.stages.text import embed_text
    from python_graphblas_ray.pipelines.similarity import ann_topk
    texts = []
    base = "the quick brown fox jumps over the lazy dog again and again"
    for i in range(30):
        words = (base + f" filler{i} extra{i} more{i} words{i}").split()
        texts.append(" ".join(words))
    texts.append(base + " filler0 extra0 more0 wordX")  # near-dup of doc 0
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    emb = embed_text(ds, dim=32).materialize()
    t = pa.concat_tables(list(emb.iter_batches(batch_format="pyarrow")))
    vecs = np.stack([np.asarray(x) for x in t["embedding"].to_pylist()])
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0,
                               atol=1e-5)
    # determinism
    t2 = pa.concat_tables(list(embed_text(ds, dim=32).iter_batches(
        batch_format="pyarrow")))
    vecs2 = np.stack([np.asarray(x) for x in t2["embedding"].to_pylist()])
    order = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))
    order2 = np.argsort(t2["doc_id"].to_numpy(zero_copy_only=False))
    np.testing.assert_array_equal(vecs[order], vecs2[order2])
    # ANN over the generated embeddings finds the planted near-dup
    out = pa.concat_tables(list(ann_topk(
        emb, query_ids=[0], k=3, id_col="doc_id").iter_batches(
        batch_format="pyarrow"))).to_pandas()
    assert out[out["rank"] == 1].neighbor_id.iloc[0] == 30


def test_repetition_score_hand_computed():
    """Gopher repetition metrics vs hand-computed values, including null,
    empty, and single-word docs."""
    from python_graphblas_ray.stages.text import repetition_score
    texts = [
        "a b a b c",        # words=5 uniq=3 top=2 bigrams: ab,ba,ab,bc -> 4 uniq 3
        "x x x x",          # words=4 uniq=1 top=4 bigrams: xx*3 -> uniq 1
        "one",              # 1 word, 0 bigrams
        "",                 # empty
        None,               # null text
        "p q r",            # all unique
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": pa.array(texts, type=pa.string())}))
    out = pa.concat_tables(list(repetition_score(ds).iter_batches(
        batch_format="pyarrow"))).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(out["words"], [5, 4, 1, 0, 0, 3])
    np.testing.assert_allclose(
        out["dup_word_frac"], [1 - 3 / 5, 1 - 1 / 4, 0.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(
        out["top_word_frac"], [2 / 5, 4 / 4, 1.0, 0.0, 0.0, 1 / 3])
    np.testing.assert_allclose(
        out["dup_bigram_frac"], [1 - 3 / 4, 1 - 1 / 3, 0.0, 0.0, 0.0, 0.0])


def test_repetition_score_bigrams_do_not_cross_docs():
    """The same flat token stream split differently must give different
    bigram stats — boundary grams are excluded by construction."""
    from python_graphblas_ray.stages.text import repetition_score
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["a b", "b a b"]}))
    out = pa.concat_tables(list(repetition_score(ds).iter_batches(
        batch_format="pyarrow"))).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # doc1 bigrams: "b a", "a b" — 2 unique of 2; the cross-boundary
    # "b b" gram must NOT appear anywhere
    np.testing.assert_allclose(out["dup_bigram_frac"], [0.0, 0.0])


def test_pii_redactor_planted():
    from python_graphblas_ray.stages.text import redact_pii
    texts = [
        "contact bob.smith+x@example.co.uk or alice@test.org now",
        "server at 192.168.1.254 answered",
        "call +1 (555) 123-4567 today",
        "clean document with no pii at all",
        None,
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": pa.array(texts, type=pa.string())}))
    out = pa.concat_tables(list(redact_pii(ds).iter_batches(
        batch_format="pyarrow"))).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out.loc[0, "text"] == "contact <EMAIL> or <EMAIL> now"
    assert out.loc[0, "n_email"] == 2
    assert out.loc[1, "text"] == "server at <IP> answered"
    assert out.loc[1, "n_ip"] == 1
    assert out.loc[2, "text"] == "call <PHONE> today"
    assert out.loc[2, "n_phone"] == 1
    assert out.loc[3, "text"] == texts[3]
    assert out.loc[4, "text"] == ""  # null-safe
    np.testing.assert_array_equal(
        out[["n_email", "n_ip", "n_phone"]].sum(axis=1), [2, 1, 1, 0, 0])


def test_ngram_lm_matches_string_reference():
    """Distributed hash-count LM == string-level Counter reference
    (Laplace bigram mean log-prob, 8-decimal rounding)."""
    import math
    from collections import Counter

    from python_graphblas_ray.stages.text import ngram_lm_fit, ngram_lm_score

    docs = ["the cat sat on the mat", "the dog sat", "cat and dog",
            "", "single", "the the the", None]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "text": pa.array(docs, type=pa.string())}))
    model = ngram_lm_fit(ds)
    got = {r["doc_id"]: r["lm_score"]
           for r in ngram_lm_score(ds, model).take_all()}

    uni, bi = Counter(), Counter()
    for t in docs:
        ws = (t or "").split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    V = len(uni)
    assert model["vocab"] == V
    for i, t in enumerate(docs):
        ws = (t or "").split()
        pairs = list(zip(ws, ws[1:]))
        want = (sum(math.log((bi[p] + 1.0) / (uni[p[0]] + V))
                    for p in pairs) / len(pairs)) if pairs else 0.0
        assert abs(got[i] - round(want, 8)) < 1e-7, (i, got[i], want)


def test_ngram_lm_min_count_prunes_broadcast_not_vocab():
    from python_graphblas_ray.stages.text import ngram_lm_fit

    docs = ["a a a b", "a c"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": pa.array(docs, type=pa.string())}))
    full = ngram_lm_fit(ds)
    pruned = ngram_lm_fit(ds, min_count=2)
    assert pruned["vocab"] == full["vocab"] == 3  # a, b, c
    assert len(pruned["u_keys"]) < len(full["u_keys"])


def test_textrank_matches_numpy_pagerank_and_ranks_hubs():
    import ray.data

    from python_graphblas_ray.pipelines.algorithms import pagerank_numpy
    from python_graphblas_ray.pipelines.textrank import (
        cooccurrence_pairs, textrank_keywords)

    docs = ray.data.from_arrow(pa.table({
        "text": ["the quick brown fox jumps over the lazy dog",
                 "the dog barks at the quick fox",
                 "  lazy  dog   sleeps ", "", None],
    }))
    out = textrank_keywords(docs, iters=5).to_pandas()
    # numpy oracle over the same co-occurrence multigraph
    pairs = pa.concat_tables(list(cooccurrence_pairs(docs).iter_batches(
        batch_format="pyarrow"))).to_pandas()
    vocab = np.unique(pairs.a)
    src = np.searchsorted(vocab, pairs.a)
    dst = np.searchsorted(vocab, pairs.b)
    r0, _ = pagerank_numpy(src, dst, len(vocab), tol=0.0, itermax=5,
                           w=np.ones(len(src)))
    expect = dict(zip(vocab, np.round(r0, 8)))
    got = dict(zip(out.word, out["rank"]))  # .rank is a DataFrame method
    assert got == expect
    # the most connected word dominates; mass is conserved (symmetric)
    assert out.sort_values("rank").iloc[-1].word == "the"
    assert abs(out["rank"].sum() - 1.0) < 1e-6


def test_textrank_empty_corpus():
    import ray.data

    from python_graphblas_ray.pipelines.textrank import textrank_keywords

    docs = ray.data.from_arrow(pa.table({"text": pa.array(
        ["", "   ", None], pa.string())}))
    out = textrank_keywords(docs)
    assert len(out) == 0
    assert out.column_names == ["word", "rank"]


def test_collocations_matches_direct_pmi():
    import collections
    import math

    import ray.data

    from python_graphblas_ray.pipelines.textrank import collocations

    texts = ["new york city is in new york state",
             "new york has a big city",
             "york new",  # reversed: directed bigrams differ
             "a b a b a b a b a b"]
    docs = ray.data.from_arrow(pa.table({"text": texts}))
    out = pa.concat_tables(list(
        collocations(docs, min_count=2).iter_batches(
            batch_format="pyarrow"))).to_pandas()
    # direct computation
    toks = [t.split() for t in texts]
    uni = collections.Counter(w for ws in toks for w in ws)
    bg = collections.Counter(
        (ws[i], ws[i + 1]) for ws in toks for i in range(len(ws) - 1))
    T = sum(uni.values())
    N = sum(bg.values())
    expect = {
        (a, b): round(math.log(c * T * T / (N * uni[a] * uni[b])), 8)
        for (a, b), c in bg.items() if c >= 2}
    got = {(r.w1, r.w2): r.pmi for r in out.itertuples()}
    assert got == expect
    assert {(r.w1, r.w2): r.c for r in out.itertuples()} == \
        {k: v for k, v in bg.items() if v >= 2}
    # "new york" is a strong collocation; PMI positive
    assert got[("new", "york")] > 0


def test_attack_vs_random_robustness_on_star():
    """The AJB fingerprint: a hub-dominated graph shatters under attack
    but survives random failure."""
    import ray.data

    from python_graphblas_ray.pipelines.linkpred import attack_robustness

    n = 40
    src = np.zeros(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst, "val": np.ones(n - 1)}))
    _, _, f_attack = attack_robustness(ds, n, k_remove=1,
                                       strategy="degree",
                                       num_partitions=2)
    _, _, f_random = attack_robustness(ds, n, k_remove=1,
                                       strategy="random",
                                       num_partitions=2)
    assert f_attack == 1.0 / (n - 1)  # hub removed: fully shattered
    # knuth32 pick removes some leaf (hash of 0 is 0? no: 0*c=0 — vid 0
    # hashes to 0 and would be picked; the star hub IS vid 0, so use the
    # reversed star to make the random pick a leaf)
    if f_random == f_attack:
        # vid 0 (the hub) got the smallest hash — flip the construction
        ds2 = ray.data.from_arrow(pa.table({
            "src": np.full(n - 1, n - 1, dtype=np.int64),
            "dst": np.arange(n - 1, dtype=np.int64),
            "val": np.ones(n - 1)}))
        _, _, f_random = attack_robustness(ds2, n, k_remove=1,
                                           strategy="random",
                                           num_partitions=2)
        _, _, f_attack = attack_robustness(ds2, n, k_remove=1,
                                           strategy="degree",
                                           num_partitions=2)
    assert f_random > f_attack


def test_chunk_windows_boundaries():
    import numpy as np
    import pyarrow as pa
    import ray as _ray
    from python_graphblas_ray.stages.text import chunk_windows

    texts = ["", "one", " ".join(f"t{i}" for i in range(100)),
             " ".join(f"t{i}" for i in range(48)),
             " ".join(f"t{i}" for i in range(49)), None]
    ds = _ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": pa.array(texts, pa.string())}))
    t = pa.concat_tables(chunk_windows(ds, window=64, stride=48)
                         .iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    rows = sorted(zip(t["doc_id"].to_pylist(), t["chunk"].to_pylist(),
                      t["start"].to_pylist(), t["len"].to_pylist()))
    # doc 0 empty -> none; doc 1: one chunk len 1; doc 2 (100 tokens):
    # chunks at 0/48/96 with lens 64/52/4; doc 3 (48): single; doc 4
    # (49): 0..64 capped 49 and tail start 48 len 1; doc 5 null -> none
    assert rows == [(1, 0, 0, 1),
                    (2, 0, 0, 64), (2, 1, 48, 52), (2, 2, 96, 4),
                    (3, 0, 0, 48),
                    (4, 0, 0, 49), (4, 1, 48, 1)]
