"""Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
word-Jaccard / embedding-cosine), ANN search, windowed aggregates,
multimodal plumbing — each verified against a single-process numpy/python
oracle on deterministic synthetic inputs + the driver testdata tables."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from python_graphblas_ray.pipelines.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
    word_jaccard_pairs,
    word_shingles,
)
from python_graphblas_ray.pipelines.multimodal import (
    decode_images,
    image_features,
    media_table,
    sample_frames,
)
from python_graphblas_ray.pipelines.similarity import (
    ann_topk,
    ivf_build,
    ivf_search,
)
from python_graphblas_ray.pipelines.windows import (
    sessionize,
    windowed_aggregate,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                            promote_options="permissive")


# ---------------------------------------------------------------------------
# corpus with planted duplicates / near-duplicates
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = []
    for i in range(60):
        nw = 20 + int(rng.integers(0, 20))
        texts.append(" ".join(vocab[j] for j in rng.integers(0, len(vocab),
                                                             nw)))
    # exact duplicates: 60..64 copy 0..4
    for i in range(5):
        texts.append(texts[i])
    # near duplicates: 65..69 = 5..9 with one word changed
    for i in range(5):
        w = texts[5 + i].split()
        w[len(w) // 2] = "changedword"
        texts.append(" ".join(w))
    ids = np.arange(len(texts), dtype=np.int64)
    return ids, texts, ray.data.from_arrow(pa.table({
        "doc_id": ids, "text": texts}))


def test_exact_dedup(corpus):
    ids, texts, ds = corpus
    out = _table(exact_dedup(ds)).to_pandas()
    # oracle
    seen = {}
    for i, t in zip(ids, texts):
        seen.setdefault(t, []).append(i)
    assert len(out) == len(seen)
    got = {r.text: (r.keep_id, r.n_dups) for r in out.itertuples()}
    for t, members in seen.items():
        assert got[t] == (min(members), len(members))


def _jaccard_oracle(texts, n=3, threshold=0.5):
    sets = [word_shingles(t, n) for t in texts]
    pairs = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            sa, sb = sets[i], sets[j]
            if len(sa) == 0 and len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            if inter / (len(sa) + len(sb) - inter) >= threshold:
                pairs.add((i, j))
    return pairs


def test_minhash_lsh_finds_planted_dups(corpus):
    ids, texts, ds = corpus
    out = _table(minhash_lsh_pairs(ds, threshold=0.5)).to_pandas()
    got = set(zip(out.ia.tolist(), out.ib.tolist()))
    # every exact duplicate pair must be found (jaccard 1.0, all bands agree)
    for i in range(5):
        assert (i, 60 + i) in got
    # every near-duplicate (1 word of ~30 changed → jaccard ~0.8) found
    for i in range(5):
        assert (5 + i, 65 + i) in got
    # no pair below the verification threshold survives
    oracle = _jaccard_oracle(texts, threshold=0.5)
    assert got <= oracle


def test_simhash_pairs_finds_exact_dups(corpus):
    ids, texts, ds = corpus
    out = _table(simhash_pairs(ds, max_hamming=3)).to_pandas()
    got = set(zip(out.ia.tolist(), out.ib.tolist()))
    for i in range(5):
        assert (i, 60 + i) in got  # identical text → hamming 0
    assert (out.hamming <= 3).all()


def test_word_jaccard_pairs_matches_oracle(corpus):
    ids, texts, ds = corpus
    out = _table(word_jaccard_pairs(ds, threshold=0.9)).to_pandas()
    got = set(zip(out.ia.tolist(), out.ib.tolist()))
    # oracle on distinct-word sets
    sets = [set(t.split()) for t in texts]
    expect = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= 0.9:
                expect.add((i, j))
    assert got == expect
    assert len(expect) >= 5  # planted exact dups qualify


def test_word_jaccard_hot_word_guard(corpus):
    """max_word_df drops hot words from the inverted index and scores the
    exact Jaccard of the df-capped word sets (numerator AND denominator
    over the same capped vocabulary)."""
    ids, texts, ds = corpus
    cap = 10
    out = _table(word_jaccard_pairs(ds, threshold=0.9,
                                    max_word_df=cap)).to_pandas()
    got = {(int(r.ia), int(r.ib)): r.jaccard for r in out.itertuples()}
    # oracle: compute df, drop words with df > cap, then exact Jaccard
    sets = [set(t.split()) for t in texts]
    df = {}
    for s in sets:
        for w in s:
            df[w] = df.get(w, 0) + 1
    capped = [{w for w in s if df[w] <= cap} for s in sets]
    expect = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(capped[i] & capped[j])
            union = len(capped[i] | capped[j])
            if union and inter / union >= 0.9:
                expect[(i, j)] = inter / union
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-12
    # the guard must actually have dropped something in this corpus
    assert any(v > cap for v in df.values())


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def embeddings():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = np.stack([np.asarray(x, dtype=np.float64)
                  for x in t["embedding"].to_pylist()])
    return ids, m, ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")


def test_embedding_neardup_matches_bruteforce(embeddings):
    ids, m, ds = embeddings
    thr = 0.3
    out = _table(embedding_neardup_pairs(ds, threshold=thr)).to_pandas()
    got = set(zip(out.ia.tolist(), out.ib.tolist()))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    ii, jj = np.nonzero(np.triu(sims >= thr, k=1))
    expect = set(zip(ids[ii].tolist(), ids[jj].tolist()))
    assert got == expect


def test_ann_topk_matches_bruteforce(embeddings):
    ids, m, ds = embeddings
    qids = [0, 1, 2]
    out = _table(ann_topk(ds, qids, k=5)).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(ids)}
    for q in qids:
        sims = mn[pos[q]] @ mn.T
        sims[pos[q]] = -np.inf
        order = np.lexsort((ids, -sims))[:5]
        expect = ids[order].tolist()
        got = out[out.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert got == expect


def test_ivf_recall(embeddings):
    ids, m, ds = embeddings
    cents, assigned = ivf_build(ds, num_centroids=8, iters=3)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = mn[0]
    nid, sim = ivf_search(cents, assigned, q, k=10, nprobe=4)
    # exact top-10
    sims = mn @ q
    exact = set(ids[np.argsort(-sims)[:10]].tolist())
    # probing half the buckets must recover at least half of the true top-10
    assert len(set(nid.tolist()) & exact) >= 5


# ---------------------------------------------------------------------------
# windows / sessions (events table)
# ---------------------------------------------------------------------------

def test_windowed_aggregate_matches_pandas():
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    out = _table(windowed_aggregate(ds, keys=("event_type",),
                                    every="day")).to_pandas()
    df = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    df["window"] = df.ts.dt.floor("D")
    exp = df.groupby(["event_type", "window"]).agg(
        n=("value", "size"), vmin=("value", "min"),
        vmax=("value", "max")).reset_index()
    merged = out.merge(exp, on=["event_type", "window"],
                       suffixes=("", "_e"))
    assert len(merged) == len(exp) == len(out)
    assert (merged.n == merged.n_e).all()
    assert np.allclose(merged.vmin, merged.vmin_e)
    assert np.allclose(merged.vmax, merged.vmax_e)


def test_sessionize():
    ts = pa.array([0, 10, 20, 100_000, 100_010, 500_000], pa.int64())
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "ts": ts.cast(pa.timestamp("us")).cast(pa.timestamp("us")),
    })
    # gap threshold 50ms → user 1: [0,10,20] then [100000,100010]; user 2: one
    out = _table(sessionize(ray.data.from_arrow(t),
                            gap_minutes=50 / 60 / 1000)).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_start")
    assert list(u1.n_events) == [3, 2]
    assert len(out[out.user_id == 2]) == 1


def test_event_transitions():
    """Hand case incl. a same-microsecond tie broken by event_id, a
    single-event user (no pairs), and a cross-user boundary (no pair),
    plus randomized parity vs a pandas shift() brute force."""
    from python_graphblas_ray.pipelines.windows import event_transitions

    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([10, 10, 20, 5, 30, 7], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "c", "a", "b"]),
    })
    # user 1 order (ts, id): (10,0)a (10,1)b (20,2)a → a→b, b→a
    # user 2: (5,3)c (30,4)a → c→a ; user 3: single event, no pair
    out = _table(event_transitions(ray.data.from_arrow(t))).to_pandas()
    got = {(r.src_type, r.dst_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("c", "a"): 1}

    rng = np.random.default_rng(3)
    n = 4000
    t2 = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(rng.integers(0, 500, n), pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 60, n), pa.int64()),
        "event_type": pa.array(
            np.array(list("pqrst"))[rng.integers(0, 5, n)]),
    })
    out2 = _table(event_transitions(
        ray.data.from_arrow(t2).repartition(7))).to_pandas()
    df = t2.to_pandas().sort_values(["user_id", "ts", "event_id"])
    nxt = df.event_type.shift(-1)
    same = df.user_id.to_numpy()[1:] == df.user_id.to_numpy()[:-1]
    pairs = df.iloc[:-1][same]
    ref = (pairs.assign(dst=nxt.iloc[:-1][same])
           .groupby(["event_type", "dst"]).size())
    got2 = {(r.src_type, r.dst_type): int(r.n) for r in out2.itertuples()}
    assert got2 == {k: int(v) for k, v in ref.items()}


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_decode_features_frames():
    rng = np.random.default_rng(3)
    payloads = [rng.bytes(200) for _ in range(10)]
    t = media_table(np.arange(10), payloads)
    ds = ray.data.from_arrow(t)
    dec = decode_images(ds, concurrency=2, batch_size=4,
                        mode="fake")  # arbitrary payloads → fake decode
    feats = _table(image_features(dec)).to_pandas()
    assert len(feats) == 10
    assert all(len(f) == 3 for f in feats.feat_mean)
    # determinism: same payload → same features
    dec2 = decode_images(ray.data.from_arrow(t), concurrency=2,
                         batch_size=4, mode="fake")
    feats2 = _table(image_features(dec2)).to_pandas()
    f1 = [list(x) for x in feats.sort_values("media_id").feat_mean]
    f2 = [list(x) for x in feats2.sort_values("media_id").feat_mean]
    assert f1 == f2
    frames = _table(sample_frames(ds, stride=2)).to_pandas()
    # 200 bytes / 64 per frame = 3 frames → sampled 0, 2
    assert set(frames[frames.media_id == 0].frame_idx) == {0, 2}


def test_multimodal_resize():
    """Nearest-neighbor resize: vectorized gather matches the per-image
    numpy oracle; upsample and downsample; schema carries through."""
    from python_graphblas_ray.pipelines.multimodal import (ImageResizer,
                                                           resize_images)

    rng = np.random.default_rng(7)
    payloads = [rng.bytes(200) for _ in range(6)]
    t = media_table(np.arange(6), payloads)
    dec = decode_images(ray.data.from_arrow(t), batch_size=3,
                        mode="fake")  # 4x4 fake pixels from raw bytes
    for oh, ow in ((2, 2), (8, 6)):
        out = _table(resize_images(dec, out_hw=(oh, ow))).to_pandas()
        out = out.sort_values("media_id").reset_index(drop=True)
        src = _table(dec).to_pandas().sort_values("media_id") \
                                     .reset_index(drop=True)
        assert (out.height == oh).all() and (out.width == ow).all()
        rows = np.minimum(((np.arange(oh) + 0.5) * 4 / oh).astype(int), 3)
        cols = np.minimum(((np.arange(ow) + 0.5) * 4 / ow).astype(int), 3)
        for i in range(6):
            pix = np.asarray(list(src.pixels[i]),
                             dtype=np.uint8).reshape(4, 4, 3)
            want = pix[rows][:, cols].ravel().tolist()
            assert list(out.pixels[i]) == want, (oh, ow, i)
    # grid rebuild on input-size change within one actor instance
    r = ImageResizer(out_hw=(2, 2))
    b1 = _table(dec).slice(0, 3)
    out1 = r(b1)
    assert out1["height"][0].as_py() == 2


def test_multimodal_resize_mixed_shapes_same_pixel_count():
    """A batch mixing 16x12 and 12x16 rows (EQUAL pixel counts — the
    ADVICE-r4 aliasing case) resizes each row with its own geometry and
    matches the per-image numpy oracle; features likewise."""
    from python_graphblas_ray.pipelines.multimodal import (ImageDecoder,
                                                           ImageFeatures,
                                                           ImageResizer)
    from python_graphblas_ray.pipelines.png import png_encode

    rng = np.random.default_rng(23)
    shapes = [(16, 12), (12, 16), (16, 12), (12, 16)]
    imgs = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            for h, w in shapes]
    t = media_table(np.arange(4), [png_encode(im) for im in imgs])
    dec = ImageDecoder()(t)
    assert dec["height"].to_pylist() == [h for h, _ in shapes]
    out = ImageResizer(out_hw=(6, 5))(dec)
    for i, im in enumerate(imgs):
        h, w = shapes[i]
        rows = np.minimum(((np.arange(6) + 0.5) * h / 6).astype(int), h - 1)
        cols = np.minimum(((np.arange(5) + 0.5) * w / 5).astype(int), w - 1)
        want = im[rows][:, cols].ravel().tolist()
        assert out["pixels"][i].as_py() == want, i
    feats = ImageFeatures()(dec)
    for i, im in enumerate(imgs):
        np.testing.assert_allclose(
            feats["feat_mean"][i].as_py(),
            im.astype(np.float64).mean(axis=(0, 1)))


def test_decode_real_png_no_pil_needed():
    """The r3 STRICT stub is gone: PNG payloads decode for REAL via the
    stdlib-zlib codec, no PIL required (STRICT aliases PNG mode)."""
    from python_graphblas_ray.pipelines.multimodal import (
        STRICT, ImageDecoder, PNG)
    from python_graphblas_ray.pipelines.png import png_encode

    assert STRICT == PNG  # back-compat alias, not a raise
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
            for _ in range(4)]
    t = media_table(np.arange(4), [png_encode(im) for im in imgs])
    out = ImageDecoder()(t)
    for i, im in enumerate(imgs):
        got = np.asarray(out["pixels"][i].as_py(),
                         dtype=np.uint8).reshape(5, 7, 3)
        assert np.array_equal(got, im)
    assert out["height"].to_pylist() == [5] * 4
    assert out["width"].to_pylist() == [7] * 4


def test_video_frame_decode_still_stubbed():
    from python_graphblas_ray.pipelines.multimodal import FrameSampler
    with pytest.raises(NotImplementedError):
        FrameSampler(mode="strict-video")


def test_prepare_corpus_end_to_end():
    """Flagship corpus-prep composition: quality gate + exact dedup +
    near-dup removal + embedding, with per-stage lineage counts."""
    from python_graphblas_ray.pipelines.corpus import prepare_corpus
    rng = np.random.default_rng(11)
    vocab = ("data model train token corpus sample batch shard layer "
             "weight gradient loss epoch metric eval split merge clean "
             "filter dedup").split()
    texts = []
    for i in range(40):
        nw = 30 + int(rng.integers(0, 20))
        texts.append(" ".join(vocab[j]
                              for j in rng.integers(0, len(vocab), nw)))
    texts += [texts[0], texts[1]]           # exact dups (40, 41)
    w = texts[2].split(); w[3] = "changed"
    texts.append(" ".join(w))               # near-dup of 2 (42)
    texts += ["too short", "tiny"]          # quality rejects (43, 44)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))
    clean, stats = prepare_corpus(ds, min_words=20, min_quality=0.0,
                                  neardup_threshold=0.6)
    t = _table(clean)
    ids = set(t["doc_id"].to_numpy(zero_copy_only=False).tolist())
    assert stats["input"] == 45
    assert stats["after_quality"] == 43          # 2 short docs gone
    assert stats["after_exact_dedup"] == 41      # 2 exact dups gone
    assert 40 not in ids and 41 not in ids
    assert 42 not in ids                         # near-dup dropped
    assert 2 in ids                              # keep-first policy
    assert "embedding" in t.column_names
    assert stats["after_neardup"] == len(ids)

    # the shuffle id-filter scale path (broadcast_limit=0 forces it)
    # must be row-identical to the broadcast path
    clean2, stats2 = prepare_corpus(ds, min_words=20, min_quality=0.0,
                                    neardup_threshold=0.6,
                                    broadcast_limit=0)
    ids2 = set(_table(clean2)["doc_id"].to_numpy(
        zero_copy_only=False).tolist())
    assert ids2 == ids and stats2 == stats


def test_asof_join_oracle():
    from python_graphblas_ray.pipelines.windows import asof_join
    lt = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([10, 20, 5, 50, 7], pa.int64()).cast(
            pa.timestamp("us")),
        "event_id": pa.array([100, 101, 102, 103, 104], pa.int64()),
    })
    rt = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([8, 15, 60], pa.int64()).cast(pa.timestamp("us")),
        "price": pa.array([1.0, 2.0, 3.0]),
    })
    out = _table(asof_join(ray.data.from_arrow(lt),
                           ray.data.from_arrow(rt), key="user_id",
                           ts_col="ts", right_value_cols=("ts", "price"))
                 ).to_pandas().sort_values("event_id")
    # event 100 (u1,t10) -> right t8; 101 (u1,t20) -> t15; 102 (u1,t5) ->
    # none; 103 (u2,t50) -> none (right at 60 is later); 104 (u3) -> none
    assert list(out.event_id) == [100, 101]
    assert list(out.price_r) == [1.0, 2.0]


def test_range_join_oracle():
    from python_graphblas_ray.pipelines.windows import range_join
    lt = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                   "x": pa.array([5.0, 15.0, 5.0])})
    rt = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                   "lo": pa.array([0.0, 10.0, 6.0]),
                   "hi": pa.array([10.0, 20.0, 9.0])})
    out = _table(range_join(ray.data.from_arrow(lt),
                            ray.data.from_arrow(rt), key="k",
                            left_val="x", right_lo="lo", right_hi="hi")
                 ).to_pandas()
    got = set(zip(out.x.tolist(), out.lo.tolist()))
    # (1,5) in [0,10); (1,15) in [10,20); (2,5) matches nothing
    assert got == {(5.0, 0.0), (15.0, 10.0)}


def test_hll_distinct_within_error():
    """HLL grouped approx-distinct within ~3σ of standard error vs the
    exact counts (p=12 → σ≈1.6%)."""
    from python_graphblas_ray.stages.sketch import hll_distinct
    rng = np.random.default_rng(3)
    n = 60_000
    group = rng.integers(0, 3, n)
    # distinct cardinalities per group: ~100, ~5000, ~20000
    vals = np.where(group == 0, rng.integers(0, 100, n),
                    np.where(group == 1, rng.integers(0, 5000, n),
                             rng.integers(0, 20000, n)))
    ds = ray.data.from_arrow(pa.table({
        "g": group.astype(np.int64), "v": vals.astype(np.int64)}))
    out = _table(hll_distinct(ds, keys=["g"], value_col="v")).to_pandas()
    import pandas as pd
    exact = pd.DataFrame({"g": group, "v": vals}).groupby("g")["v"] \
        .nunique()
    for row in out.itertuples():
        e = exact[row.g]
        assert abs(row.approx_distinct - e) <= max(0.05 * e, 10), \
            (row.g, row.approx_distinct, e)


def test_dedup_tolerates_null_text():
    """Scraped corpora carry null text rows: tokenize stages must treat
    them as zero-token docs, not NaN counts (np.repeat crash)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_graphblas_ray.pipelines.dedup import (
        minhash_lsh_pairs,
        simhash_signatures,
        word_jaccard_pairs,
    )

    docs = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a b c d e", None, "a b c d e", "x y z w v", None, "q"]}))
    pairs = minhash_lsh_pairs(docs).to_pandas()
    assert {(r.ia, r.ib) for r in pairs.itertuples()} == {(0, 2)}
    wj = word_jaccard_pairs(docs, threshold=0.9).to_pandas()
    assert len(wj) == 1
    sigs = simhash_signatures(docs).to_pandas()
    # zero-token docs emit no signature row (no content signal)
    assert sorted(sigs["doc_id"]) == [0, 2, 3, 5]


def test_ann_topk_missing_query_ids_empty_result():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_graphblas_ray.pipelines.similarity import ann_topk

    emb = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(4, dtype=np.int64),
        "embedding": [list(np.random.default_rng(i).random(8))
                      for i in range(4)]}))
    ds = ann_topk(emb, query_ids=[999999])
    assert ds.count() == 0
    assert set(ds.schema().names) == {"query_id", "neighbor_id", "rank"}


def _decon_fixture():
    import ray.data
    bench = ray.data.from_arrow(pa.table({
        "doc_id": np.array([100], dtype=np.int64),
        "text": ["alpha beta gamma delta"]}))
    train = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "xx alpha beta gamma yy",       # shares 3-gram -> dropped
            "alpha beta zeta gamma delta",  # no shared 3-gram -> kept
            "beta gamma",                   # too short for a 3-gram -> kept
            "",                             # empty -> kept
            "beta gamma delta omega",       # shares -> dropped
        ]}))
    return train, bench


def test_decontaminate_broadcast_path():
    from python_graphblas_ray.pipelines.corpus import decontaminate
    train, bench = _decon_fixture()
    clean, stats = decontaminate(train, bench, ngram=3)
    ids = sorted(pa.concat_tables(list(clean.iter_batches(
        batch_format="pyarrow")))["doc_id"].to_pylist())
    assert ids == [1, 2, 3]
    assert stats["clean"] == 3 and stats["bench_grams"] == 2


def test_decontaminate_shuffle_path_matches_broadcast():
    from python_graphblas_ray.pipelines.corpus import decontaminate
    train, bench = _decon_fixture()
    clean, _ = decontaminate(train, bench, ngram=3, broadcast_limit=0)
    ids = sorted(pa.concat_tables(list(clean.iter_batches(
        batch_format="pyarrow")))["doc_id"].to_pylist())
    assert ids == [1, 2, 3]


def test_duplicate_spans_planted():
    """ExactSubstr fixed-window dedup: a 6-token phrase planted in two
    docs is flagged at BOTH positions; unique text is untouched."""
    import ray.data

    from python_graphblas_ray.pipelines.dedup import duplicate_spans

    phrase = "alpha beta gamma delta epsilon zeta"
    texts = [
        "intro words here " + phrase + " tail one",      # pos 3..8
        phrase + " completely different ending words",   # pos 0..5
        "nothing shared in this document at all okay",
        "short doc",                                      # < window
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    out = pa.concat_tables(list(duplicate_spans(ds, window=6)
                                .iter_batches(batch_format="pyarrow")))
    got = sorted(zip(out["doc_id"].to_pylist(), out["pos"].to_pylist()))
    assert got == [(0, 3), (1, 0)]


def test_neardup_clusters_transitive():
    """Clustering collapses transitive near-dup chains via the engine's
    own FastSV components: a~b and b~c land in ONE cluster labeled by
    the smallest id, even if (a, c) was never emitted as a pair."""
    import ray.data

    from python_graphblas_ray.pipelines.corpus import neardup_clusters

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight").split()
    def variant(i):
        w = list(base)
        w[i] = f"tok{i}"
        return " ".join(w)
    texts = [" ".join(base), variant(2), variant(17),
             "completely different text " + " ".join(f"w{i}" for i in range(20)),
             "another unrelated document " + " ".join(f"z{i}" for i in range(20))]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(5, dtype=np.int64), "text": texts}))
    out = pa.concat_tables(list(neardup_clusters(ds, threshold=0.6)
                                .iter_batches(batch_format="pyarrow")))
    cl = dict(zip(out["doc_id"].to_pylist(), out["cluster"].to_pylist()))
    assert cl[0] == cl[1] == cl[2] == 0   # one transitive cluster
    assert cl[3] == 3 and cl[4] == 4      # singletons keep their id

    # path parity: forcing the distributed engine (local_cc_limit=0)
    # must produce the identical labeling
    out2 = pa.concat_tables(list(
        neardup_clusters(ds, threshold=0.6, local_cc_limit=0)
        .iter_batches(batch_format="pyarrow")))
    cl2 = dict(zip(out2["doc_id"].to_pylist(),
                   out2["cluster"].to_pylist()))
    assert cl2 == cl


def test_cut_duplicate_spans_keep_first():
    """ExactSubstr cut action: the globally-first occurrence of a
    duplicated span survives; later occurrences are excised; clean docs
    pass through byte-identical."""
    import ray.data

    from python_graphblas_ray.pipelines.dedup import cut_duplicate_spans

    phrase = "alpha beta gamma delta epsilon zeta"
    texts = [
        "intro words here " + phrase + " tail one",     # FIRST occurrence
        phrase + " completely different ending words",  # later → cut
        "nothing shared in this document at all okay",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(3, dtype=np.int64), "text": texts}))
    out = pa.concat_tables(list(cut_duplicate_spans(ds, window=6)
                                .iter_batches(batch_format="pyarrow")))
    got = dict(zip(out["doc_id"].to_pylist(), out["text"].to_pylist()))
    assert got[0] == texts[0]                 # first occurrence kept
    assert got[1] == "completely different ending words"
    assert got[2] == texts[2]                 # untouched
    # keep_first=False cuts BOTH occurrences
    out2 = pa.concat_tables(list(
        cut_duplicate_spans(ds, window=6, keep_first=False)
        .iter_batches(batch_format="pyarrow")))
    got2 = dict(zip(out2["doc_id"].to_pylist(), out2["text"].to_pylist()))
    assert got2[0] == "intro words here tail one"
    assert got2[1] == "completely different ending words"


def test_duplicate_spans_random_vs_bruteforce():
    """Random small-vocab corpora (natural window collisions) vs a
    brute-force dict-of-window-tuples oracle."""
    import ray.data

    from python_graphblas_ray.pipelines.dedup import duplicate_spans

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(6)]
    W = 4
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 30))))
             for _ in range(40)]
    expected = {}
    for d, t in enumerate(texts):
        ws = t.split()
        for p in range(len(ws) - W + 1):
            expected.setdefault(tuple(ws[p:p + W]), []).append((d, p))
    want = sorted(occ for occs in expected.values() if len(occs) >= 2
                  for occ in occs)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))
    out = pa.concat_tables(list(duplicate_spans(ds, window=W)
                                .iter_batches(batch_format="pyarrow")))
    got = sorted(zip(out["doc_id"].to_pylist(), out["pos"].to_pylist()))
    assert got == want


def test_semantic_dedup_planted_groups():
    """Three planted semantic groups (same direction ± tiny noise) plus
    orthogonal singletons: each group collapses to its smallest id."""
    from python_graphblas_ray.pipelines.corpus import semantic_dedup

    rng = np.random.default_rng(9)
    d = 16
    base = rng.normal(size=(3, d))
    rows = []
    owner = {}
    vid = 0
    for g in range(3):
        for _ in range(4):  # 4 near-identical members per group
            v = base[g] + rng.normal(scale=1e-3, size=d)
            rows.append(v / np.linalg.norm(v))
            owner[vid] = g
            vid += 1
    # orthogonal singletons (standard basis — cosine ~0 to the groups)
    for k in range(4):
        v = np.zeros(d)
        v[k + 10] = 1.0
        rows.append(v)
        owner[vid] = 100 + k
        vid += 1
    emb = pa.table({
        "vec_id": np.arange(vid, dtype=np.int64),
        "embedding": pa.array([list(map(float, r)) for r in rows],
                              type=pa.list_(pa.float32()))})
    out = {r["vec_id"]: (r["cluster"], r["keep"])
           for r in semantic_dedup(ray.data.from_arrow(emb),
                                   threshold=0.99).take_all()}
    assert len(out) == vid
    # group members share a cluster = the group's smallest id; exactly
    # one keep per cluster
    for g in range(3):
        members = [v for v, o in owner.items() if o == g]
        clusters = {out[v][0] for v in members}
        assert clusters == {min(members)}
    keeps = [v for v, (c, k) in out.items() if k]
    assert sorted(keeps) == sorted({c for c, _ in out.values()})


def test_heavy_hitters_exact_when_capacity_covers_cardinality():
    from python_graphblas_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(12)
    vals = rng.choice([f"k{i}" for i in range(20)], size=5000,
                      p=np.linspace(1, 40, 20) / np.linspace(1, 40, 20).sum())
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    out = heavy_hitters(ds, "v", k=64)
    got = dict(zip(out["v"].to_pylist(), out["mg_count"].to_pylist()))
    import collections
    want = collections.Counter(vals.tolist())
    assert got == dict(want)
    # sorted desc
    cnts = out["mg_count"].to_pylist()
    assert cnts == sorted(cnts, reverse=True)


def test_heavy_hitters_mg_guarantee_under_compression():
    """k << cardinality: every key with freq > N/k survives and counts
    are within N/k below truth (the Misra-Gries bound)."""
    from python_graphblas_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(13)
    # one dominant key + a long tail of rare keys
    vals = np.concatenate([
        np.repeat("HOT", 3000),
        np.repeat("WARM", 800),
        rng.choice([f"t{i}" for i in range(2000)], size=1200)])
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    k = 16
    out = heavy_hitters(ds, "v", k=k)
    assert len(out) <= k
    got = dict(zip(out["v"].to_pylist(), out["mg_count"].to_pylist()))
    N = len(vals)
    import collections
    true = collections.Counter(vals.tolist())
    for key, tc in true.items():
        if tc > N / k:
            assert key in got, key
    for key, est in got.items():
        assert est <= true[key] <= est + N / k + 1e-9, (key, est, true[key])


def test_bloom_no_false_negatives_and_low_fpr():
    from python_graphblas_ray.stages.sketch import (bloom_build,
                                                    bloom_contains)

    rng = np.random.default_rng(21)
    present = rng.integers(0, 1 << 62, 5000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"g": present})).repartition(4)
    bits, m, k = bloom_build(ds, "g")
    assert bloom_contains(bits, m, k, present).all()  # no false negatives
    absent = rng.integers(0, 1 << 62, 20000).astype(np.int64)
    absent = absent[~np.isin(absent, present)]
    fpr = bloom_contains(bits, m, k, absent).mean()
    assert fpr < 0.02, fpr  # ~0.24% expected at 16 bits/key, k=4


def test_decontaminate_bloom_route_matches_broadcast():
    from python_graphblas_ray.pipelines.corpus import decontaminate

    rng = np.random.default_rng(22)
    words = [f"w{i}" for i in range(300)]
    docs = [" ".join(rng.choice(words, size=20)) for _ in range(200)]
    # plant benchmark phrases into some training docs
    bench = [" ".join(rng.choice(words, size=15)) for _ in range(10)]
    for i in range(0, 40, 4):
        docs[i] = docs[i] + " " + bench[i % 10]
    dds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "text": docs})).repartition(4)
    bds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(bench), dtype=np.int64),
        "text": bench}))
    keep = {}
    for method in ("broadcast", "bloom", "shuffle"):
        clean, stats = decontaminate(dds, bds, ngram=3, method=method)
        keep[method] = sorted(r["doc_id"] for r in
                              clean.select_columns(["doc_id"]).take_all())
        assert stats["method"] == method
    assert keep["broadcast"] == keep["bloom"] == keep["shuffle"]
    assert len(keep["broadcast"]) < 200  # something was dropped


def test_quantile_sketch_exact_regime_matches_numpy():
    from python_graphblas_ray.stages.sketch import (quantile_query,
                                                    quantile_sketch)

    rng = np.random.default_rng(31)
    x = rng.normal(size=5000)
    ds = ray.data.from_arrow(pa.table({"v": x})).repartition(8)
    vals, wts, total = quantile_sketch(ds, "v", cap=8192)
    assert total == len(x) and (wts == 1.0).all()  # no compaction fired
    qs = [0.1, 0.5, 0.9, 0.99]
    got = quantile_query(vals, wts, total, qs)
    xs = np.sort(x)
    want = [xs[min(int(np.ceil(q * len(x))) - 1, len(x) - 1)]
            for q in qs]
    np.testing.assert_allclose(got, want)


def test_quantile_sketch_rank_error_under_compaction():
    from python_graphblas_ray.stages.sketch import (quantile_query,
                                                    quantile_sketch)

    rng = np.random.default_rng(32)
    x = rng.exponential(size=100_000)
    ds = ray.data.from_arrow(pa.table({"v": x})).repartition(16)
    vals, wts, total = quantile_sketch(ds, "v", cap=1024)
    assert len(vals) <= 1024 and abs(total - len(x)) < 1e-6
    xs = np.sort(x)
    for q in (0.25, 0.5, 0.9):
        est = quantile_query(vals, wts, total, [q])[0]
        true_rank = np.searchsorted(xs, est) / len(x)
        assert abs(true_rank - q) < 0.05, (q, true_rank)


def _cdc_table(texts, **kw):
    from python_graphblas_ray.pipelines.dedup import cdc_chunks

    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": pa.array(texts, type=pa.string())}))
    out = pa.concat_tables(cdc_chunks(ds, mask_bits=6).iter_batches(
        batch_format="pyarrow")).to_pandas()
    return out.sort_values(["doc_id", "chunk_ix"]).reset_index(drop=True)


def test_cdc_chunks_tile_and_deterministic():
    rng = np.random.default_rng(41)
    texts = ["".join(rng.choice(list("abcdefgh \n"), size=int(s)))
             for s in rng.integers(0, 2000, 30)]
    t1, t2 = _cdc_table(texts), _cdc_table(texts)
    assert t1.equals(t2)
    # chunks tile each doc exactly
    for i, txt in enumerate(texts):
        rows = t1[t1.doc_id == i]
        if len(txt) == 0:
            assert len(rows) == 0
            continue
        assert rows.start.iloc[0] == 0
        assert (rows.start + rows.length).iloc[-1] == len(
            txt.encode("utf-8"))
        assert (rows.start.to_numpy()[1:] ==
                (rows.start + rows.length).to_numpy()[:-1]).all()


def test_cdc_shift_resistance_and_content_addressing():
    """Insert bytes near the front: later chunk hashes are unchanged;
    a shared passage yields identical chunk hashes in different docs
    at different offsets."""
    rng = np.random.default_rng(42)
    body = "".join(rng.choice(list("abcdefgh "), size=4000))
    t_orig = _cdc_table([body])
    t_edit = _cdc_table(["XYZ" + body])
    h1 = t_orig.chunk_hash.tolist()
    h2 = t_edit.chunk_hash.tolist()
    # all but the first few chunks survive the edit (suffix alignment)
    k = 3
    assert h1[-(len(h1) - k):] == h2[-(len(h1) - k):]
    # content addressing across docs/offsets
    passage = body[500:2500]
    docs = ["PREFIX-" * 10 + passage, passage + " tail", passage]
    tt = _cdc_table(docs)
    sets = [set(tt[tt.doc_id == i].chunk_hash) for i in range(3)]
    common = sets[0] & sets[1] & sets[2]
    assert len(common) >= 10  # interior chunks of the shared passage


def test_cdc_dedup_stats_detects_duplication():
    from python_graphblas_ray.pipelines.dedup import cdc_dedup_stats

    rng = np.random.default_rng(43)
    base = "".join(rng.choice(list("abcdefgh "), size=3000))
    docs = [base] * 10 + ["".join(rng.choice(list("abcdefgh "),
                                             size=3000))]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "text": docs}))
    st = cdc_dedup_stats(ds, mask_bits=6)
    assert st["total_bytes"] == sum(len(d) for d in docs)
    assert st["dedup_ratio"] < 0.25  # 10 identical copies collapse


def test_cdc_neardup_pairs_shared_passage():
    from python_graphblas_ray.pipelines.dedup import cdc_neardup_pairs

    rng = np.random.default_rng(61)
    passage = "".join(rng.choice(list("abcdefgh "), size=3000))
    docs = [
        "A" * 50 + passage,                 # 0: shares passage with 1
        passage + " trailing stuff here",   # 1
        "".join(rng.choice(list("abcdefgh "), size=3000)),  # 2: unrelated
        "".join(rng.choice(list("abcdefgh "), size=3000)),  # 3: unrelated
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(4, dtype=np.int64), "text": docs}))
    pairs = {(r["ia"], r["ib"]): r["shared_chunks"]
             for r in cdc_neardup_pairs(ds, min_shared=3,
                                        mask_bits=6).take_all()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 3
    assert all(p == (0, 1) for p in pairs)


def test_cdc_neardup_hot_chunk_guard():
    """A boilerplate chunk present in EVERY doc must not create all-pairs
    when its df exceeds the guard."""
    from python_graphblas_ray.pipelines.dedup import cdc_neardup_pairs

    rng = np.random.default_rng(62)
    boiler = "".join(rng.choice(list("abcdefgh "), size=1500))
    docs = [boiler + "".join(rng.choice(list("abcdefgh "), size=500))
            for _ in range(20)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(20, dtype=np.int64), "text": docs}))
    guarded = cdc_neardup_pairs(ds, min_shared=2, mask_bits=6,
                                max_chunk_df=10).take_all()
    open_pairs = cdc_neardup_pairs(ds, min_shared=2, mask_bits=6,
                                   max_chunk_df=1000).take_all()
    assert len(open_pairs) == 20 * 19 // 2   # boilerplate → all pairs
    assert len(guarded) == 0                 # guard kills the hot chunks


def test_funnel_hand_case_and_brute_force():
    from python_graphblas_ray.pipelines.windows import funnel

    def mk(users, tss, types):
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(types, pa.string()),
        })

    # user 1: full funnel; user 2: click before view (doesn't count) →
    # stops at view; user 3: view only; user 4: never enters
    t = mk([1, 1, 1, 2, 2, 3, 4],
           [10, 20, 30, 5, 8, 50, 60],
           ["view", "click", "buy", "click", "view", "view", "other"])
    out = _table(funnel(ray.data.from_arrow(t),
                        ["view", "click", "buy"])).to_pandas()
    got = dict(zip(out.user_id, out.step_reached))
    assert got == {1: 3, 2: 1, 3: 1}
    r1 = out[out.user_id == 1].iloc[0]
    assert r1.ts_first.value // 1000 == 10 and r1.ts_last.value // 1000 == 30

    # equal timestamps do NOT satisfy "strictly after"
    t2 = mk([7, 7], [100, 100], ["view", "click"])
    out2 = _table(funnel(ray.data.from_arrow(t2),
                         ["view", "click"])).to_pandas()
    assert dict(zip(out2.user_id, out2.step_reached)) == {7: 1}

    # randomized brute-force parity
    rng = np.random.default_rng(31)
    n = 3000
    users = rng.integers(0, 80, n)
    tss = rng.integers(0, 10_000, n)
    types = rng.choice(["view", "click", "buy", "other"], n)
    steps = ["view", "click", "buy"]
    out3 = _table(funnel(
        ray.data.from_arrow(mk(users, tss, types)), steps,
        num_partitions=5)).to_pandas()
    got3 = dict(zip(out3.user_id, out3.step_reached))
    expect = {}
    for uu in np.unique(users):
        evs = sorted((t_, ty) for t_, ty in
                     zip(tss[users == uu], types[users == uu]))
        cur, depth = None, 0
        for want in steps:
            nxts = [t_ for t_, ty in evs
                    if ty == want and (cur is None or t_ > cur)]
            if not nxts:
                break
            cur = min(nxts)
            depth += 1
        if depth:
            expect[uu] = depth
    assert got3 == expect


def test_funnel_horizon_cuts_slow_conversions():
    from python_graphblas_ray.pipelines.windows import funnel

    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([0, 120_000_000, 0, 30_000_000],
                       pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(["view", "click"] * 2, pa.string()),
    })
    # horizon 1 minute: user 1 converts at 2min (too slow), user 2 at 30s
    out = _table(funnel(ray.data.from_arrow(t), ["view", "click"],
                        horizon_minutes=1)).to_pandas()
    got = dict(zip(out.user_id, out.step_reached))
    assert got == {1: 1, 2: 2}


def test_retention_matches_bruteforce():
    from python_graphblas_ray.pipelines.windows import retention

    rng = np.random.default_rng(37)
    n = 2500
    users = rng.integers(0, 60, n)
    day_us = 86_400_000_000
    tss = (rng.integers(0, 20, n) * day_us
           + rng.integers(0, day_us, n))  # random day + intra-day time
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
    })
    out = _table(retention(ray.data.from_arrow(t),
                           num_partitions=4)).to_pandas()
    got = {(r.cohort_day.value // 1000 // day_us * 1000, r.day_offset):
           r.n_users for r in out.itertuples()}
    # brute force
    days = tss // day_us
    expect = {}
    first = {}
    for u in np.unique(users):
        first[u] = days[users == u].min()
    import collections
    cells = collections.Counter()
    seen = set()
    for u, d in zip(users, days):
        if (u, d) in seen:
            continue
        seen.add((u, d))
        cells[(first[u], d - first[u])] += 1
    expect = {(int(c) * 1000, int(o)): v for (c, o), v in cells.items()}
    got_norm = {(int(k[0] // 1000), k[1]): v for k, v in got.items()}
    exp_norm = {(int(k[0] // 1000), k[1]): v for k, v in expect.items()}
    assert got_norm == exp_norm
    # every cohort has an offset-0 cell counting its full size
    coh_sizes = collections.Counter(first.values())
    for c, size in coh_sizes.items():
        assert exp_norm[(int(c), 0)] == size


def test_dedup_lines_boilerplate_removal():
    """Lines in >= min_df distinct docs vanish everywhere; unique prose
    and line order survive; null/empty/all-boilerplate docs come back
    as empty strings; duplicate lines WITHIN one doc don't count."""
    import pyarrow as pa
    import ray

    from python_graphblas_ray.pipelines.dedup import dedup_lines

    docs = pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["NAV\nalpha prose\nFOOTER",
                 "NAV\nbeta prose\nFOOTER",
                 "solo\nsolo\nsolo",          # within-doc dups: df = 1
                 None,
                 "NAV\nFOOTER"],              # all boilerplate
    })
    out = {r["doc_id"]: r["clean_text"]
           for r in dedup_lines(ray.data.from_arrow(docs),
                                min_df=2).take_all()}
    assert out[0] == "alpha prose"
    assert out[1] == "beta prose"
    assert out[2] == "solo\nsolo\nsolo"
    assert out[3] == ""
    assert out[4] == ""

    # min_df above every df: nothing is dropped
    keep_all = {r["doc_id"]: r["clean_text"]
                for r in dedup_lines(ray.data.from_arrow(docs),
                                     min_df=99).take_all()}
    assert keep_all[0] == "NAV\nalpha prose\nFOOTER"
    assert keep_all[2] == "solo\nsolo\nsolo"


def test_type_token_ratio_hand_cases():
    import pyarrow as pa
    import ray

    from python_graphblas_ray.stages.text import type_token_ratio

    docs = pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b c d",          # all distinct -> 1.0
                 "a a a a",          # one type -> 0.25
                 "x y x y",          # 2/4
                 None,               # no tokens -> 0.0
                 "   "],             # whitespace-only -> 0.0
    })
    out = {r["doc_id"]: r["ttr"]
           for r in type_token_ratio(ray.data.from_arrow(docs)).take_all()}
    assert out[0] == 1.0
    assert out[1] == 0.25
    assert out[2] == 0.5
    assert out[3] == 0.0
    assert out[4] == 0.0


def test_windowed_distinct_users_vs_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray

    from python_graphblas_ray.pipelines.windows import (
        windowed_distinct_users)

    rng = np.random.default_rng(5)
    n_ev = 3000
    us_day = 86_400_000_000
    users = rng.integers(0, 80, n_ev).astype(np.int64)
    ts = (rng.integers(0, 10, n_ev) * us_day
          + rng.integers(0, us_day, n_ev)).astype("datetime64[us]")
    ds = ray.data.from_arrow(pa.table({
        "user_id": users, "ts": pa.array(ts)}))
    got = {np.datetime64(r["window"], "us").astype(np.int64): r["n_users"]
           for r in windowed_distinct_users(ds).take_all()}
    days = ts.astype("datetime64[D]").astype(np.int64)
    want = {int(d) * us_day: len(np.unique(users[days == d]))
            for d in np.unique(days)}
    assert got == want


def test_vocab_signatures_duplicate_and_similarity_behavior():
    """Vocabulary-rank MinHash/SimHash: identical docs get identical
    signatures; a near-duplicate (one word changed in a long doc) keeps
    a small SimHash hamming distance and shares most MinHash
    components, while an unrelated doc does neither."""
    import pyarrow as pa
    import ray

    from python_graphblas_ray.pipelines.dedup import (
        minhash_vocab_signatures, simhash_vocab_signatures)

    words = [f"tok{i}" for i in range(120)]
    base = " ".join(words)
    near = " ".join(words[:-1] + ["CHANGED"])
    other = " ".join(f"zz{i}" for i in range(120))
    docs = pa.table({"doc_id": [0, 1, 2, 3],
                     "text": [base, base, near, other]})
    ds = ray.data.from_arrow(docs)

    mh = {}
    for r in minhash_vocab_signatures(ds, num_hashes=8).take_all():
        mh.setdefault(r["doc_id"], {})[r["h"]] = r["sig"]
    assert mh[0] == mh[1]                      # exact dup: identical
    shared_near = sum(mh[0][h] == mh[2][h] for h in range(8))
    shared_other = sum(mh[0][h] == mh[3][h] for h in range(8))
    assert shared_near >= 6                    # J ≈ 119/121
    assert shared_other == 0                   # disjoint vocab

    sh = {r["doc_id"]: r["sig"]
          for r in simhash_vocab_signatures(ds).take_all()}
    assert sh[0] == sh[1]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sh[0], sh[2]) <= 12             # near-dup: few bit flips
    assert ham(sh[0], sh[3]) > ham(sh[0], sh[2])


def test_count_min_sketch_properties():
    """CMS invariants: never undercounts; exact when width is ample;
    the distributed block-partial build equals a single-pass build."""
    from python_graphblas_ray.stages.sketch import cms_build, cms_estimate

    rng = np.random.default_rng(5)
    vals = rng.zipf(1.5, 20_000) % 1000  # skewed stream, ids 0..999
    ids, true = np.unique(vals, return_counts=True)
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(vals, pa.int64())})).repartition(6)

    tight = cms_build(ds, "x", width=64, depth=4)
    est = cms_estimate(tight, ids)
    assert (est >= true).all()                      # never undercounts
    assert (est - true).max() <= 2 * len(vals) / 64  # CM error bound-ish

    wide = cms_build(ds, "x", width=1 << 14, depth=4)
    np.testing.assert_array_equal(cms_estimate(wide, ids), true)

    single = cms_build(ds.repartition(1), "x", width=64, depth=4)
    np.testing.assert_array_equal(tight, single)    # partial-order free
