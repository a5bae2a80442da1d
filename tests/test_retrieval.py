"""BM25 / TF-IDF retrieval vs an independent DuckDB SQL oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from python_graphblas_ray.pipelines.retrieval import (
    bm25_topk,
    corpus_stats,
    tfidf_topk,
)

SF = "/root/testdata/sf0.01"
QUERIES = {"q0": "hash join", "q1": "fast scan filter",
           "q2": "customer order"}
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"])


def _oracle(docs, queries, k, k1, b):
    con = duckdb.connect()
    con.register("documents", docs)
    vocab = sorted({w for q in queries.values() for w in q.split()})
    vlist = ", ".join(f"'{w}'" for w in vocab)
    qrows = ", ".join(f"('{q}', '{w}')"
                      for q in sorted(queries)
                      for w in queries[q].split())
    sql = f"""
    WITH tok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
        FROM documents) WHERE w <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT (SELECT count(*) FROM documents) AS N,
      (SELECT count(*) FROM tok) * 1.0
        / (SELECT count(*) FROM documents) AS avgdl),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
           WHERE w IN ({vlist}) GROUP BY 1, 2),
    df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
    q(qid, w) AS (VALUES {qrows}),
    scored AS (
      SELECT q.qid, tf.doc_id,
        sum(ln(1 + ((SELECT N FROM stats) - df.df + 0.5) / (df.df + 0.5))
            * tf.tf * ({k1} + 1)
            / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl
                               / (SELECT avgdl FROM stats)))) AS s
      FROM q JOIN tf ON tf.w = q.w
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN df ON df.w = tf.w
      GROUP BY 1, 2),
    ranked AS (SELECT qid, doc_id, s,
      row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id) AS rn
      FROM scored)
    SELECT qid, doc_id, ROUND(s, 6) AS score FROM ranked
    WHERE rn <= {k} ORDER BY qid, score DESC, doc_id
    """
    return con.execute(sql).fetchall()


def test_corpus_stats(docs):
    n, avgdl = corpus_stats(ray.data.from_arrow(docs))
    con = duckdb.connect()
    con.register("documents", docs)
    want_n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    want_tok = con.execute("""
      SELECT count(*) FROM (SELECT unnest(
        string_split_regex(text, '\\s+')) AS w FROM documents)
      WHERE w <> ''""").fetchone()[0]
    assert n == want_n
    assert avgdl == pytest.approx(want_tok / want_n)


def test_bm25_matches_duckdb(docs):
    got = bm25_topk(ray.data.from_arrow(docs), QUERIES, k=10,
                    k1=K1, b=B)
    want = _oracle(docs, QUERIES, 10, K1, B)
    rows = list(zip(got["qid"].to_pylist(), got["doc_id"].to_pylist(),
                    got["score"].to_pylist()))
    assert len(rows) == len(want) == 30
    for (gq, gd, gs), (wq, wd, ws) in zip(rows, want):
        assert (gq, gd) == (wq, wd)
        assert gs == pytest.approx(float(ws), abs=2e-6)


def test_bm25_ordering_and_k(docs):
    got = bm25_topk(ray.data.from_arrow(docs), {"q": "merge"}, k=5)
    assert len(got) == 5
    s = got["score"].to_pylist()
    assert s == sorted(s, reverse=True)
    assert all(v > 0 for v in s)


def test_tfidf_is_tf_weighted(docs):
    """In the k1→∞ limit the per-term component is tf·idf exactly."""
    got = tfidf_topk(ray.data.from_arrow(docs), {"q": "merge"}, k=3)
    con = duckdb.connect()
    con.register("documents", docs)
    n_docs, df, tf_top = con.execute("""
      WITH tok AS (SELECT doc_id, w FROM (SELECT doc_id,
          unnest(string_split_regex(text, '\\s+')) AS w FROM documents)
        WHERE w <> ''),
      tf AS (SELECT doc_id, count(*) AS tf FROM tok
             WHERE w = 'merge' GROUP BY 1)
      SELECT (SELECT count(*) FROM documents),
             (SELECT count(*) FROM tf),
             (SELECT max(tf) FROM tf)""").fetchone()
    idf = float(np.log1p((n_docs - df + 0.5) / (df + 0.5)))
    assert got["score"].to_pylist()[0] == pytest.approx(tf_top * idf,
                                                        rel=1e-4)


def test_bm25_empty_vocab_raises(docs):
    with pytest.raises(ValueError):
        bm25_topk(ray.data.from_arrow(docs), {"q": "  "})


def test_stats_consistent_on_unicode_whitespace():
    """Review regression: N/avgdl must come from the same tokenization
    as the postings (NBSP splits in utf8_split_whitespace)."""
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["a b c", "merge merge"])})
    n, avgdl = corpus_stats(ray.data.from_arrow(t))
    assert n == 2 and avgdl == pytest.approx(2.5)
    got = bm25_topk(ray.data.from_arrow(t), {"q": "merge"}, k=2)
    assert got["doc_id"].to_pylist() == [1]


def test_rrf_fuse_matches_bruteforce():
    """The broadcast beat-count quality rank equals the global-sort
    rank, and rrf = 1/(60+r_lex) + 1/(60+r_quality) exactly."""
    from python_graphblas_ray.pipelines.retrieval import rrf_fuse

    topk = pa.table({
        "qid": pa.array(["q0", "q0", "q0", "q1", "q1"]),
        "doc_id": pa.array([7, 3, 11, 3, 20], pa.int64()),
        "score": pa.array([2.5, 2.5, 1.0, 9.0, 1.5], pa.float64()),
    })
    rng = np.random.default_rng(2)
    ids = np.arange(40, dtype=np.int64)
    qs = np.round(rng.normal(size=40), 8)
    qs[3] = qs[7]  # force a quality tie broken by doc_id
    quality = ray.data.from_arrow(pa.table({
        "doc_id": ids, "lm_score": qs})).repartition(4)

    out = rrf_fuse(topk, quality).to_pandas()
    order = np.lexsort((ids, -qs))
    r_qual = {int(ids[order][i]): i + 1 for i in range(40)}
    # q0: docs 7 and 3 tie on rounded score → doc 3 ranks 1, 7 ranks 2
    r_lex = {("q0", 3): 1, ("q0", 7): 2, ("q0", 11): 3,
             ("q1", 3): 1, ("q1", 20): 2}
    got = {(r.qid, r.doc_id): r.rrf for r in out.itertuples()}
    for (q, d), rl in r_lex.items():
        expect = round(1.0 / (60 + rl) + 1.0 / (60 + r_qual[d]), 8)
        assert got[(q, d)] == expect, (q, d)
