"""Driver-contract checks: entry() runs, and a sample of queries() matches
oracle_sql() via DuckDB at sf0.001 (the full sweep runs in the driver at
sf0.01 — this keeps the suite fast while guarding the contract)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# representative SQL-checked sample: one per operator family
SAMPLE = ["edges_build", "degree_out", "mxv_plus_times", "mxm_plus_times",
          "ewise_add_plus", "select_tril", "assign_scalar",
          "triangle_count", "bfs_levels", "dedup_exact", "ann_topk",
          "token_count", "events_window",
          # tail queries (outside the driver's 50-entry window) that DO
          # have oracle SQL — their only automated parity check is here
          "link_jaccard", "docs_split", "docs_quota", "docs_bm25",
          "docs_repetition", "docs_decontaminate", "docs_pii",
          "docs_dup_spans", "lpa_iter2", "edge_support", "link_scores",
          # round-2 additions (scc/mis/reciprocity/docs_lm_score are in
          # the driver window; semantic_dedup's only parity check is here)
          "scc", "mis", "reciprocity", "docs_lm_score", "semantic_dedup",
          "closeness", "host_graph", "diameter", "events_heavy_hitters",
          "pages_roundtrip", "assortativity", "local_clustering",
          "events_quantiles", "docs_mixture", "events_topk",
          "pagerank_weighted5", "docs_ccnet_buckets", "modularity",
          # link-analysis additions: fixed-iter HITS / seeded PageRank,
          # DAG layering, co-citation, and the rename-merged suites
          "hits_iter3", "trustrank_iter5", "dag_layers", "cocitation",
          "graph_metric_suite", "centrality_suite",
          "sampling_suite", "langstats_suite", "salsa_iter3",
          "truss_peel3", "anf", "effective_diameter", "bowtie",
          "critical_path", "transitivity", "rich_club",
          "avg_neighbor_degree", "docs_url_canon", "landmark_distances",
          "powerlaw_alpha", "attack_robustness", "events_funnel",
          "events_retention", "pagerank_dangling5",
          "harmonic_centrality", "docs_textrank", "docs_collocations",
          "random_robustness",
          # packed suites: heterogeneous-key members -> (q, k, val)
          "packed_metric_suite", "packed_label_suite",
          # zero-window-cost suite riders
          "docs_bpe_tokens", "edge_sample", "degree_histogram",
          "component_sizes", "katz_iter5", "quadrilaterals",
          "embed_kmeans_iter2", "eccentricity", "docs_line_dedup",
          "matching_round2", "docs_ttr", "events_window_distinct",
          "random_walk2", "events_hll_distinct", "sample_neighbors3",
          "color_first2", "packed_sample_suite", "minhash_sig4",
          "simhash_sig", "ann_ivf_fixed", "sssp_parents", "ball2_size",
          "edge_percolation", "revenue_by_nation",
          "revenue_by_brand_nation", "global_efficiency",
          "percolation_curve", "betweenness_s0", "docs_cdc_bounds",
          "docs_tfidf", "big_orders", "small_qty_revenue",
          "idle_rich_customers",
          # round-3 additions: the df-capped jaccard window form, the
          # seeded random selectk, and the checkpoint/resume identity
          "word_jaccard_pairs", "row_selectk_random2",
          "pagerank_resume5", "vec_selectk_random8", "vec_sort_desc",
          "docs_jaccard_groups"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    batches = list(res.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pd.DataFrame()
    return pa.concat_tables(batches,
                            promote_options="permissive").to_pandas()


def _float_bits_equal(av, bv):
    """Bit-level float compare — exactly what the driver hashes.
    ``==``/``allclose`` treat −0.0 == +0.0 and so shipped the round-2
    ``docs_heaps`` sign-of-zero red row; viewing the float64 bits as
    uint64 sees the sign bit (and NaN payloads) the way the hash does."""
    a = np.ascontiguousarray(av, dtype=np.float64).view(np.uint64)
    b = np.ascontiguousarray(bv, dtype=np.float64).view(np.uint64)
    return bool((a == b).all())


def test_comparator_flags_planted_negative_zero():
    """The blind comparator (allclose / ==) passes −0.0 vs +0.0; the
    bit-level one must flag it — guards the comparator itself."""
    plus, minus = np.array([1.5, 0.0]), np.array([1.5, -0.0])
    assert np.allclose(plus, minus, rtol=0, atol=0)  # the old blind spot
    assert not _float_bits_equal(plus, minus)
    assert _float_bits_equal(plus, plus.copy())


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_runs():
    df = entry_mod.entry()
    assert len(df) >= 0
    assert {"vid", "rank", "comp"} <= set(df.columns)
    assert np.isclose(df["rank"].sum(), 1.0, atol=1e-6)


def test_every_query_has_callable():
    qs = entry_mod.queries()
    assert len(qs) >= 35
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle key must have a query
    assert set(entry_mod.oracle_sql()) <= set(qs)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(con, name):
    qs = entry_mod.queries()
    mine = _canon(_to_df(qs[name](SF)))
    ora = _canon(con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(mine.columns) == list(ora.columns)
    assert len(mine) == len(ora)
    for c in mine.columns:
        av, bv = mine[c].to_numpy(), ora[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert _float_bits_equal(av.astype(float),
                                     bv.astype(float)), (name, c)
        else:
            assert (av == bv).all(), (name, c)
