"""Driver contract: ``entry()`` smoke pipeline, ``queries()`` — one entry
per implemented operator/pipeline from SURVEY.md §2 — and ``oracle_sql()``
with the DuckDB-equivalent SQL for every SQL-expressible query.

Graph queries run over a deterministic edge table derived from the
``lineitem`` testdata table (``src = l_orderkey % 512``,
``dst = l_partkey % 512``, ``val = count(*)``) so the DuckDB oracle can
reproduce it exactly; iterative algorithms (PageRank, FastSV, SSSP, LPA)
and hash-based dedup have no SQL equivalent and get rows-only checks.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

N_VERT = 512  # vertex space of the derived graph (shared with the SQL CTE)

# The shared edge-table derivation, as a DuckDB CTE prefix. Every graph
# oracle starts with this so the Ray and SQL sides compute over the SAME
# deterministic graph.
_E_CTE = (
    "WITH E AS (SELECT l_orderkey % 512 AS src, l_partkey % 512 AS dst, "
    "CAST(count(*) AS DOUBLE) AS val FROM lineitem GROUP BY 1, 2)"
)


def _read(sf_dir: str, table: str, columns=None):
    from python_graphblas_ray.sources.parquet import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _edge_dataset(sf_dir: str):
    """lineitem → (src, dst, val=1.0) raw edge rows (column-pruned read)."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def mod(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": (o % N_VERT).astype(np.int64),
            "dst": (p % N_VERT).astype(np.int64),
            "val": np.ones(len(o), dtype=np.float64),
        })

    return ds.map_batches(mod, batch_format="pyarrow")


def _edge_matrix(sf_dir: str):
    """The derived GBMatrix: dedup("plus") turns duplicate (src, dst) rows
    into edge multiplicities — matching the SQL ``count(*)``."""
    from python_graphblas_ray.core import GBMatrix

    return GBMatrix.from_dataset(_edge_dataset(sf_dir),
                                 N_VERT, N_VERT).dedup("plus")


def _scalar_table(value, name="val"):
    if value is None:
        # empty reduction: typed null (float64 — the reduce members'
        # dtype) so the NULL compares/hashes like the oracle's SQL NULL
        # instead of an untyped Python None
        return pa.table({name: pa.array([None], pa.float64())})
    return pa.table({name: [value]})


def _seed_schema(ds, **fields):
    """Union a 0-row schema'd seed block into ``ds`` so a legitimately
    all-empty result still reports its schema (Ray drops the schema of
    0-block datasets, which would make empty-vs-empty oracle compares
    column-blind). Free for non-empty results — the seed adds no rows."""
    import ray.data

    seed = pa.table({n: pa.array([], type=t) for n, t in fields.items()})
    return ds.union(ray.data.from_arrow(seed))


_ARROW_TYPES = {"int64": pa.int64(), "int32": pa.int32(),
                "double": pa.float64(), "string": pa.string(),
                "bool": pa.bool_(), "timestamp[us]": pa.timestamp("us")}

# engine-captured output schemas (sf0.001) for every window query whose
# result can be LEGITIMATELY empty at degenerate scales: Ray drops the
# schema of 0-block datasets, which would make an empty-vs-empty oracle
# compare read as a schema mismatch. _schema_stable seeds these.
_WINDOW_SCHEMAS = {
    "edges_build": [("src", "int64"), ("dst", "int64"), ("val", "double")],
    "degree_suite": [("q", "string"), ("vid", "int64"), ("val", "double")],
    "degree_count": [("vid", "int64"), ("val", "int64")],
    "reduce_scalar_suite": [("q", "string"), ("val", "double")],
    "spmv_suite": [("q", "string"), ("vid", "int64"), ("val", "double")],
    "vec_ops_suite": [("q", "string"), ("vid", "int64"), ("val", "double")],
    "ewise_suite": [("q", "string"), ("src", "int64"), ("dst", "int64"), ("val", "double")],
    "select_suite": [("q", "string"), ("src", "int64"), ("dst", "int64"), ("val", "double")],
    "apply_view_suite": [("q", "string"), ("src", "int64"), ("dst", "int64"), ("val", "double")],
    "k_core": [("src", "int64"), ("dst", "int64"), ("val", "double")],
    "rank_suite": [("q", "string"), ("vid", "int64"), ("rank", "double")],
    "hits_suite": [("q", "string"), ("vid", "int64"), ("hub", "double"), ("authority", "double")],
    "graph_metric_suite": [("q", "string"), ("val", "double")],
    "edge_support": [("src", "int64"), ("dst", "int64"), ("val", "int64")],
    "link_scores": [("u", "int64"), ("v", "int64"), ("common", "int64"), ("jaccard", "double"), ("cosine", "double"), ("preferential", "int64")],
    "link_jaccard": [("u", "int64"), ("v", "int64"), ("common", "int64"), ("jaccard", "double")],
    "dedup_exact": [("keep_id", "int64"), ("n_dups", "int64"), ("text", "string")],
    "word_jaccard_pairs": [("ia", "int64"), ("ib", "int64"), ("jaccard", "double")],
    "embedding_neardup": [("ia", "int64"), ("ib", "int64")],
    "ann_topk": [("query_id", "int64"), ("neighbor_id", "int64"), ("rank", "int64")],
    "token_count": [("doc_id", "int64"), ("ws_tokens", "int64")],
    "doc_stats": [("doc_id", "int64"), ("q_len", "int64"), ("q_words", "int64")],
    "pages_roundtrip": [("url", "string"), ("extracted_text", "string")],
    "semantic_dedup": [("vec_id", "int64"), ("cluster", "int64"), ("keep", "bool")],
    "docs_repetition": [("doc_id", "int64"), ("words", "int64"), ("dup_word_frac", "double"), ("top_word_frac", "double"), ("dup_bigram_frac", "double")],
    "docs_decontaminate": [("doc_id", "int64")],
    "docs_pii": [("doc_id", "int64"), ("text", "string"), ("n_email", "int32"), ("n_ip", "int32"), ("n_phone", "int32")],
    "docs_dup_spans": [("doc_id", "int64"), ("pos", "int64")],
    "events_window": [("event_type", "string"), ("window", "timestamp[us]"), ("n", "int64"), ("vmin", "double"), ("vmax", "double")],
    "events_hopping_window": [("event_type", "string"), ("window_us", "int64"), ("n", "int64")],
    "docs_image_resize": [("doc_id", "int64"), ("px_sum", "int64"), ("checksum", "int64")],
    "docs_audio_features": [("doc_id", "int64"), ("n_samples", "int64"), ("zero_crossings", "int64"), ("amp_sum", "int64"), ("amp_checksum", "int64")],
    "events_asof_join": [("event_id", "int64"), ("ts_r", "timestamp[us]")],
    "events_sessionize": [("user_id", "int64"), ("session_start", "timestamp[us]"), ("session_end", "timestamp[us]"), ("n_events", "int64")],
    "lineitem_agg": [("l_returnflag", "string"), ("l_linestatus", "string"), ("sum_qty", "double"), ("n", "int64")],
}


def _schema_stable(fn, name):
    """Make a window query's legitimately-empty result keep its schema
    at ANY scale. Datasets get the 0-row seed union (``_seed_schema``);
    an empty in-memory table missing its columns is replaced by the
    canonical empty table. Non-empty results are unchanged — the seed
    adds no rows and the types are the engine's own (captured at
    sf0.001, so the union is schema-identical)."""
    fields = {c: _ARROW_TYPES[t] for c, t in _WINDOW_SCHEMAS[name]}

    def canonical_empty():
        return pa.table({c: pa.array([], t) for c, t in fields.items()})

    def run(sf_dir):
        res = fn(sf_dir)
        if isinstance(res, pa.Table):
            if res.num_rows == 0 and set(res.column_names) != set(fields):
                return canonical_empty()
            return res
        if hasattr(res, "union"):  # ray Dataset
            # iter_batches SKIPS 0-row blocks, so a schema seed block
            # never reaches the consumer — an EMPTY result must become
            # an in-memory typed table (the driver hashes it fully
            # anyway, so the materialize is free work it would do)
            mat = res.materialize()
            if mat.count() == 0:
                return canonical_empty()
            return mat
        return res
    return run


def _round_away(x, k):
    """DuckDB-compatible ROUND: half away from zero. ``np.round`` is
    banker's (half to even); the two differ ONLY on values landing
    EXACTLY on the half-grain — reachable by dyadic rationals, e.g.
    1/512-derived PageRank mass on degenerate graphs (n = 2⁹) or
    α = 1/128 Katz terms — where banker's would mismatch the oracle.
    Away from exact ties the two roundings agree, so swapping this in
    is value-identical on non-degenerate inputs.

    −0.0 is normalized to +0.0 (the ``+ 0.0``; IEEE −0.0 + 0.0 = +0.0,
    every other value unchanged): the driver hashes the raw sign bit,
    and a ~1e−14 least-squares residue can round to −0.0 on one side
    and +0.0 on the other — DuckDB's parallel SUM order even flips the
    residue's SIGN run-to-run. Every SQL twin mirrors this via the
    ``(ROUND(...) + 0.0)`` rewrite in ``oracle_sql()``."""
    p = 10.0 ** k
    r = np.copysign(np.floor(np.abs(np.asarray(x)) * p + 0.5) / p, x)
    return r + 0.0


def _round0(x, k=8):
    """Scalar ``_round_away``: DuckDB-compatible HALF-AWAY rounding
    with −0.0 normalized to +0.0. Python's built-in ``round`` is
    banker's (half to even) and diverges from SQL ROUND exactly on
    dyadic ties — 1/512 = 0.001953125 rounds to ...12 vs the oracle's
    ...13 (hit by attack_robustness on a 1-survivor degenerate
    graph)."""
    return float(_round_away(float(x), k))


def _normalize_sql_round(sql):
    """Rewrite every ``ROUND(...)`` call in a SQL twin to
    ``(ROUND(...) + 0.0)`` (recursing into the argument), pinning
    −0.0 → +0.0 exactly like ``_round_away`` does engine-side. IEEE
    addition leaves every non-zero value (and NULL) unchanged, so the
    rewrite is value-identical except on the sign of zero — which
    DuckDB's parallel SUM order makes nondeterministic for ~1e−14
    residues (the round-2 ``docs_heaps`` red row)."""
    out, i = [], 0
    upper = sql.upper()
    while True:
        j = upper.find("ROUND(", i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i:j + 6])
            i = j + 6
            continue
        depth, k, n = 1, j + 6, len(sql)
        while depth:
            if k >= n:
                raise ValueError(
                    "unbalanced parentheses while normalizing ROUND() "
                    f"in SQL twin near offset {j}: {sql[j:j + 80]!r}")
            c = sql[k]
            if c == "'":
                # skip single-quoted literals ('' = escaped quote) so a
                # parenthesis inside a string can't skew the depth count
                k += 1
                while True:
                    if k >= n:
                        raise ValueError(
                            "unterminated string literal in SQL twin "
                            f"near offset {j}")
                    if sql[k] == "'":
                        if k + 1 < n and sql[k + 1] == "'":
                            k += 2
                            continue
                        break
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        out.append(sql[i:j])
        inner = _normalize_sql_round(sql[j + 6:k - 1])
        out.append("(ROUND(" + inner + ") + 0.0)")
        i = k


def _vec(v):
    """GBVector → its (vid, val) Dataset."""
    return v.ds


# ---------------------------------------------------------------------------
# graph kernel queries (SQL-checked)
# ---------------------------------------------------------------------------

def _q_edges_build(sf_dir):
    return _edge_matrix(sf_dir).ds


def _q_degree_out(sf_dir):
    return _vec(_edge_matrix(sf_dir).reduce_rowwise("plus"))


def _q_degree_in(sf_dir):
    return _vec(_edge_matrix(sf_dir).reduce_columnwise("plus"))


def _q_mxv_plus_times(sf_dir):
    from python_graphblas_ray.functions.monoids import semiring

    A = _edge_matrix(sf_dir)
    d_in = A.reduce_columnwise("plus")
    return _vec(A.mxv(d_in, semiring.plus_times))


def _q_vxm_min_plus(sf_dir):
    from python_graphblas_ray.functions.monoids import semiring

    A = _edge_matrix(sf_dir)
    d_out = A.reduce_rowwise("plus")
    return _vec(d_out.vxm(A, semiring.min_plus))


_MXM_SOAK_CAP_ROWS = 200_000  # raw lineitem rows; above this the
# full-product matmul members cap the LEFT operand's rows (see
# _mxm_left) — sf0.001/sf0.01 (~6k/60k rows) run the full product,
# sf0.1+ (~600k rows, 512²-dense E) run the capped one


def _mxm_left(sf_dir, A):
    """Left operand for the full-product matmul members. At soak
    scales the 512-vertex edge matrix saturates dense (262k entries),
    so a full mxm pays 512³ ≈ 134M intermediate products per member —
    measured 842 s for the suite at sf0.1. Above _MXM_SOAK_CAP_ROWS
    raw lineitem rows the left operand is row-capped to src < 64 (an
    8× cut); the SQL twins replicate the SAME data-dependent switch
    ((SELECT count(*) FROM lineitem) <= cap OR a.src < 64), so every
    scale stays oracle-exact and sf0.01 driver coverage is the
    unchanged full product."""
    n = _read(sf_dir, "lineitem", columns=["l_orderkey"]).count()
    return A.select("rowle", 63) if n > _MXM_SOAK_CAP_ROWS else A


def _q_mxm_plus_times(sf_dir):
    from python_graphblas_ray.functions.monoids import semiring

    A = _edge_matrix(sf_dir)
    return _mxm_left(sf_dir, A).mxm(A, semiring.plus_times).ds


def _q_power2_minplus(sf_dir):
    """A.power(2, min_plus) — cheapest 2-hop path costs (reference
    ``matrix.py:2840`` repeated-squaring recipe)."""
    from python_graphblas_ray.functions.monoids import semiring

    A = _edge_matrix(sf_dir)
    L = _mxm_left(sf_dir, A)
    if L is A:
        return A.power(2, semiring.min_plus).ds
    return L.mxm(A, semiring.min_plus).ds  # power(2) == A@A, row-capped


def _q_ewise_add(sf_dir):
    A = _edge_matrix(sf_dir)
    return A.ewise_add(A.T, "plus").ds


def _q_ewise_mult(sf_dir):
    A = _edge_matrix(sf_dir)
    return A.ewise_mult(A.T, "times").ds


def _q_ewise_union(sf_dir):
    A = _edge_matrix(sf_dir)
    return A.ewise_union(A.T, "minus", 0.0, 0.0).ds


def _q_select_tril(sf_dir):
    return _edge_matrix(sf_dir).select("tril", thunk=0).ds


def _q_select_valuegt(sf_dir):
    return _edge_matrix(sf_dir).select(">", 2.0).ds


def _q_apply_ainv(sf_dir):
    return _edge_matrix(sf_dir).apply("ainv").ds


def _q_apply_rowindex(sf_dir):
    return _edge_matrix(sf_dir).apply("rowindex", thunk=0).ds


def _q_transpose(sf_dir):
    return _edge_matrix(sf_dir).T.ds


def _q_diag(sf_dir):
    return _vec(_edge_matrix(sf_dir).diag(0))


def _q_reduce_scalar_plus(sf_dir):
    return _scalar_table(_edge_matrix(sf_dir).reduce_scalar("plus").value)


def _q_reduce_scalar_max(sf_dir):
    return _scalar_table(_edge_matrix(sf_dir).reduce_scalar("max").value)


def _q_extract_submatrix(sf_dir):
    return _edge_matrix(sf_dir).extract(slice(100, 200), slice(0, N_VERT)).ds


def _q_assign_scalar(sf_dir):
    return _edge_matrix(sf_dir).assign(slice(0, 10), slice(0, 10), 99.0).ds


def _q_kronecker(sf_dir):
    # 16x16 / 8x8 windows are non-empty at every test sf (a 4x4 window is
    # empty at sf0.001, which made the result an all-empty schemaless frame)
    A = _edge_matrix(sf_dir).extract(slice(0, 16), slice(0, 16))
    B = _edge_matrix(sf_dir).extract(slice(0, 8), slice(0, 8))
    return A.kronecker(B, "times").ds


def _q_degree_mean(sf_dir):
    """reduce_rowwise with a composite Aggregator (mean = sum/count
    partials + finalize — reference ``agg.py:478``)."""
    from python_graphblas_ray.functions.aggregators import agg

    return _vec(_edge_matrix(sf_dir).reduce_rowwise(agg["mean"]))


def _q_degree_count(sf_dir):
    """reduce_columnwise with the count Aggregator."""
    from python_graphblas_ray.functions.aggregators import agg

    out = _edge_matrix(sf_dir).reduce_columnwise(agg["count"])

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({"vid": batch["vid"],
                         "val": batch["val"].cast(pa.int64())})

    return out.ds.map_batches(cast, batch_format="pyarrow")


def _q_mxv_masked(sf_dir):
    """Masked mxv: structural mask keeps only rows where the degree
    vector has an entry with val > 8 (mask pushed into the pipeline as a
    broadcast semi-join)."""
    from python_graphblas_ray.functions.monoids import semiring

    A = _edge_matrix(sf_dir)
    d_in = A.reduce_columnwise("plus")
    mask = d_in.select(">", 8.0)
    return _vec(A.mxv(d_in, semiring.plus_times, mask=mask))


def _q_vec_ewise_add(sf_dir):
    A = _edge_matrix(sf_dir)
    return _vec(A.reduce_rowwise("plus").ewise_add(
        A.reduce_columnwise("plus"), "plus"))


def _q_vec_extract(sf_dir):
    A = _edge_matrix(sf_dir)
    return _vec(A.reduce_rowwise("plus").extract(slice(10, 100)))


def _q_vec_selectk_random(sf_dir):
    """``Vector.ss.selectk(how="random", k=8)`` over the out-degree
    vector: seeded equal-probability 8-subset via the knuth32 draw of
    the index (vid + 13) — replayed by a ROW_NUMBER oracle."""
    A = _edge_matrix(sf_dir)
    return _vec(A.reduce_rowwise("plus").ss.selectk("random", 8,
                                                    seed=13))


def _q_vec_sort_desc(sf_dir):
    """``Vector.ss.sort`` descending over the out-degree vector: sorted
    values compacted to ranks 0..nvals−1, ties by original index — the
    permutation side is covered by unit tests; the value side is the
    ROW_NUMBER replay here."""
    A = _edge_matrix(sf_dir)
    w, _ = A.reduce_rowwise("plus").ss.sort(ascending=False,
                                            permutation=False)
    return _vec(w)


def _q_row_scan(sf_dir):
    from python_graphblas_ray.stages.perrow import row_scan

    return row_scan(_edge_matrix(sf_dir), "plus").ds


def _q_row_selectk(sf_dir):
    from python_graphblas_ray.stages.perrow import row_selectk

    return row_selectk(_edge_matrix(sf_dir), "first", 2).ds


def _q_row_selectk_random(sf_dir):
    """``ss.selectk(how="random", k=2)``: seeded equal-probability
    2-subset per row via the knuth32 draw of the packed entry key
    ``src·512 + dst + 7`` — the draw is ONE plain-SQL expression, so
    the oracle replays the exact pick (reference ``how="random"``,
    core/ss/matrix.py:3806)."""
    from python_graphblas_ray.stages.perrow import row_selectk

    return row_selectk(_edge_matrix(sf_dir), "random", 2, seed=7).ds


def _q_row_sort(sf_dir):
    from python_graphblas_ray.stages.perrow import row_sort

    return row_sort(_edge_matrix(sf_dir)).ds


def _q_triangle_count(sf_dir):
    from python_graphblas_ray.pipelines.triangles import (
        triangle_count_broadcast)

    tri = triangle_count_broadcast(_edge_dataset(sf_dir), num_tasks=8)
    return pa.table({"triangles": pa.array([tri], pa.int64())})


def _q_bfs_levels(sf_dir):
    from python_graphblas_ray.pipelines.algorithms import (
        bfs_level, build_engine)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with bfs_level —
    # tests/test_fx_inactor.py)
    levels, _ = eng.bfs_level_inactor(0)
    eng.shutdown()
    vid = np.flatnonzero(levels >= 0).astype(np.int64)
    return pa.table({"vid": vid, "lvl": levels[vid]})


def _q_harmonic_centrality(sf_dir):
    """HyperBall harmonic centrality, exact-bitset mode (all 512
    sources in one register fixpoint)."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.pipelines.anf import hyperball_harmonic

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    try:
        scores, exact = hyperball_harmonic(eng, mode="exact")
        assert exact
    finally:
        eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "val": scores})


def _q_landmark_distances(sf_dir):
    """Landmark distance oracle: exact BFS distances from 4 fixed pivots,
    ALL in one bitset-register fixpoint (64 sources for the superstep
    price of one) — the web-scale shortest-path-serving construction."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.pipelines.landmarks import (
        distances_table, landmark_distances)

    lms = [0, 7, 42, 101]
    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    try:
        dist = landmark_distances(eng, lms)
    finally:
        eng.shutdown()
    return distances_table(dist, lms)


# ---------------------------------------------------------------------------
# iterative algorithms (rows-only checks)
# ---------------------------------------------------------------------------

def _q_k_core(sf_dir):
    """k = 162 exercises a real 3-round peel on the sf0.01 derived graph
    (502 of 512 vertices survive); oracle = iterative-peel recursive CTE."""
    from python_graphblas_ray.pipelines.kcore import k_core
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    return k_core(A, 162).ds


def _q_k_truss(sf_dir):
    """k-truss (auto route: broadcast wedge kernel at this size; the
    all-shuffle masked-mxm path beyond the broadcast limit — both return
    identical support-valued edges, parity-tested)."""
    from python_graphblas_ray.pipelines.kcore import k_truss_auto
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    return k_truss_auto(A, 5).ds


def _q_pagerank(sf_dir):
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, pagerank)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    r, _, _ = pagerank(eng, tol=1e-6)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64), "rank": r})


def _q_pagerank_dangling5(sf_dir):
    """Classic-semantics PageRank (dangling mass redistributed over the
    teleport distribution each superstep — networkx/Google-matrix form,
    vs the LAGraph-3f drop default): 5 fixed supersteps over the graph
    with sources ≥ 480 removed, so vertices 480..511 are genuinely
    dangling. Redistribution ≡ giving every dangling vertex uniform
    out-edges — exactly how the SQL oracle reproduces it."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, pagerank)

    def drop_hi(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(s < 480))

    edges = _edge_dataset(sf_dir).map_batches(drop_hi,
                                              batch_format="pyarrow")
    eng = build_engine(edges, N_VERT, num_partitions=4)
    try:
        r, _, _ = pagerank(eng, tol=0.0, itermax=5,
                           dangling="redistribute")
    finally:
        eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "rank": _round_away(r, 8)})


def _q_pagerank_iter5(sf_dir):
    """Fixed-5-superstep PageRank over the raw (multigraph) edge rows,
    rounded to 8 decimals so the DuckDB recursive-CTE oracle reproduces it
    exactly (summation order differs only below the rounding grain; the
    convergent-tolerance variant stays the rows-only ``pagerank`` query)."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, pagerank)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with pagerank, fixed iters)
    r, _ = eng.pagerank_inactor(tol=0.0, itermax=5, force_iters=5)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "rank": _round_away(r, 8)})


def _q_pagerank_resume5(sf_dir):
    """Checkpoint/resume identity as a driver-checked query: run 3
    supersteps writing a per-partition parquet checkpoint (with manifest
    + lineage), then resume from that checkpoint IN A FRESH
    CheckpointManager (a new driver process) and finish supersteps 4-5.
    The loaded float64 vector round-trips parquet bit-exactly and the
    engine replays the identical spmv order, so the resumed result
    equals straight-through 5 supersteps — verified against the very
    same ``pagerank_iter5`` recursive-CTE oracle."""
    import tempfile

    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, pagerank)
    from python_graphblas_ray.state.checkpoint import CheckpointManager

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    try:
        with tempfile.TemporaryDirectory(dir="/tmp") as td:
            # in-actor path: per-partition checkpoints are WRITTEN BY
            # THE PARTITION ACTORS (one slice each, atomic manifest
            # commit) and resumed slice-wise — the driver never
            # materializes r (bit-parity with the broadcast recipe)
            ck = CheckpointManager(td, "resume5", num_partitions=2)
            eng.pagerank_inactor(tol=0.0, itermax=3, checkpoint=ck,
                                 checkpoint_every=3)
            ck2 = CheckpointManager(td, "resume5", num_partitions=2)
            r, iters = eng.pagerank_inactor(tol=0.0, itermax=5,
                                            checkpoint=ck2,
                                            checkpoint_every=1_000_000)
            # a degenerate (e.g. empty) graph converges to rdiff 0.0
            # before the superstep-3 checkpoint ever writes; only a
            # written checkpoint implies the resume skipped past it
            assert iters == 4 or ck2.latest() is None, \
                "resume must start past the checkpoint"
    finally:
        eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "rank": _round_away(r, 8)})


def _q_trustrank_iter5(sf_dir):
    """TrustRank (seed-personalized PageRank, fixed 5 supersteps): the
    teleport mass is uniform over trusted seeds 0..15, so the
    ``pagerank_iter5`` recursive-CTE oracle carries over with only the
    teleport vector and the initial distribution changed."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, trustrank)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (personalized teleport/r0 slices)
    pvec = np.zeros(N_VERT)
    pvec[np.arange(16)] = 1.0 / 16
    r, _ = eng.pagerank_inactor(tol=0.0, itermax=5, force_iters=5,
                                personalization=pvec)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "rank": _round_away(r, 8)})


def _q_hits_iter3(sf_dir):
    """Fixed-3-iteration HITS normalized ONLY at the end: every
    intermediate hub/authority value is an exact-integer path count
    (doubles below 2⁵³), so the recursive-CTE oracle reproduces the
    scores to the 8-decimal grain with a single final L2 division. The
    per-iteration-normalized convergent variant stays the rows-only
    ``hits`` query."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, hits_fixed)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    h, a = hits_fixed(eng, iters=3)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "hub": np.round(h, 8),
                     "authority": np.round(a, 8)})


def _q_salsa_iter3(sf_dir):
    """Fixed-3-iteration SALSA (degree-normalized HITS — the stochastic
    hub/authority walk). Mass conservation keeps values O(n), so the
    single final L2 normalization lands inside the 8-decimal grain like
    ``hits_iter3``."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, salsa_fixed)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    h, a = salsa_fixed(eng, iters=3)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "hub": np.round(h, 8),
                     "authority": np.round(a, 8)})


def _q_truss_peel3(sf_dir):
    """Exactly 3 rounds of the k-truss peel (k=5): support = masked
    plus_pair mxm, drop support < 3, repeat — a FIXED-ROUND variant of
    the convergent ``k_truss`` query so a 3×-unrolled SQL oracle can
    reproduce it (idempotent once converged, so early fixpoints match
    too). Cast to double to ride the matmul-family suite schema."""
    from python_graphblas_ray.pipelines.kcore import k_truss
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    T = k_truss(A, 5, max_iter=3)

    def to_double(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["src"], "dst": batch["dst"],
                         "val": batch["val"].cast(pa.float64())})

    return T.ds.map_batches(to_double, batch_format="pyarrow")


def _q_bowtie(sf_dir):
    """Broder bow-tie decomposition (core / in / out / tube / tendril /
    disc) — the canonical web-graph structure analysis, as one scc run +
    four reachability fixpoints over the engine pair. SQL oracle:
    one transitive closure, mutual-reach component labels, then the
    same part definitions."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, bowtie)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with bowtie)
    parts, _ = eng.bowtie_inactor()
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "part": pa.array(list(parts), type=pa.string())})


def _q_anf(sf_dir):
    """Exact neighborhood function N(t) (# ordered pairs within distance
    t, self-pairs at t=0) via the ANF bitset engine rounds, bounded at
    t ≤ 6 to match the SQL closure bound (both test graphs converge by
    t=4; the HLL estimator is pytest-checked against this exact mode)."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.pipelines.anf import neighborhood_function

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    counts, _ = neighborhood_function(eng, tmax=6, mode="exact",
                                      inactor=True)
    eng.shutdown()
    return pa.table({"t": np.arange(len(counts), dtype=np.int64),
                     "n_pairs": counts.astype(np.int64)})


def _q_effective_diameter(sf_dir):
    """Discrete 90% effective diameter from the exact neighborhood
    function — the web-graph distance headline ("how many clicks span
    90% of reachable page pairs")."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.pipelines.anf import effective_diameter

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    d = effective_diameter(eng, q=0.9, tmax=6, mode="exact",
                           inactor=True)
    eng.shutdown()
    return pa.table({"d90": np.array([d], dtype=np.int64)})


def _q_dag_layers(sf_dir):
    """Longest-path topological layers over the DAG-ified edge table
    (keep src < dst — acyclic by construction): the level schedule a
    dependency ordering runs in. SQL oracle: recursive path-length
    enumeration with UNION dedup (states bounded by V × longest path),
    final max per vertex."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, dag_layers)

    def dagify(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(s < d))

    edges = _edge_dataset(sf_dir).map_batches(
        dagify, batch_format="pyarrow").materialize()
    eng = build_engine(edges, N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with dag_layers)
    layers, _, _ = eng.dag_layers_inactor()
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "layer": layers})


def _q_critical_path(sf_dir):
    """Weighted longest-path distances (critical path) on the src<dst
    DAG with the deterministic synthetic weight ``(src·7+dst·13)%10+1``
    — integer weights keep the max_plus fixpoint float-exact, so the
    recursive path-sum SQL oracle matches bit-for-bit."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, critical_path)

    base = _edge_matrix(sf_dir).ds

    def dag_weighted(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s < d
        s, d = s[keep], d[keep]
        return pa.table({"src": s, "dst": d,
                         "val": ((s * 7 + d * 13) % 10 + 1).astype(
                             np.float64)})

    eng = build_engine(
        base.map_batches(dag_weighted, batch_format="pyarrow"),
        N_VERT, num_partitions=4, weighted=True)
    # in-actor O(P)-driver path (bit-parity with critical_path)
    dist, _, _ = eng.critical_path_inactor()
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "dist": dist})


def _q_cocitation(sf_dir):
    """Co-citation counts (in-neighbor overlap, ``A.T @ A`` plus_pair) —
    the related-page signal dual to ``link_scores``' out-neighbor
    coupling counts. Cast to double to match the matmul family dtype."""
    from python_graphblas_ray.pipelines.linkpred import cocitation_counts

    ds = cocitation_counts(_edge_dataset(sf_dir), N_VERT)

    def to_double(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["src"], "dst": batch["dst"],
                         "val": batch["val"].cast(pa.float64())})

    return ds.map_batches(to_double, batch_format="pyarrow")


def _q_bfs_parents(sf_dir):
    """Parent BFS (min_secondi recipe): deterministic smallest-id parent
    among level-(L-1) in-neighbors — SQL-expressible via the bfs-levels
    recursive CTE + per-vertex min over the previous level."""
    from python_graphblas_ray.pipelines.algorithms import (
        bfs_parent, build_engine)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with bfs_parent)
    parent, _ = eng.bfs_parent_inactor(0)
    eng.shutdown()
    vid = np.flatnonzero(parent >= 0).astype(np.int64)
    return pa.table({"vid": vid, "parent": parent[vid]})


def _q_assign_masked(sf_dir):
    """Value-masked scalar subassign (GxB_subassign semantics): region
    entries where the region-shaped mask (val > 2) holds become 99.0,
    unmasked region entries and everything outside the region keep C."""
    A = _edge_matrix(sf_dir)
    m = A.extract(slice(0, 20), slice(0, 20)).select(">", 2.0)
    return A.assign(slice(0, 20), slice(0, 20), 99.0, mask=m.S,
                    subassign=True).ds


def _q_mxm_min_secondi(sf_dir):
    """Positional semiring matmul: C[i,j] = min over contributing k of k
    (``min_secondi`` — reference ``semiring.py:190-218`` family)."""
    from python_graphblas_ray.functions.monoids import semiring

    A = _edge_matrix(sf_dir)
    return _mxm_left(sf_dir, A).mxm(A, semiring.min_secondi).ds


def _q_connected_components(sf_dir):
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, connected_components)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4,
                       undirected=True)
    # in-actor O(P)-driver FastSV (bit-parity with connected_components
    # — r3 parity tests)
    f, _ = eng.connected_components_inactor()
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64), "comp": f})


def _q_scc(sf_dir):
    """Strongly connected components (FW-BW min-label peeling over the
    directed engine + its actor-derived transpose); oracle = recursive
    transitive closure → mutual-reachability min."""
    from python_graphblas_ray.pipelines.algorithms import build_engine, scc

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with scc)
    comp, _, _ = eng.scc_inactor()
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "comp": comp})


def _q_closeness(sf_dir):
    """Harmonic closeness from the deterministic 4-source sample
    (Eppstein-Wang-style sampled approximation; exact per-source BFS)."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, closeness_centrality)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    val, _ = closeness_centrality(eng, sources=[0, 1, 2, 3])
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64), "val": val})


def _q_host_graph(sf_dir):
    """Vertex contraction (page graph → 'host' graph, labels = vid % 64):
    one broadcast remap + dedup("plus") exchange; == S.T @ A @ S."""
    from python_graphblas_ray.pipelines.algorithms import contract_graph

    A = _edge_matrix(sf_dir)
    labels = np.arange(N_VERT, dtype=np.int64) % 64
    return contract_graph(A, labels, k=64).ds


def _q_diameter(sf_dir):
    """Double-sweep diameter lower bound (2 BFS sweeps from 0)."""
    from python_graphblas_ray.pipelines.algorithms import (
        approx_diameter, build_engine)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    d, _, _ = approx_diameter(eng, start=0, sweeps=2)
    eng.shutdown()
    return pa.table({"diameter_lb": [int(d)]})


def _q_events_quantiles(sf_dir):
    """KLL quantile sketch over events.value — cap ≥ rowcount at test
    scale, so the sketch is exact (the compaction path is exercised by
    the dedicated rank-error test)."""
    from python_graphblas_ray.stages.sketch import (quantile_query,
                                                    quantile_sketch)

    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    vals, wts, total = quantile_sketch(
        _read(sf_dir, "events", columns=["value"]), "value",
        cap=262144)  # ≥ rowcount through sf0.1 → exact regime
    est = quantile_query(vals, wts, total, qs)
    # empty stream: pin 0.0 (NaN never round-trips a float compare)
    return pa.table({"q": np.asarray(qs),
                     "value": np.nan_to_num(np.round(est, 8), nan=0.0)})


def _q_events_topk(sf_dir):
    """Top-5 events by value per event_type (grouped_topk: one exchange
    + cross-group segment-rank, ROW_NUMBER SQL oracle)."""
    from python_graphblas_ray.stages.reduce import grouped_topk

    return grouped_topk(
        _read(sf_dir, "events",
              columns=["event_id", "event_type", "value"]),
        "event_type", "value", k=5, descending=True,
        tie_col="event_id", num_partitions=4)


def _q_events_heavy_hitters(sf_dir):
    """Misra-Gries top-k on event_type: k=64 ≥ the column's cardinality,
    so the sketch is EXACT here (the compression path is exercised by
    the dedicated guarantee test)."""
    from python_graphblas_ray.stages.sketch import heavy_hitters

    return heavy_hitters(_read(sf_dir, "events", columns=["event_type"]),
                         "event_type", k=64)


def _q_mis(sf_dir):
    """Maximal independent set (deterministic Luby, knuth32 priorities)
    over the simple undirected graph; oracle = the same round recursion
    as a recursive CTE (priorities are plain-SQL expressible)."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, maximal_independent_set)
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    eng = build_engine(A.ds, N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with maximal_independent_set)
    mis, _, _ = eng.mis_inactor()
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "in_mis": mis.astype(np.int64)})


def _q_color_first2(sf_dir):
    """First TWO color classes of the iterated-MIS greedy coloring
    (Jones-Plassmann family): color 0 = the MIS, color 1 = the MIS of
    the graph induced on the uncolored rest — both replayed by the SQL
    oracle's doubled Luby-round recursion; everything later stays the
    rows-only ``greedy_color``. Output: (vid, col) with col ∈
    {0, 1, -1 (not yet colored)}."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, maximal_independent_set)
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    eng = build_engine(A.ds, N_VERT, num_partitions=4)
    try:
        col = np.full(N_VERT, -1, dtype=np.int64)
        c0, _, _ = maximal_independent_set(eng)
        col[c0] = 0
        c1, _, _ = maximal_independent_set(eng, active_init=col < 0)
        col[c1] = 1
    finally:
        eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "col": col})


def _q_greedy_color(sf_dir):
    """Distance-1 coloring by iterated MIS (deterministic); rows-only —
    validity + engine==numpy parity are pytest-checked."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, greedy_color)
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    eng = build_engine(A.ds, N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with greedy_color)
    color, _, _ = eng.greedy_color_inactor()
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "color": color})


def _q_reciprocity(sf_dir):
    """Link-graph reciprocity (fraction of mutual non-loop edges)."""
    from python_graphblas_ray.pipelines.linkpred import reciprocity

    n_edges, n_recip, ratio = reciprocity(_edge_matrix(sf_dir))
    return pa.table({"n_edges": [int(n_edges)],
                     "n_recip": [int(n_recip)],
                     "ratio": [_round0(ratio)]})


def _q_assortativity(sf_dir):
    """Degree assortativity (Newman): Pearson corr of (out-deg(src),
    in-deg(dst)) over edges — one streaming moments pass."""
    from python_graphblas_ray.pipelines.linkpred import assortativity

    r = assortativity(_edge_matrix(sf_dir), N_VERT)
    return pa.table({"assortativity": [_round0(r)]})


def _q_local_clustering(sf_dir):
    """Per-vertex local clustering coefficient — composition of the
    masked plus_pair support mxm + two rowwise reductions."""
    from python_graphblas_ray.pipelines.linkpred import local_clustering
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    return local_clustering(A, N_VERT)


def _q_modularity(sf_dir):
    """Modularity of the deterministic vid%16 labeling over the simple
    undirected graph (8-decimal rounded for the SQL oracle)."""
    from python_graphblas_ray.pipelines.louvain import modularity
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    labels = np.arange(N_VERT, dtype=np.int64) % 16
    q = modularity(A.ds, labels, N_VERT)
    return pa.table({"modularity": [_round0(q)]})


def _q_transitivity(sf_dir):
    """Global clustering coefficient (3·tri / wedges) over the simple
    undirected graph — broadcast triangle kernel + one degree reduction."""
    from python_graphblas_ray.pipelines.linkpred import transitivity

    t = transitivity(_edge_dataset(sf_dir), N_VERT, num_tasks=8)
    return pa.table({"transitivity": [_round0(t)]})


def _q_avg_neighbor_degree(sf_dir):
    """knn(v): mean out-neighbor out-degree over the distinct pattern —
    one plus_times spmv against the broadcast degree vector."""
    from python_graphblas_ray.pipelines.linkpred import avg_neighbor_degree

    return avg_neighbor_degree(_edge_dataset(sf_dir), N_VERT)


def _q_rich_club(sf_dir):
    """Rich-club coefficient at the mean-degree threshold (density of
    the subgraph induced on above-average-degree vertices)."""
    from python_graphblas_ray.pipelines.linkpred import rich_club

    k, nk, phi = rich_club(_edge_dataset(sf_dir), N_VERT)
    return pa.table({"k": [_round0(k)], "n_k": [int(nk)],
                     "phi": [_round0(phi)]})


def _q_powerlaw_alpha(sf_dir):
    """Discrete power-law exponent MLE (xmin=1) of the in-degree
    distribution over the distinct pattern."""
    from python_graphblas_ray.pipelines.linkpred import powerlaw_alpha

    a, _ = powerlaw_alpha(_edge_dataset(sf_dir), N_VERT, degree="in")
    return pa.table({"alpha": [_round0(a)]})


def _q_attack_robustness(sf_dir):
    """Giant-component fraction after removing the 25 highest-degree
    hubs — targeted-attack tolerance of the link graph."""
    from python_graphblas_ray.pipelines.linkpred import attack_robustness

    k, n_kept, frac = attack_robustness(_edge_dataset(sf_dir), N_VERT,
                                        k_remove=25)
    return pa.table({"k_removed": [int(k)], "n_kept": [int(n_kept)],
                     "giant_frac": [_round0(frac)]})


def _q_random_robustness(sf_dir):
    """Random-failure (error-tolerance) counterpart of
    attack_robustness: 25 knuth32-hash-picked vertices removed."""
    from python_graphblas_ray.pipelines.linkpred import attack_robustness

    k, n_kept, frac = attack_robustness(_edge_dataset(sf_dir), N_VERT,
                                        k_remove=25, strategy="random")
    return pa.table({"k_removed": [int(k)], "n_kept": [int(n_kept)],
                     "giant_frac": [_round0(frac)]})


def _q_docs_url_canon(sf_dir):
    """Crawl-URL canonicalization over deterministically synthesized messy
    URLs (case / www / default-port / tracking-param / fragment /
    trailing-slash variants built from document rows — synthetic-input
    scaffolding only) — runs the REAL ``URLCanonicalizer`` stage; the
    oracle replays the identical RE2 rule chain in DuckDB."""
    from python_graphblas_ray.pipelines.ingest import canonicalize_urls

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def synth(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_pylist()
        suffix = np.select(
            [did % 4 == 0, did % 4 == 1, did % 4 == 2],
            ["?utm_source=feed&next=1#top", "/",
             "?a=1&utm_campaign=x&b=2"],
            default="#sec")
        urls = [f"HTTP://WWW.Site{d % 5}.COM:80/{s}/p{d}{x}"
                for d, s, x in zip(did, src, suffix)]
        return pa.table({"doc_id": batch["doc_id"],
                         "url": pa.array(urls, type=pa.string())})

    out = canonicalize_urls(docs.map_batches(synth, batch_format="pyarrow"))
    return out.select_columns(["doc_id", "canon_url"])


def _q_docs_textrank(sf_dir):
    """TextRank keywords: weighted PageRank over the consecutive-word
    co-occurrence graph — the webtext→link-graph composition."""
    from python_graphblas_ray.pipelines.textrank import textrank_keywords

    docs = _read(sf_dir, "documents", columns=["text"])
    return textrank_keywords(docs, iters=5)


def _q_docs_collocations(sf_dir):
    """PMI collocations (min_count=5) over consecutive word pairs."""
    from python_graphblas_ray.pipelines.textrank import collocations

    docs = _read(sf_dir, "documents", columns=["text"])
    return collocations(docs, min_count=5)


def _q_docs_lm_score(sf_dir):
    """CCNet-style n-gram LM quality score: Laplace bigram LM trained on
    the corpus itself, mean log-prob per doc (8-decimal rounded)."""
    from python_graphblas_ray.stages.text import ngram_lm_fit, ngram_lm_score

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    model = ngram_lm_fit(docs)
    return ngram_lm_score(docs, model)


# RE2-safe GPT-2-style pre-tokenizer (contractions, letter runs, digit
# runs, punctuation runs, whitespace — the lookahead-free core of the
# GPT-2 regex); shared byte-for-byte with the DuckDB oracle (both RE2).
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def _q_docs_bpe_tokens(sf_dir):
    """BPE-style pre-tokenizer token count per document: one RE2
    ``count_substring_regex`` pass per Arrow batch (the LLM-training
    token-budget estimator; whitespace ``token_count`` is the cruder
    sibling). Null text counts 0 on both sides."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"].combine_chunks(),
                                     _BPE_PAT)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pc.fill_null(n.cast(pa.int64()), 0),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_edge_sample(sf_dir):
    """20% deterministic edge sample: keep (src, dst) pairs whose knuth32
    hash of the packed key ``src*512 + dst`` lands in residue 0 mod 5 —
    graph sparsification ahead of expensive all-pairs work. The filter is
    vectorized inside ``map_batches`` BEFORE any shuffle (the 100-TB
    path: sampled edges never leave the reading node), and the
    multiplicative hash is replayed exactly by the SQL oracle."""
    ds = _edge_matrix(sf_dir).ds

    def samp(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        h = ((s * N_VERT + d) * 2654435761) % 4294967296
        return batch.filter(pa.array(h % 5 == 0))

    return ds.map_batches(samp, batch_format="pyarrow")


def _q_degree_histogram(sf_dir):
    """Out-degree histogram over the distinct-pair pattern: one count
    reduction (vertex-bounded), then an O(degrees) driver fold —
    the power-law shape probe feeding ``powerlaw_alpha``."""
    from python_graphblas_ray.functions.aggregators import agg

    out = _as_table(_edge_matrix(sf_dir).reduce_rowwise(agg["count"]).ds)
    if out is None or "val" not in out.column_names:  # empty graph
        return pa.table({"deg": pa.array([], pa.int64()),
                         "n_vertices": pa.array([], pa.int64())})
    deg = out["val"].to_numpy(zero_copy_only=False).astype(np.int64)
    degs, n = np.unique(deg, return_counts=True)
    return pa.table({"deg": degs.astype(np.int64),
                     "n_vertices": n.astype(np.int64)})


def _q_component_sizes(sf_dir):
    """Component-size histogram (size → number of components) off the
    FastSV labels — the fragmentation fingerprint read alongside
    ``attack_robustness``; O(n) driver fold over the 512-vertex labels."""
    t = _as_table(_q_connected_components(sf_dir))
    comp = t["comp"].to_numpy(zero_copy_only=False)
    _, sizes = np.unique(comp, return_counts=True)
    szs, n = np.unique(sizes, return_counts=True)
    return pa.table({"size": szs.astype(np.int64),
                     "n_components": n.astype(np.int64)})


def _q_katz_iter5(sf_dir):
    """Fixed-5-iteration Katz centrality ``x ← 1 + α·AᵀX`` (α = 1/128,
    exactly representable) over the raw multigraph edges via the pinned
    engine's plus_second spmv; 8-decimal rounded so the recursive-CTE
    oracle reproduces it exactly (reference: Katz 1953; the damped
    path-count dual of ``pagerank_iter5``)."""
    from python_graphblas_ray.pipelines.algorithms import build_engine

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    x = np.ones(N_VERT, dtype=np.float64)
    for _ in range(5):
        x = 1.0 + 0.0078125 * eng.spmv("plus_second", x)
    eng.shutdown()
    # round to 6 (not 8): values reach ~1e5 at sf0.1, where partial-sum
    # ordering noise (~1e-9 relative) would cross a 1e-8 grain
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "val": _round_away(x, 6)})


def _q_quadrilaterals(sf_dir):
    """4-cycle (C4) subgraph count of the simple undirected graph: one
    plus_pair mxm + strict-triu select, then ½·Σ binom(C(u,v), 2) folded
    per batch — the butterfly/bipartite-community fingerprint next to
    ``triangle_count``."""
    from python_graphblas_ray.pipelines.linkpred import quadrilateral_count

    q = quadrilateral_count(_edge_dataset(sf_dir), N_VERT)
    return pa.table({"quadrilaterals": pa.array([q], pa.int64())})


def _q_embed_kmeans_iter2(sf_dir):
    """Fixed-2-update Lloyd k-means over the embeddings table with a
    deterministic init (centroids = vectors 0..7) and 6-decimal centroid
    rounding after each update, so the unrolled SQL oracle — whose sums
    run in a different order — reproduces the assignments exactly. The
    converging seeded variant stays the rows-only ``embed_kmeans``."""
    from python_graphblas_ray.pipelines.clustering import (
        kmeans_assign, kmeans_fit)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    k = 8
    heads = [b for b in ds.filter(expr=f"vec_id < {k}").iter_batches(
        batch_format="pyarrow") if b.num_rows]  # tiny: k rows
    if not heads:  # empty corpus — no centroids, no assignments
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    head = pa.concat_tables(heads, promote_options="permissive")
    order = np.argsort(head["vec_id"].to_numpy(zero_copy_only=False))
    init = np.stack([np.asarray(head["embedding"][int(i)].as_py(),
                                dtype=np.float64) for i in order])
    cents, _ = kmeans_fit(ds, k, iters=2, init_centroids=init,
                          round_to=6, tol=0.0)
    return kmeans_assign(ds, cents).select_columns(["vec_id", "cluster"])


def _q_eccentricity(sf_dir):
    """Per-vertex in-eccentricity (max finite incoming distance) read
    off the exact-bitset ANF register fixpoint — all 512 sources in one
    run; the per-vertex signal behind radius/diameter bounds."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.pipelines.anf import hyperball_eccentricity

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    try:
        ecc, exact = hyperball_eccentricity(eng, mode="exact")
        assert exact
    finally:
        eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "val": ecc})


def _q_docs_line_dedup(sf_dir):
    """CCNet-style cross-document line dedup: lines appearing in ≥ 3
    distinct docs are boilerplate — dropped everywhere, docs rebuilt
    from the survivors (order kept). Synthetic docs share templated
    lines, so the hot set is non-trivial at both test scales."""
    from python_graphblas_ray.pipelines.dedup import dedup_lines

    return dedup_lines(_read(sf_dir, "documents",
                             columns=["doc_id", "text"]), min_df=3)


def _q_random_walk2(sf_dir):
    """TWO deterministic random-walk steps from every vertex over the
    DEDUPED in-adjacency (the dedupe build lexsorts (src, dst), so each
    vertex's pinned neighbor list is src-ascending — the SQL-replicable
    layout): walker w at v steps to neighbor ``splitmix64(w + step·2³²)
    mod deg(v)`` (seed 0 keeps the hash input pure addition). The DuckDB
    twin replays splitmix64 exactly with HUGEINT mod-2⁶⁴ arithmetic —
    see ``_SM64_STAGES`` — making the seeded-RNG walk family
    hash-verifiable, not just rows-checked. Walkers at in-degree-0
    vertices park at -1."""
    from python_graphblas_ray.pipelines.algorithms import build_engine

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4,
                       dedupe=True)
    try:
        walks = eng.random_walks(np.arange(N_VERT, dtype=np.int64), 2,
                                 seed=0)
    finally:
        eng.shutdown()
    n, L = walks.shape
    return pa.table({
        "w": np.repeat(np.arange(n, dtype=np.int64), L),
        "step": np.tile(np.arange(L, dtype=np.int64), n),
        "vid": walks.reshape(-1),
    })


def _q_sample_neighbors3(sf_dir):
    """GraphSAGE-style fanout sampling: up to 3 DISTINCT in-neighbors
    per vertex from the deduped pinned adjacency — a hashed contiguous
    window ``(splitmix64(vid) % deg + 0..2) % deg`` over the
    src-ascending neighbor segment, replayed exactly by the SQL twin."""
    from python_graphblas_ray.pipelines.algorithms import build_engine

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4,
                       dedupe=True)
    try:
        v, nb = eng.sample_neighbors(np.arange(N_VERT, dtype=np.int64),
                                     3, seed=0)
    finally:
        eng.shutdown()
    return pa.table({"vid": v, "neighbor": nb})


def _q_wl_refine2(sf_dir):
    """Two rounds of 1-WL color refinement (commutative sum-hash
    combiner) over the DEDUPED in-adjacency — per-vertex structural
    fingerprints: label0 = in-degree, label_{k+1} =
    (splitmix64(label_k + 2³²) + Σ_in splitmix64(label_k(u))) mod 2⁶⁴.
    One ``register_step("add")`` superstep per round (wrapping uint64
    reduceat in the pinned actors). Fingerprints ride the packed key as
    signed-int64 bit patterns (a double value would drop bits); the
    numeric value is the in-degree."""
    from python_graphblas_ray.pipelines.algorithms import (build_engine,
                                                           wl_refinement)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4,
                       dedupe=True)
    try:
        # in-actor O(P)-driver path (bit-parity with wl_refinement —
        # mod-2^64 sums are exactly associative)
        deg, lab = eng.wl_inactor(rounds=2)
    finally:
        eng.shutdown()
    return pa.table({
        "vid": np.arange(N_VERT, dtype=np.int64),
        "sig": lab.view(np.int64),
        "deg": deg.astype(np.float64),
    })


def _q_embed_gram(sf_dir):
    """Distributed second-moment matrix G = EᵀE/n of the embedding
    table — one streaming pass of d×d per-batch partials (32 KB each at
    d=64), driver-merged; round-8 keeps the partial-vs-SQL summation-
    order noise (~1e-14 relative) far below the grain."""
    from python_graphblas_ray.pipelines.similarity import gram_matrix

    g, _ = gram_matrix(_read(sf_dir, "embeddings", columns=["embedding"]))
    d = g.shape[0]
    ii, jj = np.meshgrid(np.arange(d, dtype=np.int64),
                         np.arange(d, dtype=np.int64), indexing="ij")
    return pa.table({"i": ii.reshape(-1), "j": jj.reshape(-1),
                     "v": np.round(g.reshape(-1), 8)})


def _q_docs_rrf(sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 per-query
    top-10 with the corpus-wide n-gram-LM quality ranking — rrf =
    1/(60+r_lex) + 1/(60+r_quality). Lexical rank re-ranks the top-10
    on the ROUNDED score (replayable order); quality rank is computed
    WITHOUT a global sort via the broadcast-candidates beat-count pass."""
    from python_graphblas_ray.pipelines.retrieval import (bm25_topk,
                                                          rrf_fuse)
    from python_graphblas_ray.stages.text import (ngram_lm_fit,
                                                  ngram_lm_score)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    topk = bm25_topk(docs, _BM25_QUERIES, k=10)
    lm = ngram_lm_score(docs, ngram_lm_fit(docs))
    return rrf_fuse(topk, lm)


def _q_events_cms_users(sf_dir):
    """Count-Min frequency estimates for every distinct user over the
    events stream (depth 4 × width 128 — far fewer buckets than users
    at sf0.1, so real collisions exercise the min-over-rows ESTIMATE
    path, not just exact counting). One streaming sketch pass (d×w
    partial per block, driver-summed) + one grouped_agg pass for the
    distinct-user readout; buckets replayed by the SQL twin from the
    shared splitmix64 stages."""
    from python_graphblas_ray.stages.reduce import grouped_agg
    from python_graphblas_ray.stages.sketch import (cms_build,
                                                    cms_estimate)

    ev = _read(sf_dir, "events", columns=["user_id"])
    counters = cms_build(ev, "user_id", width=128, depth=4)
    users = _as_table(grouped_agg(ev, ["user_id"],
                                  [(None, "count", "n")]))
    uid = np.sort(users["user_id"].to_numpy(zero_copy_only=False))
    return pa.table({"user_id": uid,
                     "est": cms_estimate(counters, uid).astype(
                         np.float64)})


def _q_events_bloom(sf_dir):
    """Bloom-filter membership screen (the decontamination-prefilter
    shape: no false NEGATIVES, so misses are definitively absent and
    only hits pay verification): build a 4096-bit k=3 filter over the
    purchase-user set — ONE m/64-word bitmap partial per block,
    driver-ORed, never shuffled — broadcast it once, and probe the
    0..4095 candidate-id range distributed. At sf0.1 the 1500-user
    build set fills ~2/3 of the bits, so real false positives exercise
    the k-way AND; the SQL twin replays every bit position exactly
    from the shared splitmix64 stages."""
    from python_graphblas_ray.stages.sketch import (bloom_build,
                                                    bloom_contains)

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def purch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.equal(batch["event_type"], "purchase")
        return pa.table({"user_id": batch.filter(keep)["user_id"]})

    import ray as _ray

    bits, m, k = bloom_build(ev.map_batches(purch, batch_format="pyarrow"),
                             "user_id", m_bits=4096, k=3)
    bref = _ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _r
        v = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = bloom_contains(_r.get(bref), m, k, v)
        return pa.table({"uid": v, "hit": hit.astype(np.float64)})

    return _ray.data.range(4096).map_batches(probe, batch_format="pyarrow")


def _q_mst_forest(sf_dir):
    """Borůvka minimum spanning forest over the 512-vertex undirected
    weighted quotient (w = link multiplicity): every round is one
    map_batches min-reduction over the never-reshuffled edge stream
    (per-component candidate min per block), components hook via
    min-label CC with pointer jumping. The strict (w, a, b) total
    order makes the forest unique; the SQL twin replays each round's
    per-component argmin + forest-connectivity relabel exactly, so the
    (round, edge) pairs compare hash-exact. Returns (r, u, v, w)."""
    from python_graphblas_ray.pipelines.mst import (mst_boruvka,
                                                    undirected_weights)

    edges = undirected_weights(_edge_dataset(sf_dir), N_VERT)
    forest, _ = mst_boruvka(edges, N_VERT)
    return pa.table({"r": forest["r"], "u": forest["a"],
                     "v": forest["b"], "w": forest["w"]})


def _q_widest4(sf_dir):
    """Fixed-4-round widest (bottleneck) path widths from vertex 0
    over the max_min semiring on the undirected capacity graph
    (capacity = link multiplicity): 4 sparse vxm relaxations + ewise
    max — only reached vertices materialize. Integer capacities make
    every width exact (source carries +inf); the SQL twin replays the
    relaxation as a bounded recursive CTE with MAX(LEAST(...))
    grouping per round."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.pipelines.mst import undirected_weights

    und = undirected_weights(_edge_dataset(sf_dir), N_VERT)

    def both(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a]),
                         "val": np.concatenate([w, w])})

    # in-actor O(P)-driver path (present-value parity with
    # widest_path_fixed — tests/test_fx_inactor.py); the dense result's
    # reached set is exactly the sparse vxm formulation's support, and
    # the source is always reached (width +inf), so the empty-graph
    # seed row falls out naturally
    eng = build_engine(und.map_batches(both, batch_format="pyarrow"),
                       N_VERT, num_partitions=4, weighted=True)
    try:
        dense = eng.widest_inactor(0, iters=4)
    finally:
        eng.shutdown()
    ids = np.flatnonzero(dense > -np.inf).astype(np.int64)
    return pa.table({"vid": ids, "width": dense[ids]})


def _q_embed_mmr(sf_dir):
    """Maximal-marginal-relevance diversity top-5 (λ=0.7) for query
    vector 0 over a distributed top-32 cosine prefilter — the
    relevance-vs-coverage selection move; rank-only compare (the
    ann_topk convention: cosine order is stable across numpy/DuckDB at
    these gaps, ties broken by id)."""
    from python_graphblas_ray.pipelines.similarity import mmr_select

    return mmr_select(_read(sf_dir, "embeddings"), query_id=0, k=5,
                      lam=0.7, pool=32)


def _q_events_f2(sf_dir):
    """AMS tug-of-war second-moment sketch over the event stream's
    user ids: 5 ±1-sign sums (ONE O(depth) integer partial per block,
    driver-added — EXACT in any merge order, no rounding grain),
    median-of-squares F₂ estimate, plus the exact F₂ = Σ f(u)² ground
    truth (self-join size) for in-query estimator-quality readout.
    Rows: r 0..4 = squared sign sums, r=5 = median estimate, r=6 =
    exact F₂."""
    from python_graphblas_ray.stages.reduce import grouped_agg
    from python_graphblas_ray.stages.sketch import (ams_f2_build,
                                                    ams_f2_estimate)

    ev = _read(sf_dir, "events", columns=["user_id"])
    s = ams_f2_build(ev, "user_id", depth=5)
    est = ams_f2_estimate(s)
    cnts = _as_table(grouped_agg(ev, ["user_id"], [(None, "count", "n")]))
    n = cnts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    f2 = int(np.sum(n * n))
    return pa.table({
        "r": np.arange(7, dtype=np.int64),
        "v": np.concatenate([(s.astype(np.int64) ** 2).astype(np.float64),
                             [float(est)], [float(f2)]])})


def _q_docs_chunks(sf_dir):
    """Fixed 64-token / stride-48 context-window chunk boundaries over
    every document (the training-chunk packing prep): one vectorized
    Arrow RE2 token-count kernel + repeat/arange expansion — pure
    integer arithmetic, so the SQL twin (range cross join on
    j·stride < n) is bit-exact."""
    from python_graphblas_ray.stages.text import chunk_windows

    return chunk_windows(_read(sf_dir, "documents",
                               columns=["doc_id", "text"]),
                         window=64, stride=48)


def _q_host_rank3(sf_dir):
    """Two-level web authority (the Common-Crawl host-ranking flow):
    contract the page graph to its 64 'hosts' (labels = vid % 64, edge
    weight = inter-host link count via the dedup('plus') exchange),
    then fixed-3-superstep WEIGHTED PageRank on the small quotient —
    contraction pays one bounded shuffle, the rank runs on k vertices.
    """
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, contract_graph, pagerank)

    C = contract_graph(_edge_matrix(sf_dir),
                       np.arange(N_VERT, dtype=np.int64) % 64, k=64)
    eng = build_engine(C.ds, 64, num_partitions=2, weighted=True)
    try:
        r, _, _ = pagerank(eng, tol=0.0, itermax=3, weighted=True)
    finally:
        eng.shutdown()
    return pa.table({"host": np.arange(64, dtype=np.int64),
                     "rank": _round_away(r, 8)})


def _q_embed_rp8(sf_dir):
    """JL ±1 sign projection to k=8: sign(j,i) = bit 0 of
    splitmix64(j·64+i), y = E @ Sᵀ — one streaming matmul pass; the
    SQL twin replays the sign matrix from the shared splitmix64 CTE
    generator. Round-8 covers the 64-term summation-order noise."""
    from python_graphblas_ray.pipelines.similarity import (
        random_projection)

    out = random_projection(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), k=8)
    t = _as_table(out)
    if t is None or "v" not in t.column_names:  # empty corpus
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "v": pa.array([], pa.float64())})
    return t.set_column(t.schema.get_field_index("v"), "v",
                        pa.array(np.round(
                            t["v"].to_numpy(zero_copy_only=False), 8)))


def _q_events_transitions(sf_dir):
    """Markov transition counts over per-user event sequences: one
    user-keyed hash exchange + per-partition vectorized adjacent-pair
    bincount; (ts, event_id) ordering makes ties deterministic."""
    from python_graphblas_ray.pipelines.windows import event_transitions

    out = event_transitions(_read(sf_dir, "events", columns=[
        "event_id", "ts", "user_id", "event_type"]))
    t = _as_table(out)
    return t.set_column(t.schema.get_field_index("n"), "n",
                        t["n"].cast(pa.float64()))


def _q_embed_pc1(sf_dir):
    """Top-principal-axis power iteration (2 fixed unnormalized steps,
    all-ones start) on the mean-scaled Gram matrix: the distributed
    part is the gram pass; the O(d²) iteration is driver work replayed
    verbatim by the SQL twin's two matvec CTEs."""
    from python_graphblas_ray.pipelines.similarity import (gram_matrix,
                                                           pc1_power)

    g, _ = gram_matrix(_read(sf_dir, "embeddings", columns=["embedding"]))
    y = pc1_power(g, iters=2)
    return pa.table({"i": np.arange(g.shape[0], dtype=np.int64),
                     "v": np.round(y, 8)})


def _q_minhash_sig4(sf_dir):
    """4-permutation MinHash signatures over vocabulary ranks — the
    SQL-replayable MinHash variant (perm i hashes a token as
    splitmix64(rank + i·2³²)); the per-actor-salted LSH pipeline stays
    the rows-only scale default."""
    from python_graphblas_ray.pipelines.dedup import (
        minhash_vocab_signatures)

    return minhash_vocab_signatures(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        num_hashes=4)


def _q_ann_ivf_fixed(sf_dir):
    """IVF-ANN with FIXED centroids (vectors 0..7, normalized) and
    nprobe=2 — the cell-exact twin of the kmeans-built ``ann_ivf``
    scale path: bucket = argmax cosine vs centroids (tie → lower id),
    each query probes its 2 nearest buckets, cosine top-10 within.
    Exercises the real ``ivf_search_batch`` masked-matmul kernel."""
    from python_graphblas_ray.pipelines.similarity import (
        _matrix, _normalize, ivf_search_batch)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    heads = [b for b in ds.filter(expr="vec_id < 8").iter_batches(
        batch_format="pyarrow") if b.num_rows]
    if not heads:  # empty corpus — no centroids, no neighbors
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    head = pa.concat_tables(heads, promote_options="permissive")
    order = np.argsort(head["vec_id"].to_numpy(zero_copy_only=False))
    cents = _normalize(_matrix(head["embedding"]))[order]
    import ray as _ray
    cref = _ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = _ray.get(cref)
        m = _normalize(_matrix(batch["embedding"]))
        return batch.append_column(
            "bucket", pa.array(np.argmax(m @ c.T, axis=1).astype(
                np.int64)))

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    qt = pa.concat_tables(
        ds.filter(expr="vec_id < 10").iter_batches(
            batch_format="pyarrow"), promote_options="permissive")
    qorder = np.argsort(qt["vec_id"].to_numpy(zero_copy_only=False))
    qids = qt["vec_id"].to_numpy(zero_copy_only=False)[qorder]
    qmat = _matrix(qt["embedding"])[qorder]
    return ivf_search_batch(cents, assigned, qids, qmat, k=10, nprobe=2)


def _q_simhash_sig(sf_dir):
    """64-bit SimHash over vocabulary ranks (majority bit votes of
    splitmix64(rank) across token occurrences) — the SQL-replayable
    SimHash variant; FNV-salted ``SimHasher`` stays the scale default."""
    from python_graphblas_ray.pipelines.dedup import (
        simhash_vocab_signatures)

    return simhash_vocab_signatures(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_docs_ttr(sf_dir):
    """Type-token ratio (lexical diversity) per document — distinct ÷
    total whitespace tokens, the Gopher-style quality signal."""
    from python_graphblas_ray.stages.text import type_token_ratio

    return type_token_ratio(_read(sf_dir, "documents",
                                  columns=["doc_id", "text"]))


def _q_docs_flesch(sf_dir):
    """Flesch reading-ease per document — words / sentences / vowel-group
    syllables each counted by ONE Arrow RE2 kernel, byte-matched by the
    DuckDB ``regexp_extract_all`` twin."""
    from python_graphblas_ray.stages.text import readability

    return readability(_read(sf_dir, "documents",
                             columns=["doc_id", "text"]))


# fixed screening list for the blocklist query/oracle pair — the terms
# themselves are arbitrary; what's verified is the whole-word counting
_BLOCKLIST_TERMS = ("click", "error", "free", "winner")


def _q_docs_blocklist(sf_dir):
    """Whole-word blocklist hit counts per document (zeros included) —
    one compiled alternation RE2 pattern, one Arrow kernel per batch."""
    from python_graphblas_ray.stages.text import blocklist_hits

    return blocklist_hits(_read(sf_dir, "documents",
                                columns=["doc_id", "text"]),
                          list(_BLOCKLIST_TERMS))


def _q_docs_entropy(sf_dir):
    """Char-level Shannon entropy per document (nats, round-8) — the
    gibberish/noise quality axis; one packed-key np.unique per batch."""
    from python_graphblas_ray.stages.text import char_entropy

    return char_entropy(_read(sf_dir, "documents",
                              columns=["doc_id", "text"]))


def _q_events_decay(sf_dir):
    """Exponentially time-decayed activity per user (half-life = day,
    as-of = stream max ts). Integer half-life buckets make every weight
    a dyadic rational 2^-d, so partial sums are EXACT in float64 and
    the SQL twin reproduces scores bit-for-bit — no rounding grain."""
    from python_graphblas_ray.pipelines.windows import decayed_counts

    return decayed_counts(_read(sf_dir, "events",
                                columns=["user_id", "ts"]))


def _q_embed_pq_topk(sf_dir):
    """Product-quantization ADC top-10 for queries {0,1,2} with FIXED
    one-hot codebooks (m=8, dsub=8): subspace code = argmax of the
    subvector element (tie → lower index), so a SQL oracle replays the
    code assignment with pure comparisons and the ADC distance with the
    same exact float32→double widened terms. Exercises the real
    ``pq_adc_topk`` lookup-table kernel."""
    from python_graphblas_ray.pipelines.similarity import (
        pq_adc_topk, pq_onehot_codebooks)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # round-6 ranking key: vectors sharing a CODE VECTOR have exactly
    # equal ADC distance up to summation order — the grain collapses
    # both sides to the same tie, broken by neighbor_id ascending
    return pq_adc_topk(ds, pq_onehot_codebooks(64, 8),
                       query_ids=[0, 1, 2], k=10, round_to=6)


def _q_simrank_iter2(sf_dir):
    """Fixed-2-iteration SimRank (c = 0.8) on the 128-vertex quotient
    of the derived graph (SimRank is pair-dense, so it runs on the
    contracted space — the same scale posture as host_rank3): two
    ``Aᵀ S A`` plus_times matmul chains + broadcast in-degree scaling,
    diagonal reset to 1; off-diagonal u < v pairs, round-8."""
    from python_graphblas_ray.pipelines.linkpred import simrank

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def mod(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": (o % 128).astype(np.int64),
            "dst": (p % 128).astype(np.int64),
            "val": np.ones(len(o), dtype=np.float64),
        })

    out = simrank(ds.map_batches(mod, batch_format="pyarrow"),
                  n=128, c=0.8, iters=2)

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch["u"], "v": batch["v"],
                         "s": _round_away(batch["s"].to_numpy(
                             zero_copy_only=False), 8)})

    return out.map_batches(rnd, batch_format="pyarrow")


def _q_docs_winnow(sf_dir):
    """Winnowing fingerprints (MOSS; gram=3, window=8) over vocabulary
    ranks — rightmost-min of each 8-gram-hash window, splitmix64
    replayed in SQL; any shared 10-token run shares a fingerprint."""
    from python_graphblas_ray.pipelines.dedup import winnow_fingerprints

    return winnow_fingerprints(_read(sf_dir, "documents",
                                     columns=["doc_id", "text"]),
                               gram=3, window=8)


def _q_docs_bpe_merges(sf_dir):
    """First 6 BPE merge rules fitted on the corpus vocabulary (ties →
    lexicographically smallest pair; greedy left-to-right non-overlap
    merging == SQL ``replace`` over bracket-delimited symbol strings,
    which the chained-CTE oracle replays round by round). Emits
    ``(step, cnt, pair)`` with pair = a ⟂ b joined on chr(31)."""
    from python_graphblas_ray.pipelines.bpe import bpe_fit

    docs = _read(sf_dir, "documents", columns=["text"])
    merges, counts = bpe_fit(docs, num_merges=6)
    return pa.table({
        "step": pa.array(range(1, len(merges) + 1), pa.int64()),
        "cnt": pa.array(counts, pa.int64()),
        "pair": pa.array([a + "\x1f" + b for a, b in merges],
                         pa.string()),
    })


def _q_events_window_distinct(sf_dir):
    """Distinct active users per tumbling day — the COUNT(DISTINCT)
    window aggregate (one user-keyed exchange, partials sum exactly)."""
    from python_graphblas_ray.pipelines.windows import (
        windowed_distinct_users)

    return windowed_distinct_users(_read(sf_dir, "events",
                                         columns=["user_id", "ts"]))


def _q_matching_round2(sf_dir):
    """First TWO rounds of the deterministic Luby-style maximal
    matching (static knuth32 edge priorities, local-minimum selection)
    — bounded so the unrolled SQL twin replays it exactly; the full
    fixpoint stays the rows-only ``maximal_matching`` query."""
    from python_graphblas_ray.pipelines.matching import maximal_matching

    u, v, r = maximal_matching(_edge_dataset(sf_dir), N_VERT,
                               max_rounds=2)
    return pa.table({"src": u, "dst": v,
                     "val": r.astype(np.float64)})


def _q_maximal_matching(sf_dir):
    """Full maximal matching fixpoint (rows-only; matching + maximality
    invariants are pytest-enforced)."""
    from python_graphblas_ray.pipelines.matching import maximal_matching

    u, v, r = maximal_matching(_edge_dataset(sf_dir), N_VERT)
    return pa.table({"u": u, "v": v, "round": r})


def _q_pagerank_weighted5(sf_dir):
    """Fixed-5-superstep WEIGHTED PageRank (transition ∝ a synthetic
    deterministic edge weight ``(src·7 + dst·13) % 10 + 1``): the
    plus_times spmv + out-strength normalization path, 8-decimal
    rounded for the recursive-CTE oracle."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, pagerank)

    base = _edge_matrix(sf_dir).ds

    def reweight(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": s, "dst": d,
                         "val": ((s * 7 + d * 13) % 10 + 1).astype(
                             np.float64)})

    eng = build_engine(base.map_batches(reweight, batch_format="pyarrow"),
                       N_VERT, num_partitions=4, weighted=True)
    # in-actor O(P)-driver path (bit-parity incl. weighted transition)
    r, _ = eng.pagerank_inactor(tol=0.0, itermax=5, force_iters=5,
                                weighted=True)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "rank": _round_away(r, 8)})


def _q_sssp(sf_dir):
    """Weighted Bellman-Ford over the dedup'd matrix (weight = edge
    multiplicity) so the hop-bounded recursive-CTE oracle sees the same
    weights. Capped at 6 supersteps = min over ≤6-hop walks, EXACTLY the
    oracle's ``hop < 6`` recursion bound (converged well before 6 on the
    real-sf graphs; the cap only binds on degenerate ultra-sparse
    fixtures where longer shortest paths exist)."""
    from python_graphblas_ray.pipelines.algorithms import build_engine, sssp

    eng = build_engine(_edge_matrix(sf_dir).ds, N_VERT, num_partitions=4,
                       weighted=True)
    # in-actor O(P)-driver path (bit-parity with sssp)
    dist, _ = eng.sssp_inactor(0, itermax=6)
    eng.shutdown()
    vid = np.flatnonzero(np.isfinite(dist)).astype(np.int64)
    return pa.table({"vid": vid, "dist": dist[vid]})


def _q_revenue_by_nation(sf_dir):
    """TPC-H-style star join: orders revenue per customer nation per
    region. The dimension side (customer⋈nation⋈region, a few hundred
    rows) is broadcast ONCE via ``ray.put`` as an o_custkey→label map —
    the canonical small-side broadcast join, no shuffle of the fact
    table; one vectorized per-batch partial sum + a tiny grouped
    finish. Exercises the otherwise-untouched dimension tables."""
    import ray as _ray

    from python_graphblas_ray.functions.monoids import monoid
    from python_graphblas_ray.stages.reduce import groupby_monoid

    cust = _as_table(_read(sf_dir, "customer",
                           columns=["c_custkey", "c_nationkey"]))
    nat = _as_table(_read(sf_dir, "nation",
                          columns=["n_nationkey", "n_name",
                                   "n_regionkey"]))
    reg = _as_table(_read(sf_dir, "region",
                          columns=["r_regionkey", "r_name"]))
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    nreg = nat["n_regionkey"].to_numpy(zero_copy_only=False)
    rk = reg["r_regionkey"].to_numpy(zero_copy_only=False)
    rname = np.asarray(reg["r_name"].to_pylist(), dtype=object)
    r_of_n = rname[np.searchsorted(rk, nreg)]
    # customer key -> (nation name, region name); custkeys are dense-ish
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(nk, cn)
    # validated dimension chain: a customer with a dangling nationkey
    # drops out (the oracle's inner join)
    okc = (pos < len(nk)) & (nk[np.minimum(pos, len(nk) - 1)] == cn)
    ck, cn, pos = ck[okc], cn[okc], pos[okc]
    # per-customer combined "nation|region" label, sorted by custkey —
    # the broadcast probe is one vectorized searchsorted per batch
    order = np.argsort(ck)
    ck_sorted = ck[order]
    clabel = np.array([f"{n}|{r}" for n, r in
                       zip(nname[pos][order], r_of_n[pos][order])],
                      dtype=object)
    ref = _ray.put((ck_sorted, clabel))

    def part(batch: pa.Table) -> pa.Table:
        cks_arr, labels_arr = _ray.get(ref)
        cks = batch["o_custkey"].to_numpy(zero_copy_only=False)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        # validated probe: a dangling o_custkey (no customer row) is
        # DROPPED, matching the oracle's inner join — an unvalidated
        # searchsorted would silently attribute it to a neighbor key
        pos = np.searchsorted(cks_arr, cks)
        ok = (pos < len(cks_arr)) & (cks_arr[np.minimum(
            pos, len(cks_arr) - 1)] == cks)
        key = pa.array(labels_arr[pos[ok]], pa.string())
        t = pa.table({"k": key, "rev": price[ok]})
        # per-batch combine: one row per (nation, region) per batch
        g = t.group_by("k").aggregate([("rev", "sum")])
        return pa.table({"k": g["k"], "rev": g["rev_sum"]})

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    out = _as_table(groupby_monoid(
        orders.map_batches(part, batch_format="pyarrow"),
        ["k"], "rev", monoid.plus))
    if out is None or "k" not in out.column_names:  # empty fact table
        return pa.table({"n_name": pa.array([], pa.string()),
                         "r_name": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64())})
    ks = out["k"].to_pylist()
    nats = [k.split("|")[0] for k in ks]
    regs = [k.split("|")[1] for k in ks]
    rev = out["rev"].to_numpy(zero_copy_only=False)
    return pa.table({"n_name": pa.array(nats), "r_name": pa.array(regs),
                     "revenue": np.round(rev, 4)})


def _q_revenue_by_brand_nation(sf_dir):
    """TPC-H Q9-style two-dimension star join over the FACT table:
    discounted lineitem revenue per (part brand, supplier nation). Both
    dimension maps (part→brand, supplier→nation name) broadcast once as
    key-sorted arrays; each lineitem batch pays two vectorized
    searchsorted probes and one Arrow group_by partial — the fact table
    never shuffles."""
    import ray as _ray

    from python_graphblas_ray.functions.monoids import monoid
    from python_graphblas_ray.stages.reduce import groupby_monoid

    part = _as_table(_read(sf_dir, "part",
                           columns=["p_partkey", "p_brand"]))
    supp = _as_table(_read(sf_dir, "supplier",
                           columns=["s_suppkey", "s_nationkey"]))
    nat = _as_table(_read(sf_dir, "nation",
                          columns=["n_nationkey", "n_name"]))
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    pb = np.asarray(part["p_brand"].to_pylist(), dtype=object)
    po = np.argsort(pk)
    pk, pb = pk[po], pb[po]
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    nn = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
    snk = supp["s_nationkey"].to_numpy(zero_copy_only=False)
    np_ = np.searchsorted(nk, snk)
    # dangling s_nationkey drops the supplier (oracle inner join)
    oks = (np_ < len(nk)) & (nk[np.minimum(np_, len(nk) - 1)] == snk)
    sk, np_ = sk[oks], np_[oks]
    sn = nn[np_]
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    ref = _ray.put((pk, pb, sk, sn))

    def partial(batch: pa.Table) -> pa.Table:
        pks, pbs, sks, sns = _ray.get(ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        rev = (batch["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - batch["l_discount"].to_numpy(
                   zero_copy_only=False)))
        # validated probes: dangling part/supplier keys DROP the fact
        # row (the oracle's inner joins), never mislabel it
        pp = np.searchsorted(pks, lp)
        sp = np.searchsorted(sks, ls)
        ok = ((pp < len(pks)) & (pks[np.minimum(pp, len(pks) - 1)] == lp)
              & (sp < len(sks))
              & (sks[np.minimum(sp, len(sks) - 1)] == ls))
        brand = pbs[pp[ok]]
        natn = sns[sp[ok]]
        rev = rev[ok]
        t = pa.table({
            "k": pa.array(np.char.add(np.char.add(
                brand.astype(str), "|"), natn.astype(str))),
            "rev": rev})
        g = t.group_by("k").aggregate([("rev", "sum")])
        return pa.table({"k": g["k"], "rev": g["rev_sum"]})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    out = _as_table(groupby_monoid(
        li.map_batches(partial, batch_format="pyarrow"),
        ["k"], "rev", monoid.plus))
    if out is None or "k" not in out.column_names:  # empty fact table
        return pa.table({"p_brand": pa.array([], pa.string()),
                         "n_name": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64())})
    ks = out["k"].to_pylist()
    return pa.table({
        "p_brand": pa.array([k.split("|")[0] for k in ks]),
        "n_name": pa.array([k.split("|")[1] for k in ks]),
        "revenue": np.round(out["rev"].to_numpy(zero_copy_only=False),
                            4)})


def _q_percolation_curve(sf_dir):
    """Bond-percolation CURVE: giant-component fraction at 20/40/60/80%
    deterministic edge survival (knuth32 residues < m of 5) — the
    phase-transition fingerprint of the web graph (a power-law giant
    component emerges far below 50% survival). Four broadcast-filter +
    pinned-engine FastSV runs, O(1) driver readout each."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, connected_components)

    base_ds = _edge_matrix(sf_dir).ds.materialize()
    rows_m, rows_f = [], []
    for m_keep in (1, 2, 3, 4):
        def samp(batch: pa.Table, mk=m_keep) -> pa.Table:
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            h = ((s * N_VERT + d) * 2654435761) % 4294967296
            return batch.filter(pa.array(h % 5 < mk))

        eng = build_engine(base_ds.map_batches(samp,
                                               batch_format="pyarrow"),
                           N_VERT, num_partitions=4, undirected=True)
        try:
            f, _, _ = connected_components(eng)
        finally:
            eng.shutdown()
        _, counts = np.unique(f, return_counts=True)
        rows_m.append(m_keep * 20)
        # NO rounding: n/512 is exact in doubles (2^9 denominator), and
        # round-8 hits banker's-vs-half-away ties at x.xx5 (509/512)
        rows_f.append(float(counts.max()) / N_VERT)
    return pa.table({"keep_pct": np.asarray(rows_m, dtype=np.int64),
                     "giant_frac": np.asarray(rows_f)})


def _q_global_efficiency(sf_dir):
    """Global efficiency (Latora-Marchiori 2001): mean of 1/d(u,v) over
    all ordered vertex pairs (0 for unreachable) — Σ harmonic
    centrality / (n·(n−1)), read off the same exact-bitset HyperBall
    fixpoint; the one-number connectivity-quality metric next to
    ``effective_diameter``."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.pipelines.anf import hyperball_harmonic

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    try:
        scores, exact = hyperball_harmonic(eng, mode="exact")
        assert exact
    finally:
        eng.shutdown()
    eff = float(scores.sum()) / (N_VERT * (N_VERT - 1))
    return pa.table({"efficiency": [_round0(eff)]})


def _q_edge_percolation(sf_dir):
    """Bond-percolation probe (the edge-failure twin of the
    attack/random vertex-robustness pair): keep the deterministic 20%
    knuth32 edge sample (same rule as ``edge_sample``), then the
    giant-component fraction of the surviving undirected graph —
    power-law webs stay largely connected under random edge loss."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, connected_components)

    sampled = _q_edge_sample(sf_dir)
    eng = build_engine(sampled, N_VERT, num_partitions=4,
                       undirected=True)
    try:
        f, _, _ = connected_components(eng)
    finally:
        eng.shutdown()
    _, counts = np.unique(f, return_counts=True)
    # exact n/512 — see percolation_curve on why rounding is a hazard
    return pa.table({"giant_frac": [float(counts.max()) / N_VERT]})


def _q_sssp_parents(sf_dir):
    """Shortest-path tree parents: parent(v) = smallest u among in-edges
    with dist(u) + w(u,v) == dist(v) (integer weights keep the equality
    exact in doubles) — the path-reconstruction companion to ``sssp``,
    one broadcast-dist batch pass + a min reduction, no new exchange.
    Source 0 is excluded (it has no parent). Distances use the same
    6-superstep cap as ``_q_sssp`` so the tree matches the hop-bounded
    oracle on degenerate ultra-sparse fixtures too."""
    import ray as _ray

    from python_graphblas_ray.functions.monoids import monoid
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, sssp)
    from python_graphblas_ray.stages.reduce import groupby_monoid

    A = _edge_matrix(sf_dir).ds
    eng = build_engine(A, N_VERT, num_partitions=4, weighted=True)
    try:
        dist, _ = sssp(eng, source=0, itermax=6)
    finally:
        eng.shutdown()
    dref = _ray.put(dist)

    def cand(batch: pa.Table) -> pa.Table:
        d = _ray.get(dref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        t = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["val"].to_numpy(zero_copy_only=False)
        ok = np.isfinite(d[s]) & (d[s] + w == d[t]) & (t != 0)
        return pa.table({"vid": t[ok], "parent": s[ok]})

    return groupby_monoid(A.map_batches(cand, batch_format="pyarrow"),
                          ["vid"], "parent", monoid.min)


def _q_ball2_size(sf_dir):
    """Exact 2-hop in-ball size |B_in(v, 2)| per vertex (self included)
    — the friend-of-friend audience metric, two bitset register
    supersteps."""
    from python_graphblas_ray.pipelines.algorithms import build_engine
    from python_graphblas_ray.pipelines.anf import ball_sizes

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    try:
        sizes = ball_sizes(eng, t=2)
    finally:
        eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "val": sizes.astype(np.int64)})


def _q_edge_support(sf_dir):
    """Per-edge triangle support — the k-truss/triangle inner kernel as
    a standalone oracle-checked query: ``C<A.S> = A plus_pair A`` over
    the simple undirected graph (entries exist only where support ≥ 1,
    the structural sparsity of the masked mxm)."""
    from python_graphblas_ray.functions.monoids import semiring
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    return _seed_schema(A.mxm(A, semiring.plus_pair, mask=A.S).ds,
                        src=pa.int64(), dst=pa.int64(), val=pa.int64())


def _q_lpa_iter2(sf_dir):
    """Synchronous LPA, EXACTLY 2 forced iterations (no early stop) —
    the fixed-iteration oracle form (same trick as pagerank_iter5):
    deterministic mode (max count, tie → smallest label) is plain SQL
    when unrolled."""
    from python_graphblas_ray.pipelines.algorithms import build_engine

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4,
                       undirected=True)
    # in-actor O(P)-driver synchronous LPA (identical mode/tie-break
    # kernel; 2 forced supersteps unless labels already fixed — same
    # values either way)
    labels, _ = eng.label_propagation_inactor(itermax=2)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "label": labels})


def _q_label_propagation(sf_dir):
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, label_propagation)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4,
                       undirected=True)
    labels, _, _ = label_propagation(eng)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "label": labels})


def _q_betweenness(sf_dir):
    from python_graphblas_ray.pipelines.centrality import (
        betweenness, reverse_edges)
    from python_graphblas_ray.state.superstep import SuperstepEngine

    edges = _edge_dataset(sf_dir).materialize()
    fwd = SuperstepEngine(edges, N_VERT, num_partitions=4)
    rev = SuperstepEngine(reverse_edges(edges), N_VERT, num_partitions=4)
    bc = betweenness(fwd, rev, sources=list(range(8)))
    fwd.shutdown()
    rev.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64), "bc": bc})


def _q_docs_cdc_bounds(sf_dir):
    """Content-defined chunk BOUNDARIES (gear rolling hash, mask_bits=8)
    — the SQL-checkable member of the CDC family: the oracle rebuilds
    the 256-entry gear table (splitmix64(byte ^ 0xC0FFEE)), the 64-byte
    shifted-sum window via 64 LAG terms, and the boundary rule exactly;
    synthetic docs are pure ASCII so characters == bytes. Chunk content
    hashes (cumulative-polynomial, needing a mod-2⁶⁴ prefix scan) stay
    with the rows-only ``docs_cdc_chunks``."""
    from python_graphblas_ray.pipelines.dedup import cdc_chunks

    return cdc_chunks(_read(sf_dir, "documents",
                            columns=["doc_id", "text"])).select_columns(
        ["doc_id", "chunk_ix", "start", "length"])


def _q_betweenness_s0(sf_dir):
    """Single-source Brandes dependency (source 0) over the raw
    multigraph edges — the SQL-checkable member of the betweenness
    family (path counts multiply through parallel edges exactly like
    the plus_second spmv): the oracle unrolls σ forward and δ backward
    level by level. Values rounded to 8 (σ stays exact-integer; δ's
    division order differs below the grain). The multi-source sampled
    estimator stays the rows-only ``betweenness``."""
    from python_graphblas_ray.pipelines.centrality import (
        betweenness, reverse_edges)
    from python_graphblas_ray.state.superstep import SuperstepEngine

    edges = _edge_dataset(sf_dir).materialize()
    fwd = SuperstepEngine(edges, N_VERT, num_partitions=4)
    rev = SuperstepEngine(reverse_edges(edges), N_VERT,
                          num_partitions=4)
    try:
        bc = betweenness(fwd, rev, sources=[0])
    finally:
        fwd.shutdown()
        rev.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "val": np.round(bc, 8)})


def _q_hits(sf_dir):
    from python_graphblas_ray.pipelines.algorithms import build_engine, hits

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    h, a, _, _ = hits(eng, itermax=50, tol=1e-8)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "hub": h, "authority": a})


def _q_link_jaccard(sf_dir):
    from python_graphblas_ray.pipelines.linkpred import neighborhood_jaccard

    return _seed_schema(
        neighborhood_jaccard(_edge_dataset(sf_dir), N_VERT, min_common=2),
        u=pa.int64(), v=pa.int64(), common=pa.int64(),
        jaccard=pa.float64())


def _q_link_scores(sf_dir):
    """Neighborhood-overlap score family (common / jaccard / cosine /
    preferential attachment) — each score is one float op over exact
    integer counts, so the SQL oracle matches bit-exactly. The
    Adamic–Adar column is excluded here (float-sum order is
    engine-dependent); its parity check is the brute-force oracle in
    tests/test_sampling_hits.py."""
    from python_graphblas_ray.pipelines.linkpred import link_scores

    return _seed_schema(
        link_scores(_edge_dataset(sf_dir), N_VERT, min_common=2,
                    adamic_adar=False),
        u=pa.int64(), v=pa.int64(), common=pa.int64(),
        jaccard=pa.float64(), cosine=pa.float64(),
        preferential=pa.int64())


def _q_node2vec_walks(sf_dir):
    """Second-order node2vec walks (p=0.5 return-biased, q=2.0
    exploration-damped) via rejection sampling — deterministic given the
    seed; rows-only (edge-validity/bias behavior are pytest-checked)."""
    from python_graphblas_ray.pipelines.algorithms import build_engine

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    eng_t = eng.transposed(release=True)  # walk along out-edges
    walks = eng_t.node2vec_walks(np.arange(0, N_VERT, 8), length=8,
                                 p=0.5, q=2.0, seed=42)
    eng_t.shutdown()
    wid = np.repeat(np.arange(walks.shape[0]), walks.shape[1])
    step = np.tile(np.arange(walks.shape[1]), walks.shape[0])
    return pa.table({"walk_id": wid.astype(np.int64),
                     "step": step.astype(np.int64),
                     "vertex": walks.reshape(-1)})


def _q_docs_cdc_chunks(sf_dir):
    """Content-defined chunking over documents (gear rolling hash) —
    rows-only (tiling/shift-resistance/dedup-ratio are pytest-checked);
    chunk_hash cast to int64 for the driver's Arrow comparison."""
    from python_graphblas_ray.pipelines.dedup import cdc_chunks

    ch = cdc_chunks(_read(sf_dir, "documents", columns=["doc_id", "text"]))

    def cast(batch: pa.Table) -> pa.Table:
        h = batch["chunk_hash"].to_numpy(zero_copy_only=False)
        return batch.set_column(
            batch.schema.get_field_index("chunk_hash"), "chunk_hash",
            pa.array(h.view(np.int64)))

    return ch.map_batches(cast, batch_format="pyarrow")


def _q_ppr_local(sf_dir):
    """ACL local-push personalized PageRank from seeds {0, 7} (work ∝
    touched edges); rows-only — the under-approximation / residual
    bounds are pytest-checked against a dense linear-system oracle."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, ppr_push)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    # in-actor O(P)-driver path (bit-parity with ppr_push)
    p, r, _, _ = eng.ppr_inactor([0, 7], alpha=0.15, eps=1e-7)
    eng.shutdown()
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "ppr": np.round(p, 10),
                     "residual": np.round(r, 10)})


def _q_core_numbers(sf_dir):
    """Per-vertex core number (iterated k-core peel over the simple
    undirected graph); rows-only — dense-oracle pytest coverage lives
    in test_kcore."""
    from python_graphblas_ray.pipelines.kcore import core_number
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    core = core_number(A)
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "core": core})


def _q_docs_cdc_neardup(sf_dir):
    """Shared-passage near-dup pairs (≥2 shared content-defined chunks);
    rows-only — planted-passage and hot-chunk-guard tests cover it."""
    from python_graphblas_ray.pipelines.dedup import cdc_neardup_pairs

    return cdc_neardup_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        min_shared=2, mask_bits=6)


def _q_random_walks(sf_dir):
    from python_graphblas_ray.pipelines.algorithms import build_engine

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    eng_t = eng.transposed(release=True)  # walk along out-edges
    walks = eng_t.random_walks(np.arange(0, N_VERT, 4), length=8, seed=42)
    eng_t.shutdown()
    wid = np.repeat(np.arange(walks.shape[0]), walks.shape[1])
    step = np.tile(np.arange(walks.shape[1]), walks.shape[0])
    return pa.table({"walk_id": wid.astype(np.int64),
                     "step": step.astype(np.int64),
                     "vertex": walks.reshape(-1)})


def _q_docs_split(sf_dir):
    """Deterministic train/val/test split over documents — knuth32 hash
    method so the mapping is ONE plain-SQL expression (see oracle)."""
    from python_graphblas_ray.pipelines.sampling import split_column

    ds = split_column(_read(sf_dir, "documents", columns=["doc_id"]),
                      {"train": 0.8, "val": 0.1, "test": 0.1},
                      key_col="doc_id", method="knuth32")
    return ds.select_columns(["doc_id", "split"])


def _q_docs_quota(sf_dir):
    """Per-language quota sample: the 20 docs with the smallest knuth32
    key hash per lang (ROW_NUMBER-over-hash SQL oracle)."""
    from python_graphblas_ray.pipelines.sampling import quota_sample

    ds = quota_sample(_read(sf_dir, "documents",
                            columns=["doc_id", "lang"]),
                      "lang", 20, key_col="doc_id", method="knuth32",
                      num_partitions=4)
    return ds.select_columns(["doc_id", "lang"])


_BM25_QUERIES = {"q0": "hash join", "q1": "fast scan filter",
                 "q2": "customer order"}


def _q_docs_mixture(sf_dir):
    """Temperature-based mixture sample (w ∝ n^0.5 per source, exact
    largest-remainder quotas, smallest-hash picks)."""
    from python_graphblas_ray.pipelines.sampling import mixture_sample

    return mixture_sample(
        _read(sf_dir, "documents", columns=["doc_id", "source"]),
        "source", total=200, key_col="doc_id", temperature=0.5,
        method="knuth32", num_partitions=4)


def _q_docs_ccnet_buckets(sf_dir):
    """CCNet perplexity bucketing: LM-score tertiles → tail/middle/head
    (tail iff score ≤ q1/3, middle iff ≤ q2/3, else head)."""
    from python_graphblas_ray.stages.text import ccnet_buckets

    return ccnet_buckets(_read(sf_dir, "documents",
                               columns=["doc_id", "text"]))


def _q_docs_bm25(sf_dir):
    """Lexical BM25 top-10 per query (streaming postings pruned to the
    query vocabulary at the map stage — no corpus-wide index shuffle)."""
    from python_graphblas_ray.pipelines.retrieval import bm25_topk

    return bm25_topk(_read(sf_dir, "documents",
                           columns=["doc_id", "text"]),
                     _BM25_QUERIES, k=10)


def _q_embed_kmeans(sf_dir):
    """k-means over the embeddings table (deterministic seed); returns
    per-vector cluster assignments. Iterative — rows-only check."""
    from python_graphblas_ray.pipelines.clustering import (
        kmeans_assign, kmeans_fit)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if ds.count() == 0:  # empty corpus — nothing to fit
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    cents, _ = kmeans_fit(ds, 8, iters=10, seed=0)
    return kmeans_assign(ds, cents).select_columns(["vec_id", "cluster"])


def _q_docs_repetition(sf_dir):
    """Gopher-style intra-doc repetition metrics (dup-word / top-word /
    dup-bigram fractions) — the standard repetition quality gate."""
    from python_graphblas_ray.stages.text import repetition_score

    return repetition_score(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_docs_decontaminate(sf_dir):
    """Benchmark decontamination: docs with doc_id % 20 == 0 act as the
    held-out benchmark; every other doc sharing ANY word 3-gram with the
    benchmark is dropped. Returns surviving train doc_ids."""
    from python_graphblas_ray.pipelines.corpus import decontaminate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def is_bench(batch: pa.Table, invert=False) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sel = (ids % 20) == 0
        return batch.filter(pa.array(~sel if invert else sel))

    bench = docs.map_batches(is_bench, batch_format="pyarrow")
    train = docs.map_batches(lambda b: is_bench(b, invert=True),
                             batch_format="pyarrow")
    clean, _ = decontaminate(train, bench, ngram=3)
    return clean.select_columns(["doc_id"])


def _q_docs_dup_spans(sf_dir):
    """Exact substring dedup (Lee et al. 2022 ExactSubstr, fixed
    8-token-window variant): (doc_id, pos) of every window occurring
    ≥2 times anywhere in the corpus."""
    from python_graphblas_ray.pipelines.dedup import duplicate_spans

    return duplicate_spans(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), window=8)


def _q_docs_neardup_clusters(sf_dir):
    """Near-dup clusters: MinHash pairs → FastSV components on the pair
    graph (engine reuse); hash-based → rows-only (pytest pins the
    transitive-collapse semantics)."""
    from python_graphblas_ray.pipelines.corpus import neardup_clusters

    return neardup_clusters(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.6)


def _q_louvain(sf_dir):
    """Louvain community detection (reference notebooks/Louvain.ipynb,
    synchronized deterministic variant) — iterative modularity
    optimization; rows-only check (pytest pins notebook parity)."""
    from python_graphblas_ray.pipelines.louvain import louvain
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    comm, _ = louvain(A.ds, N_VERT, max_levels=5)
    return pa.table({"vid": np.arange(N_VERT, dtype=np.int64),
                     "community": comm})


def _q_docs_pii(sf_dir):
    """PII redaction over documents: scrubbed text + per-type match
    counts. The corpus is synthetic word-soup (zero PII), so the oracle
    checks the byte-identity of the pass-through path — the planted-PII
    behavior is pinned by tests/test_text_stages.py."""
    from python_graphblas_ray.stages.text import redact_pii

    return redact_pii(_read(sf_dir, "documents",
                            columns=["doc_id", "text"]))


def _q_pages_pagerank(sf_dir):
    """Flagship front-end: synthetic Common-Crawl-style pages → link
    extraction → PageRank (the BASELINE.json input_hint pipeline; sized by
    sf so it stays a smoke-scale run here — bench.py runs it big)."""
    import ray.data

    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, pagerank)
    from python_graphblas_ray.pipelines.ingest import extract_edges
    from python_graphblas_ray.sources.pages import pages_dataset

    n_pages = 2000
    pages = pages_dataset(n_pages, parallelism=4)
    edges = extract_edges(pages)
    eng = build_engine(edges, n_pages, num_partitions=4)
    r, _, _ = pagerank(eng, tol=1e-6)
    eng.shutdown()
    return pa.table({"vid": np.arange(n_pages, dtype=np.int64), "rank": r})


def _q_pages_extract_text(sf_dir):
    """Per-url extracted text (the byte-identical invariant surface)."""
    from python_graphblas_ray.pipelines.ingest import extract_text_table
    from python_graphblas_ray.sources.pages import pages_dataset

    return extract_text_table(pages_dataset(2000, parallelism=4))


def _q_pages_roundtrip(sf_dir):
    """The byte-identical extracted-text invariant as an ORACLE query:
    wrap each document's text in the synthetic page html shell, run the
    REAL ``extract_text`` stage over it, return (url, extracted_text).
    The SQL side performs the same tag-strip + whitespace-collapse in
    DuckDB's RE2 — any drift in the extraction path breaks the hash."""
    from python_graphblas_ray.pipelines.ingest import extract_text_table

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        txts = batch["text"].to_pylist()
        html = [(f"<html><head><title>doc {i}</title></head>"
                 f"<body><p>{t or ''}</p></body></html>").encode("utf-8")
                for i, t in zip(ids, txts)]
        return pa.table({
            "url": pa.array([f"doc://{i}" for i in ids],
                            type=pa.string()),
            "html": pa.array(html, type=pa.binary())})

    return extract_text_table(docs.map_batches(wrap,
                                               batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# documents / embeddings / events queries
# ---------------------------------------------------------------------------

def _q_prepare_corpus(sf_dir):
    """Flagship training-corpus prep composition (quality gate → exact
    dedup → near-dup removal → embeddings); returns the surviving ids."""
    from python_graphblas_ray.pipelines.corpus import prepare_corpus

    clean, _ = prepare_corpus(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        min_words=10, min_quality=0.0, neardup_threshold=0.6)
    return clean.select_columns(["doc_id"])


def _q_dedup_exact(sf_dir):
    from python_graphblas_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents",
                             columns=["doc_id", "text"]))


def _q_word_jaccard(sf_dir):
    """df-capped exact word-set Jaccard: words in more than half the
    corpus (classic stopwords) are dropped from the inverted index
    BEFORE the self-join — a word in k docs contributes k² join rows,
    so the uncapped form is quadratic on hot words (measured 871 s at
    sf0.1). The cap is the scale-invariant ``ndocs // 2`` so the SQL
    twin's HAVING clause replays it exactly at every scale; the score
    is the exact Jaccard of the capped word sets on both sides."""
    from python_graphblas_ray.pipelines.dedup import word_jaccard_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return word_jaccard_pairs(docs, threshold=0.8,
                              max_word_df=docs.count() // 2)


def _q_minhash_pairs(sf_dir):
    from python_graphblas_ray.pipelines.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_read(sf_dir, "documents",
                                   columns=["doc_id", "text"]),
                             threshold=0.5)


def _q_simhash_sigs(sf_dir):
    from python_graphblas_ray.pipelines.dedup import simhash_signatures

    return simhash_signatures(_read(sf_dir, "documents",
                                    columns=["doc_id", "text"]))


def _q_embedding_neardup(sf_dir):
    from python_graphblas_ray.pipelines.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(_read(sf_dir, "embeddings"),
                                   threshold=0.4)


def _q_semantic_dedup(sf_dir):
    """SemDeDup: embedding-cosine clusters (threshold shared with
    ``embedding_neardup``) → keep the smallest id per cluster."""
    from python_graphblas_ray.pipelines.corpus import semantic_dedup

    return semantic_dedup(_read(sf_dir, "embeddings"), threshold=0.4)


def _q_docs_jaccard_groups(sf_dir):
    """Near-dup TEXT clustering under full oracle verification: the
    df-capped (ndocs // 2) word-Jaccard ≥ 0.8 pair graph collapses to
    canonical clusters via FastSV; keep = smallest id per cluster. The
    lexical twin of semantic_dedup (recursive-CTE closure oracle)."""
    from python_graphblas_ray.pipelines.corpus import jaccard_dedup_groups

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return jaccard_dedup_groups(docs, threshold=0.8,
                                max_word_df=docs.count() // 2)


def _q_ann_topk(sf_dir):
    from python_graphblas_ray.pipelines.similarity import ann_topk

    return ann_topk(_read(sf_dir, "embeddings"), query_ids=list(range(10)),
                    k=10)


def _q_ann_ivf(sf_dir):
    """ANN through the IVF index (build → multi-probe batched search) —
    the at-scale path; recall vs brute force is pytest-asserted ≥ 0.9
    (approximate → rows-only here)."""
    from python_graphblas_ray.pipelines.similarity import ann_topk_ivf

    ds = _read(sf_dir, "embeddings")
    if ds.count() == 0:  # empty corpus — no index, no neighbors
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    return ann_topk_ivf(ds, query_ids=list(range(10)), k=10, nprobe=4)


def _q_doc_embed_ann(sf_dir):
    """Text → feature-hashing embedding → ANN top-5 (the full text
    similarity chain; hashing not SQL-reproducible → rows-only)."""
    from python_graphblas_ray.pipelines.similarity import ann_topk
    from python_graphblas_ray.stages.text import embed_text

    emb = embed_text(_read(sf_dir, "documents",
                           columns=["doc_id", "text"]), dim=64)
    return ann_topk(emb, query_ids=list(range(5)), k=5, id_col="doc_id")


def _q_token_count(sf_dir):
    from python_graphblas_ray.stages.text import token_count

    ds = token_count(_read(sf_dir, "documents", columns=["doc_id", "text"]))
    return ds.select_columns(["doc_id", "ws_tokens"])


def _q_doc_stats(sf_dir):
    from python_graphblas_ray.stages.text import quality_score

    ds = quality_score(_read(sf_dir, "documents",
                             columns=["doc_id", "text"]))
    return ds.select_columns(["doc_id", "q_len", "q_words"])


def _q_quality_filter(sf_dir):
    """Quality-gate pipeline: score docs, keep q_words ≥ 40, count per
    lang (the C4-style filter step as a query). The count is a per-batch
    Arrow hash-aggregate combiner + tiny merge — no per-group Python."""
    from python_graphblas_ray.stages.reduce import grouped_agg
    from python_graphblas_ray.stages.text import quality_score

    ds = quality_score(_read(sf_dir, "documents",
                             columns=["doc_id", "text", "lang"]))

    def filt(batch: pa.Table) -> pa.Table:
        keep = batch["q_words"].to_numpy(zero_copy_only=False) >= 40
        return batch.filter(pa.array(keep)).select(["lang"])

    kept = ds.map_batches(filt, batch_format="pyarrow")
    return grouped_agg(kept, ["lang"], [(None, "count", "n_docs")])


def _q_lang_count(sf_dir):
    from python_graphblas_ray.stages.reduce import grouped_agg

    ds = _read(sf_dir, "documents", columns=["lang"])
    return grouped_agg(ds, ["lang"], [(None, "count", "n_docs")])


def _q_events_window(sf_dir):
    from python_graphblas_ray.pipelines.windows import windowed_aggregate

    return windowed_aggregate(_read(sf_dir, "events"),
                              keys=("event_type",), every="day")


def _q_events_hll(sf_dir):
    """Approximate distinct users per event type (HyperLogLog sketch;
    approximate → rows-only check; unit test bounds the error)."""
    from python_graphblas_ray.stages.sketch import hll_distinct

    return hll_distinct(_read(sf_dir, "events",
                              columns=["event_type", "user_id"]),
                        keys=["event_type"], value_col="user_id")


def _q_events_hopping(sf_dir):
    from python_graphblas_ray.pipelines.windows import hopping_window_count

    return hopping_window_count(_read(sf_dir, "events"))


def _q_events_asof(sf_dir):
    """As-of join: for each click, the user's latest prior purchase."""
    from python_graphblas_ray.pipelines.windows import asof_join

    ev = _read(sf_dir, "events")

    def side(t):
        def f(batch: pa.Table) -> pa.Table:
            keep = pa.compute.equal(batch["event_type"], pa.scalar(t))
            return batch.filter(keep)
        return f

    clicks = ev.map_batches(side("click"), batch_format="pyarrow")
    purchases = ev.map_batches(side("purchase"), batch_format="pyarrow")
    out = asof_join(clicks, purchases, key="user_id", ts_col="ts",
                    right_value_cols=("ts",))
    return out.select_columns(["event_id", "ts_r"])


def _q_events_sessionize(sf_dir):
    from python_graphblas_ray.pipelines.windows import sessionize

    return sessionize(_read(sf_dir, "events"), gap_minutes=30)


def _q_events_funnel(sf_dir):
    """Ordered view→click→purchase funnel per user (first-touch greedy
    matching) — one hash-exchange + vectorized merge-scan pass."""
    from python_graphblas_ray.pipelines.windows import funnel

    return funnel(_read(sf_dir, "events",
                        columns=["user_id", "ts", "event_type"]),
                  ["view", "click", "purchase"])


def _q_events_retention(sf_dir):
    """Cohort retention matrix: users cohorted by first active day,
    distinct-active counts per (cohort_day, day_offset)."""
    from python_graphblas_ray.pipelines.windows import retention

    return retention(_read(sf_dir, "events", columns=["user_id", "ts"]))


def _q_lineitem_agg(sf_dir):
    """Plain wide aggregate (general groupby surface) — per-batch Arrow
    combiner, partial rows ≤ #groups × #blocks, tiny driver merge."""
    from python_graphblas_ray.stages.reduce import grouped_agg

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return grouped_agg(ds, ["l_returnflag", "l_linestatus"],
                       [("l_quantity", "sum", "sum_qty"),
                        (None, "count", "n")])


# ---------------------------------------------------------------------------
# suite merging: the driver records correctness rows for the FIRST 50
# queries() entries only (CORRECTNESS_r01.json held exactly 50 of 57).
# To get every SQL-oracle-backed operator a driver row, same-schema
# operator families are merged into one UNION-tagged query each (tag
# column ``q``), freeing window slots for the tail oracle queries. The
# individual members stay in queries()/oracle_sql() past the window so
# they remain runnable / pytest-checkable one by one.
# ---------------------------------------------------------------------------

def _as_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if hasattr(res, "iter_batches"):  # ray.data.Dataset
        batches = list(res.iter_batches(batch_format="pyarrow"))
        if not batches:
            # empty result (e.g. a fully-peeled k-core at tiny sf) —
            # keep the schema so empty-vs-empty compares column-exact.
            # A materialized 0-BLOCK dataset has no schema at all
            # (Ray returns None); a column-less empty table is the
            # best recoverable answer there.
            sch = res.schema(fetch_if_missing=True)
            if sch is None:
                return pa.table({})
            return pa.table({n: pa.array([], type=t)
                             for n, t in zip(sch.names, sch.types)})
        return pa.concat_tables(batches, promote_options="permissive")
    return pa.Table.from_pandas(res, preserve_index=False)


def _suite(members):
    """Callable running each (tag, fn) member and concatenating the
    results under a leading ``q`` tag column (identical member schemas
    by construction — verified by the per-member oracle rows)."""
    def run(sf_dir):
        parts = []
        for tag, fn in members:
            t = _as_table(fn(sf_dir))
            if t is None:
                continue  # empty member: oracle side yields 0 rows too
            parts.append(t.add_column(0, "q", pa.array([tag] * len(t))))
        if not parts:  # every member legitimately empty
            return pa.table({"q": pa.array([], pa.string())})
        return pa.concat_tables(parts, promote_options="permissive")
    return run


def _suite_sql(members):
    return " UNION ALL ".join(
        f"SELECT '{tag}' AS q, * FROM ({sql}) AS t{i}"
        for i, (tag, sql) in enumerate(members))


# suite name -> member query names (each member keeps its own entry too)
def _q_events_zscore(sf_dir):
    """Per-user daily-volume anomaly z-scores (bot bursts / tracking
    breakage): one user-keyed hash exchange, per-partition vectorized
    moments — integer counts make z bit-exact vs the SQL twin (no
    rounding grain)."""
    from python_graphblas_ray.pipelines.windows import daily_zscores

    t = _as_table(daily_zscores(
        _read(sf_dir, "events", columns=["user_id", "ts"])))
    if t is None or "z" not in t.column_names:  # empty stream
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "day": pa.array([], pa.timestamp("us")),
                         "z": pa.array([], pa.float64())})
    return t.select(["user_id", "day", "z"])


def _q_events_cusum(sf_dir):
    """Per-user CUSUM burst statistic (Page 1954) over daily counts:
    integer drift + running min make the statistic exact up to one
    final division — bit-exact vs the SQL window-function twin."""
    from python_graphblas_ray.pipelines.windows import user_cusum

    t = _as_table(user_cusum(
        _read(sf_dir, "events", columns=["user_id", "ts"])))
    if t is None or "cusum" not in t.column_names:  # empty stream
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "cusum": pa.array([], pa.float64())})
    return t.select(["user_id", "cusum"])


def _q_events_priority_sample(sf_dir):
    """Priority sampling (Duffield-Lund-Thorup 2007) of users weighted
    by event count, k=20: u = ((splitmix64(user) >> 11) + 1) * 2^-53 is
    exactly representable, so priorities and max(w, tau) estimates are
    single exactly-rounded divisions — bit-exact vs the splitmix64 SQL
    replay."""
    from python_graphblas_ray.pipelines.sampling import priority_sample

    t = priority_sample(_read(sf_dir, "events", columns=["user_id"]),
                        "user_id", 20)
    return t.select(["rank", "user_id", "est"])


def _q_degree_rankcorr(sf_dir):
    """Spearman rank correlation of (in-degree, out-degree) over all
    512 vertices: doubled average ranks keep every partial sum INTEGER
    (histogram-derived, no global sort), final coefficient is a fixed
    IEEE op sequence — bit-exact, no grain. Degenerate (constant-rank)
    graphs emit no row on either side."""
    from python_graphblas_ray.pipelines.linkpred import (
        degree_rank_correlation)

    r = degree_rank_correlation(_edge_matrix(sf_dir).ds, N_VERT)
    if r != r:  # nan: zero rank variance on a side (SQL: WHERE guard)
        return pa.table({"n_vertices": pa.array([], pa.int64()),
                         "spearman": pa.array([], pa.float64())})
    return pa.table({"n_vertices": pa.array([N_VERT], pa.int64()),
                     "spearman": pa.array([r], pa.float64())})


def _q_degree_gini(sf_dir):
    """Gini coefficient of the out-degree distribution over all 512
    vertices (hub concentration): exact from the driver-size degree
    histogram, integer sums, 4 fixed IEEE ops — bit-exact, no grain."""
    from python_graphblas_ray.pipelines.linkpred import degree_gini

    g = degree_gini(_edge_matrix(sf_dir).ds, N_VERT, "src")
    return pa.table({"n_vertices": pa.array([N_VERT], pa.int64()),
                     "gini": pa.array([g], pa.float64())})


def _q_embed_silhouette(sf_dir):
    """Simplified silhouette (Hruschka et al. 2004) of the fixed
    2-update k-means clustering (same deterministic vec_id<8 init +
    round-6 centroid grain as ``embed_kmeans_iter2``): a/b = L2 to
    own/nearest-other centroid, s = (b-a)/max(a,b), ONE streaming pass
    against broadcast centroids. Round-8 absorbs the 64-term
    summation-order noise; the SQL twin extends the kmeans CTE chain."""
    from python_graphblas_ray.pipelines.clustering import (
        kmeans_fit, silhouette_simplified)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    heads = [b for b in ds.filter(expr="vec_id < 8").iter_batches(
        batch_format="pyarrow") if b.num_rows]
    if not heads:  # empty corpus - no centroids, no scores
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64()),
                         "sil": pa.array([], pa.float64())})
    head = pa.concat_tables(heads, promote_options="permissive")
    order = np.argsort(head["vec_id"].to_numpy(zero_copy_only=False))
    init = np.stack([np.asarray(head["embedding"][int(i)].as_py(),
                                dtype=np.float64) for i in order])
    cents, _ = kmeans_fit(ds, 8, iters=2, init_centroids=init,
                          round_to=6)
    t = _as_table(silhouette_simplified(ds, cents))
    return t.set_column(t.schema.get_field_index("sil"), "sil",
                        pa.array(np.round(
                            t["sil"].to_numpy(zero_copy_only=False), 8)))



def _q_embed_db_index(sf_dir):
    """Per-cluster Davies-Bouldin separation scores of the fixed
    2-update k-means clustering (same deterministic vec_id<8 init +
    round-6 centroid grain as ``embed_kmeans_iter2``): r_i =
    max_j (s_i+s_j)/m_ij off ONE streaming (cluster, n, Σdist) partial
    pass. Round-6 over Σ√d summation order; the SQL twin extends the
    kmeans CTE chain."""
    from python_graphblas_ray.pipelines.clustering import (
        davies_bouldin, kmeans_fit)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    empty = pa.table({"cluster": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "r": pa.array([], pa.float64())})
    heads = [b for b in ds.filter(expr="vec_id < 8").iter_batches(
        batch_format="pyarrow") if b.num_rows]
    if not heads:
        return empty
    head = pa.concat_tables(heads, promote_options="permissive")
    order = np.argsort(head["vec_id"].to_numpy(zero_copy_only=False))
    init = np.stack([np.asarray(head["embedding"][int(i)].as_py(),
                                dtype=np.float64) for i in order])
    cents, _ = kmeans_fit(ds, 8, iters=2, init_centroids=init,
                          round_to=6)
    t = davies_bouldin(ds, cents)
    return t.set_column(t.schema.get_field_index("r"), "r",
                        pa.array(_round_away(
                            t["r"].to_numpy(zero_copy_only=False), 6)))


def _q_docs_pack_offsets(sf_dir):
    """Global concat-and-chunk sequence-packing layout (GPT-style
    pretraining packer): per-doc global token offsets from the
    distributed ordered_prefix_sum SCAN (range exchange + two-phase
    base offsets), sequences of 256 tokens crossing doc boundaries.
    Pure integer arithmetic - bit-exact vs the SQL window-sum twin at
    any partition count."""
    from python_graphblas_ray.stages.text import pack_offsets

    t = _as_table(pack_offsets(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        budget=256))
    if t is None or "offset" not in t.column_names:  # empty corpus
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "offset": pa.array([], pa.int64()),
                         "first_seq": pa.array([], pa.int64()),
                         "last_seq": pa.array([], pa.int64())})
    return t


def _q_events_user_entropy(sf_dir):
    """Per-user Shannon entropy of the event-type mix (behavioral
    diversity): one grouped-count exchange + one user-keyed segment
    pass; round-8 absorbs term-order noise."""
    from python_graphblas_ray.pipelines.windows import user_entropy

    t = _as_table(user_entropy(
        _read(sf_dir, "events", columns=["user_id", "event_type"])))
    if t is None or "entropy" not in t.column_names:  # empty stream
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "entropy": pa.array([], pa.float64())})
    return t



def _q_events_value_quantiles(sf_dir):
    """Exact per-event-type value quantiles (p25 / median / p90) via
    the grouped_quantile exchange (quantile_disc semantics: element
    ceil(q*n)-1 of the sorted group) - bit-exact vs quantile_disc."""
    from python_graphblas_ray.stages.reduce import grouped_quantile

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = {}
    for name, q in (("p25", 0.25), ("med", 0.5), ("p90", 0.9)):
        t = _as_table(grouped_quantile(ds, ["event_type"], "value",
                                       q=q, out_col=name))
        if t is None or name not in t.column_names:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "p25": pa.array([], pa.float64()),
                             "med": pa.array([], pa.float64()),
                             "p90": pa.array([], pa.float64())})
        ks = t["event_type"].to_pylist()
        vs = t[name].to_numpy(zero_copy_only=False)
        out[name] = dict(zip(ks, vs))
    keys = sorted(out["med"])
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "p25": pa.array([out["p25"][k] for k in keys], pa.float64()),
        "med": pa.array([out["med"][k] for k in keys], pa.float64()),
        "p90": pa.array([out["p90"][k] for k in keys], pa.float64())})


def _q_docs_source_stats(sf_dir):
    """Per-source corpus report (the dataset-card readout): doc count,
    total/mean/median chars - counts and sums INTEGER (exact any
    order), mean is one division, median via grouped_quantile -
    bit-exact, no grain."""
    from python_graphblas_ray.stages.reduce import (grouped_agg,
                                                    grouped_quantile)

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    agg = _as_table(grouped_agg(ds, ["source"],
                                [("source", "count", "n_docs"),
                                 ("n_chars", "sum", "sum_chars")]))
    med = _as_table(grouped_quantile(ds, ["source"], "n_chars",
                                     q=0.5, out_col="med_chars"))
    if (agg is None or med is None or "n_docs" not in agg.column_names
            or "med_chars" not in med.column_names):  # empty corpus
        return pa.table({"source": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "sum_chars": pa.array([], pa.int64()),
                         "med_chars": pa.array([], pa.float64()),
                         "avg_chars": pa.array([], pa.float64())})
    mm = dict(zip(med["source"].to_pylist(),
                  med["med_chars"].to_numpy(zero_copy_only=False)))
    ks = agg["source"].to_pylist()
    nd = agg["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    sc = agg["sum_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(np.asarray(ks, dtype=object))
    ks = [ks[int(i)] for i in order]
    nd, sc = nd[order], sc[order]
    return pa.table({
        "source": pa.array(ks, pa.string()),
        "n_docs": nd, "sum_chars": sc,
        "med_chars": pa.array([mm[k] for k in ks], pa.float64()),
        "avg_chars": sc.astype(np.float64) / nd})


def _q_events_covisit(sf_dir):
    """Item-item co-visitation counts + cosine ("users who touched i
    also touched j") over the (user, item) interaction stream — item =
    the integer in the props JSON. One distinct exchange, one user-
    keyed basket exchange with vectorized pair expansion, one bounded
    pair sum; max_basket guard replicated exactly in the SQL twin.
    Integer counts + one IEEE sqrt/divide — bit-exact, no grain."""
    import pyarrow.compute as pc

    from python_graphblas_ray.pipelines.recsys import item_covisitation

    ds = _read(sf_dir, "events", columns=["user_id", "props"])

    def items(batch: pa.Table) -> pa.Table:
        s = pc.replace_substring_regex(
            pc.fill_null(batch["props"], ""), r"[^0-9]", "")
        keep = pc.not_equal(s, "")
        return pa.table({
            "user_id": pc.filter(batch["user_id"], keep),
            "item": pc.cast(pc.filter(s, keep), pa.int64())})

    out = item_covisitation(
        ds.map_batches(items, batch_format="pyarrow"), max_basket=64)
    t = _as_table(out)
    if t is None or "cosine" not in t.column_names:  # empty stream
        return pa.table({"i": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    return t


def _q_events_type_corr(sf_dir):
    """Pearson correlation matrix of the per-day event-count series
    across event types (shared day grid, missing cells 0): integer
    moments off ONE grouped-count exchange + a fixed float tail —
    bit-exact, no grain; zero-variance series pin 0.0."""
    from python_graphblas_ray.pipelines.windows import (
        type_daily_correlation)

    return type_daily_correlation(
        _read(sf_dir, "events", columns=["event_type", "ts"]))


def _q_mktseg_top3(sf_dir):
    """Relational OLAP showcase (the TPC-H Q3/Q10 family): top-3
    customers by exact integer revenue per market segment —
    lineitem → per-order revenue (basis units: cents × (100 − disc%),
    pure int64), hash-join orders, per-customer sum, hash-join
    customer, grouped top-k with deterministic (rev DESC, custkey)
    ties. Two hash joins + two bounded grouped sums; every value
    integer — bit-exact."""
    from python_graphblas_ray.stages.join import hash_join
    from python_graphblas_ray.stages.reduce import (grouped_agg,
                                                    grouped_topk)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(d * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "rev": cents * (100 - disc)})

    orev = grouped_agg(li.map_batches(rev, batch_format="pyarrow"),
                       ["l_orderkey"], [("rev", "sum", "rev")])
    empty = pa.table({"seg": pa.array([], pa.string()),
                      "custkey": pa.array([], pa.int64()),
                      "rev": pa.array([], pa.int64())})
    j1 = hash_join(orev,
                   _read(sf_dir, "orders",
                         columns=["o_orderkey", "o_custkey"]),
                   on="l_orderkey", right_on="o_orderkey")
    crev = grouped_agg(j1, ["o_custkey"], [("rev", "sum", "rev")])
    j2 = hash_join(crev,
                   _read(sf_dir, "customer",
                         columns=["c_custkey", "c_mktsegment"]),
                   on="o_custkey", right_on="c_custkey")
    top = grouped_topk(j2, "c_mktsegment", "rev", 3,
                       tie_col="o_custkey")
    t = _as_table(top)
    if (t is None or "rev" not in t.column_names
            or "c_mktsegment" not in t.column_names):  # empty inputs
        return empty
    return pa.table({
        "seg": t["c_mktsegment"],
        "custkey": t["o_custkey"].cast(pa.int64()),
        "rev": t["rev"].cast(pa.int64())})


def _q_events_peak(sf_dir):
    """Sweep-line peak concurrency per event type (30-min half-open
    activity intervals, minute buckets): ONE (type, minute) grouped
    ±1-delta exchange bounded by |types|×|active minutes|, integer
    net-prefix scan on the driver — bit-exact, no grain."""
    from python_graphblas_ray.pipelines.windows import peak_concurrency

    return peak_concurrency(
        _read(sf_dir, "events", columns=["event_type", "ts"]))


def _q_events_session_sizes(sf_dir):
    """Session-size histogram (how many sessions have k events): the
    sessionize composition — ONE user-keyed exchange + vectorized gap
    scan — finished by one bounded grouped count. Integer — bit-exact."""
    from python_graphblas_ray.pipelines.windows import sessionize
    from python_graphblas_ray.stages.reduce import grouped_agg

    s = sessionize(_read(sf_dir, "events", columns=["user_id", "ts"]))
    h = grouped_agg(s, ["n_events"], [("n_events", "count",
                                       "n_sessions")])
    t = _as_table(h)
    if t is None or "n_events" not in t.column_names:
        return pa.table({"n_events": pa.array([], pa.int64()),
                         "n_sessions": pa.array([], pa.int64())})
    return pa.table({"n_events": t["n_events"].cast(pa.int64()),
                     "n_sessions": t["n_sessions"].cast(pa.int64())})


def _q_region_revenue(sf_dir):
    """TPC-H Q5-family multi-join: revenue by (region, nation) where
    the customer and the line's supplier share a nation ("local
    supplier volume"). lineitem → exact integer revenue basis units
    cents × (100 − disc%) → hash-join orders → customer → supplier,
    same-nation filter, ONE bounded grouped sum (≤ |nations| rows),
    then the tiny nation/region dimension tables join on the driver.
    All integers — bit-exact."""
    from python_graphblas_ray.stages.join import hash_join
    from python_graphblas_ray.stages.reduce import grouped_agg

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(d * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_suppkey": batch["l_suppkey"],
            "rev": cents * (100 - disc)})

    empty = pa.table({"region": pa.array([], pa.string()),
                      "nation": pa.array([], pa.string()),
                      "rev": pa.array([], pa.int64())})
    j = hash_join(li.map_batches(rev, batch_format="pyarrow"),
                  _read(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey"]),
                  on="l_orderkey", right_on="o_orderkey")
    j = hash_join(j, _read(sf_dir, "customer",
                           columns=["c_custkey", "c_nationkey"]),
                  on="o_custkey", right_on="c_custkey")
    j = hash_join(j, _read(sf_dir, "supplier",
                           columns=["s_suppkey", "s_nationkey"]),
                  on="l_suppkey", right_on="s_suppkey")

    def local(batch: pa.Table) -> pa.Table:
        c = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        s = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        keep = c == s
        return pa.table({
            "nationkey": pa.array(c[keep].astype(np.int64)),
            "rev": batch["rev"].to_numpy(zero_copy_only=False)[keep]})

    try:
        agg = grouped_agg(j.map_batches(local, batch_format="pyarrow"),
                          ["nationkey"], [("rev", "sum", "rev")])
        t = _as_table(agg)
    except Exception:
        return empty
    if t is None or "nationkey" not in t.column_names:
        return empty
    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    df = t.to_pandas().merge(
        nat, left_on="nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey")
    return pa.table({
        "region": pa.array(df["r_name"].astype(str), pa.string()),
        "nation": pa.array(df["n_name"].astype(str), pa.string()),
        "rev": pa.array(df["rev"].astype(np.int64), pa.int64())})


def _q_docs_zipf(sf_dir):
    """Zipf slope of the top-100 term frequencies (vocab-bounded
    streaming count + per-block candidate cuts; round-8 over SQL SUM
    order). Degenerate corpora pin slope 0.0."""
    from python_graphblas_ray.stages.text import zipf_slope

    t = zipf_slope(_read(sf_dir, "documents", columns=["text"]),
                   top_n=100)
    s = t["slope"].to_numpy(zero_copy_only=False)
    return pa.table({"n_terms": t["n_terms"],
                     "slope": _round_away(s, 8)})


def _q_events_gap_quantiles(sf_dir):
    """Inter-arrival cadence per event type: p50/p90 of the same-user
    gap (µs) preceding each event — ONE user-keyed exchange +
    vectorized diff, then the exact grouped discrete quantile
    (quantile_disc semantics). Integer gaps — bit-exact."""
    from python_graphblas_ray.pipelines.windows import inter_arrival_gaps
    from python_graphblas_ray.stages.reduce import grouped_quantile

    gaps = inter_arrival_gaps(
        _read(sf_dir, "events",
              columns=["user_id", "ts", "event_type", "event_id"]))
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "p50": pa.array([], pa.float64()),
                      "p90": pa.array([], pa.float64())})
    out = {}
    for name, q in (("p50", 0.5), ("p90", 0.9)):
        t = _as_table(grouped_quantile(gaps, ["event_type"], "gap_us",
                                       q=q, out_col=name))
        if t is None or name not in t.column_names:
            return empty
        out[name] = dict(zip(t["event_type"].to_pylist(),
                             t[name].to_numpy(zero_copy_only=False)))
    keys = sorted(out["p50"])
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "p50": pa.array([out["p50"][k] for k in keys], pa.float64()),
        "p90": pa.array([out["p90"][k] for k in keys], pa.float64())})


def _q_orders_priority(sf_dir):
    """TPC-H Q4 shape (EXISTS semi-join): orders per priority having at
    least one line shipped after the order date — one hash join +
    late-line filter + DISTINCT-orderkey grouped count (two bounded
    exchanges). Integers — bit-exact."""
    from python_graphblas_ray.stages.join import hash_join
    from python_graphblas_ray.stages.reduce import grouped_agg

    empty = pa.table({"priority": pa.array([], pa.string()),
                      "n_orders": pa.array([], pa.int64())})
    j = hash_join(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]),
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_orderpriority", "o_orderdate"]),
        on="l_orderkey", right_on="o_orderkey")

    def late(batch: pa.Table) -> pa.Table:
        s = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        o = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = pa.array(s > o)
        return pa.table({
            "o_orderkey": batch["l_orderkey"].filter(keep),
            "o_orderpriority": batch["o_orderpriority"].filter(keep)})

    try:
        dist = grouped_agg(j.map_batches(late, batch_format="pyarrow"),
                           ["o_orderkey", "o_orderpriority"],
                           [(None, "count", "n")])
        h = grouped_agg(dist, ["o_orderpriority"],
                        [(None, "count", "n_orders")])
        t = _as_table(h)
    except Exception:
        return empty
    if t is None or "o_orderpriority" not in t.column_names:
        return empty
    return pa.table({"priority": t["o_orderpriority"].cast(pa.string()),
                     "n_orders": t["n_orders"].cast(pa.int64())})


def _q_bipartite(sf_dir):
    """Per-component bipartiteness: FastSV components → multi-source
    unit BFS parity from each component's min representative (one
    engine superstep loop for ALL components) → equal-parity conflict
    edges counted in one streaming pass over the simple undirected
    edges. Integer counts — bit-exact; the SQL twin reuses the
    min-label closure + a 40-bounded multi-source BFS."""
    from python_graphblas_ray.pipelines.algorithms import (
        bipartite_check, build_engine, connected_components)
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    empty = pa.table({"comp": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "n_conflicts": pa.array([], pa.int64())})
    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4,
                       undirected=True, weighted=True)
    try:
        comp, _, _ = connected_components(eng)
        t = bipartite_check(eng, A, comp, max_rounds=40)
    finally:
        eng.shutdown()
    return t if t is not None else empty


def _q_events_dau_growth(sf_dir):
    """Day-over-day active-user growth: distinct users per day (the
    user-keyed exchange with exactly-summing distinct partials) + the
    consecutive-day ratio — integer counts, one IEEE divide per day,
    bit-exact; the first active day pins growth 0.0."""
    from python_graphblas_ray.pipelines.windows import (
        windowed_distinct_users)

    t = _as_table(windowed_distinct_users(
        _read(sf_dir, "events", columns=["user_id", "ts"])))
    empty = pa.table({"window": pa.array([], pa.timestamp("us")),
                      "n_users": pa.array([], pa.int64()),
                      "growth": pa.array([], pa.float64())})
    if t is None or "window" not in t.column_names or t.num_rows == 0:
        return empty
    w = t["window"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    n = t["n_users"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(w)
    w, n = w[order], n[order]
    g = np.zeros(len(n), dtype=np.float64)
    g[1:] = n[1:].astype(np.float64) / n[:-1].astype(np.float64)
    return pa.table({"window": pa.array(w).cast(pa.timestamp("us")),
                     "n_users": n, "growth": g})


def _q_customers_no_orders(sf_dir):
    """Anti-join showcase: customers that never ordered, counted per
    market segment — the shuffle anti-join (left-outer + null-probe;
    the scale path when the key set outgrows a broadcast) + one
    bounded grouped count. Integers — bit-exact."""
    from python_graphblas_ray.stages.join import semi_join_shuffle
    from python_graphblas_ray.stages.reduce import grouped_agg

    empty = pa.table({"seg": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def ren(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["o_custkey"]})

    try:
        left = semi_join_shuffle(
            cust, ["c_custkey"],
            orders.map_batches(ren, batch_format="pyarrow"), anti=True)
        h = grouped_agg(left, ["c_mktsegment"], [(None, "count", "n")])
        t = _as_table(h)
    except Exception:
        return empty
    if t is None or "c_mktsegment" not in t.column_names:
        # schema-less empty == legitimately no order-less customers
        # (or no customers at all) — both mean zero output rows
        return empty
    return pa.table({"seg": t["c_mktsegment"].cast(pa.string()),
                     "n": t["n"].cast(pa.int64())})


def _q_small_qty_revenue(sf_dir):
    """TPC-H Q17 family (small-quantity-order revenue, per brand):
    revenue locked in lines whose quantity is below 20% of their
    part's average — the aggregate-then-rejoin shape (ONE bounded
    grouped (sum, count) keyed by partkey, threshold = the fixed IEEE
    tail ``0.2 * (sum/cnt)`` replicated verbatim in SQL, re-join to
    the line stream + part dims, ONE ≤|brands|-row grouped sum over
    integer cents). Quantities are integral doubles → the per-part
    sum is exact in any merge order; the only float ops are the
    division and the 0.2 multiply, identical two-op sequences on both
    sides — bit-exact."""
    from python_graphblas_ray.stages.join import hash_join
    from python_graphblas_ray.stages.reduce import grouped_agg

    empty = pa.table({"brand": pa.array([], pa.string()),
                      "n_lines": pa.array([], pa.int64()),
                      "rev": pa.array([], pa.int64())})
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def small(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        sq = batch["sq"].to_numpy(zero_copy_only=False)
        nq = batch["nq"].to_numpy(zero_copy_only=False)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        keep = pa.array(q < 0.2 * (sq / nq))
        return pa.table({
            "l_partkey": batch["l_partkey"].filter(keep),
            "cents": pa.array(np.floor(
                p * 100.0 + 0.5).astype(np.int64)[
                    keep.to_numpy(zero_copy_only=False)])})

    try:
        avg = grouped_agg(
            li.select_columns(["l_partkey", "l_quantity"]),
            ["l_partkey"], [("l_quantity", "sum", "sq"),
                            (None, "count", "nq")])
        j = hash_join(li, avg, on="l_partkey")
        j = hash_join(j.map_batches(small, batch_format="pyarrow"),
                      _read(sf_dir, "part",
                            columns=["p_partkey", "p_brand"]),
                      on="l_partkey", right_on="p_partkey")
        h = grouped_agg(j.select_columns(["p_brand", "cents"]),
                        ["p_brand"], [(None, "count", "n_lines"),
                                      ("cents", "sum", "rev")])
        t = _as_table(h)
    except Exception:
        return empty
    if t is None or "p_brand" not in t.column_names:
        return empty
    return pa.table({"brand": t["p_brand"].cast(pa.string()),
                     "n_lines": t["n_lines"].cast(pa.int64()),
                     "rev": t["rev"].cast(pa.int64())})


def _q_idle_rich_customers(sf_dir):
    """TPC-H Q22 family (promising idle customers): customers whose
    balance beats the positive-balance average but who never ordered,
    counted and balance-summed per market segment — the global-
    aggregate-as-filter-threshold shape (ONE streaming (sum, count)
    fold over integer cents, driver-held scalar, broadcast into the
    filter) + the shuffle anti-join + ONE bounded grouped sum.
    Balances ride integer cents so every sum is exact; the threshold
    compare ``cents > sum/cnt`` is the same single IEEE division and
    int→double promote on both sides — bit-exact."""
    from python_graphblas_ray.stages.join import semi_join_shuffle
    from python_graphblas_ray.stages.reduce import grouped_agg

    empty = pa.table({"seg": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "sum_cents": pa.array([], pa.int64())})
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def cents(batch: pa.Table) -> pa.Table:
        b = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "c_mktsegment": batch["c_mktsegment"],
            "cents": pa.array(np.floor(b * 100.0 + 0.5).astype(
                np.int64))})

    try:
        cc = cust.map_batches(cents, batch_format="pyarrow")
        s = n = 0
        for b in cc.iter_batches(batch_format="pyarrow",
                                 batch_size=None):
            if b.num_rows and "cents" in b.column_names:
                v = b["cents"].to_numpy(zero_copy_only=False)
                pos = v[v > 0]
                s += int(pos.sum())
                n += len(pos)
        if n == 0:
            return empty
        thr = s / n  # one IEEE division, replicated in the oracle

        def rich(batch: pa.Table) -> pa.Table:
            keep = pa.array(batch["cents"].to_numpy(
                zero_copy_only=False) > thr)
            return batch.filter(keep)

        def ren(batch: pa.Table) -> pa.Table:
            return pa.table({"c_custkey": batch["o_custkey"]})

        left = semi_join_shuffle(
            cc.map_batches(rich, batch_format="pyarrow"),
            ["c_custkey"],
            _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
                ren, batch_format="pyarrow"), anti=True)
        h = grouped_agg(left, ["c_mktsegment"],
                        [(None, "count", "n"),
                         ("cents", "sum", "sum_cents")])
        t = _as_table(h)
    except Exception:
        return empty
    if t is None or "c_mktsegment" not in t.column_names:
        return empty
    return pa.table({"seg": t["c_mktsegment"].cast(pa.string()),
                     "n": t["n"].cast(pa.int64()),
                     "sum_cents": t["sum_cents"].cast(pa.int64())})


def _q_scc_dag_longest(sf_dir):
    """Critical chain of the SCC condensation: FW-BW SCC labels → one
    streaming broadcast-remap pass over the directed edges (≤ |SCCs|²
    condensed pairs reach the driver) → vectorized Bellman longest-path
    sweep over the acyclic quotient. Integer depths — bit-exact."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, condensation_longest_path, scc)

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    try:
        comp, _, _ = scc(eng)
    finally:
        eng.shutdown()
    return condensation_longest_path(_edge_dataset(sf_dir), comp)


def _q_conductance(sf_dir):
    """Per-community conductance of the deterministic vid%16 labeling
    over the simple undirected graph — the cut-quality twin of
    ``modularity``: φ(c) = cut/min(vol, 2m−vol), one streaming k×k
    label-pair bincount pass, integer counts + one IEEE divide —
    bit-exact, no grain."""
    from python_graphblas_ray.pipelines.louvain import conductance
    from python_graphblas_ray.pipelines.triangles import simple_undirected

    A = simple_undirected(_edge_dataset(sf_dir), N_VERT)
    labels = np.arange(N_VERT, dtype=np.int64) % 16
    return conductance(A.ds, labels, N_VERT, k=16)


def _q_docs_heaps(sf_dir):
    """Heaps'-law vocabulary-growth fit V(T) ≈ K·T^β sampled at 16
    doc-id checkpoints: integer token/vocab cumulatives (bit-exact) +
    the round-8 ln-ln least-squares β repeated per row."""
    from python_graphblas_ray.stages.text import heaps_fit

    t = heaps_fit(_read(sf_dir, "documents",
                        columns=["doc_id", "text"]), n_checkpoints=16)
    b = t["beta"].to_numpy(zero_copy_only=False)
    return t.set_column(t.schema.get_field_index("beta"), "beta",
                        pa.array(_round_away(b, 8), pa.float64()))


def _q_docs_js(sf_dir):
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions: (source, term) counts in one streaming pass, one
    term-keyed exchange emitting k×k partials — round-8 over term
    summation order (and the last-ulp ln difference)."""
    from python_graphblas_ray.stages.text import js_source_divergence

    t = js_source_divergence(_read(sf_dir, "documents",
                                   columns=["source", "text"]))
    v = t["js"].to_numpy(zero_copy_only=False)
    return t.set_column(t.schema.get_field_index("js"), "js",
                        pa.array(_round_away(v, 8), pa.float64()))


def _q_trade_matrix(sf_dir):
    """TPC-H Q7-family cross-nation trade matrix: revenue between every
    (customer nation, supplier nation) pair — the region_revenue
    machinery without the same-nation filter: exact integer revenue
    basis units cents × (100 − disc%), three hash joins, ONE bounded
    grouped sum (≤ |nations|² rows), nation names joined driver-side.
    All integers — bit-exact."""
    from python_graphblas_ray.stages.join import hash_join
    from python_graphblas_ray.stages.reduce import grouped_agg

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(d * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_suppkey": batch["l_suppkey"],
            "rev": cents * (100 - disc)})

    empty = pa.table({"cust_nation": pa.array([], pa.string()),
                      "supp_nation": pa.array([], pa.string()),
                      "rev": pa.array([], pa.int64())})
    try:
        j = hash_join(li.map_batches(rev, batch_format="pyarrow"),
                      _read(sf_dir, "orders",
                            columns=["o_orderkey", "o_custkey"]),
                      on="l_orderkey", right_on="o_orderkey")
        j = hash_join(j, _read(sf_dir, "customer",
                               columns=["c_custkey", "c_nationkey"]),
                      on="o_custkey", right_on="c_custkey")
        j = hash_join(j, _read(sf_dir, "supplier",
                               columns=["s_suppkey", "s_nationkey"]),
                      on="l_suppkey", right_on="s_suppkey")
        agg = grouped_agg(j.select_columns(
            ["c_nationkey", "s_nationkey", "rev"]),
            ["c_nationkey", "s_nationkey"], [("rev", "sum", "rev")])
        t = _as_table(agg)
    except Exception:
        return empty
    if t is None or "c_nationkey" not in t.column_names:
        return empty
    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    df = t.to_pandas().merge(
        nat[["n_nationkey", "n_name"]], left_on="c_nationkey",
        right_on="n_nationkey").merge(
        nat[["n_nationkey", "n_name"]], left_on="s_nationkey",
        right_on="n_nationkey", suffixes=("_c", "_s"))
    return pa.table({
        "cust_nation": pa.array(df["n_name_c"].astype(str), pa.string()),
        "supp_nation": pa.array(df["n_name_s"].astype(str), pa.string()),
        "rev": pa.array(df["rev"].astype(np.int64), pa.int64())})


def _q_docs_tfidf(sf_dir):
    """Top-20 corpus terms by TF-IDF ``cnt · ln(N/df)`` — the
    "which terms carry signal vs boilerplate" dataset-card readout.
    ONE vocab-bounded grouped exchange (cnt and distinct-doc df
    partials sum exactly: a doc never spans two batches) + per-block
    top-k candidate cuts; ranking on the ROUNDED (8) score with
    (score DESC, term) tie order keeps the cut oracle-replayable."""
    from python_graphblas_ray.stages.text import tfidf_top_terms

    try:
        n_docs = _read(sf_dir, "documents",
                       columns=["doc_id"]).count()
    except Exception:
        n_docs = 0
    return tfidf_top_terms(
        _read(sf_dir, "documents", columns=["text"]),
        n_docs, text_col="text", top_k=20)


def _q_big_orders(sf_dir):
    """TPC-H Q18 family (large-volume customers): orders whose total
    line quantity exceeds 150, with their customer — ONE bounded
    grouped sum keyed by orderkey (quantities are integral doubles,
    so the sum is EXACT in any merge order) + HAVING filter + two
    hash joins (order → customer; dangling keys drop, matching the
    oracle's inner joins). Integers — bit-exact."""
    from python_graphblas_ray.stages.join import hash_join
    from python_graphblas_ray.stages.reduce import grouped_agg

    empty = pa.table({"custkey": pa.array([], pa.int64()),
                      "orderkey": pa.array([], pa.int64()),
                      "sum_qty": pa.array([], pa.float64())})

    def big(batch: pa.Table) -> pa.Table:
        keep = pa.array(batch["sum_qty"].to_numpy(
            zero_copy_only=False) > 150.0)
        return batch.filter(keep)

    try:
        agg = grouped_agg(
            _read(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_quantity"]),
            ["l_orderkey"], [("l_quantity", "sum", "sum_qty")])
        j = hash_join(agg.map_batches(big, batch_format="pyarrow"),
                      _read(sf_dir, "orders",
                            columns=["o_orderkey", "o_custkey"]),
                      on="l_orderkey", right_on="o_orderkey")
        j = hash_join(j, _read(sf_dir, "customer",
                               columns=["c_custkey"]),
                      on="o_custkey", right_on="c_custkey")
        t = _as_table(j)
    except Exception:
        return empty
    if t is None or "o_custkey" not in t.column_names:
        return empty
    return pa.table({
        "custkey": t["o_custkey"].cast(pa.int64()),
        "orderkey": t["l_orderkey"].cast(pa.int64()),
        "sum_qty": t["sum_qty"].cast(pa.float64())})


def _q_docs_chisq(sf_dir):
    """Pearson chi-square independence of the lang × source
    contingency table: integer marginals off ONE |langs|×|sources|-
    bounded grouped count; round-8 over cell summation order."""
    from python_graphblas_ray.pipelines.windows import contingency_chisq

    t = contingency_chisq(_read(sf_dir, "documents",
                                columns=["lang", "source"]),
                          "lang", "source")
    c = t["chi2"].to_numpy(zero_copy_only=False)
    return t.set_column(t.schema.get_field_index("chi2"), "chi2",
                        pa.array(_round_away(c, 8), pa.float64()))


def _q_embed_ch_index(sf_dir):
    """Calinski-Harabasz variance-ratio score of the fixed 2-update
    k-means clustering (same deterministic vec_id<8 init + round-6
    centroid grain as ``embed_kmeans_iter2``): CH = (B/(k−1))/(W/(n−k))
    off ONE streaming (cluster, n, Σd²) partial pass. Round-6 over Σd²
    summation order; the SQL twin extends the kmeans CTE chain."""
    from python_graphblas_ray.pipelines.clustering import (
        calinski_harabasz, kmeans_fit)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "ch": pa.array([], pa.float64())})
    heads = [b for b in ds.filter(expr="vec_id < 8").iter_batches(
        batch_format="pyarrow") if b.num_rows]
    if not heads:
        return empty
    head = pa.concat_tables(heads, promote_options="permissive")
    order = np.argsort(head["vec_id"].to_numpy(zero_copy_only=False))
    init = np.stack([np.asarray(head["embedding"][int(i)].as_py(),
                                dtype=np.float64) for i in order])
    cents, _ = kmeans_fit(ds, 8, iters=2, init_centroids=init,
                          round_to=6)
    t = calinski_harabasz(ds, cents)
    return t.set_column(t.schema.get_field_index("ch"), "ch",
                        pa.array(_round_away(
                            t["ch"].to_numpy(zero_copy_only=False), 6)))


def _q_pagerank_resid5(sf_dir):
    """Per-superstep L1 convergence residual ``Σ|r_t − r_{t−1}|`` of
    the fixed-5-iteration PageRank — the supersteps-to-convergence
    diagnostic of the north-star metric, read straight off the
    engine's per-superstep metrics records (the reference-Recorder
    analogue). Round-8: both sides sum 512 |deltas| in unspecified
    order."""
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, pagerank)
    from python_graphblas_ray.state.checkpoint import SuperstepMetrics

    eng = build_engine(_edge_dataset(sf_dir), N_VERT, num_partitions=4)
    try:
        m = SuperstepMetrics()
        # tol=-1: never early-break — the oracle emits all 5 residuals
        # even once rdiff hits exactly 0.0 (empty/degenerate graphs)
        pagerank(eng, tol=-1.0, itermax=5, metrics=m)
    finally:
        eng.shutdown()
    its = np.array([r["superstep"] + 1 for r in m.records],
                   dtype=np.int64)
    rd = np.array([r["rdiff"] for r in m.records], dtype=np.float64)
    return pa.table({"it": pa.array(its, pa.int64()),
                     "resid": pa.array(_round_away(rd, 8),
                                       pa.float64())})


def _q_custdist(sf_dir):
    """TPC-H Q13 customer order-count distribution: how many customers
    placed k orders, INCLUDING the zero-order customers the LEFT JOIN
    keeps. Ray shape: ONE grouped count over orders keyed by custkey
    (≤ |customers| rows), an inner hash join against customer (drops
    dangling o_custkey — the LEFT JOIN twin never sees them either),
    ONE bounded grouped count by order count (≤ max orders/customer
    rows), and the zero bucket = |customer| − |matched| off two
    streaming counts. All integers — bit-exact."""
    from python_graphblas_ray.stages.join import hash_join
    from python_graphblas_ray.stages.reduce import grouped_agg

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    n_cust = cust.count()
    empty = pa.table({"c_count": pa.array([], pa.int64()),
                      "n_custs": pa.array([], pa.int64())})
    oc = grouped_agg(orders, ["o_custkey"],
                     [("o_custkey", "count", "c_count")])
    rows = 0
    cc = np.array([], dtype=np.int64)
    nc = np.array([], dtype=np.int64)
    try:
        j = hash_join(oc, cust, on="o_custkey", right_on="c_custkey")
        h = grouped_agg(j, ["c_count"], [("c_count", "count", "n_custs")])
        t = _as_table(h)
    except Exception:
        t = None
    if t is not None and "c_count" in t.column_names and len(t):
        cc = t["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["n_custs"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = int(nc.sum())
    n_zero = n_cust - rows
    if n_zero > 0:
        cc = np.concatenate([cc, [0]])
        nc = np.concatenate([nc, [n_zero]])
    if len(cc) == 0:
        return empty
    return pa.table({"c_count": pa.array(cc, pa.int64()),
                     "n_custs": pa.array(nc, pa.int64())})


def _q_promo_revenue(sf_dir):
    """TPC-H Q14 promo-revenue share per ship month: revenue basis
    units cents × (100 − disc%) (pure int64), lineitem hash-joined to
    part (inner — dangling partkeys drop on both sides), promo flag
    ``p_type = 'PROMO'``, ONE grouped sum bounded by |months|; ratio =
    the fixed two-op tail ``(100.0 · promo) / total`` — one IEEE
    multiply + one divide, bit-exact."""
    from python_graphblas_ray.stages.join import hash_join
    from python_graphblas_ray.stages.reduce import grouped_agg

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])
    empty = pa.table({"ym": pa.array([], pa.int64()),
                      "promo": pa.array([], pa.int64()),
                      "total": pa.array([], pa.int64()),
                      "ratio": pa.array([], pa.float64())})

    def rev(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(d * 100.0 + 0.5).astype(np.int64)
        y = pc.year(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        m = pc.month(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "l_partkey": batch["l_partkey"],
            "ym": (y.astype(np.int64) * 100 + m.astype(np.int64)),
            "rev": cents * (100 - disc)})

    try:
        j = hash_join(li.map_batches(rev, batch_format="pyarrow"),
                      _read(sf_dir, "part",
                            columns=["p_partkey", "p_type"]),
                      on="l_partkey", right_on="p_partkey")

        def flag(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            promo = pc.equal(pc.fill_null(batch["p_type"], ""), "PROMO")
            r = batch["rev"].to_numpy(zero_copy_only=False)
            pr = np.where(promo.to_numpy(zero_copy_only=False), r, 0)
            return pa.table({"ym": batch["ym"], "promo": pr, "total": r})

        agg = grouped_agg(j.map_batches(flag, batch_format="pyarrow"),
                          ["ym"], [("promo", "sum", "promo"),
                                   ("total", "sum", "total")])
        t = _as_table(agg)
    except Exception:
        return empty
    if t is None or "ym" not in t.column_names or len(t) == 0:
        return empty
    promo = t["promo"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = t["total"].to_numpy(zero_copy_only=False).astype(np.int64)
    ratio = np.where(total > 0,
                     (100.0 * promo.astype(np.float64))
                     / np.where(total > 0, total, 1).astype(np.float64),
                     0.0)
    return pa.table({"ym": t["ym"].cast(pa.int64()),
                     "promo": pa.array(promo, pa.int64()),
                     "total": pa.array(total, pa.int64()),
                     "ratio": pa.array(ratio, pa.float64())})


def _q_disc_revenue(sf_dir):
    """TPC-H Q6 forecasting-revenue-change: ONE streaming filtered sum
    (no shuffle, no join) of ``cents × disc%`` over lines with disc% in
    [5, 7] and quantity < 24 — the "how much revenue would we keep by
    dropping small discounts" scan. Integer basis — bit-exact."""
    li = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(d * 100.0 + 0.5).astype(np.int64)
        keep = (disc >= 5) & (disc <= 7) & (q < 24)
        return pa.table({
            "n_lines": pa.array([int(keep.sum())], pa.int64()),
            "rev": pa.array([int((cents[keep] * disc[keep]).sum())],
                            pa.int64())})

    n = rev = 0
    for b in li.map_batches(partial,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow", batch_size=None):
        if b.num_rows and "rev" in b.column_names:
            n += int(b["n_lines"].to_numpy(zero_copy_only=False).sum())
            rev += int(b["rev"].to_numpy(zero_copy_only=False).sum())
    return pa.table({"n_lines": pa.array([n], pa.int64()),
                     "rev": pa.array([rev], pa.int64())})


def _q_events_autocorr(sf_dir):
    """Lag-1..7 autocorrelation of the global daily event-count series
    over the contiguous day grid (missing days 0): ONE (day)
    grouped-count exchange + integer moments + the fixed IEEE Pearson
    tail — bit-exact, no grain. Lags with <2 pairs emit no row."""
    from python_graphblas_ray.pipelines.windows import (
        daily_autocorrelation)

    return daily_autocorrelation(
        _read(sf_dir, "events", columns=["ts"]), max_lag=7)


def _q_events_hourly(sf_dir):
    """Hour-of-day activity profile per event type (the seasonality
    dashboard readout): ONE grouped count bounded by |types| × 24.
    Integer — bit-exact."""
    from python_graphblas_ray.stages.reduce import grouped_agg

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "hour": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_type": batch["event_type"],
            "hour": pc.hour(batch["ts"]).cast(pa.int64())})

    t = _as_table(grouped_agg(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["event_type", "hour"], [("hour", "count", "n")]))
    if t is None or "event_type" not in t.column_names:
        return empty
    return pa.table({"event_type": t["event_type"],
                     "hour": t["hour"].cast(pa.int64()),
                     "n": t["n"].cast(pa.int64())})


SUITES = {
    "degree_suite": ["degree_out", "degree_in", "degree_mean"],
    "reduce_scalar_suite": ["reduce_scalar_plus", "reduce_scalar_max"],
    "spmv_suite": ["mxv_plus_times", "vxm_min_plus", "mxv_masked"],
    "vec_ops_suite": ["vec_ewise_add", "vec_extract",
                      "vec_selectk_random8", "vec_sort_desc",
                      "diag"],
    "ewise_suite": ["ewise_add_plus", "ewise_mult_times",
                    "ewise_union_minus"],
    "select_suite": ["select_tril", "select_valuegt"],
    "assign_suite": ["assign_scalar", "assign_masked"],
    "perrow_suite": ["row_scan_plus", "row_selectk_first2",
                     "row_selectk_random2", "row_sort"],
    "components_suite": ["connected_components", "scc"],
    "matmul_suite": ["mxm_plus_times", "mxm_min_secondi",
                     "power2_minplus", "kronecker", "cocitation",
                     "host_graph", "truss_peel3", "edge_sample",
                     "matching_round2"],
    "hits_suite": ["hits_iter3", "salsa_iter3"],
    "apply_view_suite": ["apply_ainv", "apply_rowindex", "transpose",
                         "extract_submatrix"],
    "rank_suite": ["pagerank_iter5", "pagerank_weighted5",
                   "trustrank_iter5", "pagerank_dangling5",
                   "pagerank_resume5"],
    "langstats_suite": ["lang_count", "quality_filter"],
}

# suites whose members have heterogeneous value-column names: each
# member's value column is renamed to ``val`` (cast DOUBLE) on BOTH the
# Ray and the SQL side before the UNION-tag concat. Format:
# suite -> [(member, value_col), ...]; key columns (if any) listed too.
RENAME_SUITES = {
    # suite -> (key cols, [(member, value_col)], cast)
    # 1-row graph-shape metrics: (q, val)
    "graph_metric_suite": ([], [("modularity", "modularity"),
                                ("assortativity", "assortativity"),
                                ("diameter", "diameter_lb"),
                                ("effective_diameter", "d90"),
                                ("transitivity", "transitivity"),
                                ("rich_club", "phi"),
                                ("powerlaw_alpha", "alpha"),
                                ("attack_robustness", "giant_frac"),
                                ("random_robustness", "giant_frac"),
                                ("quadrilaterals", "quadrilaterals"),
                                ("edge_percolation", "giant_frac"),
                                ("global_efficiency", "efficiency")],
                           "double"),
    # per-vertex centrality scores: (q, vid, val)
    "centrality_suite": (["vid"], [("closeness", "val"),
                                   ("local_clustering", "coeff"),
                                   ("critical_path", "dist"),
                                   ("avg_neighbor_degree", "val"),
                                   ("harmonic_centrality", "val"),
                                   ("mis", "in_mis"),
                                   ("katz_iter5", "val"),
                                   ("eccentricity", "val"),
                                   ("ball2_size", "val"),
                                   ("betweenness_s0", "val")],
                         "double"),
    # per-doc group assignments (split / quota-kept lang / mixture
    # source): (q, doc_id, val string)
    "sampling_suite": (["doc_id"], [("docs_split", "split"),
                                    ("docs_quota", "lang"),
                                    ("docs_mixture", "source"),
                                    ("docs_url_canon", "canon_url")], None),
}


# Suites whose members have heterogeneous KEY columns: every key column
# is cast to a string (typed casts below, chosen so the Arrow and DuckDB
# renderings are byte-identical) and '|'-joined into one ``k`` column on
# BOTH sides, so any oracle-backed query with one value column can ride
# a single driver-window slot. keyspec kinds:
#   's'  string (passes through)
#   'i'  integer -> decimal string (Arrow cast == DuckDB CAST AS VARCHAR)
#   't'  timestamp[us] -> epoch-microseconds string (epoch_us in DuckDB)
#   'f2' double -> fixed 2-decimal string (%.2f == printf('%.2f', x))
# Format: suite -> (val kind 'double'|'str', [(member, keyspecs, val_col)]).
PACKED_SUITES = {
    "packed_metric_suite": ("double", [
        ("reciprocity", [("n_edges", "i"), ("n_recip", "i")], "ratio"),
        ("docs_lm_score", [("doc_id", "i")], "lm_score"),
        ("anf", [("t", "i")], "n_pairs"),
        ("landmark_distances", [("lm", "i"), ("vid", "i")], "dist"),
        ("events_heavy_hitters", [("event_type", "s")], "mg_count"),
        ("events_topk", [("event_id", "i"), ("event_type", "s")], "value"),
        ("events_quantiles", [("q", "f2")], "value"),
        ("events_funnel", [("user_id", "i"), ("ts_first", "t"),
                           ("ts_last", "t")], "step_reached"),
        ("events_retention", [("cohort_day", "t"), ("day_offset", "i")],
         "n_users"),
        ("docs_textrank", [("word", "s")], "rank"),
        ("docs_collocations", [("w1", "s"), ("w2", "s"), ("c", "i")],
         "pmi"),
        ("docs_bpe_tokens", [("doc_id", "i")], "n_bpe_tokens"),
        ("degree_histogram", [("deg", "i")], "n_vertices"),
        ("component_sizes", [("size", "i")], "n_components"),
        ("docs_ttr", [("doc_id", "i")], "ttr"),
        ("events_window_distinct", [("window", "t")], "n_users"),
        ("sssp_parents", [("vid", "i")], "parent"),
        ("percolation_curve", [("keep_pct", "i")], "giant_frac"),
        ("docs_cdc_bounds", [("doc_id", "i"), ("chunk_ix", "i"),
                             ("start", "i")], "length"),
        ("revenue_by_nation", [("n_name", "s"), ("r_name", "s")],
         "revenue"),
        ("revenue_by_brand_nation", [("p_brand", "s"), ("n_name", "s")],
         "revenue"),
        ("embed_gram", [("i", "i"), ("j", "i")], "v"),
        ("embed_pc1", [("i", "i")], "v"),
        ("events_transitions", [("src_type", "s"), ("dst_type", "s")],
         "n"),
        ("host_rank3", [("host", "i")], "rank"),
        ("docs_rrf", [("qid", "s"), ("doc_id", "i")], "rrf"),
        ("docs_flesch", [("doc_id", "i")], "flesch"),
        ("docs_entropy", [("doc_id", "i")], "entropy"),
        ("docs_blocklist", [("doc_id", "i")], "n_hits"),
        ("events_decay", [("user_id", "i")], "score"),
        ("embed_pq_topk", [("query_id", "i"), ("neighbor_id", "i")],
         "rank"),
        ("simrank_iter2", [("u", "i"), ("v", "i")], "s"),
        ("events_bloom", [("uid", "i")], "hit"),
        ("mst_forest", [("r", "i"), ("u", "i"), ("v", "i")], "w"),
        ("widest4", [("vid", "i")], "width"),
        ("embed_mmr", [("vec_id", "i")], "rank"),
        ("events_f2", [("r", "i")], "v"),
        ("docs_chunks", [("doc_id", "i"), ("chunk", "i"),
                         ("start", "i")], "len"),
        ("events_zscore", [("user_id", "i"), ("day", "t")], "z"),
        ("events_cusum", [("user_id", "i")], "cusum"),
        ("degree_rankcorr", [("n_vertices", "i")], "spearman"),
        ("degree_gini", [("n_vertices", "i")], "gini"),
        ("embed_silhouette", [("vec_id", "i"), ("cluster", "i")],
         "sil"),
        ("docs_pack_offsets", [("doc_id", "i"), ("offset", "i"),
                               ("first_seq", "i")], "last_seq"),
        ("events_user_entropy", [("user_id", "i")], "entropy"),
        ("events_value_quantiles", [("event_type", "s"),
                                    ("p25", "f2"), ("med", "f2")],
         "p90"),
        ("docs_source_stats", [("source", "s"), ("n_docs", "i"),
                               ("sum_chars", "i"), ("med_chars", "f2")],
         "avg_chars"),
        ("events_covisit", [("i", "i"), ("j", "i"), ("c", "i")],
         "cosine"),
        ("conductance", [("comm", "i"), ("cut", "i"), ("vol", "i")],
         "phi"),
        ("events_type_corr", [("ta", "s"), ("tb", "s")], "corr"),
        ("mktseg_top3", [("seg", "s"), ("custkey", "i")], "rev"),
        ("events_peak", [("event_type", "s"), ("peak_ts", "t")],
         "peak"),
        ("events_session_sizes", [("n_events", "i")], "n_sessions"),
        ("region_revenue", [("region", "s"), ("nation", "s")], "rev"),
        ("docs_zipf", [("n_terms", "i")], "slope"),
        ("events_gap_quantiles", [("event_type", "s"), ("p50", "f2")],
         "p90"),
        ("orders_priority", [("priority", "s")], "n_orders"),
        ("embed_db_index", [("cluster", "i"), ("n", "i")], "r"),
        ("bipartite", [("comp", "i"), ("n", "i")], "n_conflicts"),
        ("events_dau_growth", [("window", "t"), ("n_users", "i")],
         "growth"),
        ("customers_no_orders", [("seg", "s")], "n"),
        ("scc_dag_longest", [("comp", "i")], "depth"),
        ("custdist", [("c_count", "i")], "n_custs"),
        ("promo_revenue", [("ym", "i"), ("promo", "i"), ("total", "i")],
         "ratio"),
        ("disc_revenue", [("n_lines", "i")], "rev"),
        ("events_hourly", [("event_type", "s"), ("hour", "i")], "n"),
        ("events_autocorr", [("lag", "i"), ("n", "i")], "ac"),
        ("embed_ch_index", [("k", "i"), ("n", "i")], "ch"),
        ("pagerank_resid5", [("it", "i")], "resid"),
        ("docs_heaps", [("ck", "i"), ("tokens", "i"), ("vocab", "i")],
         "beta"),
        ("docs_chisq", [("dof", "i"), ("n", "i")], "chi2"),
        ("docs_js", [("sa", "s"), ("sb", "s")], "js"),
        ("trade_matrix", [("cust_nation", "s"), ("supp_nation", "s")],
         "rev"),
        ("docs_tfidf", [("term", "s"), ("cnt", "i"), ("df", "i")],
         "tfidf"),
        ("big_orders", [("custkey", "i"), ("orderkey", "i")],
         "sum_qty"),
        ("small_qty_revenue", [("brand", "s"), ("n_lines", "i")],
         "rev"),
        ("idle_rich_customers", [("seg", "s"), ("n", "i")],
         "sum_cents"),
    ]),
    # the splitmix64/knuth32 hash-replay family (seeded sampling and
    # bounded stochastic rounds) — its own slot so a member failure
    # can't take down the metric suite's row
    "packed_sample_suite": ("double", [
        ("random_walk2", [("w", "i"), ("step", "i")], "vid"),
        ("events_hll_distinct", [("event_type", "s")], "approx_distinct"),
        ("sample_neighbors3", [("vid", "i")], "neighbor"),
        ("embed_kmeans_iter2", [("vec_id", "i")], "cluster"),
        ("color_first2", [("vid", "i")], "col"),
        ("minhash_sig4", [("doc_id", "i"), ("sig", "i")], "h"),
        ("simhash_sig", [("doc_id", "i"), ("sig", "i")], "n_tokens"),
        ("ann_ivf_fixed", [("query_id", "i"), ("neighbor_id", "i")],
         "rank"),
        ("wl_refine2", [("vid", "i"), ("sig", "i")], "deg"),
        ("embed_rp8", [("vec_id", "i"), ("j", "i")], "v"),
        ("events_cms_users", [("user_id", "i")], "est"),
        ("docs_winnow", [("doc_id", "i"), ("fp", "i")], "pos"),
        ("events_priority_sample", [("rank", "i"), ("user_id", "i")],
         "est"),
    ]),
    "packed_label_suite": ("str", [
        ("bowtie", [("vid", "i")], "part"),
        ("docs_ccnet_buckets", [("doc_id", "i")], "bucket"),
        ("docs_line_dedup", [("doc_id", "i")], "clean_text"),
        ("docs_bpe_merges", [("step", "i"), ("cnt", "i")], "pair"),
    ]),
}


def _packed_key_arrow(t, keyspecs):
    """Render the member table's key columns as one '|'-joined string
    array, matching the DuckDB rendering in ``_suite_sql_packed``."""
    import pyarrow.compute as pc

    parts = []
    for col, kind in keyspecs:
        a = t[col]
        if kind == "s":
            parts.append(a.cast(pa.string()))
        elif kind == "i":
            parts.append(a.cast(pa.int64()).cast(pa.string()))
        elif kind == "t":
            parts.append(a.cast(pa.int64()).cast(pa.string()))
        elif kind == "f2":
            vals = a.to_numpy(zero_copy_only=False)
            parts.append(pa.array([f"{v:.2f}" for v in vals]))
        else:  # pragma: no cover
            raise ValueError(kind)
    if len(parts) == 1:
        return parts[0].combine_chunks() if isinstance(
            parts[0], pa.ChunkedArray) else parts[0]
    flat = [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
            for p in parts]
    return pc.binary_join_element_wise(*flat, "|")


def _suite_packed(specs, valkind, fnmap):
    """Callable running each packed member and emitting (q, k, val)."""
    def run(sf_dir):
        parts = []
        for tag, keyspecs, vcol in specs:
            t = _as_table(fnmap[tag](sf_dir))
            if t is None or len(t) == 0 or any(
                    c not in t.column_names
                    for c in [vcol, *(c for c, _ in keyspecs)]):
                continue  # empty member lost its schema — 0 rows anyway
            v = t[vcol]
            if valkind == "double":
                v = v.cast(pa.float64())
            else:
                v = v.cast(pa.string())
            parts.append(pa.table({
                "q": pa.array([tag] * len(t)),
                "k": _packed_key_arrow(t, keyspecs),
                "val": v,
            }))
        if not parts:
            return pa.table({"q": pa.array([], pa.string()),
                             "k": pa.array([], pa.string()),
                             "val": pa.array(
                                 [], pa.float64() if valkind == "double"
                                 else pa.string())})
        return pa.concat_tables(parts)
    return run


def _suite_sql_packed(specs, valkind, sqlmap):
    def key_expr(col, kind):
        col = f'"{col}"'  # quote: member aliases may be reserved words
        if kind in ("s", "i"):
            return f"CAST({col} AS VARCHAR)"
        if kind == "t":
            return f"CAST(epoch_us({col}) AS VARCHAR)"
        if kind == "f2":
            return f"printf('%.2f', {col})"
        raise ValueError(kind)

    parts = []
    for i, (tag, keyspecs, vcol) in enumerate(specs):
        k = " || '|' || ".join(key_expr(c, kd) for c, kd in keyspecs)
        v = (f"CAST({vcol} AS DOUBLE)" if valkind == "double"
             else f"CAST({vcol} AS VARCHAR)")
        parts.append(f"SELECT '{tag}' AS q, {k} AS k, {v} AS val "
                     f"FROM ({sqlmap[tag]}) AS t{i}")
    return " UNION ALL ".join(parts)


def _suite_renamed(members, cols, cast="double"):
    """Like ``_suite`` but renames each member's value column to ``val``
    (cast to float64 when ``cast='double'``) so heterogeneous
    single-metric members share one schema. ``members``: [(tag, fn,
    value_col)]; ``cols``: key columns kept as-is (e.g. ["vid"])."""
    def run(sf_dir):
        parts = []
        for tag, fn, vcol in members:
            t = _as_table(fn(sf_dir))
            if t is None or any(c not in t.column_names
                                for c in [*cols, vcol]):
                continue  # empty member lost its schema — 0 rows anyway
            data = {"q": pa.array([tag] * len(t))}
            for c in cols:
                data[c] = t[c]
            v = t[vcol]
            data["val"] = v.cast(pa.float64()) if cast == "double" else v
            parts.append(pa.table(data))
        if not parts:  # every member legitimately empty
            return pa.table({"q": pa.array([], pa.string())})
        return pa.concat_tables(parts, promote_options="permissive")
    return run


def _rename_suite(name, members):
    cols, specs, cast = RENAME_SUITES[name]
    return _suite_renamed([(n, members[n], c) for n, c in specs],
                          cols, cast)


def _suite_sql_renamed(members, cols, cast="double"):
    key = "".join(f"{c}, " for c in cols)
    return " UNION ALL ".join(
        f"SELECT '{tag}' AS q, {key}"
        + (f"CAST({vcol} AS DOUBLE) AS val" if cast == "double"
           else f"{vcol} AS val")
        + f" FROM ({sql}) AS t{i}"
        for i, (tag, sql, vcol) in enumerate(members))


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship on sf0.001: derived edge table → PageRank + components,
    returned as one vertex table."""
    sf_dir = "/root/testdata/sf0.001"
    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, connected_components, pagerank)

    edges = _edge_dataset(sf_dir).materialize()
    eng = build_engine(edges, N_VERT, num_partitions=4)
    r, iters, _ = pagerank(eng, tol=1e-6)
    eng.shutdown()
    eng2 = build_engine(edges, N_VERT, num_partitions=4, undirected=True)
    f, _, _ = connected_components(eng2)
    eng2.shutdown()
    return pa.table({
        "vid": np.arange(N_VERT, dtype=np.int64),
        "rank": r,
        "comp": f,
    }).to_pandas()


def _q_image_resize(sf_dir):
    """REAL image codec path (r3 verdict item 3 — STRICT stub gone):
    one deterministic synthetic 16×12 RGB PNG per document
    (pixel(y, x, c) = (doc_id·7 + y·131 + x·17 + c·29) mod 256,
    stdlib-zlib encoded), decoded by the hand-rolled PNG decoder
    (``pipelines/png.py`` — real zlib inflate + scanline unfilter, no
    PIL) in the ``decode_images`` actor pool, nearest-neighbor resized
    to 8×8 by ``ImageResizer``, then reduced to integer per-image
    checksums. The SQL twin replays the pixel formula AND the resize's
    pixel-center index map — any decode/unfilter/resize defect shifts
    the sums."""
    from python_graphblas_ray.pipelines.multimodal import (
        decode_images, media_table, resize_images)
    from python_graphblas_ray.pipelines.png import png_encode

    H, W, OH, OW = 16, 12, 8, 8
    ids_ds = _read(sf_dir, "documents", columns=["doc_id"]).sort(
        "doc_id").limit(48)

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        y = np.arange(H)[:, None, None]
        x = np.arange(W)[None, :, None]
        c = np.arange(3)[None, None, :]
        payloads = [png_encode(((int(d) * 7 + y * 131 + x * 17 + c * 29)
                                % 256).astype(np.uint8)) for d in ids]
        return media_table(ids, payloads)

    media = ids_ds.map_batches(synth, batch_format="pyarrow")
    decoded = decode_images(media, batch_size=16)
    resized = resize_images(decoded, out_hw=(OH, OW))

    def agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "px_sum": pa.array([], pa.int64()),
                             "checksum": pa.array([], pa.int64())})
        arr = np.stack([np.asarray(p, dtype=np.int64)
                        for p in batch["pixels"].to_pylist()])
        wgt = np.arange(arr.shape[1], dtype=np.int64) + 1
        return pa.table({
            "doc_id": batch["media_id"],
            "px_sum": arr.sum(axis=1),
            "checksum": (arr * wgt).sum(axis=1)})

    return resized.map_batches(agg, batch_format="pyarrow")


def _q_audio_features(sf_dir):
    """REAL audio codec path: one deterministic synthetic mono 16-bit
    PCM WAV per document (sample i = ((doc_id·31 + i²·7) mod 4001) −
    2000, 480 samples at 16 kHz, stdlib-struct RIFF encode), decoded by
    the hand-rolled WAV decoder (``pipelines/audio.py``) in an actor
    pool, reduced to INTEGER features the SQL twin replays from the
    formula: zero crossings (sign-change count of the decoded floats)
    and amplitude sums recovered exactly from the decode (round(x ·
    32767) == the original int16 — any decode defect shifts them)."""
    from python_graphblas_ray.pipelines.audio import (decode_audio,
                                                      wav_encode)
    from python_graphblas_ray.pipelines.multimodal import media_table

    NS = 480
    ids_ds = _read(sf_dir, "documents", columns=["doc_id"]).sort(
        "doc_id").limit(32)

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        i = np.arange(NS, dtype=np.int64)
        payloads = [wav_encode((((int(d) * 31 + i * i * 7) % 4001)
                                - 2000).astype(np.int16), rate=16000)
                    for d in ids]
        return media_table(ids, payloads, media_type="audio")

    media = ids_ds.map_batches(synth, batch_format="pyarrow")
    dec = decode_audio(media, batch_size=16)

    def feats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_samples": pa.array([], pa.int64()),
                "zero_crossings": pa.array([], pa.int64()),
                "amp_sum": pa.array([], pa.int64()),
                "amp_checksum": pa.array([], pa.int64())})
        out_zc, out_s, out_ck, out_n = [], [], [], []
        for m in batch["samples"].to_pylist():
            x = np.asarray(m, dtype=np.float64)
            v = np.round(x * 32767.0).astype(np.int64)
            out_n.append(len(v))
            out_zc.append(int((np.signbit(x[1:])
                               != np.signbit(x[:-1])).sum()))
            a = np.abs(v)
            out_s.append(int(a.sum()))
            out_ck.append(int((a * (np.arange(len(a)) + 1)).sum()))
        return pa.table({
            "doc_id": batch["media_id"],
            "n_samples": np.array(out_n, dtype=np.int64),
            "zero_crossings": np.array(out_zc, dtype=np.int64),
            "amp_sum": np.array(out_s, dtype=np.int64),
            "amp_checksum": np.array(out_ck, dtype=np.int64)})

    return dec.map_batches(feats, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    """Ordered so every SQL-oracle-backed operator gets a row inside the
    driver's 50-entry correctness window: same-schema operator families
    run as UNION-tagged suites (see ``SUITES``), the remaining oracle
    queries fill the window, and rows-only queries plus the individual
    suite members follow at the tail (still runnable one by one)."""
    members = {
        "degree_out": _q_degree_out,
        "degree_in": _q_degree_in,
        "degree_mean": _q_degree_mean,
        "reduce_scalar_plus": _q_reduce_scalar_plus,
        "reduce_scalar_max": _q_reduce_scalar_max,
        "mxv_plus_times": _q_mxv_plus_times,
        "vxm_min_plus": _q_vxm_min_plus,
        "mxv_masked": _q_mxv_masked,
        "vec_ewise_add": _q_vec_ewise_add,
        "vec_extract": _q_vec_extract,
        "vec_selectk_random8": _q_vec_selectk_random,
        "vec_sort_desc": _q_vec_sort_desc,
        "ewise_add_plus": _q_ewise_add,
        "ewise_mult_times": _q_ewise_mult,
        "ewise_union_minus": _q_ewise_union,
        "select_tril": _q_select_tril,
        "select_valuegt": _q_select_valuegt,
        "assign_scalar": _q_assign_scalar,
        "assign_masked": _q_assign_masked,
        "row_scan_plus": _q_row_scan,
        "row_selectk_first2": _q_row_selectk,
        "row_selectk_random2": _q_row_selectk_random,
        "row_sort": _q_row_sort,
        "connected_components": _q_connected_components,
        "scc": _q_scc,
        "mxm_plus_times": _q_mxm_plus_times,
        "mxm_min_secondi": _q_mxm_min_secondi,
        "power2_minplus": _q_power2_minplus,
        "kronecker": _q_kronecker,
        "cocitation": _q_cocitation,
        "host_graph": _q_host_graph,
        "apply_ainv": _q_apply_ainv,
        "apply_rowindex": _q_apply_rowindex,
        "transpose": _q_transpose,
        "extract_submatrix": _q_extract_submatrix,
        "diag": _q_diag,
        "pagerank_iter5": _q_pagerank_iter5,
        "pagerank_resume5": _q_pagerank_resume5,
        "pagerank_weighted5": _q_pagerank_weighted5,
        "trustrank_iter5": _q_trustrank_iter5,
        "pagerank_dangling5": _q_pagerank_dangling5,
        "modularity": _q_modularity,
        "assortativity": _q_assortativity,
        "diameter": _q_diameter,
        "closeness": _q_closeness,
        "local_clustering": _q_local_clustering,
        "lang_count": _q_lang_count,
        "quality_filter": _q_quality_filter,
        "docs_split": _q_docs_split,
        "docs_quota": _q_docs_quota,
        "docs_mixture": _q_docs_mixture,
        "hits_iter3": _q_hits_iter3,
        "salsa_iter3": _q_salsa_iter3,
        "truss_peel3": _q_truss_peel3,
        "effective_diameter": _q_effective_diameter,
        "critical_path": _q_critical_path,
        "transitivity": _q_transitivity,
        "rich_club": _q_rich_club,
        "avg_neighbor_degree": _q_avg_neighbor_degree,
        "docs_url_canon": _q_docs_url_canon,
        "powerlaw_alpha": _q_powerlaw_alpha,
        "attack_robustness": _q_attack_robustness,
        "random_robustness": _q_random_robustness,
        "harmonic_centrality": _q_harmonic_centrality,
        "mis": _q_mis,
        "events_zscore": _q_events_zscore,
        "events_cusum": _q_events_cusum,
        "events_priority_sample": _q_events_priority_sample,
        "degree_rankcorr": _q_degree_rankcorr,
        "degree_gini": _q_degree_gini,
        "embed_silhouette": _q_embed_silhouette,
        "docs_pack_offsets": _q_docs_pack_offsets,
        "events_user_entropy": _q_events_user_entropy,
        "events_value_quantiles": _q_events_value_quantiles,
        "docs_source_stats": _q_docs_source_stats,
        "events_covisit": _q_events_covisit,
        "conductance": _q_conductance,
        "events_type_corr": _q_events_type_corr,
        "mktseg_top3": _q_mktseg_top3,
        "events_peak": _q_events_peak,
        "events_session_sizes": _q_events_session_sizes,
        "region_revenue": _q_region_revenue,
        "docs_zipf": _q_docs_zipf,
        "events_gap_quantiles": _q_events_gap_quantiles,
        "orders_priority": _q_orders_priority,
        "embed_db_index": _q_embed_db_index,
        "bipartite": _q_bipartite,
        "events_dau_growth": _q_events_dau_growth,
        "customers_no_orders": _q_customers_no_orders,
        "scc_dag_longest": _q_scc_dag_longest,
        "custdist": _q_custdist,
        "promo_revenue": _q_promo_revenue,
        "disc_revenue": _q_disc_revenue,
        "events_hourly": _q_events_hourly,
        "events_autocorr": _q_events_autocorr,
        "embed_ch_index": _q_embed_ch_index,
        "pagerank_resid5": _q_pagerank_resid5,
        "docs_heaps": _q_docs_heaps,
        "docs_chisq": _q_docs_chisq,
        "docs_js": _q_docs_js,
        "trade_matrix": _q_trade_matrix,
        "docs_tfidf": _q_docs_tfidf,
        "big_orders": _q_big_orders,
        "small_qty_revenue": _q_small_qty_revenue,
        "idle_rich_customers": _q_idle_rich_customers,
        # packed-suite members (heterogeneous keys -> one string col)
        "reciprocity": _q_reciprocity,
        "docs_lm_score": _q_docs_lm_score,
        "anf": _q_anf,
        "landmark_distances": _q_landmark_distances,
        "events_heavy_hitters": _q_events_heavy_hitters,
        "events_topk": _q_events_topk,
        "events_quantiles": _q_events_quantiles,
        "events_funnel": _q_events_funnel,
        "events_retention": _q_events_retention,
        "docs_textrank": _q_docs_textrank,
        "docs_collocations": _q_docs_collocations,
        "bowtie": _q_bowtie,
        "docs_ccnet_buckets": _q_docs_ccnet_buckets,
        "docs_bpe_tokens": _q_docs_bpe_tokens,
        "degree_histogram": _q_degree_histogram,
        "component_sizes": _q_component_sizes,
        "edge_sample": _q_edge_sample,
        "katz_iter5": _q_katz_iter5,
        "quadrilaterals": _q_quadrilaterals,
        "embed_kmeans_iter2": _q_embed_kmeans_iter2,
        "eccentricity": _q_eccentricity,
        "docs_line_dedup": _q_docs_line_dedup,
        "matching_round2": _q_matching_round2,
        "docs_ttr": _q_docs_ttr,
        "events_window_distinct": _q_events_window_distinct,
        "random_walk2": _q_random_walk2,
        "events_hll_distinct": _q_events_hll,
        "sample_neighbors3": _q_sample_neighbors3,
        "wl_refine2": _q_wl_refine2,
        "embed_gram": _q_embed_gram,
        "embed_pc1": _q_embed_pc1,
        "embed_rp8": _q_embed_rp8,
        "events_transitions": _q_events_transitions,
        "host_rank3": _q_host_rank3,
        "events_cms_users": _q_events_cms_users,
        "docs_rrf": _q_docs_rrf,
        "color_first2": _q_color_first2,
        "minhash_sig4": _q_minhash_sig4,
        "simhash_sig": _q_simhash_sig,
        "ann_ivf_fixed": _q_ann_ivf_fixed,
        "sssp_parents": _q_sssp_parents,
        "ball2_size": _q_ball2_size,
        "edge_percolation": _q_edge_percolation,
        "revenue_by_nation": _q_revenue_by_nation,
        "revenue_by_brand_nation": _q_revenue_by_brand_nation,
        "global_efficiency": _q_global_efficiency,
        "percolation_curve": _q_percolation_curve,
        "betweenness_s0": _q_betweenness_s0,
        "docs_cdc_bounds": _q_docs_cdc_bounds,
        "docs_flesch": _q_docs_flesch,
        "docs_entropy": _q_docs_entropy,
        "docs_blocklist": _q_docs_blocklist,
        "events_decay": _q_events_decay,
        "embed_pq_topk": _q_embed_pq_topk,
        "docs_bpe_merges": _q_docs_bpe_merges,
        "docs_winnow": _q_docs_winnow,
        "simrank_iter2": _q_simrank_iter2,
        "events_bloom": _q_events_bloom,
        "mst_forest": _q_mst_forest,
        "widest4": _q_widest4,
        "embed_mmr": _q_embed_mmr,
        "events_f2": _q_events_f2,
        "docs_chunks": _q_docs_chunks,
    }
    window = {
        # construction / exports
        "edges_build": _q_edges_build,
        # reductions (suites: rowwise/colwise/mean + full-matrix scalar)
        "degree_suite": _suite([(n, members[n])
                                for n in SUITES["degree_suite"]]),
        "degree_count": _q_degree_count,
        "reduce_scalar_suite": _suite([(n, members[n])
                                       for n in SUITES["reduce_scalar_suite"]]),
        # semiring matvec / vector ops
        "spmv_suite": _suite([(n, members[n])
                              for n in SUITES["spmv_suite"]]),
        "vec_ops_suite": _suite([(n, members[n])
                                 for n in SUITES["vec_ops_suite"]]),
        # semiring matmuls
        "matmul_suite": _suite([(n, members[n])
                                for n in SUITES["matmul_suite"]]),
        # heterogeneous-key members packed to (q, k, val) — see
        # PACKED_SUITES; each member also stays standalone in the tail
        "packed_metric_suite": _suite_packed(
            PACKED_SUITES["packed_metric_suite"][1], "double", members),
        "packed_label_suite": _suite_packed(
            PACKED_SUITES["packed_label_suite"][1], "str", members),
        "packed_sample_suite": _suite_packed(
            PACKED_SUITES["packed_sample_suite"][1], "double", members),
        # elementwise / select
        "ewise_suite": _suite([(n, members[n])
                               for n in SUITES["ewise_suite"]]),
        "select_suite": _suite([(n, members[n])
                                for n in SUITES["select_suite"]]),
        # apply / views (unary+indexunary apply, transpose, extract)
        "apply_view_suite": _suite([(n, members[n])
                                    for n in SUITES["apply_view_suite"]]),
        "assign_suite": _suite([(n, members[n])
                                for n in SUITES["assign_suite"]]),
        # per-row .ss extras
        "perrow_suite": _suite([(n, members[n])
                                for n in SUITES["perrow_suite"]]),
        # algorithms (SQL-checkable)
        "triangle_count": _q_triangle_count,
        "k_core": _q_k_core,
        "bfs_levels": _q_bfs_levels,
        "bfs_parents": _q_bfs_parents,
        # uniform / weighted / seed-personalized fixed-iter PageRank
        "rank_suite": _suite([(n, members[n])
                              for n in SUITES["rank_suite"]]),
        "hits_suite": _suite([(n, members[n])
                              for n in SUITES["hits_suite"]]),
        "dag_layers": _q_dag_layers,
        # 1-row graph-shape metrics + per-vertex centralities
        "graph_metric_suite": _rename_suite("graph_metric_suite", members),
        "centrality_suite": _rename_suite("centrality_suite", members),
        "components_suite": _suite([(n, members[n])
                                    for n in SUITES["components_suite"]]),
        "sssp": _q_sssp,
        "lpa_iter2": _q_lpa_iter2,
        "edge_support": _q_edge_support,
        "link_scores": _q_link_scores,
        "link_jaccard": _q_link_jaccard,
        # training-data prep (SQL-checkable)
        "dedup_exact": _q_dedup_exact,
        "word_jaccard_pairs": _q_word_jaccard,
        "embedding_neardup": _q_embedding_neardup,
        "ann_topk": _q_ann_topk,
        "token_count": _q_token_count,
        "doc_stats": _q_doc_stats,
        # language histogram raw vs post-quality-filter
        "langstats_suite": _suite([(n, members[n])
                                   for n in SUITES["langstats_suite"]]),
        # per-doc group assignments: split / quota sample / mixture
        "sampling_suite": _rename_suite("sampling_suite", members),
        # the north-star per-row invariant: byte-identical extracted text
        "pages_roundtrip": _q_pages_roundtrip,
        "semantic_dedup": _q_semantic_dedup,
        "docs_bm25": _q_docs_bm25,
        "docs_repetition": _q_docs_repetition,
        "docs_decontaminate": _q_docs_decontaminate,
        "docs_pii": _q_docs_pii,
        "docs_dup_spans": _q_docs_dup_spans,
        "events_window": _q_events_window,
        # real-codec multimodal row (r3 verdict item 3); hopping-window
        # moved to the tail to free the slot (still oracle-backed there)
        "docs_image_resize": _q_image_resize,
        "events_asof_join": _q_events_asof,
        "events_sessionize": _q_events_sessionize,
        "lineitem_agg": _q_lineitem_agg,
    }
    assert len(window) <= 50, len(window)  # 49: one spare slot
    tail = {
        # oracle-backed tail (window full): exact lexical dedup clusters
        "docs_jaccard_groups": _q_docs_jaccard_groups,
        "events_hopping_window": _q_events_hopping,
        "docs_audio_features": _q_audio_features,
        # ---- rows-only tail (no SQL equivalent) ----
        "k_truss": _q_k_truss,
        "pagerank": _q_pagerank,
        "label_propagation": _q_label_propagation,
        "betweenness": _q_betweenness,
        "pages_pagerank": _q_pages_pagerank,
        "pages_extract_text": _q_pages_extract_text,
        "prepare_corpus": _q_prepare_corpus,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_sigs": _q_simhash_sigs,
        "doc_embed_ann": _q_doc_embed_ann,
        "events_hll_distinct": _q_events_hll,
        "ann_ivf": _q_ann_ivf,
        "hits": _q_hits,
        "random_walks": _q_random_walks,
        "node2vec_walks": _q_node2vec_walks,
        "docs_cdc_chunks": _q_docs_cdc_chunks,
        "ppr_local": _q_ppr_local,
        "core_numbers": _q_core_numbers,
        "docs_ccnet_buckets": _q_docs_ccnet_buckets,
        "docs_cdc_neardup": _q_docs_cdc_neardup,
        "maximal_matching": _q_maximal_matching,
        "embed_kmeans": _q_embed_kmeans,
        "louvain": _q_louvain,
        "docs_neardup_clusters": _q_docs_neardup_clusters,
        "greedy_color": _q_greedy_color,
        # oracle-backed but beyond the window: parity-checked in
        # tests/test_entry.py
        "events_heavy_hitters": _q_events_heavy_hitters,
        "events_quantiles": _q_events_quantiles,
        "events_topk": _q_events_topk,
        "anf": _q_anf,
        "bowtie": _q_bowtie,
        "landmark_distances": _q_landmark_distances,
        "events_funnel": _q_events_funnel,
        "events_retention": _q_events_retention,
        "docs_textrank": _q_docs_textrank,
        "docs_collocations": _q_docs_collocations,
    }
    out = {**window, **tail, **members}
    # degenerate-scale hardening: every window query whose result can
    # be legitimately empty keeps its schema (see _WINDOW_SCHEMAS)
    for name in _WINDOW_SCHEMAS:
        out[name] = _schema_stable(out[name], name)
    return out


def oracle_sql() -> dict[str, str]:
    E = _E_CTE
    base = {
        "edges_build": f"{E} SELECT src, dst, val FROM E",
        "degree_out": (f"{E} SELECT src AS vid, sum(val) AS val "
                       "FROM E GROUP BY 1"),
        "degree_in": (f"{E} SELECT dst AS vid, sum(val) AS val "
                      "FROM E GROUP BY 1"),
        "reduce_scalar_plus": f"{E} SELECT sum(val) AS val FROM E",
        "reduce_scalar_max": f"{E} SELECT max(val) AS val FROM E",
        "degree_mean": (f"{E} SELECT src AS vid, avg(val) AS val "
                        "FROM E GROUP BY 1"),
        "degree_count": (f"{E} SELECT dst AS vid, "
                         "CAST(count(*) AS BIGINT) AS val "
                         "FROM E GROUP BY 1"),
        "mxv_masked": (
            f"{E}, d AS (SELECT dst AS vid, sum(val) AS val FROM E "
            "GROUP BY 1), w AS ("
            "SELECT e.src AS vid, sum(e.val * d.val) AS val "
            "FROM E e JOIN d ON e.dst = d.vid GROUP BY 1) "
            "SELECT vid, val FROM w "
            "WHERE vid IN (SELECT vid FROM d WHERE val > 8.0)"),
        "vec_ewise_add": (
            f"{E}, o AS (SELECT src AS vid, sum(val) AS val FROM E "
            "GROUP BY 1), i AS (SELECT dst AS vid, sum(val) AS val "
            "FROM E GROUP BY 1) "
            "SELECT COALESCE(o.vid, i.vid) AS vid, "
            "COALESCE(o.val, 0) + COALESCE(i.val, 0) AS val "
            "FROM o FULL OUTER JOIN i ON o.vid = i.vid"),
        "vec_extract": (
            f"{E} SELECT src - 10 AS vid, sum(val) AS val FROM E "
            "WHERE src >= 10 AND src < 100 GROUP BY 1"),
        "vec_selectk_random8": (
            # knuth32 draw of vid + 13 replayed (see stages/perrow
            # _vector_pick_order); ties by vid
            f"{E}, d AS (SELECT src AS vid, sum(val) AS val FROM E "
            "GROUP BY 1) "
            "SELECT vid, val FROM (SELECT *, row_number() OVER ("
            "ORDER BY (CAST((vid + 13) % 4294967296 AS HUGEINT) "
            "* 2654435761) % 4294967296, vid) AS rn FROM d) "
            "WHERE rn <= 8"),
        "vec_sort_desc": (
            # Vector.ss.sort(ascending=False): value at rank r of the
            # (val DESC, vid ASC) order
            f"{E}, d AS (SELECT src AS vid, sum(val) AS val FROM E "
            "GROUP BY 1) "
            "SELECT CAST(row_number() OVER (ORDER BY val DESC, vid) "
            "- 1 AS BIGINT) AS vid, val FROM d"),
        "mxv_plus_times": (
            f"{E}, d AS (SELECT dst AS vid, sum(val) AS val FROM E "
            "GROUP BY 1) "
            "SELECT e.src AS vid, sum(e.val * d.val) AS val "
            "FROM E e JOIN d ON e.dst = d.vid GROUP BY 1"),
        "vxm_min_plus": (
            f"{E}, d AS (SELECT src AS vid, sum(val) AS val FROM E "
            "GROUP BY 1) "
            "SELECT e.dst AS vid, min(d.val + e.val) AS val "
            "FROM E e JOIN d ON e.src = d.vid GROUP BY 1"),
        "mxm_plus_times": (
            # soak row cap replicated from _mxm_left
            f"{E} SELECT a.src AS src, b.dst AS dst, "
            "sum(a.val * b.val) AS val "
            "FROM E a JOIN E b ON a.dst = b.src "
            "WHERE (SELECT count(*) FROM lineitem) <= 200000 OR a.src < 64 GROUP BY 1, 2"),
        "kronecker": (
            f"{E}, A AS (SELECT * FROM E WHERE src < 16 AND dst < 16), "
            "B AS (SELECT * FROM E WHERE src < 8 AND dst < 8) "
            "SELECT a.src * 8 + b.src AS src, a.dst * 8 + b.dst AS dst, "
            "a.val * b.val AS val FROM A a CROSS JOIN B b"),
        "ewise_add_plus": (
            f"{E} SELECT COALESCE(a.src, b.src) AS src, "
            "COALESCE(a.dst, b.dst) AS dst, "
            "COALESCE(a.val, 0) + COALESCE(b.val, 0) AS val FROM E a "
            "FULL OUTER JOIN (SELECT dst AS src, src AS dst, val FROM E) b "
            "ON a.src = b.src AND a.dst = b.dst"),
        "ewise_mult_times": (
            f"{E} SELECT a.src, a.dst, a.val * b.val AS val FROM E a "
            "JOIN (SELECT dst AS src, src AS dst, val FROM E) b "
            "ON a.src = b.src AND a.dst = b.dst"),
        "ewise_union_minus": (
            f"{E} SELECT COALESCE(a.src, b.src) AS src, "
            "COALESCE(a.dst, b.dst) AS dst, "
            "COALESCE(a.val, 0) - COALESCE(b.val, 0) AS val FROM E a "
            "FULL OUTER JOIN (SELECT dst AS src, src AS dst, val FROM E) b "
            "ON a.src = b.src AND a.dst = b.dst"),
        "select_tril": f"{E} SELECT src, dst, val FROM E WHERE dst <= src",
        "select_valuegt": f"{E} SELECT src, dst, val FROM E WHERE val > 2.0",
        "apply_ainv": f"{E} SELECT src, dst, -val AS val FROM E",
        "apply_rowindex": f"{E} SELECT src, dst, src AS val FROM E",
        "transpose": f"{E} SELECT dst AS src, src AS dst, val FROM E",
        "diag": f"{E} SELECT src AS vid, val FROM E WHERE src = dst",
        "extract_submatrix": (
            f"{E} SELECT src - 100 AS src, dst, val FROM E "
            "WHERE src >= 100 AND src < 200"),
        "assign_scalar": (
            f"{E} SELECT src, dst, val FROM E "
            "WHERE NOT (src < 10 AND dst < 10) "
            "UNION ALL "
            "SELECT r1.range AS src, r2.range AS dst, "
            "CAST(99.0 AS DOUBLE) AS val FROM range(10) r1, range(10) r2"),
        "row_scan_plus": (
            f"{E} SELECT src, dst, sum(val) OVER (PARTITION BY src "
            "ORDER BY dst ROWS UNBOUNDED PRECEDING) AS val FROM E"),
        "row_selectk_first2": (
            f"{E} SELECT src, dst, val FROM (SELECT *, row_number() "
            "OVER (PARTITION BY src ORDER BY dst) AS rn FROM E) "
            "WHERE rn <= 2"),
        "row_selectk_random2": (
            # seeded knuth32 draw of the packed entry key — replays
            # stages/perrow._knuth32_draw exactly (seed=7, ncols=512)
            f"{E} SELECT src, dst, val FROM (SELECT *, row_number() "
            "OVER (PARTITION BY src ORDER BY "
            "(CAST((CAST(src AS BIGINT) * 512 + dst + 7) % 4294967296 "
            "AS HUGEINT) * 2654435761) % 4294967296, dst) AS rn FROM E) "
            "WHERE rn <= 2"),
        "row_sort": (
            f"{E} SELECT src, CAST(row_number() OVER (PARTITION BY src "
            "ORDER BY val, dst) - 1 AS BIGINT) AS dst, val FROM E"),
        "triangle_count": (
            f"{E}, P AS (SELECT DISTINCT least(src, dst) AS a, "
            "greatest(src, dst) AS b FROM E WHERE src <> dst) "
            "SELECT count(*) AS triangles FROM P p1 "
            "JOIN P p2 ON p1.b = p2.a "
            "JOIN P p3 ON p3.a = p1.a AND p3.b = p2.b"),
        "dedup_exact": (
            "SELECT min(doc_id) AS keep_id, "
            "CAST(count(*) AS BIGINT) AS n_dups, text "
            "FROM documents GROUP BY text"),
        "word_jaccard_pairs": (
            # df-capped Jaccard: the HAVING replays the engine's
            # hot-word guard (max_word_df = ndocs // 2) — see
            # _q_word_jaccard
            r"WITH tok0 AS (SELECT doc_id, unnest(list_distinct("
            r"regexp_split_to_array(trim(text), '\s+'))) AS word "
            "FROM documents), "
            "keep AS (SELECT word FROM tok0 GROUP BY word "
            "HAVING count(*) <= "
            "(SELECT count(*) FROM documents) // 2), "
            "tok AS (SELECT t.doc_id, t.word FROM tok0 t "
            "JOIN keep k ON k.word = t.word), "
            "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n "
            "FROM tok GROUP BY 1), "
            "co AS (SELECT a.doc_id AS ia, b.doc_id AS ib, "
            "CAST(count(*) AS BIGINT) AS inter FROM tok a "
            "JOIN tok b ON a.word = b.word AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT co.ia, co.ib, "
            "CAST(co.inter AS DOUBLE) / (sa.n + sb.n - co.inter) AS jaccard "
            "FROM co JOIN sizes sa ON co.ia = sa.doc_id "
            "JOIN sizes sb ON co.ib = sb.doc_id "
            "WHERE CAST(co.inter AS DOUBLE) / (sa.n + sb.n - co.inter) "
            ">= 0.8"),
        "embedding_neardup": (
            "SELECT a.vec_id AS ia, b.vec_id AS ib "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) "
            ">= 0.4"),
        "semantic_dedup": (
            # cosine pair graph → connected components (min label) →
            # keep = cluster representative
            "WITH RECURSIVE P AS (SELECT a.vec_id AS ia, b.vec_id AS ib "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) "
            ">= 0.4), "
            "V AS (SELECT vec_id FROM embeddings), "
            "E2 AS (SELECT ia AS s, ib AS d FROM P "
            "UNION SELECT ib, ia FROM P), "
            "reach(vid, root) AS (SELECT vec_id, vec_id FROM V UNION "
            "SELECT e.d, r.root FROM reach r JOIN E2 e ON e.s = r.vid) "
            "SELECT vid AS vec_id, CAST(min(root) AS BIGINT) AS cluster, "
            "min(root) = vid AS keep FROM reach GROUP BY vid"),
        "docs_jaccard_groups": (
            # df-capped jaccard pairs (same CTEs as word_jaccard_pairs)
            # -> undirected closure -> min-root cluster per doc
            r"WITH RECURSIVE tok0 AS (SELECT doc_id, "
            r"unnest(list_distinct(regexp_split_to_array(trim(text), "
            r"'\s+'))) AS word FROM documents), "
            "keepw AS (SELECT word FROM tok0 GROUP BY word "
            "HAVING count(*) <= "
            "(SELECT count(*) FROM documents) // 2), "
            "tok AS (SELECT t.doc_id, t.word FROM tok0 t "
            "JOIN keepw k ON k.word = t.word), "
            "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n "
            "FROM tok GROUP BY 1), "
            "co AS (SELECT a.doc_id AS ia, b.doc_id AS ib, "
            "CAST(count(*) AS BIGINT) AS inter FROM tok a "
            "JOIN tok b ON a.word = b.word AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2), "
            "P AS (SELECT co.ia, co.ib FROM co "
            "JOIN sizes sa ON co.ia = sa.doc_id "
            "JOIN sizes sb ON co.ib = sb.doc_id "
            "WHERE CAST(co.inter AS DOUBLE) / (sa.n + sb.n - co.inter) "
            ">= 0.8), "
            "V AS (SELECT doc_id FROM documents), "
            "E2 AS (SELECT ia AS s, ib AS d FROM P "
            "UNION SELECT ib, ia FROM P), "
            "reach(vid, root) AS (SELECT doc_id, doc_id FROM V UNION "
            "SELECT e.d, r.root FROM reach r JOIN E2 e ON e.s = r.vid) "
            "SELECT vid AS doc_id, CAST(min(root) AS BIGINT) AS cluster, "
            "min(root) = vid AS keep FROM reach GROUP BY vid"),
        "ann_topk": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings "
            "WHERE vec_id < 10), "
            "s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.embedding, e.embedding) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id) "
            "SELECT query_id, neighbor_id, rank FROM ("
            "SELECT query_id, neighbor_id, "
            "row_number() OVER (PARTITION BY query_id "
            "ORDER BY sim DESC, neighbor_id) AS rank FROM s) "
            "WHERE rank <= 10"),
        "token_count": (
            r"SELECT doc_id, CAST(length(regexp_split_to_array(trim(text), "
            r"'\s+')) AS BIGINT) AS ws_tokens FROM documents"),
        "doc_stats": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS q_len, "
            "CAST(length(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) "
            "AS q_words FROM documents"),
        "lang_count": ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
                       "FROM documents GROUP BY 1"),
        "quality_filter": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents "
            "WHERE length(regexp_extract_all(text, '[a-zA-Z]+')) >= 40 "
            "GROUP BY 1"),
        "connected_components": (
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "V AS (SELECT range::BIGINT AS vid FROM range(512)), "
            "E2 AS (SELECT src, dst FROM E "
            "UNION SELECT dst AS src, src AS dst FROM E), "
            "reach(vid, root) AS (SELECT vid, vid FROM V UNION "
            "SELECT e.dst, r.root FROM reach r JOIN E2 e "
            "ON e.src = r.vid) "
            "SELECT vid, CAST(min(root) AS BIGINT) AS comp FROM reach "
            "GROUP BY vid"),
        "scc": (
            # transitive closure on the DIRECTED edges, then comp[v] =
            # min over {v} ∪ {u mutually reachable with v}
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "V AS (SELECT range::BIGINT AS vid FROM range(512)), "
            "reach(s, d) AS (SELECT src, dst FROM E UNION "
            "SELECT r.s, e.dst FROM reach r JOIN E e ON e.src = r.d), "
            "mutual AS (SELECT a.s AS u, a.d AS v FROM reach a "
            "JOIN reach b ON b.s = a.d AND b.d = a.s) "
            "SELECT v.vid, CAST(least(v.vid, COALESCE(min(m.u), v.vid)) "
            "AS BIGINT) AS comp FROM V v "
            "LEFT JOIN mutual m ON m.v = v.vid GROUP BY v.vid"),
        "mis": (
            # deterministic Luby rounds as a recursive CTE: act(it) holds
            # the still-active set; a vertex is selected at round it when
            # its knuth32 priority beats every active neighbor's, and
            # drops out when it or a neighbor is selected. The final MIS
            # is recovered post-hoc (selection depends only on act(it)).
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "U AS (SELECT DISTINCT least(src, dst) AS a, "
            "greatest(src, dst) AS b FROM E WHERE src <> dst), "
            "S AS (SELECT a AS src, b AS dst FROM U "
            "UNION ALL SELECT b, a FROM U), "
            "V AS (SELECT range::BIGINT AS vid FROM range(512)), "
            "act(it, vid) AS ("
            "SELECT 0, vid FROM V "
            "UNION ALL "
            "SELECT a.it + 1, a.vid FROM act a "
            "WHERE a.it < 64 "
            "AND NOT ((a.vid * 2654435761) % 4294967296 < "
            "COALESCE((SELECT min((b.vid * 2654435761) % 4294967296) "
            "FROM S e JOIN act b ON b.vid = e.dst AND b.it = a.it "
            "WHERE e.src = a.vid), 9223372036854775807)) "
            "AND NOT EXISTS ("
            "SELECT 1 FROM S e1 JOIN act u ON u.vid = e1.dst "
            "AND u.it = a.it WHERE e1.src = a.vid "
            "AND (u.vid * 2654435761) % 4294967296 < "
            "COALESCE((SELECT min((w.vid * 2654435761) % 4294967296) "
            "FROM S e2 JOIN act w ON w.vid = e2.dst AND w.it = u.it "
            "WHERE e2.src = u.vid), 9223372036854775807))), "
            "sel AS (SELECT DISTINCT a.vid FROM act a "
            "WHERE (a.vid * 2654435761) % 4294967296 < "
            "COALESCE((SELECT min((b.vid * 2654435761) % 4294967296) "
            "FROM S e JOIN act b ON b.vid = e.dst AND b.it = a.it "
            "WHERE e.src = a.vid), 9223372036854775807)) "
            "SELECT v.vid, CAST(v.vid IN (SELECT vid FROM sel) "
            "AS BIGINT) AS in_mis FROM V v"),
        "reciprocity": (
            f"{E}, D AS (SELECT src, dst FROM E WHERE src <> dst) "
            "SELECT CAST((SELECT count(*) FROM D) AS BIGINT) AS n_edges, "
            "CAST((SELECT count(*) FROM D a JOIN D b "
            "ON b.src = a.dst AND b.dst = a.src) AS BIGINT) AS n_recip, "
            # NULLIF/COALESCE: an empty graph has ratio 0.0 (the Ray
            # side's convention), not NULL from 0/0
            "COALESCE(round((SELECT count(*) FROM D a JOIN D b "
            "ON b.src = a.dst AND b.dst = a.src) * 1.0 / "
            "NULLIF((SELECT count(*) FROM D), 0), 8), 0.0) AS ratio"),
        "docs_lm_score": (
            # same whitespace tokenize as docs_repetition; Laplace bigram
            # mean log-prob, 8-decimal rounded (matches the Ray side's
            # hash-keyed counts up to 64-bit collisions)
            "WITH lst AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "tok AS (SELECT unnest(ws) AS w FROM lst), "
            "uni AS (SELECT w, count(*) AS c FROM tok GROUP BY 1), "
            "vc AS (SELECT count(*) AS v FROM uni), "
            "bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM lst, "
            "LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) "
            "AS i) t WHERE len(ws) >= 2), "
            "bcnt AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2), "
            "lp AS (SELECT b.doc_id, ln((bc.c + 1.0) / (u.c + v.v)) AS l "
            "FROM bg b JOIN bcnt bc ON bc.w1 = b.w1 AND bc.w2 = b.w2 "
            "JOIN uni u ON u.w = b.w1 CROSS JOIN vc v) "
            "SELECT d.doc_id, round(COALESCE(avg(l), 0.0), 8) AS lm_score "
            "FROM documents d LEFT JOIN lp USING (doc_id) "
            "GROUP BY d.doc_id"),
        "events_window": (
            "SELECT event_type, date_trunc('day', ts) AS window, "
            "CAST(count(*) AS BIGINT) AS n, min(value) AS vmin, "
            "max(value) AS vmax FROM events GROUP BY 1, 2"),
        "docs_image_resize": (
            # replay the synthetic pixel formula + the pixel-center
            # nearest-neighbor index map of ImageResizer: src_row =
            # min(floor((y+0.5)·16/8), 15), src_col =
            # min(floor((x+0.5)·12/8), 11); decode correctness rides on
            # the sums matching (any unfilter/inflate/resize defect
            # shifts every checksum)
            "WITH ids AS (SELECT doc_id FROM documents "
            "ORDER BY doc_id LIMIT 48), "
            "g AS (SELECT i.doc_id, y.range AS y, x.range AS x, "
            "c.range AS c FROM ids i, range(8) y, range(8) x, "
            "range(3) c), "
            "v AS (SELECT doc_id, (y * 8 + x) * 3 + c AS pos, "
            "(doc_id * 7 "
            "+ LEAST(CAST(FLOOR((y + 0.5) * 16.0 / 8) AS BIGINT), 15) "
            "* 131 "
            "+ LEAST(CAST(FLOOR((x + 0.5) * 12.0 / 8) AS BIGINT), 11) "
            "* 17 + c * 29) % 256 AS val FROM g) "
            "SELECT doc_id, CAST(SUM(val) AS BIGINT) AS px_sum, "
            "CAST(SUM(val * (pos + 1)) AS BIGINT) AS checksum "
            "FROM v GROUP BY doc_id"),
        "docs_audio_features": (
            # replay the synthetic int16 waveform: v(i) =
            # ((doc_id*31 + i*i*7) % 4001) - 2000; the engine recovers
            # v exactly from the decoded floats (round(x*32767))
            "WITH ids AS (SELECT doc_id FROM documents "
            "ORDER BY doc_id LIMIT 32), "
            "s AS (SELECT d.doc_id, i.range AS i, "
            "((d.doc_id * 31 + i.range * i.range * 7) % 4001) - 2000 "
            "AS v FROM ids d, range(480) i), "
            "z AS (SELECT doc_id, i, v, CASE WHEN (v < 0) <> "
            "LAG(v < 0) OVER (PARTITION BY doc_id ORDER BY i) "
            "THEN 1 ELSE 0 END AS zc FROM s) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples, "
            "CAST(SUM(zc) AS BIGINT) AS zero_crossings, "
            "CAST(SUM(ABS(v)) AS BIGINT) AS amp_sum, "
            "CAST(SUM(ABS(v) * (i + 1)) AS BIGINT) AS amp_checksum "
            "FROM z GROUP BY doc_id"),
        "events_hopping_window": (
            "WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),"
            " w AS (SELECT event_type, unnest(generate_series("
            "CAST(ceil((t - 7200000000 + 1) / 3600000000.0) AS BIGINT) "
            "* 3600000000, (t // 3600000000) * 3600000000, 3600000000)) "
            "AS window_us FROM e) "
            "SELECT event_type, window_us, CAST(count(*) AS BIGINT) AS n "
            "FROM w GROUP BY 1, 2"),
        "events_asof_join": (
            "SELECT l.event_id, r.ts AS ts_r "
            "FROM (SELECT * FROM events WHERE event_type = 'click') l "
            "ASOF JOIN (SELECT * FROM events "
            "WHERE event_type = 'purchase') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"),
        "events_sessionize": (
            "WITH x AS (SELECT user_id, ts, CASE WHEN epoch_us(ts) - "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
            "> 1800000000 THEN 1 ELSE 0 END AS newsess FROM events), "
            "y AS (SELECT user_id, ts, sum(newsess) OVER ("
            "PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) "
            "AS sess FROM x) "
            "SELECT user_id, min(ts) AS session_start, "
            "max(ts) AS session_end, CAST(count(*) AS BIGINT) AS n_events "
            "FROM y GROUP BY user_id, sess"),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2"),
        "mxm_min_secondi": (
            f"{E} SELECT a.src AS src, b.dst AS dst, "
            "CAST(min(a.dst) AS BIGINT) AS val "
            "FROM E a JOIN E b ON a.dst = b.src "
            "WHERE (SELECT count(*) FROM lineitem) <= 200000 OR a.src < 64 GROUP BY 1, 2"),
        "assign_masked": (
            f"{E} SELECT src, dst, CASE WHEN src < 20 AND dst < 20 "
            "AND val > 2.0 THEN 99.0 ELSE val END AS val FROM E"),
        "sssp": (
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst, CAST(count(*) AS DOUBLE) AS val "
            "FROM lineitem GROUP BY 1, 2), "
            "walk(vid, d, hop) AS ("
            "SELECT CAST(0 AS BIGINT), CAST(0 AS DOUBLE), 0 "
            "UNION "
            "SELECT e.dst, w.d + e.val, w.hop + 1 "
            "FROM walk w JOIN E e ON e.src = w.vid WHERE w.hop < 6) "
            "SELECT vid, min(d) AS dist FROM walk GROUP BY vid"),
        "k_core": (
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "U AS (SELECT DISTINCT least(src, dst) AS a, "
            "greatest(src, dst) AS b FROM E WHERE src <> dst), "
            "S AS (SELECT a AS src, b AS dst FROM U "
            "UNION ALL SELECT b, a FROM U), "
            "peel(it, vid) AS ("
            "SELECT 0, CAST(range AS BIGINT) FROM range(512) "
            "UNION ALL "
            "SELECT p.it + 1, p.vid FROM peel p "
            "JOIN S e ON e.src = p.vid "
            "JOIN peel q ON q.vid = e.dst AND q.it = p.it "
            "WHERE p.it < 40 "
            "GROUP BY p.it, p.vid HAVING count(*) >= 162), "
            # it = 40 (not max(it)): when the core empties, the recursion
            # terminates early and max(it) would pick the last NON-empty
            # pre-convergence level; the fixed point always survives to 40.
            "core AS (SELECT vid FROM peel WHERE it = 40) "
            "SELECT s.src, s.dst, CAST(1.0 AS DOUBLE) AS val FROM S s "
            "WHERE s.src IN (SELECT vid FROM core) "
            "AND s.dst IN (SELECT vid FROM core)"),
        "pagerank_iter5": (
            "WITH RECURSIVE R AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem), "
            "Ew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt "
            "FROM R GROUP BY 1, 2), "
            "deg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS d "
            "FROM R GROUP BY 1), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "C AS (SELECT src, dst, cnt FROM Ew "
            "UNION ALL SELECT vid, vid, 0.0 FROM V), "
            "pr(it, vid, r) AS ("
            "SELECT 0, vid, 1.0 / 512 FROM V "
            "UNION ALL "
            "SELECT p.it + 1, c.dst, (1.0 - 0.85) / 512 + "
            "sum(c.cnt * COALESCE(p.r / (deg.d / 0.85), 0.0)) "
            "FROM pr p JOIN C c ON c.src = p.vid "
            "LEFT JOIN deg ON deg.vid = p.vid "
            "WHERE p.it < 5 GROUP BY p.it, c.dst) "
            "SELECT vid, ROUND(r, 8) AS rank FROM pr WHERE it = 5"),
        "pagerank_dangling5": (
            # classic dangling redistribution == uniform synthetic
            # out-edges from every dangling vertex, then the identical
            # pagerank_iter5 recursion over the augmented edge set
            "WITH RECURSIVE R AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem "
            "WHERE l_orderkey % 512 < 480), "
            "Ew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt "
            "FROM R GROUP BY 1, 2), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "dang AS (SELECT vid FROM V WHERE vid NOT IN "
            "(SELECT DISTINCT src FROM R)), "
            "E2 AS (SELECT src, dst, cnt FROM Ew UNION ALL "
            "SELECT d.vid, v.vid, 1.0 FROM dang d CROSS JOIN V v), "
            "deg AS (SELECT src AS vid, CAST(sum(cnt) AS DOUBLE) AS d "
            "FROM E2 GROUP BY 1), "
            "C AS (SELECT src, dst, cnt FROM E2 "
            "UNION ALL SELECT vid, vid, 0.0 FROM V), "
            "pr(it, vid, r) AS ("
            "SELECT 0, vid, 1.0 / 512 FROM V "
            "UNION ALL "
            "SELECT p.it + 1, c.dst, (1.0 - 0.85) / 512 + "
            "sum(c.cnt * COALESCE(p.r / (deg.d / 0.85), 0.0)) "
            "FROM pr p JOIN C c ON c.src = p.vid "
            "LEFT JOIN deg ON deg.vid = p.vid "
            "WHERE p.it < 5 GROUP BY p.it, c.dst) "
            "SELECT vid, ROUND(r, 8) AS rank FROM pr WHERE it = 5"),
        "trustrank_iter5": (
            # pagerank_iter5 with the teleport vector and the initial
            # distribution concentrated uniformly on seeds 0..15
            "WITH RECURSIVE R AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem), "
            "Ew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt "
            "FROM R GROUP BY 1, 2), "
            "deg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS d "
            "FROM R GROUP BY 1), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "C AS (SELECT src, dst, cnt FROM Ew "
            "UNION ALL SELECT vid, vid, 0.0 FROM V), "
            "pr(it, vid, r) AS ("
            "SELECT 0, vid, CASE WHEN vid < 16 THEN 1.0 / 16 ELSE 0.0 END "
            "FROM V "
            "UNION ALL "
            "SELECT p.it + 1, c.dst, (1.0 - 0.85) * "
            "(CASE WHEN c.dst < 16 THEN 1.0 / 16 ELSE 0.0 END) + "
            "sum(c.cnt * COALESCE(p.r / (deg.d / 0.85), 0.0)) "
            "FROM pr p JOIN C c ON c.src = p.vid "
            "LEFT JOIN deg ON deg.vid = p.vid "
            "WHERE p.it < 5 GROUP BY p.it, c.dst) "
            "SELECT vid, ROUND(r, 8) AS rank FROM pr WHERE it = 5"),
        "hits_iter3": (
            # unnormalized power iterations h' = A @ (A.T @ h) carry
            # exact-integer path counts; the only float division is the
            # final L2 normalization (rounded to the driver's 8-decimal
            # grain)
            "WITH RECURSIVE R AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem), "
            "Ew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt "
            "FROM R GROUP BY 1, 2), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "st(it, vid, h) AS ("
            "SELECT 0, vid, CAST(1.0 AS DOUBLE) FROM V "
            "UNION ALL "
            "SELECT a.it + 1, e2.src, sum(e2.cnt * a.av) "
            "FROM (SELECT p.it AS it, e.dst AS vid, "
            "sum(e.cnt * p.h) AS av "
            "FROM st p JOIN Ew e ON e.src = p.vid "
            "WHERE p.it < 3 GROUP BY 1, 2) a "
            "JOIN Ew e2 ON e2.dst = a.vid GROUP BY 1, 2), "
            "A3 AS (SELECT e.dst AS vid, sum(e.cnt * p.h) AS av "
            "FROM st p JOIN Ew e ON e.src = p.vid "
            "WHERE p.it = 2 GROUP BY 1), "
            "H3 AS (SELECT vid, h FROM st WHERE it = 3), "
            "NH AS (SELECT sqrt(sum(h * h)) AS s FROM H3), "
            "NA AS (SELECT sqrt(sum(av * av)) AS s FROM A3) "
            "SELECT v.vid, "
            "COALESCE(ROUND(COALESCE(h.h, 0) / NULLIF(nh.s, 0), 8), "
            "0.0) AS hub, "
            "COALESCE(ROUND(COALESCE(a.av, 0) / NULLIF(na.s, 0), 8), "
            "0.0) AS authority "
            "FROM V v LEFT JOIN H3 h ON h.vid = v.vid "
            "LEFT JOIN A3 a ON a.vid = v.vid "
            "CROSS JOIN NH nh CROSS JOIN NA na"),
        "salsa_iter3": (
            # hits_iter3 with the sums degree-normalized: authority
            # a(i) = sum h(j)/outdeg(j) over in-edges, hub
            # h(j) = sum a(i)/indeg(i) over out-edges
            "WITH RECURSIVE R AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem), "
            "Ew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt "
            "FROM R GROUP BY 1, 2), "
            "OD AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS d "
            "FROM R GROUP BY 1), "
            "ID AS (SELECT dst AS vid, CAST(count(*) AS DOUBLE) AS d "
            "FROM R GROUP BY 1), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "st(it, vid, h) AS ("
            "SELECT 0, vid, CAST(1.0 AS DOUBLE) FROM V "
            "UNION ALL "
            "SELECT a.it + 1, e2.src, sum(e2.cnt * (a.av / id.d)) "
            "FROM (SELECT p.it AS it, e.dst AS vid, "
            "sum(e.cnt * (p.h / od.d)) AS av "
            "FROM st p JOIN Ew e ON e.src = p.vid "
            "JOIN OD od ON od.vid = p.vid "
            "WHERE p.it < 3 GROUP BY 1, 2) a "
            "JOIN Ew e2 ON e2.dst = a.vid "
            "JOIN ID id ON id.vid = a.vid GROUP BY 1, 2), "
            "A3 AS (SELECT e.dst AS vid, sum(e.cnt * (p.h / od.d)) AS av "
            "FROM st p JOIN Ew e ON e.src = p.vid "
            "JOIN OD od ON od.vid = p.vid "
            "WHERE p.it = 2 GROUP BY 1), "
            "H3 AS (SELECT vid, h FROM st WHERE it = 3), "
            "NH AS (SELECT sqrt(sum(h * h)) AS s FROM H3), "
            "NA AS (SELECT sqrt(sum(av * av)) AS s FROM A3) "
            "SELECT v.vid, "
            "COALESCE(ROUND(COALESCE(h.h, 0) / NULLIF(nh.s, 0), 8), "
            "0.0) AS hub, "
            "COALESCE(ROUND(COALESCE(a.av, 0) / NULLIF(na.s, 0), 8), "
            "0.0) AS authority "
            "FROM V v LEFT JOIN H3 h ON h.vid = v.vid "
            "LEFT JOIN A3 a ON a.vid = v.vid "
            "CROSS JOIN NH nh CROSS JOIN NA na"),
        "truss_peel3": (
            # three unrolled support-then-drop rounds over the simple
            # undirected graph (k=5 -> keep support >= 3); support of a
            # kept edge (u,v) = common neighbors within the current set
            f"{E}, "
            "sym AS (SELECT DISTINCT s, d FROM ("
            "SELECT src AS s, dst AS d FROM E "
            "UNION ALL SELECT dst, src FROM E) WHERE s <> d), "
            "s1 AS (SELECT e.s, e.d, count(*) AS sup FROM sym e "
            "JOIN sym a ON a.s = e.s "
            "JOIN sym b ON b.s = e.d AND b.d = a.d GROUP BY 1, 2), "
            "k1 AS (SELECT s, d FROM s1 WHERE sup >= 3), "
            "s2 AS (SELECT e.s, e.d, count(*) AS sup FROM k1 e "
            "JOIN k1 a ON a.s = e.s "
            "JOIN k1 b ON b.s = e.d AND b.d = a.d GROUP BY 1, 2), "
            "k2 AS (SELECT s, d FROM s2 WHERE sup >= 3), "
            "s3 AS (SELECT e.s, e.d, count(*) AS sup FROM k2 e "
            "JOIN k2 a ON a.s = e.s "
            "JOIN k2 b ON b.s = e.d AND b.d = a.d GROUP BY 1, 2) "
            "SELECT s AS src, d AS dst, CAST(sup AS DOUBLE) AS val "
            "FROM s3 WHERE sup >= 3"),
        "bowtie": (
            # one unbounded transitive closure (UNION dedup terminates at
            # the reachable-pair fixpoint), mutual-reach min labels, then
            # the Broder part definitions; CASE order enforces the
            # core > in > out > tube > tendril precedence
            "WITH RECURSIVE D AS (SELECT DISTINCT l_orderkey % 512 AS "
            "src, l_partkey % 512 AS dst FROM lineitem), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "reach(u, v) AS ("
            "SELECT vid, vid FROM V "
            "UNION "
            "SELECT r.u, e.dst FROM reach r JOIN D e ON e.src = r.v), "
            "comp AS (SELECT a.u AS vid, min(a.v) AS c FROM reach a "
            "JOIN reach b ON b.u = a.v AND b.v = a.u GROUP BY 1), "
            "rep AS (SELECT c FROM comp GROUP BY c "
            "ORDER BY count(*) DESC, c ASC LIMIT 1), "
            "core AS (SELECT vid FROM comp WHERE c = (SELECT c FROM rep)), "
            "vin AS (SELECT r.u AS vid FROM reach r "
            "WHERE r.v = (SELECT c FROM rep) "
            "AND r.u NOT IN (SELECT vid FROM core)), "
            "vout AS (SELECT r.v AS vid FROM reach r "
            "WHERE r.u = (SELECT c FROM rep) "
            "AND r.v NOT IN (SELECT vid FROM core)), "
            "fromin AS (SELECT DISTINCT r.v AS vid FROM reach r "
            "JOIN vin i ON i.vid = r.u), "
            "toout AS (SELECT DISTINCT r.u AS vid FROM reach r "
            "JOIN vout o ON o.vid = r.v) "
            "SELECT v.vid, CASE "
            "WHEN v.vid IN (SELECT vid FROM core) THEN 'core' "
            "WHEN v.vid IN (SELECT vid FROM vin) THEN 'in' "
            "WHEN v.vid IN (SELECT vid FROM vout) THEN 'out' "
            "WHEN v.vid IN (SELECT vid FROM fromin) "
            "AND v.vid IN (SELECT vid FROM toout) THEN 'tube' "
            "WHEN v.vid IN (SELECT vid FROM fromin) "
            "OR v.vid IN (SELECT vid FROM toout) THEN 'tendril' "
            "ELSE 'disc' END AS part FROM V v"),
        "anf": (
            # exact neighborhood function: bounded min-distance closure
            # (path-length states, UNION dedup; t < 6 matches the ray
            # side's tmax — both test graphs converge by t=4), then
            # cumulative pair counts per level
            "WITH RECURSIVE D AS (SELECT DISTINCT l_orderkey % 512 AS "
            "src, l_partkey % 512 AS dst FROM lineitem), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "reach(u, v, t) AS ("
            "SELECT vid, vid, 0 FROM V "
            "UNION "
            "SELECT r.u, e.dst, r.t + 1 FROM reach r "
            "JOIN D e ON e.src = r.v WHERE r.t < 6), "
            "dist AS (SELECT u, v, min(t) AS d FROM reach GROUP BY 1, 2), "
            "T AS (SELECT DISTINCT d AS t FROM dist) "
            "SELECT t.t, CAST((SELECT count(*) FROM dist "
            "WHERE dist.d <= t.t) AS BIGINT) AS n_pairs FROM T t"),
        "effective_diameter": (
            # smallest t covering >= 90% of reachable pairs
            "WITH RECURSIVE D AS (SELECT DISTINCT l_orderkey % 512 AS "
            "src, l_partkey % 512 AS dst FROM lineitem), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "reach(u, v, t) AS ("
            "SELECT vid, vid, 0 FROM V "
            "UNION "
            "SELECT r.u, e.dst, r.t + 1 FROM reach r "
            "JOIN D e ON e.src = r.v WHERE r.t < 6), "
            "dist AS (SELECT u, v, min(t) AS d FROM reach GROUP BY 1, 2), "
            "tot AS (SELECT count(*) AS c FROM dist), "
            "T AS (SELECT DISTINCT d AS t FROM dist) "
            "SELECT CAST(min(t.t) AS BIGINT) AS d90 FROM T t, tot "
            "WHERE (SELECT count(*) FROM dist WHERE dist.d <= t.t) "
            ">= 0.9 * tot.c"),
        "critical_path": (
            # weighted longest-path distances on the src<dst DAG via
            # path-sum state enumeration (integer weights -> exact
            # doubles, UNION dedup terminates at the fixpoint)
            f"WITH RECURSIVE {_E_CTE[5:]}, "
            "D AS (SELECT src, dst, CAST((src * 7 + dst * 13) % 10 + 1 "
            "AS DOUBLE) AS w FROM E WHERE src < dst), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "lv(vid, dist) AS ("
            "SELECT vid, CAST(0 AS DOUBLE) FROM V "
            "UNION "
            "SELECT e.dst, p.dist + e.w FROM lv p "
            "JOIN D e ON e.src = p.vid) "
            "SELECT vid, max(dist) AS dist FROM lv GROUP BY 1"),
        "dag_layers": (
            # longest path from any source on the src<dst DAG: recursive
            # path-length enumeration (UNION dedups states, so the
            # recursion is bounded by V x longest-path and terminates at
            # the fixpoint), then max per vertex
            "WITH RECURSIVE D AS (SELECT DISTINCT l_orderkey % 512 AS "
            "src, l_partkey % 512 AS dst FROM lineitem "
            "WHERE l_orderkey % 512 < l_partkey % 512), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "lv(vid, l) AS ("
            "SELECT vid, CAST(0 AS BIGINT) FROM V "
            "UNION "
            "SELECT e.dst, p.l + 1 FROM lv p JOIN D e ON e.src = p.vid) "
            "SELECT vid, max(l) AS layer FROM lv GROUP BY 1"),
        "cocitation": (
            # in-neighbor overlap counts over the DISTINCT edge pattern
            "WITH D AS (SELECT DISTINCT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem) "
            "SELECT a.dst AS src, b.dst AS dst, "
            "CAST(count(*) AS DOUBLE) AS val "
            "FROM D a JOIN D b ON a.src = b.src AND a.dst < b.dst "
            "GROUP BY 1, 2"),
        "pagerank_weighted5": (
            # weighted variant: distinct edges carry the synthetic weight
            # (src·7+dst·13)%10+1; normalization by weighted out-strength
            "WITH RECURSIVE D AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "Ew AS (SELECT src, dst, CAST((src * 7 + dst * 13) % 10 + 1 "
            "AS DOUBLE) AS wt FROM D), "
            "deg AS (SELECT src AS vid, sum(wt) AS d FROM Ew GROUP BY 1), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "C AS (SELECT src, dst, wt FROM Ew "
            "UNION ALL SELECT vid, vid, 0.0 FROM V), "
            "pr(it, vid, r) AS ("
            "SELECT 0, vid, 1.0 / 512 FROM V "
            "UNION ALL "
            "SELECT p.it + 1, c.dst, (1.0 - 0.85) / 512 + "
            "sum(c.wt * COALESCE(p.r / (deg.d / 0.85), 0.0)) "
            "FROM pr p JOIN C c ON c.src = p.vid "
            "LEFT JOIN deg ON deg.vid = p.vid "
            "WHERE p.it < 5 GROUP BY p.it, c.dst) "
            "SELECT vid, ROUND(r, 8) AS rank FROM pr WHERE it = 5"),
        "bfs_parents": (
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "bfs(vid, lvl) AS ("
            "SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT) "
            "UNION "
            "SELECT e.dst, b.lvl + 1 FROM bfs b JOIN E e ON e.src = b.vid "
            "WHERE b.lvl < 30), "
            "L AS (SELECT vid, min(lvl) AS lvl FROM bfs GROUP BY vid) "
            "SELECT l.vid, CASE WHEN l.vid = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (SELECT min(e.src) FROM E e JOIN L l2 ON l2.vid = e.src "
            "WHERE e.dst = l.vid AND l2.lvl = l.lvl - 1) END AS parent "
            "FROM L l"),
    } | {"bfs_levels": (
        "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
        "bfs(vid, lvl) AS ("
        "SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT) "
        "UNION "
        "SELECT e.dst, b.lvl + 1 FROM bfs b JOIN E e ON e.src = b.vid "
        "WHERE b.lvl < 30) "
        "SELECT vid, min(lvl) AS lvl FROM bfs GROUP BY vid"),
        # multi-source form of the bfs_levels closure, one (lm, vid)
        # state per landmark
        "landmark_distances": (
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "bfs(lm, vid, lvl) AS ("
            "SELECT lm, lm AS vid, CAST(0 AS BIGINT) AS lvl FROM ("
            "VALUES (CAST(0 AS BIGINT)), (CAST(7 AS BIGINT)), "
            "(CAST(42 AS BIGINT)), (CAST(101 AS BIGINT))) t(lm) "
            "UNION "
            "SELECT b.lm, e.dst, b.lvl + 1 FROM bfs b "
            "JOIN E e ON e.src = b.vid WHERE b.lvl < 40) "
            "SELECT lm, vid, min(lvl) AS dist FROM bfs GROUP BY 1, 2"),
        "host_graph": (
            f"{E} SELECT src % 64 AS src, dst % 64 AS dst, "
            "sum(val) AS val FROM E GROUP BY 1, 2"),
        "events_heavy_hitters": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS mg_count "
            "FROM events GROUP BY 1"),
        # first-touch funnel: each step takes the earliest event strictly
        # after the previous step's match
        "events_funnel": (
            "WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1 "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
            "JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2 "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT s1.user_id, CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3 "
            "WHEN s2.t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) "
            "AS step_reached, s1.t1 AS ts_first, "
            "COALESCE(s3.t3, s2.t2, s1.t1) AS ts_last "
            "FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id "
            "LEFT JOIN s3 ON s3.user_id = s1.user_id"),
        # PMI over the same tokenize/bigram machinery; identical
        # double-op order keeps round-8 hash-exact
        "docs_collocations": (
            "WITH lst AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "tok AS (SELECT unnest(ws) AS w FROM lst), "
            "uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok "
            "GROUP BY 1), "
            "tt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok), "
            "bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM lst, "
            "LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) "
            "AS i) t WHERE len(ws) >= 2), "
            "nb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bg), "
            "bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c "
            "FROM bg GROUP BY 1, 2) "
            "SELECT b.w1, b.w2, b.c, round(ln(b.c * "
            "(SELECT t FROM tt) * (SELECT t FROM tt) / "
            "((SELECT n FROM nb) * u1.c * u2.c)), 8) AS pmi "
            "FROM bc b JOIN uni u1 ON u1.w = b.w1 "
            "JOIN uni u2 ON u2.w = b.w2 WHERE b.c >= 5"),
        # TextRank: the docs_lm_score tokenize/bigram machinery feeding
        # the pagerank_weighted5 recursion over the symmetrized
        # co-occurrence graph (symmetric => no dangling, plain recursion)
        "docs_textrank": (
            "WITH RECURSIVE lst AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM lst, "
            "LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) "
            "AS i) t WHERE len(ws) >= 2), "
            "und AS (SELECT w1 AS a, w2 AS b FROM bg WHERE w1 <> w2 "
            "UNION ALL SELECT w2, w1 FROM bg WHERE w1 <> w2), "
            "Ew AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS wt "
            "FROM und GROUP BY 1, 2), "
            "W AS (SELECT DISTINCT a AS w FROM und), "
            "deg AS (SELECT a, sum(wt) AS d FROM Ew GROUP BY 1), "
            "pr(it, w, r) AS ("
            "SELECT 0, w, 1.0 / (SELECT count(*) FROM W) FROM W "
            "UNION ALL "
            "SELECT p.it + 1, e.b, "
            "(1.0 - 0.85) / (SELECT count(*) FROM W) + "
            "sum(e.wt * p.r / (deg.d / 0.85)) "
            "FROM pr p JOIN Ew e ON e.a = p.w "
            "JOIN deg ON deg.a = p.w "
            "WHERE p.it < 5 GROUP BY p.it, e.b) "
            "SELECT w AS word, ROUND(r, 8) AS rank FROM pr "
            "WHERE it = 5"),
        "events_retention": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "date_trunc('day', ts) AS day FROM events), "
            "c AS (SELECT user_id, min(day) AS cohort FROM d "
            "GROUP BY 1) "
            "SELECT c.cohort AS cohort_day, "
            "CAST(date_diff('day', c.cohort, d.day) AS BIGINT) "
            "AS day_offset, CAST(count(*) AS BIGINT) AS n_users "
            "FROM d JOIN c ON c.user_id = d.user_id GROUP BY 1, 2"),
        "events_topk": (
            "SELECT event_id, event_type, value FROM ("
            "SELECT event_id, event_type, value, row_number() OVER ("
            "PARTITION BY event_type ORDER BY value DESC, event_id) "
            "AS rn FROM events) WHERE rn <= 5"),
        # COALESCE: the empty-stream quantile is 0.0 on both sides
        # (NaN never round-trips a float compare)
        "events_quantiles": " UNION ALL ".join(
            f"SELECT {q} AS q, COALESCE(round(quantile_disc(value, "
            f"{q}), 8), 0.0) AS value FROM events"
            for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)),
        "modularity": (
            # Q = Σ_in/2m − Σ_c (σ_c/2m)² over the simple symmetric
            # graph, labels = vid % 16
            f"{E}, "
            "U AS (SELECT DISTINCT least(src, dst) AS a, "
            "greatest(src, dst) AS b FROM E WHERE src <> dst), "
            "S AS (SELECT a AS src, b AS dst, 1.0 AS w FROM U "
            "UNION ALL SELECT b, a, 1.0 FROM U), "
            "m2 AS (SELECT sum(w) AS m FROM S), "
            "inw AS (SELECT sum(w) AS iw FROM S "
            "WHERE src % 16 = dst % 16), "
            "sig AS (SELECT src % 16 AS c, sum(w) AS s FROM S "
            "GROUP BY 1) "
            # COALESCE: an edgeless graph has 2m = 0 — Q undefined; the
            # engine pins 0.0 there
            "SELECT COALESCE(round((SELECT COALESCE(iw, 0) FROM inw) / "
            "(SELECT m FROM m2) - (SELECT sum((s / (SELECT m FROM m2)) "
            "* (s / (SELECT m FROM m2))) FROM sig), 8), 0.0) "
            "AS modularity"),
        "assortativity": (
            f"{E}, dout AS (SELECT src, count(*) AS d FROM E GROUP BY 1), "
            "din AS (SELECT dst, count(*) AS d FROM E GROUP BY 1) "
            "SELECT round(corr(o.d * 1.0, i.d * 1.0), 8) "
            "AS assortativity FROM E e "
            "JOIN dout o ON o.src = e.src JOIN din i ON i.dst = e.dst"),
        "local_clustering": (
            f"{E}, "
            "sym AS (SELECT DISTINCT s, d FROM ("
            "SELECT src AS s, dst AS d FROM E "
            "UNION ALL SELECT dst, src FROM E) WHERE s <> d), "
            "deg AS (SELECT s, count(*) AS d FROM sym GROUP BY 1), "
            "sup AS (SELECT e.s, e.d, count(*) AS c "
            "FROM sym e JOIN sym a ON a.s = e.s "
            "JOIN sym b ON b.s = e.d AND b.d = a.d GROUP BY 1, 2), "
            "tri2 AS (SELECT s, sum(c) AS t2 FROM sup GROUP BY 1) "
            "SELECT v.vid, round(CASE WHEN COALESCE(g.d, 0) >= 2 "
            "THEN COALESCE(t.t2, 0) * 1.0 / (g.d * (g.d - 1)) "
            "ELSE 0.0 END, 8) AS coeff "
            "FROM (SELECT range::BIGINT AS vid FROM range(512)) v "
            "LEFT JOIN deg g ON g.s = v.vid "
            "LEFT JOIN tri2 t ON t.s = v.vid"),
        "transitivity": (
            # Σ_{(s,d)∈sym} |N(s)∩N(d)| = 6·triangles; Σ d(d-1) = 2·wedges
            f"{E}, "
            "sym AS (SELECT DISTINCT s, d FROM ("
            "SELECT src AS s, dst AS d FROM E "
            "UNION ALL SELECT dst, src FROM E) WHERE s <> d), "
            "deg AS (SELECT s, count(*) AS d FROM sym GROUP BY 1), "
            "tri6 AS (SELECT count(*) AS c "
            "FROM sym e JOIN sym a ON a.s = e.s "
            "JOIN sym b ON b.s = e.d AND b.d = a.d) "
            "SELECT round((SELECT c FROM tri6) * 1.0 / "
            "(SELECT sum(d * (d - 1)) FROM deg), 8) AS transitivity"),
        "avg_neighbor_degree": (
            f"{E}, P AS (SELECT DISTINCT src, dst FROM E), "
            "dout AS (SELECT src, count(*) AS d FROM P GROUP BY 1) "
            "SELECT p.src AS vid, "
            "round(avg(COALESCE(o.d, 0) * 1.0), 8) AS val "
            "FROM P p LEFT JOIN dout o ON o.src = p.dst GROUP BY 1"),
        "attack_robustness": (
            # top-25 hub removal (deg DESC, vid tie-break) + min-label
            # reach closure on the induced symmetric graph
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "sym AS (SELECT DISTINCT s, d FROM ("
            "SELECT src AS s, dst AS d FROM E "
            "UNION ALL SELECT dst, src FROM E) WHERE s <> d), "
            "deg AS (SELECT s, count(*) AS d FROM sym GROUP BY 1), "
            "removed AS (SELECT s FROM (SELECT s, row_number() OVER ("
            "ORDER BY d DESC, s) AS rn FROM deg) WHERE rn <= 25), "
            "keptv AS (SELECT range::BIGINT AS vid FROM range(512) "
            "WHERE range NOT IN (SELECT s FROM removed)), "
            "ind AS (SELECT s, d FROM sym "
            "WHERE s NOT IN (SELECT s FROM removed) "
            "AND d NOT IN (SELECT s FROM removed)), "
            "reach(vid, root) AS (SELECT vid, vid FROM keptv UNION "
            "SELECT e.d, r.root FROM reach r JOIN ind e "
            "ON e.s = r.vid), "
            "comp AS (SELECT vid, min(root) AS root FROM reach "
            "GROUP BY 1), "
            "sizes AS (SELECT root, count(*) AS c FROM comp GROUP BY 1) "
            "SELECT CAST(25 AS BIGINT) AS k_removed, "
            "(SELECT count(*) FROM keptv) AS n_kept, "
            "round(max(c) * 1.0 / (SELECT count(*) FROM keptv), 8) "
            "AS giant_frac FROM sizes"),
        "harmonic_centrality": (
            # all-sources harmonic centrality from the bounded
            # min-distance closure (t < 8 exceeds both test graphs'
            # max finite distance; they converge by t=4)
            "WITH RECURSIVE D AS (SELECT DISTINCT l_orderkey % 512 AS "
            "src, l_partkey % 512 AS dst FROM lineitem), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "reach(u, v, t) AS (SELECT vid, vid, 0 FROM V "
            "UNION "
            "SELECT r.u, e.dst, r.t + 1 FROM reach r "
            "JOIN D e ON e.src = r.v WHERE r.t < 8), "
            "dist AS (SELECT u, v, min(t) AS d FROM reach GROUP BY 1, 2) "
            "SELECT V.vid, round(COALESCE(s.h, 0.0), 8) AS val FROM V "
            "LEFT JOIN (SELECT v, sum(1.0 / d) AS h FROM dist "
            "WHERE d > 0 GROUP BY 1) s ON s.v = V.vid"),
        "random_robustness": (
            # attack_robustness with the removal set picked by smallest
            # knuth32 vid hash instead of highest degree
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "sym AS (SELECT DISTINCT s, d FROM ("
            "SELECT src AS s, dst AS d FROM E "
            "UNION ALL SELECT dst, src FROM E) WHERE s <> d), "
            "deg AS (SELECT s, count(*) AS d FROM sym GROUP BY 1), "
            "removed AS (SELECT s FROM (SELECT s, row_number() OVER ("
            "ORDER BY ((s % 4294967296) * 2654435761) % 4294967296, s) "
            "AS rn FROM deg) WHERE rn <= 25), "
            "keptv AS (SELECT range::BIGINT AS vid FROM range(512) "
            "WHERE range NOT IN (SELECT s FROM removed)), "
            "ind AS (SELECT s, d FROM sym "
            "WHERE s NOT IN (SELECT s FROM removed) "
            "AND d NOT IN (SELECT s FROM removed)), "
            "reach(vid, root) AS (SELECT vid, vid FROM keptv UNION "
            "SELECT e.d, r.root FROM reach r JOIN ind e "
            "ON e.s = r.vid), "
            "comp AS (SELECT vid, min(root) AS root FROM reach "
            "GROUP BY 1), "
            "sizes AS (SELECT root, count(*) AS c FROM comp GROUP BY 1) "
            "SELECT CAST(25 AS BIGINT) AS k_removed, "
            "(SELECT count(*) FROM keptv) AS n_kept, "
            "round(max(c) * 1.0 / (SELECT count(*) FROM keptv), 8) "
            "AS giant_frac FROM sizes"),
        "powerlaw_alpha": (
            # CSN 2009 eq. 3.7 discrete MLE at xmin=1 over in-degrees
            f"{E}, P AS (SELECT DISTINCT src, dst FROM E), "
            "din AS (SELECT dst, count(*) AS d FROM P GROUP BY 1) "
            "SELECT round(1.0 + count(*) / sum(ln(d / 0.5)), 8) "
            "AS alpha FROM din"),
        "rich_club": (
            f"{E}, "
            "sym AS (SELECT DISTINCT s, d FROM ("
            "SELECT src AS s, dst AS d FROM E "
            "UNION ALL SELECT dst, src FROM E) WHERE s <> d), "
            "deg AS (SELECT s, count(*) AS d FROM sym GROUP BY 1), "
            "kv AS (SELECT avg(d * 1.0) AS k FROM deg), "
            "rich AS (SELECT s FROM deg WHERE d > (SELECT k FROM kv)), "
            "nk AS (SELECT count(*) AS c FROM rich) "
            "SELECT round((SELECT k FROM kv), 8) AS k, "
            "(SELECT c FROM nk) AS n_k, "
            "round(count(*) * 1.0 / ((SELECT c FROM nk) * "
            "((SELECT c FROM nk) - 1)), 8) AS phi "
            "FROM sym e JOIN rich a ON a.s = e.s "
            "JOIN rich b ON b.s = e.d"),
        "pages_roundtrip": (
            # same shell construction + the same tag-strip /
            # whitespace-collapse / trim the Python extract_text applies
            "SELECT 'doc://' || doc_id AS url, "
            "trim(regexp_replace(regexp_replace("
            "'<html><head><title>doc ' || doc_id || '</title></head>"
            "<body><p>' || COALESCE(text, '') || '</p></body></html>', "
            "'<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g')) "
            "AS extracted_text FROM documents"),
        "diameter": (
            # two-sweep lower bound: BFS from 0, re-BFS from the first
            # (= smallest-vid) farthest vertex, take the larger ecc
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "b0(vid, lvl) AS ("
            "SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT) UNION "
            "SELECT e.dst, b.lvl + 1 FROM b0 b JOIN E e ON e.src = b.vid "
            "WHERE b.lvl < 30), "
            "d0 AS (SELECT vid, min(lvl) AS lvl FROM b0 GROUP BY vid), "
            "far AS (SELECT min(vid) AS u FROM d0 "
            "WHERE lvl = (SELECT max(lvl) FROM d0)), "
            "b1(vid, lvl) AS ("
            "SELECT u, CAST(0 AS BIGINT) FROM far UNION "
            "SELECT e.dst, b.lvl + 1 FROM b1 b JOIN E e ON e.src = b.vid "
            "WHERE b.lvl < 30), "
            "d1 AS (SELECT vid, min(lvl) AS lvl FROM b1 GROUP BY vid) "
            "SELECT CAST(greatest((SELECT max(lvl) FROM d0), "
            "(SELECT max(lvl) FROM d1)) AS BIGINT) AS diameter_lb"),
        "closeness": (
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "bfs(s, vid, lvl) AS ("
            "SELECT s, s, CAST(0 AS BIGINT) FROM "
            "(SELECT unnest([0, 1, 2, 3]::BIGINT[]) AS s) "
            "UNION "
            "SELECT b.s, e.dst, b.lvl + 1 FROM bfs b "
            "JOIN E e ON e.src = b.vid WHERE b.lvl < 30), "
            "d AS (SELECT s, vid, min(lvl) AS dd FROM bfs GROUP BY 1, 2) "
            "SELECT v.vid, round(COALESCE(sum(1.0 / d.dd) "
            "FILTER (WHERE d.dd > 0), 0.0), 8) AS val "
            "FROM (SELECT range::BIGINT AS vid FROM range(512)) v "
            "LEFT JOIN d ON d.vid = v.vid GROUP BY v.vid"),
        # sampling: knuth32 hash = one plain-SQL expression
        "docs_split": (
            "SELECT doc_id, CASE WHEN u < 0.8 THEN 'train' "
            "WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split "
            "FROM (SELECT doc_id, "
            "(((doc_id % 4294967296) * 2654435761) % 4294967296) "
            "/ 4294967296.0 AS u FROM documents)"),
        "docs_quota": (
            "SELECT doc_id, lang FROM ("
            "SELECT doc_id, lang, row_number() OVER ("
            "PARTITION BY lang ORDER BY "
            "(((doc_id % 4294967296) * 2654435761) % 4294967296), "
            "doc_id) AS rn FROM documents) WHERE rn <= 20"),
        "docs_mixture": (
            # temperature mixing: largest-remainder quotas of
            # 200·n^0.5/Σn^0.5 (remainder ties by source name), capped
            # at n, then the same ROW_NUMBER-over-knuth32 pick as
            # docs_quota
            "WITH cnt AS (SELECT source, count(*) AS n FROM documents "
            "GROUP BY 1), "
            "w AS (SELECT source, n, pow(n, 0.5) AS wr FROM cnt), "
            # s must be the SEQUENTIAL source-ordered fold (the engine's
            # np.sum over sorted names): a bare sum(wr) lets DuckDB's
            # parallel hash-group output order pick the fold order,
            # which flipped floor(r) at an integer boundary and made the
            # oracle nondeterministic at sf0.1 (±20 rows run-to-run);
            # the cumulative-window last row pins left-to-right order,
            # and r replicates the engine's (wr/s)*200 expression shape
            "ws AS (SELECT source, n, wr, "
            "sum(wr) OVER (ORDER BY source ROWS UNBOUNDED PRECEDING) "
            "AS cs, row_number() OVER (ORDER BY source DESC) AS rvn "
            "FROM w), "
            "tot AS (SELECT cs AS s FROM ws WHERE rvn = 1), "
            "raw AS (SELECT source, n, (wr / s) * 200 AS r "
            "FROM ws, tot), "
            "base AS (SELECT source, n, CAST(floor(r) AS BIGINT) AS b, "
            "r - floor(r) AS f FROM raw), "
            "rem AS (SELECT 200 - sum(b) AS m FROM base), "
            "quota AS (SELECT source, least(n, b + CASE WHEN "
            "row_number() OVER (ORDER BY f DESC, source) <= "
            "(SELECT m FROM rem) THEN 1 ELSE 0 END) AS q FROM base), "
            "ranked AS (SELECT doc_id, source, row_number() OVER ("
            "PARTITION BY source ORDER BY "
            "(((doc_id % 4294967296) * 2654435761) % 4294967296), "
            "doc_id) AS rn FROM documents) "
            "SELECT doc_id, source FROM ranked JOIN quota USING (source) "
            "WHERE rn <= q"),
        "docs_bm25": (
            "WITH tok AS (SELECT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(text, '\\s+')) AS w "
            "FROM documents) WHERE w <> ''), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), "
            "stats AS (SELECT (SELECT count(*) FROM documents) AS N, "
            "(SELECT count(*) FROM tok) * 1.0 "
            "/ (SELECT count(*) FROM documents) AS avgdl), "
            "tf AS (SELECT doc_id, w, count(*) AS tf FROM tok WHERE w IN "
            "('customer', 'fast', 'filter', 'hash', 'join', 'order', "
            "'scan') GROUP BY 1, 2), "
            "df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1), "
            "q(qid, w) AS (VALUES ('q0', 'hash'), ('q0', 'join'), "
            "('q1', 'fast'), ('q1', 'scan'), ('q1', 'filter'), "
            "('q2', 'customer'), ('q2', 'order')), "
            "scored AS (SELECT q.qid, tf.doc_id, "
            "sum(ln(1 + ((SELECT N FROM stats) - df.df + 0.5) "
            "/ (df.df + 0.5)) * tf.tf * 2.2 "
            "/ (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl "
            "/ (SELECT avgdl FROM stats)))) AS s "
            "FROM q JOIN tf ON tf.w = q.w "
            "JOIN dl ON dl.doc_id = tf.doc_id "
            "JOIN df ON df.w = tf.w GROUP BY 1, 2), "
            "ranked AS (SELECT qid, doc_id, s, row_number() OVER ("
            "PARTITION BY qid ORDER BY s DESC, doc_id) AS rn FROM scored) "
            "SELECT qid, doc_id, ROUND(s, 6) AS score FROM ranked "
            "WHERE rn <= 10"),
        # neighborhood-Jaccard link prediction: E is already the distinct
        # (src, dst) pattern (its GROUP BY), so common-neighbor counts are
        # a self-join on dst; jaccard = common/(du+dv-common) is a single
        # exact-integer-operand division → bit-identical to the Ray path.
        "link_jaccard": (
            f"{E}, "
            "deg AS (SELECT src AS v, count(*) AS d FROM E GROUP BY 1), "
            "c AS (SELECT a.src AS u, b.src AS v, count(*) AS common "
            "FROM E a JOIN E b ON a.dst = b.dst AND a.src < b.src "
            "GROUP BY 1, 2) "
            "SELECT c.u, c.v, c.common, "
            "c.common / (du.d + dv.d - c.common) AS jaccard "
            "FROM c JOIN deg du ON du.v = c.u JOIN deg dv ON dv.v = c.v "
            "WHERE c.common >= 2"),
        # full overlap-score family: every output is ONE float op over
        # exact-integer operands (count, +, *, sqrt, /) → bit-identical
        # to the Ray path regardless of evaluation order
        "link_scores": (
            f"{E}, "
            "deg AS (SELECT src AS v, count(*) AS d FROM E GROUP BY 1), "
            "c AS (SELECT a.src AS u, b.src AS v, count(*) AS common "
            "FROM E a JOIN E b ON a.dst = b.dst AND a.src < b.src "
            "GROUP BY 1, 2) "
            "SELECT c.u, c.v, c.common, "
            "c.common / (du.d + dv.d - c.common) AS jaccard, "
            "c.common / sqrt(du.d * dv.d) AS cosine, "
            "du.d * dv.d AS preferential "
            "FROM c JOIN deg du ON du.v = c.u JOIN deg dv ON dv.v = c.v "
            "WHERE c.common >= 2"),
        # Gopher repetition metrics: same tokenize as docs_bm25; bigrams
        # via list indexing (chr(31) joiner can't occur inside a token);
        # every division has exact BIGINT operands → bit-identical doubles.
        "docs_repetition": (
            "WITH tok AS (SELECT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(text, '\\s+')) AS w "
            "FROM documents) WHERE w <> ''), "
            "cnt AS (SELECT doc_id, w, count(*) AS c FROM tok "
            "GROUP BY 1, 2), "
            "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total, "
            "count(*) AS uniq, max(c) AS topc FROM cnt GROUP BY 1), "
            "lst AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "bg AS (SELECT doc_id, ws[i] || chr(31) || ws[i+1] AS b "
            "FROM lst, LATERAL (SELECT unnest("
            "generate_series(1, len(ws) - 1)) AS i) t "
            "WHERE len(ws) >= 2), "
            "bcnt AS (SELECT doc_id, b, count(*) AS c FROM bg "
            "GROUP BY 1, 2), "
            "bagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS btotal, "
            "count(*) AS buniq FROM bcnt GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(a.total, 0) AS words, "
            "CASE WHEN a.total > 0 THEN 1 - a.uniq / a.total "
            "ELSE 0.0 END AS dup_word_frac, "
            "CASE WHEN a.total > 0 THEN a.topc / a.total "
            "ELSE 0.0 END AS top_word_frac, "
            "CASE WHEN b.btotal > 0 THEN 1 - b.buniq / b.btotal "
            "ELSE 0.0 END AS dup_bigram_frac "
            "FROM documents d LEFT JOIN agg a USING (doc_id) "
            "LEFT JOIN bagg b USING (doc_id)"),
        # decontamination: any shared word 3-gram with the doc_id%20==0
        # benchmark slice drops a train doc; same tokenize + chr(31)
        # joiner as docs_repetition (hash-chain vs string grams agree up
        # to 64-bit collisions)
        "docs_decontaminate": (
            "WITH lst AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "tri AS (SELECT doc_id, ws[i] || chr(31) || ws[i+1] || "
            "chr(31) || ws[i+2] AS g "
            "FROM lst, LATERAL (SELECT unnest("
            "generate_series(1, len(ws) - 2)) AS i) t "
            "WHERE len(ws) >= 3), "
            "bench AS (SELECT DISTINCT g FROM tri WHERE doc_id % 20 = 0), "
            "bad AS (SELECT DISTINCT doc_id FROM tri "
            "WHERE doc_id % 20 <> 0 AND g IN (SELECT g FROM bench)) "
            "SELECT doc_id FROM documents WHERE doc_id % 20 <> 0 "
            "AND doc_id NOT IN (SELECT doc_id FROM bad)"),
        # PII redaction: same RE2 patterns, same order (counts taken
        # BEFORE each replace, on the previous stage's text — matching
        # the Arrow kernel chain)
        "docs_pii": (
            "WITH s0 AS (SELECT doc_id, COALESCE(text, '') AS text "
            "FROM documents), "
            "s1 AS (SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) "
            "AS BIGINT) AS n_email, regexp_replace(text, "
            "'[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g') AS text FROM s0), "
            "s2 AS (SELECT doc_id, n_email, CAST(len(regexp_extract_all("
            "text, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) "
            "AS n_ip, regexp_replace(text, "
            "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS text "
            "FROM s1) "
            "SELECT doc_id, regexp_replace(text, "
            "'\\+?\\d[\\d\\-\\s()]{7,}\\d', '<PHONE>', 'g') AS text, "
            "n_email, n_ip, CAST(len(regexp_extract_all(text, "
            "'\\+?\\d[\\d\\-\\s()]{7,}\\d')) AS BIGINT) AS n_phone "
            "FROM s2"),
        # the URLCanonicalizer rule chain replayed step-for-step in DuckDB
        # RE2 over the same deterministic messy-URL synthesis
        "docs_url_canon": (
            "WITH base AS (SELECT doc_id, 'HTTP://WWW.Site' || "
            "(doc_id % 5) || '.COM:80/' || source || '/p' || doc_id || "
            "CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&next=1#top' "
            "WHEN 1 THEN '/' WHEN 2 THEN '?a=1&utm_campaign=x&b=2' "
            "ELSE '#sec' END AS url FROM documents), "
            "c1 AS (SELECT doc_id, regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(regexp_replace(trim(url), "
            "'#.*$', '', 'g'), "
            "'(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '', 'g'), "
            "'&{2,}', '&', 'g'), '\\?&', '?', 'g'), "
            "'[?&]+$', '', 'g') AS u FROM base), "
            "c2 AS (SELECT doc_id, "
            "lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', "
            "1)) AS scheme, "
            "lower(regexp_extract(u, "
            "'^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS host, "
            "regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', "
            "'') AS rest FROM c1), "
            "c3 AS (SELECT doc_id, scheme || '://' || "
            "CASE WHEN scheme = 'http' THEN regexp_replace("
            "regexp_replace(host, '^www\\.', ''), ':80$', '') "
            "WHEN scheme = 'https' THEN regexp_replace("
            "regexp_replace(host, '^www\\.', ''), ':443$', '') "
            "ELSE regexp_replace(host, '^www\\.', '') END || rest AS u "
            "FROM c2) "
            "SELECT doc_id, regexp_replace(u, '/$', '') AS canon_url "
            "FROM c3"),
        # exact substring dedup: 8-token windows via list slicing (chr(31)
        # joiner); a window string occurring >= 2 times flags every one of
        # its (doc_id, pos) occurrences — hash-chain vs string windows
        # agree up to 64-bit collisions
        "docs_dup_spans": (
            "WITH lst AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "win AS (SELECT doc_id, i - 1 AS pos, array_to_string("
            "list_slice(ws, i, i + 7), chr(31)) AS g "
            "FROM lst, LATERAL (SELECT unnest("
            "generate_series(1, len(ws) - 7)) AS i) t "
            "WHERE len(ws) >= 8), "
            "dup AS (SELECT g FROM win GROUP BY g HAVING count(*) >= 2) "
            "SELECT doc_id, pos FROM win "
            "WHERE g IN (SELECT g FROM dup)"),
        # 2 forced synchronous LPA iterations, unrolled: per iteration
        # each vertex takes the most frequent in-neighbor label over the
        # SET-union symmetrized graph, ties → smallest label, keeps its
        # own when it has no neighbors
        "lpa_iter2": (
            f"{E}, "
            "sym AS (SELECT DISTINCT s, d FROM ("
            "SELECT src AS s, dst AS d FROM E "
            "UNION ALL SELECT dst, src FROM E)), "
            "verts AS (SELECT range AS v FROM range(512)), "
            "lab0 AS (SELECT v, v AS lab FROM verts), "
            "votes1 AS (SELECT sym.d AS v, l.lab, count(*) AS c "
            "FROM sym JOIN lab0 l ON l.v = sym.s GROUP BY 1, 2), "
            "mode1 AS (SELECT v, lab, row_number() OVER ("
            "PARTITION BY v ORDER BY c DESC, lab) AS rn FROM votes1), "
            "lab1 AS (SELECT l.v, COALESCE(m.lab, l.lab) AS lab "
            "FROM lab0 l LEFT JOIN (SELECT v, lab FROM mode1 "
            "WHERE rn = 1) m ON m.v = l.v), "
            "votes2 AS (SELECT sym.d AS v, l.lab, count(*) AS c "
            "FROM sym JOIN lab1 l ON l.v = sym.s GROUP BY 1, 2), "
            "mode2 AS (SELECT v, lab, row_number() OVER ("
            "PARTITION BY v ORDER BY c DESC, lab) AS rn FROM votes2), "
            "lab2 AS (SELECT l.v, COALESCE(m.lab, l.lab) AS lab "
            "FROM lab1 l LEFT JOIN (SELECT v, lab FROM mode2 "
            "WHERE rn = 1) m ON m.v = l.v) "
            "SELECT v AS vid, lab AS label FROM lab2"),
        # per-edge triangle support: common-neighbor count over the
        # simple undirected graph — only pairs with >= 1 shared neighbor
        # materialize (the masked plus_pair mxm's structural sparsity)
        "edge_support": (
            f"{E}, "
            "sym AS (SELECT DISTINCT s, d FROM ("
            "SELECT src AS s, dst AS d FROM E "
            "UNION ALL SELECT dst, src FROM E) WHERE s <> d) "
            "SELECT e.s AS src, e.d AS dst, "
            "CAST(count(*) AS BIGINT) AS val "
            "FROM sym e JOIN sym a ON a.s = e.s "
            "JOIN sym b ON b.s = e.d AND b.d = a.d "
            "GROUP BY 1, 2")}
    base["docs_ccnet_buckets"] = (
        # tertile cuts over the docs_lm_score result (nested WITH is
        # valid CTE-body SQL); boundary rule matches the sketch's
        # searchsorted(left): tail iff score <= q1, middle iff <= q2
        "WITH scores AS (" + base["docs_lm_score"] + "), "
        "cuts AS (SELECT quantile_disc(lm_score, 1.0/3) AS q1, "
        "quantile_disc(lm_score, 2.0/3) AS q2 FROM scores) "
        "SELECT doc_id, lm_score, CASE WHEN lm_score <= q1 THEN 'tail' "
        "WHEN lm_score <= q2 THEN 'middle' ELSE 'head' END AS bucket "
        "FROM scores, cuts")
    base["power2_minplus"] = (
        f"{E} SELECT a.src, b.dst, min(a.val + b.val) AS val "
        "FROM E a JOIN E b ON a.dst = b.src "
        "WHERE (SELECT count(*) FROM lineitem) <= 200000 OR a.src < 64 GROUP BY 1, 2")
    # '' doubles the quote inside the SQL string literal; both engines
    # run the identical RE2 pattern.
    _bpe_sql = _BPE_PAT.replace("'", "''")
    base["docs_bpe_tokens"] = (
        f"SELECT doc_id, COALESCE(CAST(length(regexp_extract_all(text, "
        f"'{_bpe_sql}')) AS BIGINT), 0) AS n_bpe_tokens FROM documents")
    base["edge_sample"] = (
        f"{E} SELECT src, dst, val FROM E "
        "WHERE ((src * 512 + dst) * 2654435761) % 4294967296 % 5 = 0")
    base["degree_histogram"] = (
        f"{E}, d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg "
        "FROM E GROUP BY 1) "
        "SELECT deg, CAST(count(*) AS BIGINT) AS n_vertices "
        "FROM d GROUP BY 1")
    base["component_sizes"] = (
        "WITH cc AS (" + base["connected_components"] + "), "
        "s AS (SELECT comp, CAST(count(*) AS BIGINT) AS size "
        "FROM cc GROUP BY 1) "
        "SELECT size, CAST(count(*) AS BIGINT) AS n_components "
        "FROM s GROUP BY 1")
    # splitmix64 in SQL: uint64 values live as non-negative HUGEINTs;
    # xor round-trips through the BIGINT bit pattern, multiplication
    # decomposes 32/32 so the 128-bit intermediate never overflows,
    # right-shifts are integer division by a LITERAL power of two
    # (HUGEINT ** returns DOUBLE — off-by-one hazard). Verified equal to
    # numpy's splitmix64 on edge cases incl. 2^64-1.
    M64 = "18446744073709551616"

    def _u64(e):
        return f"((({e}) % {M64} + {M64}) % {M64})"

    def _tos(e):
        return (f"CAST(CASE WHEN ({e}) >= 9223372036854775808 "
                f"THEN ({e}) - {M64} ELSE ({e}) END AS BIGINT)")

    def _bx(a, b):
        return _u64(f"CAST(xor({_tos(a)}, {_tos(b)}) AS HUGEINT)")

    def _mulmod(a, c):
        hi = _u64(f"{_u64(f'(({a}) // 4294967296) * {c}')} * 4294967296")
        lo = _u64(f"(({a}) % 4294967296) * {c}")
        return _u64(f"{hi} + {lo}")

    def _sm64_stages_cols(tag, cur, carry, x_expr):
        """CTE stages computing h = splitmix64(x_expr) for every row of
        ``cur``, carrying the ``carry`` columns through — one
        intermediate per stage so no expression blow-up."""
        c = "".join(f"{col}, " for col in carry)
        return (
            f"{tag}a AS (SELECT {c}"
            f"{_u64(f'{x_expr} + 11400714819323198485')} AS z FROM {cur}), "
            f"{tag}b AS (SELECT {c}{_bx('z', 'z // 1073741824')} AS y FROM {tag}a), "
            f"{tag}c AS (SELECT {c}{_mulmod('y', '13787848793156543929')} AS z FROM {tag}b), "
            f"{tag}d AS (SELECT {c}{_bx('z', 'z // 134217728')} AS y FROM {tag}c), "
            f"{tag}e AS (SELECT {c}{_mulmod('y', '10723151780598845931')} AS z FROM {tag}d), "
            f"{tag}f AS (SELECT {c}{_bx('z', 'z // 2147483648')} AS h FROM {tag}e)")

    def _sm64_stages(tag, cur, add_const):
        return _sm64_stages_cols(tag, cur, ["w", "pos"],
                                 f"CAST(w AS HUGEINT) + {add_const}")

    def _walk_step(out, cur_h):
        return (
            f"{out} AS (SELECT s.w, CAST(CASE WHEN s.pos < 0 THEN -1 "
            "WHEN d.dg IS NULL THEN -1 ELSE n.nb END AS BIGINT) AS pos "
            f"FROM {cur_h} s LEFT JOIN deg d ON d.v = s.pos "
            f"LEFT JOIN nbr n ON n.v = s.pos AND n.rk = (s.h % d.dg))")

    base["random_walk2"] = (
        "WITH D AS (SELECT DISTINCT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "deg AS (SELECT dst AS v, CAST(count(*) AS HUGEINT) AS dg "
        "FROM D GROUP BY 1), "
        "nbr AS (SELECT dst AS v, src AS nb, CAST(row_number() OVER ("
        "PARTITION BY dst ORDER BY src) - 1 AS HUGEINT) AS rk FROM D), "
        "w0 AS (SELECT vid AS w, vid AS pos FROM V), "
        + _sm64_stages("s0", "w0", "0") + ", "
        + _walk_step("w1", "s0f") + ", "
        + _sm64_stages("s1", "w1", "4294967296") + ", "
        + _walk_step("w2", "s1f") + " "
        "SELECT w, CAST(0 AS BIGINT) AS step, pos AS vid FROM w0 "
        "UNION ALL SELECT w, 1, pos FROM w1 "
        "UNION ALL SELECT w, 2, pos FROM w2")

    def _wl_round(r):
        # One WL round: neighbor-hash sum (wrapping mod 2^64) + offset
        # self hash. Label CTEs are MATERIALIZED — each is referenced by
        # THREE downstream chains, and DuckDB's default inlining would
        # re-evaluate the whole upstream recursion per reference.
        return (
            _sm64_stages_cols(f"wn{r}", f"l{r}", ["vid"], "lab") + ", "
            f"ws{r} AS MATERIALIZED (SELECT e.dst AS vid, "
            f"{_u64('SUM(h.h)')} AS s FROM D e JOIN wn{r}f h "
            "ON h.vid = e.src GROUP BY e.dst), "
            + _sm64_stages_cols(f"wm{r}", f"l{r}", ["vid"],
                                "lab + 4294967296") + ", "
            f"l{r + 1} AS MATERIALIZED (SELECT m.vid, "
            f"{_u64('m.h + COALESCE(s.s, 0)')} AS lab FROM wm{r}f m "
            f"LEFT JOIN ws{r} s ON s.vid = m.vid)")

    base["wl_refine2"] = (
        # 1-WL sum-hash refinement, 2 rounds: label0 = in-degree over
        # the DEDUPED edges; label_{k+1} = (sm64(label_k + 2^32) +
        # SUM_in sm64(label_k(u))) mod 2^64 — the signature rides the
        # packed key as its signed-int64 bit pattern.
        "WITH D AS MATERIALIZED (SELECT DISTINCT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "l0 AS MATERIALIZED (SELECT v.vid, "
        "CAST(COALESCE(d.dg, 0) AS HUGEINT) AS lab FROM V v LEFT JOIN "
        "(SELECT dst, CAST(count(*) AS HUGEINT) AS dg FROM D "
        "GROUP BY 1) d ON d.dst = v.vid), "
        + _wl_round(0) + ", "
        + _wl_round(1) + " "
        f"SELECT l2.vid, {_tos('l2.lab')} AS sig, "
        "CAST(l0.lab AS DOUBLE) AS deg FROM l2 "
        "JOIN l0 ON l0.vid = l2.vid")

    # mean-scaled second-moment matrix of the embedding table; elements
    # CAST to DOUBLE before multiplying so per-term products are exact
    # (float32 storage), leaving only summation-order noise under the
    # round-8 grain. 1-based list indexing -> 0-based (i, j) output.
    _emb_gram_cte = (
        "WITH x AS MATERIALIZED (SELECT vec_id, CAST(t.i AS BIGINT) AS i, "
        "CAST(embedding[t.i] AS DOUBLE) AS v FROM embeddings, "
        "range(1, 65) t(i)), "
        "g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, "
        "SUM(a.v * b.v) / (SELECT count(*) FROM embeddings) AS v "
        "FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2)")
    base["embed_gram"] = (
        _emb_gram_cte
        + " SELECT i - 1 AS i, j - 1 AS j, ROUND(v, 8) AS v FROM g")
    base["embed_pc1"] = (
        # two unnormalized power-iteration matvecs from the all-ones
        # start, replaying pc1_power(g, iters=2) on the UNROUNDED gram
        _emb_gram_cte + ", "
        "y1 AS (SELECT i, SUM(v) AS y FROM g GROUP BY 1), "
        "y2 AS (SELECT g.i, SUM(g.v * y1.y) AS y FROM g "
        "JOIN y1 ON y1.i = g.j GROUP BY 1) "
        "SELECT i - 1 AS i, ROUND(y, 8) AS v FROM y2")

    base["embed_rp8"] = (
        # JL sign projection: sign(j,i) = bit 0 of splitmix64(j*64+i),
        # y(vec,j) = sum_i x_i * sign — signs replayed via the shared
        # splitmix64 stages, elements CAST to DOUBLE (exact float32
        # widening), round-8 over the 64-term sums
        "WITH ix AS (SELECT CAST(range AS HUGEINT) AS x, "
        "CAST(range // 64 AS BIGINT) AS j, "
        "CAST(range % 64 AS BIGINT) AS i FROM range(512)), "
        + _sm64_stages_cols("rp", "ix", ["j", "i"], "x") + ", "
        "sg AS (SELECT j, i, CASE WHEN h % 2 = 1 THEN CAST(1 AS DOUBLE) "
        "ELSE CAST(-1 AS DOUBLE) END AS s FROM rpf), "
        "xe AS (SELECT vec_id, CAST(t.i - 1 AS BIGINT) AS i, "
        "CAST(embedding[t.i] AS DOUBLE) AS v FROM embeddings, "
        "range(1, 65) t(i)) "
        "SELECT xe.vec_id, sg.j, ROUND(SUM(xe.v * sg.s), 8) AS v "
        "FROM xe JOIN sg ON sg.i = xe.i GROUP BY 1, 2")

    base["docs_rrf"] = (
        # RRF = 1/(60+r_lex) + 1/(60+r_quality): the bm25 chain selects
        # each query's top-10 by unrounded score (same selection as
        # docs_bm25), re-ranked on ROUND(s,6) within the subset; the
        # lm chain ranks ALL docs by (round-8 score DESC, doc_id)
        "WITH tok AS MATERIALIZED (SELECT doc_id, w FROM (SELECT doc_id, "
        "unnest(string_split_regex(text, '\\s+')) AS w "
        "FROM documents) WHERE w <> ''), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), "
        "stats AS (SELECT (SELECT count(*) FROM documents) AS N, "
        "(SELECT count(*) FROM tok) * 1.0 "
        "/ (SELECT count(*) FROM documents) AS avgdl), "
        "tf AS (SELECT doc_id, w, count(*) AS tf FROM tok WHERE w IN "
        "('customer', 'fast', 'filter', 'hash', 'join', 'order', "
        "'scan') GROUP BY 1, 2), "
        "df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1), "
        "q(qid, w) AS (VALUES ('q0', 'hash'), ('q0', 'join'), "
        "('q1', 'fast'), ('q1', 'scan'), ('q1', 'filter'), "
        "('q2', 'customer'), ('q2', 'order')), "
        "scored AS (SELECT q.qid, tf.doc_id, "
        "sum(ln(1 + ((SELECT N FROM stats) - df.df + 0.5) "
        "/ (df.df + 0.5)) * tf.tf * 2.2 "
        "/ (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl "
        "/ (SELECT avgdl FROM stats)))) AS s "
        "FROM q JOIN tf ON tf.w = q.w "
        "JOIN dl ON dl.doc_id = tf.doc_id "
        "JOIN df ON df.w = tf.w GROUP BY 1, 2), "
        "sub AS MATERIALIZED (SELECT qid, doc_id, s FROM ("
        "SELECT qid, doc_id, s, row_number() OVER (PARTITION BY qid "
        "ORDER BY s DESC, doc_id) AS rn FROM scored) WHERE rn <= 10), "
        "lexr AS (SELECT qid, doc_id, row_number() OVER ("
        "PARTITION BY qid ORDER BY ROUND(s, 6) DESC, doc_id) AS r1 "
        "FROM sub), "
        "lst AS (SELECT doc_id, list_filter("
        "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "uni AS (SELECT w, count(*) AS c FROM (SELECT unnest(ws) AS w "
        "FROM lst) GROUP BY 1), "
        "vc AS (SELECT count(*) AS v FROM uni), "
        "bg AS MATERIALIZED (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 "
        "FROM lst, LATERAL (SELECT unnest(generate_series(1, "
        "len(ws) - 1)) AS i) t WHERE len(ws) >= 2), "
        "bcnt AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2), "
        "lp AS (SELECT b.doc_id, ln((bc.c + 1.0) / (u.c + v.v)) AS l "
        "FROM bg b JOIN bcnt bc ON bc.w1 = b.w1 AND bc.w2 = b.w2 "
        "JOIN uni u ON u.w = b.w1 CROSS JOIN vc v), "
        "lmsc AS MATERIALIZED (SELECT d.doc_id, "
        "round(COALESCE(avg(l), 0.0), 8) AS lm FROM documents d "
        "LEFT JOIN lp USING (doc_id) GROUP BY d.doc_id), "
        "qr AS (SELECT doc_id, row_number() OVER ("
        "ORDER BY lm DESC, doc_id) AS r2 FROM lmsc) "
        "SELECT x.qid, x.doc_id, ROUND(1.0 / (60 + x.r1) "
        "+ 1.0 / (60 + qr.r2), 8) AS rrf "
        "FROM lexr x JOIN qr USING (doc_id)")

    base["events_cms_users"] = (
        # Count-Min replay: bucket(u, r) = splitmix64(u + r*2^32) % 128,
        # row counters = sum of true per-user counts landing in the
        # bucket, estimate = min over the 4 rows
        "WITH u AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS c "
        "FROM events GROUP BY 1), "
        "ix AS (SELECT user_id, t.r, CAST(user_id AS HUGEINT) + "
        "CAST(t.r AS HUGEINT) * 4294967296 AS x FROM u, range(4) t(r)), "
        + _sm64_stages_cols("cm", "ix", ["user_id", "r"], "x") + ", "
        "bk AS MATERIALIZED (SELECT user_id, r, "
        "CAST(h % 128 AS BIGINT) AS b FROM cmf), "
        "ct AS MATERIALIZED (SELECT bk.r, bk.b, SUM(u.c) AS cnt "
        "FROM bk JOIN u USING (user_id) GROUP BY 1, 2) "
        "SELECT bk.user_id, CAST(MIN(ct.cnt) AS DOUBLE) AS est "
        "FROM bk JOIN ct ON ct.r = bk.r AND ct.b = bk.b GROUP BY 1")

    base["events_priority_sample"] = (
        # Duffield-Lund-Thorup priority sampling, k=20: u = ((h >> 11)
        # + 1) * 2^-53 is EXACTLY representable, so q = w/u and
        # est = max(w, tau) are single exactly-rounded IEEE divisions
        # — bit-exact vs numpy, no rounding grain
        "WITH w AS (SELECT user_id, count(*) AS w "
        "FROM events GROUP BY 1), "
        "ix AS (SELECT user_id, w, CAST(user_id AS HUGEINT) AS x "
        "FROM w), "
        + _sm64_stages_cols("ps", "ix", ["user_id", "w"], "x") + ", "
        "q AS (SELECT user_id, w, CAST(w AS DOUBLE) / "
        "((CAST(h // 2048 AS DOUBLE) + 1.0) / 9007199254740992.0) AS q "
        "FROM psf), "
        "r AS (SELECT user_id, w, q, "
        "row_number() OVER (ORDER BY q DESC, user_id) AS rn FROM q), "
        "tau AS (SELECT COALESCE((SELECT q FROM r WHERE rn = 21), 0.0) "
        "AS tau) "
        "SELECT rn AS rank, user_id, "
        "GREATEST(CAST(w AS DOUBLE), tau.tau) AS est "
        "FROM r, tau WHERE rn <= 20")

    base["host_rank3"] = (
        # contract to 64 hosts ((x%512)%64 == x%64), weight = inter-host
        # link count, then the weighted fixed-iteration PageRank
        # recursion (same recipe as pagerank_weighted5, 3 supersteps)
        "WITH RECURSIVE H AS (SELECT l_orderkey % 64 AS src, "
        "l_partkey % 64 AS dst, CAST(count(*) AS DOUBLE) AS wt "
        "FROM lineitem GROUP BY 1, 2), "
        "deg AS (SELECT src AS vid, sum(wt) AS d FROM H GROUP BY 1), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(64)), "
        "C AS (SELECT src, dst, wt FROM H "
        "UNION ALL SELECT vid, vid, 0.0 FROM V), "
        "pr(it, vid, r) AS ("
        "SELECT 0, vid, 1.0 / 64 FROM V "
        "UNION ALL "
        "SELECT p.it + 1, c.dst, (1.0 - 0.85) / 64 + "
        "sum(c.wt * COALESCE(p.r / (deg.d / 0.85), 0.0)) "
        "FROM pr p JOIN C c ON c.src = p.vid "
        "LEFT JOIN deg ON deg.vid = p.vid "
        "WHERE p.it < 3 GROUP BY p.it, c.dst) "
        "SELECT vid AS host, ROUND(r, 8) AS rank FROM pr WHERE it = 3")

    base["events_transitions"] = (
        # consecutive same-user event pairs ordered by (ts, event_id)
        "WITH s AS (SELECT user_id, event_type AS a, "
        "LEAD(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS b FROM events) "
        "SELECT a AS src_type, b AS dst_type, "
        "CAST(count(*) AS DOUBLE) AS n FROM s "
        "WHERE b IS NOT NULL GROUP BY 1, 2")
    base["minhash_sig4"] = (
        # MinHash over vocabulary ranks: dense rank of the sorted
        # distinct tokens is the permutation seed (UTF-8 byte order ==
        # numpy's searchsorted order), hashed per permutation with the
        # same splitmix64 stages; signatures stay exact-integer as the
        # signed-int64 bit pattern of the uint64 minimum.
        r"WITH tok AS (SELECT doc_id, unnest(string_split_regex("
        r"COALESCE(text, ''), '\s+')) AS w FROM documents), "
        "nz AS (SELECT doc_id, w FROM tok WHERE w <> ''), "
        "voc AS (SELECT w, CAST(row_number() OVER (ORDER BY w) - 1 "
        "AS HUGEINT) AS vid FROM (SELECT DISTINCT w FROM nz)), "
        "tv AS (SELECT n.doc_id, v.vid FROM nz n JOIN voc v "
        "ON v.w = n.w), "
        "th AS (SELECT doc_id, hx, "
        "vid + CAST(hx AS HUGEINT) * 4294967296 AS x FROM tv, "
        "unnest(generate_series(0, 3)) AS t(hx)), "
        + _sm64_stages_cols("mh", "th", ["doc_id", "hx"], "x") + ", "
        "mins AS (SELECT doc_id, hx, min(h) AS m FROM mhf "
        "GROUP BY 1, 2) "
        "SELECT doc_id, CAST(hx AS BIGINT) AS h, "
        "CAST(CASE WHEN m >= 9223372036854775808 "
        "THEN m - 18446744073709551616 ELSE m END AS BIGINT) AS sig "
        "FROM mins")
    base["revenue_by_nation"] = (
        "SELECT n.n_name, r.r_name, "
        "ROUND(sum(o.o_totalprice), 4) AS revenue "
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "JOIN region r ON r.r_regionkey = n.n_regionkey "
        "GROUP BY 1, 2")
    # CDC boundaries: gear table = splitmix64(byte ^ 0xC0FFEE); the
    # 64-byte window W[i] = Σ_{j<64} gear(b[i-j])·2^j mod 2^64 as 64
    # LAG terms (each u64-wrapped so the HUGEINT sum stays < 2^70);
    # boundary where the low 8 bits vanish and the window fits the doc.
    _w_terms = " + ".join(
        _u64(f"COALESCE(lag(g, {j}) OVER win, 0) * {1 << j}")
        for j in range(64))
    base["docs_cdc_bounds"] = (
        "WITH chars AS MATERIALIZED (SELECT doc_id, "
        "unicode(unnest(string_split(text, ''))) AS bv, "
        "generate_subscripts(string_split(text, ''), 1) - 1 AS i "
        "FROM documents WHERE text IS NOT NULL AND text <> ''), "
        "bvals AS (SELECT CAST(range AS HUGEINT) AS b FROM range(256)), "
        "b0 AS (SELECT b, " + _bx("b", "12648430") + " AS x FROM bvals), "
        + _sm64_stages_cols("gr", "b0", ["b"], "x") + ", "
        "g AS MATERIALIZED (SELECT c.doc_id, c.i, ge.h AS g "
        "FROM chars c JOIN grf ge ON ge.b = c.bv), "
        f"w AS MATERIALIZED (SELECT doc_id, i, {_u64(_w_terms)} AS wv "
        "FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY i)), "
        "cand AS (SELECT doc_id, i FROM w WHERE wv % 256 = 0 "
        "AND i >= 63), "
        "cuts AS (SELECT doc_id, i + 1 AS cut FROM cand "
        "UNION SELECT doc_id, length(text) FROM documents "
        "WHERE text IS NOT NULL AND text <> '') "
        "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id "
        "ORDER BY cut) - 1 AS BIGINT) AS chunk_ix, "
        "CAST(COALESCE(lag(cut) OVER (PARTITION BY doc_id "
        "ORDER BY cut), 0) AS BIGINT) AS start, "
        "CAST(cut - COALESCE(lag(cut) OVER (PARTITION BY doc_id "
        "ORDER BY cut), 0) AS BIGINT) AS length FROM cuts")
    # single-source Brandes, unrolled by BFS level (L=8 exceeds both
    # test graphs' eccentricity from vertex 0): σ forward — σ(v at
    # level k) = Σ cnt(u,v)·σ(u) over level-(k−1) in-edges, exact
    # integers — then δ backward — δ(u at k−1) = σ(u)·Σ cnt(u,w)·
    # (1+δ(w))/σ(w) over level-k out-edges. bc = δ (source 0 excluded).
    _BC_L = 8
    _bc_parts = [
        "WITH RECURSIVE Ew AS (SELECT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst, CAST(count(*) AS DOUBLE) AS cnt "
        "FROM lineitem GROUP BY 1, 2), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "reach(vid, t) AS (SELECT CAST(0 AS BIGINT), 0 UNION "
        f"SELECT e.dst, r.t + 1 FROM reach r JOIN Ew e "
        f"ON e.src = r.vid WHERE r.t < {_BC_L}), "
        "lv AS MATERIALIZED (SELECT vid, min(t) AS d "
        "FROM reach GROUP BY 1), "
        "sg0 AS (SELECT CAST(0 AS BIGINT) AS vid, "
        "CAST(1.0 AS DOUBLE) AS sig)"]
    for k in range(1, _BC_L + 1):
        _bc_parts.append(
            f"sg{k} AS MATERIALIZED (SELECT e.dst AS vid, "
            f"sum(s.sig * e.cnt) AS sig FROM sg{k - 1} s "
            f"JOIN Ew e ON e.src = s.vid "
            f"JOIN lv d ON d.vid = e.dst AND d.d = {k} GROUP BY 1)")
    _bc_parts.append(
        "sigma AS MATERIALIZED (" + " UNION ALL ".join(
            f"SELECT vid, sig FROM sg{k}" for k in range(_BC_L + 1))
        + ")")
    _bc_parts.append(
        f"dl{_BC_L} AS MATERIALIZED (SELECT vid, CAST(0.0 AS DOUBLE) AS dl "
        f"FROM lv WHERE d = {_BC_L})")
    for k in range(_BC_L, 0, -1):
        _bc_parts.append(
            f"dl{k - 1} AS MATERIALIZED (SELECT u.vid, su.sig * "
            f"sum(e.cnt * (1.0 + COALESCE(w.dl, 0.0)) / sw.sig) AS dl "
            f"FROM lv u JOIN Ew e ON e.src = u.vid "
            f"JOIN lv lw ON lw.vid = e.dst AND lw.d = {k} "
            f"JOIN sigma su ON su.vid = u.vid "
            f"JOIN sigma sw ON sw.vid = e.dst "
            f"LEFT JOIN dl{k} w ON w.vid = e.dst "
            f"WHERE u.d = {k - 1} GROUP BY u.vid, su.sig)")
    _bc_parts.append(
        "delta AS (" + " UNION ALL ".join(
            f"SELECT vid, dl FROM dl{k}" for k in range(_BC_L + 1))
        + ")")
    base["betweenness_s0"] = (
        ", ".join(_bc_parts)
        + " SELECT V.vid, ROUND(CASE WHEN V.vid = 0 THEN 0.0 "
        "ELSE COALESCE(d.dl, 0.0) END, 8) AS val FROM V "
        "LEFT JOIN delta d ON d.vid = V.vid")

    def _perc_leg(mk):
        return (
            f"SELECT {mk * 20} AS keep_pct, giant_frac FROM ("
            "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
            "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
            "samp AS (SELECT src, dst FROM E WHERE "
            f"((src * 512 + dst) * 2654435761) % 4294967296 % 5 < {mk}), "
            "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
            "S AS (SELECT src, dst FROM samp "
            "UNION SELECT dst, src FROM samp), "
            "reach(vid, root) AS (SELECT vid, vid FROM V UNION "
            "SELECT e.dst, r.root FROM reach r "
            "JOIN S e ON e.src = r.vid), "
            "comp AS (SELECT vid, min(root) AS c FROM reach GROUP BY 1), "
            "sz AS (SELECT c, count(*) AS n FROM comp GROUP BY 1) "
            "SELECT CAST(max(n) AS DOUBLE) / 512 "
            "AS giant_frac FROM sz) AS t")

    base["percolation_curve"] = " UNION ALL ".join(
        _perc_leg(mk) for mk in (1, 2, 3, 4))
    base["global_efficiency"] = (
        "WITH h AS (" + base["harmonic_centrality"] + ") "
        "SELECT ROUND(sum(val) / (512 * 511.0), 8) AS efficiency FROM h")
    base["revenue_by_brand_nation"] = (
        "SELECT p.p_brand, n.n_name, "
        "ROUND(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) "
        "AS revenue "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN nation n ON n.n_nationkey = s.s_nationkey "
        "GROUP BY 1, 2")
    base["edge_percolation"] = (
        # sampled edges (same knuth32 rule as edge_sample) → symmetric
        # min-label reach closure → giant-component fraction over ALL
        # 512 vertices (isolated ones are their own components)
        "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
        "samp AS (SELECT src, dst FROM E WHERE "
        "((src * 512 + dst) * 2654435761) % 4294967296 % 5 = 0), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "S AS (SELECT src, dst FROM samp "
        "UNION SELECT dst, src FROM samp), "
        "reach(vid, root) AS (SELECT vid, vid FROM V UNION "
        "SELECT e.dst, r.root FROM reach r JOIN S e ON e.src = r.vid), "
        "comp AS (SELECT vid, min(root) AS c FROM reach GROUP BY 1), "
        "sz AS (SELECT c, count(*) AS n FROM comp GROUP BY 1) "
        "SELECT CAST(max(n) AS DOUBLE) / 512 AS giant_frac "
        "FROM sz")
    base["sssp_parents"] = (
        "WITH dist AS (" + base["sssp"] + ") "
        "SELECT e.dst AS vid, CAST(min(e.src) AS BIGINT) AS parent "
        "FROM (SELECT l_orderkey % 512 AS src, l_partkey % 512 AS dst, "
        "CAST(count(*) AS DOUBLE) AS val FROM lineitem GROUP BY 1, 2) e "
        "JOIN dist du ON du.vid = e.src "
        "JOIN dist dv ON dv.vid = e.dst "
        "WHERE du.dist + e.val = dv.dist AND e.dst <> 0 GROUP BY 1")
    base["ball2_size"] = (
        "WITH RECURSIVE D AS (SELECT DISTINCT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "reach(u, v, t) AS (SELECT vid, vid, 0 FROM V "
        "UNION "
        "SELECT r.u, e.dst, r.t + 1 FROM reach r "
        "JOIN D e ON e.src = r.v WHERE r.t < 2) "
        "SELECT v AS vid, CAST(count(DISTINCT u) AS BIGINT) AS val "
        "FROM reach GROUP BY 1")
    base["ann_ivf_fixed"] = (
        "WITH c AS (SELECT vec_id AS cid, embedding FROM embeddings "
        "WHERE vec_id < 8), "
        "asg AS (SELECT vec_id, bucket FROM ("
        "SELECT e.vec_id, c.cid AS bucket, row_number() OVER ("
        "PARTITION BY e.vec_id ORDER BY list_cosine_similarity("
        "e.embedding, c.embedding) DESC, c.cid) AS rn "
        "FROM embeddings e CROSS JOIN c) WHERE rn = 1), "
        "q AS (SELECT vec_id, embedding FROM embeddings "
        "WHERE vec_id < 10), "
        "probe AS (SELECT qid, cid FROM (SELECT q.vec_id AS qid, "
        "c.cid, row_number() OVER (PARTITION BY q.vec_id "
        "ORDER BY list_cosine_similarity(q.embedding, c.embedding) "
        "DESC, c.cid) AS rn FROM q CROSS JOIN c) WHERE rn <= 2), "
        "cand AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "list_cosine_similarity(q.embedding, e.embedding) AS sim "
        "FROM q JOIN probe p ON p.qid = q.vec_id "
        "JOIN asg a2 ON a2.bucket = p.cid "
        "JOIN embeddings e ON e.vec_id = a2.vec_id "
        "WHERE e.vec_id <> q.vec_id) "
        "SELECT query_id, neighbor_id, rank FROM ("
        "SELECT query_id, neighbor_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
        "FROM cand) WHERE rank <= 10")
    base["simhash_sig"] = (
        # SimHash over vocabulary ranks: bit b of splitmix64(rank) votes
        # per token OCCURRENCE; signature bit set on strict majority.
        # Powers of two come from a tiny recursive doubling CTE (** on
        # HUGEINT returns DOUBLE); the HUGEINT bit sum converts to the
        # signed int64 pattern at the end, like minhash_sig4.
        r"WITH RECURSIVE tok AS (SELECT doc_id, unnest("
        r"string_split_regex(COALESCE(text, ''), '\s+')) AS w "
        "FROM documents), "
        "nz AS (SELECT doc_id, w FROM tok WHERE w <> ''), "
        "voc AS (SELECT w, CAST(row_number() OVER (ORDER BY w) - 1 "
        "AS HUGEINT) AS vid FROM (SELECT DISTINCT w FROM nz)), "
        "tv AS (SELECT n.doc_id, v.vid AS x FROM nz n JOIN voc v "
        "ON v.w = n.w), "
        + _sm64_stages_cols("sh", "tv", ["doc_id"], "x") + ", "
        "pw(b, v) AS (SELECT 0, CAST(1 AS HUGEINT) "
        "UNION ALL SELECT b + 1, v * 2 FROM pw WHERE b < 63), "
        "nn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shf "
        "GROUP BY 1), "
        "bits AS (SELECT s.doc_id, p.b, p.v, "
        "sum(CAST((CAST(s.h AS HUGEINT) // p.v) % 2 AS BIGINT)) AS cnt "
        "FROM shf s CROSS JOIN pw p GROUP BY 1, 2, 3), "
        "sg AS (SELECT bits.doc_id, sum(CASE WHEN 2 * bits.cnt > nn.n "
        "THEN bits.v ELSE CAST(0 AS HUGEINT) END) AS s "
        "FROM bits JOIN nn ON nn.doc_id = bits.doc_id GROUP BY 1) "
        "SELECT sg.doc_id, CAST(CASE WHEN sg.s >= 9223372036854775808 "
        "THEN sg.s - 18446744073709551616 ELSE sg.s END AS BIGINT) "
        "AS sig, nn.n AS n_tokens FROM sg "
        "JOIN nn ON nn.doc_id = sg.doc_id")
    # one Luby-MIS fixpoint (act rounds + post-hoc selection) seeded
    # from an arbitrary vertex-set CTE — doubled below for the first
    # two greedy-coloring classes (same template as the "mis" oracle)
    def _mis_block(sfx, seed_cte):
        K = "9223372036854775807"

        def pr(v):
            return f"(({v} * 2654435761) % 4294967296)"

        return (
            f"act{sfx}(it, vid) AS ("
            f"SELECT 0, vid FROM {seed_cte} "
            "UNION ALL "
            f"SELECT a.it + 1, a.vid FROM act{sfx} a WHERE a.it < 64 "
            f"AND NOT ({pr('a.vid')} < COALESCE((SELECT min({pr('b.vid')}) "
            f"FROM S e JOIN act{sfx} b ON b.vid = e.dst AND b.it = a.it "
            f"WHERE e.src = a.vid), {K})) "
            "AND NOT EXISTS ("
            f"SELECT 1 FROM S e1 JOIN act{sfx} u ON u.vid = e1.dst "
            f"AND u.it = a.it WHERE e1.src = a.vid AND {pr('u.vid')} < "
            f"COALESCE((SELECT min({pr('w.vid')}) FROM S e2 "
            f"JOIN act{sfx} w ON w.vid = e2.dst AND w.it = u.it "
            f"WHERE e2.src = u.vid), {K}))), "
            f"sel{sfx} AS (SELECT DISTINCT a.vid FROM act{sfx} a "
            f"WHERE {pr('a.vid')} < COALESCE((SELECT min({pr('b.vid')}) "
            f"FROM S e JOIN act{sfx} b ON b.vid = e.dst AND b.it = a.it "
            f"WHERE e.src = a.vid), {K}))")

    base["color_first2"] = (
        "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
        "U AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM E WHERE src <> dst), "
        "S AS (SELECT a AS src, b AS dst FROM U "
        "UNION ALL SELECT b, a FROM U), "
        "V AS (SELECT range::BIGINT AS vid FROM range(512)), "
        + _mis_block("1", "V") + ", "
        "V1 AS (SELECT vid FROM V WHERE vid NOT IN "
        "(SELECT vid FROM sel1)), "
        + _mis_block("2", "V1") + " "
        "SELECT v.vid, CAST(CASE WHEN v.vid IN (SELECT vid FROM sel1) "
        "THEN 0 WHEN v.vid IN (SELECT vid FROM sel2) THEN 1 "
        "ELSE -1 END AS BIGINT) AS col FROM V v")
    base["sample_neighbors3"] = (
        # fanout sample: window start = splitmix64(vid) % deg, then k=3
        # consecutive ranks (mod deg) over the src-ascending neighbors
        "WITH D AS (SELECT DISTINCT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "deg AS (SELECT dst AS v, CAST(count(*) AS HUGEINT) AS dg "
        "FROM D GROUP BY 1), "
        "nbr AS (SELECT dst AS v, src AS nb, CAST(row_number() OVER ("
        "PARTITION BY dst ORDER BY src) - 1 AS HUGEINT) AS rk FROM D), "
        "q AS (SELECT v AS w, v AS pos, CAST(v AS HUGEINT) AS x "
        "FROM deg), "
        + _sm64_stages_cols("sn", "q", ["w", "pos"], "x") + ", "
        "st AS (SELECT s.w AS v, (s.h % d.dg) AS st, "
        "LEAST(d.dg, 3) AS take, d.dg FROM snf s "
        "JOIN deg d ON d.v = s.w), "
        "sel AS (SELECT v, (st + j) % dg AS rk FROM st, "
        "unnest(generate_series(0, CAST(take AS BIGINT) - 1)) AS t(j)) "
        "SELECT sel.v AS vid, n.nb AS neighbor FROM sel "
        "JOIN nbr n ON n.v = sel.v AND n.rk = sel.rk")
    # HLL (p=12) replayed exactly: same splitmix64, top-12-bit bucket,
    # leading-zero rank via bin() length, bias-corrected estimate with
    # the linear-counting small-range correction. Zero registers
    # contribute 2^0 = 1 each to the harmonic sum ((4096 - n_present)).
    _hll_alpha = repr(0.7213 / (1 + 1.079 / 4096))
    base["events_hll_distinct"] = (
        "WITH u AS (SELECT DISTINCT event_type, user_id FROM events), "
        "u0 AS (SELECT event_type, CAST(user_id AS HUGEINT) AS x "
        "FROM u), "
        + _sm64_stages_cols("hh", "u0", ["event_type"], "x") + ", "
        "rr AS (SELECT event_type, "
        "CAST(CAST(h AS HUGEINT) // 4503599627370496 AS BIGINT) AS idx, "
        + _u64("CAST(h AS HUGEINT) * 4096") + " AS rest FROM hhf), "
        "rk AS (SELECT event_type, idx, CASE WHEN rest = 0 THEN 53 "
        "ELSE LEAST(64 - (CASE WHEN rest >= 9223372036854775808 THEN 63 "
        "ELSE length(bin(CAST(rest AS BIGINT))) - 1 END), 53) END "
        "AS rank FROM rr), "
        "reg AS (SELECT event_type, idx, max(rank) AS r FROM rk "
        "GROUP BY 1, 2), "
        "stats AS (SELECT event_type, sum(pow(2.0, -r)) AS s, "
        "count(*) AS np FROM reg GROUP BY 1), "
        f"est AS (SELECT event_type, CAST({_hll_alpha} AS DOUBLE) "
        "* 4096 * 4096 / (s + (4096 - np)) AS e, "
        "4096 - np AS zeros FROM stats) "
        "SELECT event_type, CAST(round(CASE WHEN zeros > 0 "
        "AND e <= 10240.0 THEN 4096 * ln(4096.0 / zeros) ELSE e END) "
        "AS BIGINT) AS approx_distinct FROM est")
    base["docs_ttr"] = (
        r"WITH tok AS (SELECT doc_id, unnest(string_split_regex("
        r"COALESCE(text, ''), '\s+')) AS w FROM documents), "
        "nz AS (SELECT doc_id, w FROM tok WHERE w <> ''), "
        "agg AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS n, "
        "CAST(count(DISTINCT w) AS DOUBLE) AS d FROM nz GROUP BY 1) "
        "SELECT d0.doc_id, COALESCE(ROUND(a.d / a.n, 8), 0.0) AS ttr "
        "FROM documents d0 LEFT JOIN agg a ON a.doc_id = d0.doc_id")
    base["events_window_distinct"] = (
        "SELECT date_trunc('day', ts) AS window, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY 1")
    base["matching_round2"] = (
        # two unrolled Luby rounds: per-vertex min of the knuth32 edge
        # priorities, edges that are local minima at BOTH endpoints
        # match, their endpoints' edges die before round 2
        f"{E}, und AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM E WHERE src <> dst), "
        "e0 AS (SELECT a AS u, b AS v, "
        "((a * 512 + b) * 2654435761) % 4294967296 AS p FROM und), "
        "vm1 AS (SELECT vid, min(p) AS mp FROM ("
        "SELECT u AS vid, p FROM e0 UNION ALL SELECT v, p FROM e0) "
        "GROUP BY 1), "
        "m1 AS (SELECT e.u, e.v FROM e0 e "
        "JOIN vm1 x ON x.vid = e.u AND x.mp = e.p "
        "JOIN vm1 y ON y.vid = e.v AND y.mp = e.p), "
        "mv1 AS (SELECT u AS vid FROM m1 UNION SELECT v FROM m1), "
        "e1 AS (SELECT * FROM e0 WHERE u NOT IN (SELECT vid FROM mv1) "
        "AND v NOT IN (SELECT vid FROM mv1)), "
        "vm2 AS (SELECT vid, min(p) AS mp FROM ("
        "SELECT u AS vid, p FROM e1 UNION ALL SELECT v, p FROM e1) "
        "GROUP BY 1), "
        "m2 AS (SELECT e.u, e.v FROM e1 e "
        "JOIN vm2 x ON x.vid = e.u AND x.mp = e.p "
        "JOIN vm2 y ON y.vid = e.v AND y.mp = e.p) "
        "SELECT u AS src, v AS dst, CAST(1 AS DOUBLE) AS val FROM m1 "
        "UNION ALL "
        "SELECT u, v, CAST(2 AS DOUBLE) FROM m2")
    base["eccentricity"] = (
        # bounded min-distance closure (t < 8 exceeds both test graphs'
        # max finite distance), then max incoming distance per vertex
        "WITH RECURSIVE D AS (SELECT DISTINCT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "reach(u, v, t) AS (SELECT vid, vid, 0 FROM V "
        "UNION "
        "SELECT r.u, e.dst, r.t + 1 FROM reach r "
        "JOIN D e ON e.src = r.v WHERE r.t < 8), "
        "dist AS (SELECT u, v, min(t) AS d FROM reach GROUP BY 1, 2) "
        "SELECT V.vid, CAST(COALESCE(s.e, 0) AS BIGINT) AS val FROM V "
        "LEFT JOIN (SELECT v, max(d) AS e FROM dist GROUP BY 1) s "
        "ON s.v = V.vid")
    base["docs_line_dedup"] = (
        "WITH t AS (SELECT doc_id, COALESCE(text, '') AS text "
        "FROM documents), "
        "lines AS (SELECT doc_id, "
        "unnest(string_split(text, chr(10))) AS line, "
        "generate_subscripts(string_split(text, chr(10)), 1) AS i "
        "FROM t), "
        "df AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines "
        "GROUP BY 1), "
        "keep AS (SELECT l.doc_id, l.i, l.line FROM lines l "
        "JOIN df ON df.line = l.line WHERE df.df < 3) "
        "SELECT t.doc_id, COALESCE(string_agg(k.line, chr(10) "
        "ORDER BY k.i), '') AS clean_text FROM t "
        "LEFT JOIN keep k ON k.doc_id = t.doc_id GROUP BY 1")
    base["quadrilaterals"] = (
        f"{E}, und AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM E WHERE src <> dst), "
        "sym AS (SELECT a AS s, b AS d FROM und "
        "UNION ALL SELECT b, a FROM und), "
        "cn AS (SELECT x.s AS u, y.s AS v, "
        "CAST(count(*) AS DOUBLE) AS c "
        "FROM sym x JOIN sym y ON x.d = y.d AND x.s < y.s "
        "GROUP BY 1, 2) "
        "SELECT CAST(COALESCE(sum(c * (c - 1) / 2), 0) / 2 AS BIGINT) "
        "AS quadrilaterals FROM cn")
    # fixed-2-update k-means, unrolled: per-dimension explode, squared-L2
    # assignment with (distance, centroid-id) tie-break, ROUND(avg, 6)
    # centroid updates with empty-cluster keep (COALESCE onto the
    # previous — rounded — coordinates), final assignment = output.
    base["embed_kmeans_iter2"] = (
        "WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) "
        "AS x, generate_subscripts(embedding, 1) AS i FROM embeddings), "
        "c0 AS (SELECT vec_id AS cid, i, x FROM e WHERE vec_id < 8), "
        "d1 AS (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c0 c ON c.i = e.i GROUP BY 1, 2), "
        "a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn "
        "FROM d1) WHERE rn = 1), "
        "u1 AS (SELECT a.cid, e.i, ROUND(avg(e.x), 6) AS x "
        "FROM e JOIN a1 a ON a.vec_id = e.vec_id GROUP BY 1, 2), "
        "c1 AS (SELECT c0.cid, c0.i, "
        "COALESCE(u1.x, ROUND(c0.x, 6)) AS x FROM c0 "
        "LEFT JOIN u1 ON u1.cid = c0.cid AND u1.i = c0.i), "
        "d2 AS (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c1 c ON c.i = e.i GROUP BY 1, 2), "
        "a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn "
        "FROM d2) WHERE rn = 1), "
        "u2 AS (SELECT a.cid, e.i, ROUND(avg(e.x), 6) AS x "
        "FROM e JOIN a2 a ON a.vec_id = e.vec_id GROUP BY 1, 2), "
        "c2 AS (SELECT c1.cid, c1.i, COALESCE(u2.x, c1.x) AS x FROM c1 "
        "LEFT JOIN u2 ON u2.cid = c1.cid AND u2.i = c1.i), "
        "d3 AS (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c2 c ON c.i = e.i GROUP BY 1, 2) "
        "SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM ("
        "SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY d, cid) AS rn FROM d3) WHERE rn = 1")
    base["katz_iter5"] = (
        "WITH RECURSIVE R AS (SELECT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "Ew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt "
        "FROM R GROUP BY 1, 2), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "C AS (SELECT src, dst, cnt FROM Ew "
        "UNION ALL SELECT vid, vid, 0.0 FROM V), "
        "kz(it, vid, x) AS ("
        "SELECT 0, vid, CAST(1.0 AS DOUBLE) FROM V "
        "UNION ALL "
        "SELECT k.it + 1, c.dst, 1.0 + 0.0078125 * sum(c.cnt * k.x) "
        "FROM kz k JOIN C c ON c.src = k.vid "
        "WHERE k.it < 5 GROUP BY k.it, c.dst) "
        "SELECT vid, ROUND(x, 6) AS val FROM kz WHERE it = 5")
    base["docs_flesch"] = (
        # Flesch reading-ease: the three RE2 counts byte-match Arrow's
        # count_substring_regex; identical double-op order; round
        # half-away on both sides (text.py uses _round_half_away)
        r"SELECT doc_id, CASE WHEN w > 0 THEN "
        r"round(206.835 - 1.015 * (w / GREATEST(s, 1.0)) "
        r"- 84.6 * (syl / GREATEST(w, 1.0)), 6) ELSE 0.0 END AS flesch "
        r"FROM (SELECT doc_id, "
        r"CAST(len(regexp_extract_all(COALESCE(text, ''), '\S+')) "
        r"AS DOUBLE) AS w, "
        r"CAST(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+')) "
        r"AS DOUBLE) AS s, "
        r"CAST(len(regexp_extract_all(COALESCE(text, ''), "
        r"'[aeiouyAEIOUY]+')) AS DOUBLE) AS syl FROM documents) t")
    base["events_zscore"] = (
        # per-user daily z-scores: integer daily counts and moments,
        # then the SAME fixed float-op sequence as the numpy side
        # (m = sx/nd, var = sxx/nd - m*m, z = (x-m)/sqrt(var)) —
        # every op exactly rounded identically, bit-exact, no grain
        "WITH c AS (SELECT user_id, date_trunc('day', ts) AS day, "
        "count(*) AS x FROM events GROUP BY 1, 2), "
        "s AS (SELECT user_id, sum(x) AS sx, sum(x*x) AS sxx, "
        "count(*) AS nd FROM c GROUP BY 1) "
        "SELECT c.user_id, c.day, "
        "CASE WHEN CAST(s.sxx AS DOUBLE)/s.nd - "
        "(CAST(s.sx AS DOUBLE)/s.nd)*(CAST(s.sx AS DOUBLE)/s.nd) > 0 "
        "THEN (CAST(c.x AS DOUBLE) - CAST(s.sx AS DOUBLE)/s.nd) / "
        "sqrt(CAST(s.sxx AS DOUBLE)/s.nd - "
        "(CAST(s.sx AS DOUBLE)/s.nd)*(CAST(s.sx AS DOUBLE)/s.nd)) "
        "ELSE 0.0 END AS z "
        "FROM c JOIN s ON s.user_id = c.user_id")
    base["events_cusum"] = (
        # CUSUM burst statistic: v_t = nd*x_t - sx - nd keeps the
        # drift and running min INTEGER (window sums commute exactly);
        # one final division — bit-exact, no grain
        "WITH c AS (SELECT user_id, date_trunc('day', ts) AS day, "
        "CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "s AS (SELECT user_id, sum(x) AS sx, count(*) AS nd "
        "FROM c GROUP BY 1), "
        "d AS (SELECT c.user_id, c.day, s.nd, "
        "SUM(s.nd * c.x - s.sx - s.nd) OVER "
        "(PARTITION BY c.user_id ORDER BY c.day) AS drift "
        "FROM c JOIN s ON s.user_id = c.user_id), "
        "r AS (SELECT user_id, nd, drift, MIN(drift) OVER "
        "(PARTITION BY user_id ORDER BY day) AS runmin FROM d) "
        "SELECT user_id, CAST(MAX(drift - runmin) AS DOUBLE) / "
        "any_value(nd) AS cusum FROM r GROUP BY user_id")
    base["degree_rankcorr"] = (
        # Spearman over (in-deg, out-deg) of all 512 vertices: doubled
        # average ranks (2*minrank + cnt - 1) keep every sum INTEGER;
        # the coefficient is a fixed IEEE sequence — bit-exact;
        # degenerate (zero rank variance) emits no row (matches the
        # Ray side's nan -> empty contract)
        "WITH E AS (SELECT DISTINCT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "d AS (SELECT V.vid, COALESCE(o.c, 0) AS od, "
        "COALESCE(i.c, 0) AS idg FROM V "
        "LEFT JOIN (SELECT src, count(*) AS c FROM E GROUP BY 1) o "
        "ON o.src = V.vid "
        "LEFT JOIN (SELECT dst, count(*) AS c FROM E GROUP BY 1) i "
        "ON i.dst = V.vid), "
        "rk AS (SELECT vid, "
        "2*rank() OVER (ORDER BY od) + "
        "count(*) OVER (PARTITION BY od) - 1 AS rx, "
        "2*rank() OVER (ORDER BY idg) + "
        "count(*) OVER (PARTITION BY idg) - 1 AS ry FROM d), "
        "s AS (SELECT count(*) AS n, sum(rx) sx, sum(ry) sy, "
        "sum(rx*rx) sxx, sum(ry*ry) syy, sum(rx*ry) sxy FROM rk) "
        "SELECT CAST(n AS BIGINT) AS n_vertices, "
        "CAST(n*sxy - sx*sy AS DOUBLE) / "
        "sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * "
        "CAST(n*syy - sy*sy AS DOUBLE)) AS spearman FROM s "
        "WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0")
    base["degree_gini"] = (
        # Gini of the out-degree distribution over all 512 vertices,
        # exact from the degree histogram: each degree run contributes
        # d*(k*C0 + k(k+1)/2) to the sorted weighted sum (tie-order
        # invariant); integer sums, 4 fixed IEEE ops — bit-exact
        "WITH E AS (SELECT DISTINCT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "d AS (SELECT V.vid, COALESCE(o.c, 0) AS od FROM V "
        "LEFT JOIN (SELECT src, count(*) AS c FROM E GROUP BY 1) o "
        "ON o.src = V.vid), "
        "h AS (SELECT od, count(*) AS k FROM d GROUP BY 1), "
        "w AS (SELECT od, k, COALESCE(SUM(k) OVER (ORDER BY od "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c0 "
        "FROM h), "
        "s AS (SELECT sum(od * (k*c0 + k*(k+1)//2)) AS S, "
        "sum(od*k) AS T FROM w) "
        "SELECT CAST(512 AS BIGINT) AS n_vertices, "
        "CASE WHEN T = 0 THEN 0.0 ELSE "
        "(2.0 * CAST(S AS DOUBLE)) / CAST(512*T AS DOUBLE) - "
        "(CAST(512 AS DOUBLE) + 1.0) / CAST(512 AS DOUBLE) END AS gini "
        "FROM s")
    base["embed_silhouette"] = (
        # simplified silhouette off the embed_kmeans_iter2 CTE chain:
        # a/b = sqrt of own / nearest-other squared distance to the
        # round-6 2-update centroids; round-8 absorbs the 64-term
        # summation-order noise
        "WITH e AS MATERIALIZED (SELECT vec_id, "
        "CAST(unnest(embedding) AS DOUBLE) AS x, "
        "generate_subscripts(embedding, 1) AS i FROM embeddings), "
        "c0 AS (SELECT vec_id AS cid, i, x FROM e WHERE vec_id < 8), "
        "d1 AS (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c0 c ON c.i = e.i GROUP BY 1, 2), "
        "a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn "
        "FROM d1) WHERE rn = 1), "
        "u1 AS (SELECT a.cid, e.i, ROUND(avg(e.x), 6) AS x "
        "FROM e JOIN a1 a ON a.vec_id = e.vec_id GROUP BY 1, 2), "
        "c1 AS (SELECT c0.cid, c0.i, "
        "COALESCE(u1.x, ROUND(c0.x, 6)) AS x FROM c0 "
        "LEFT JOIN u1 ON u1.cid = c0.cid AND u1.i = c0.i), "
        "d2 AS (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c1 c ON c.i = e.i GROUP BY 1, 2), "
        "a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn "
        "FROM d2) WHERE rn = 1), "
        "u2 AS (SELECT a.cid, e.i, ROUND(avg(e.x), 6) AS x "
        "FROM e JOIN a2 a ON a.vec_id = e.vec_id GROUP BY 1, 2), "
        "c2 AS (SELECT c1.cid, c1.i, COALESCE(u2.x, c1.x) AS x FROM c1 "
        "LEFT JOIN u2 ON u2.cid = c1.cid AND u2.i = c1.i), "
        "d3 AS MATERIALIZED (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c2 c ON c.i = e.i GROUP BY 1, 2), "
        "own AS MATERIALIZED (SELECT vec_id, cid, d FROM ("
        "SELECT vec_id, cid, d, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY d, cid) AS rn FROM d3) WHERE rn = 1), "
        "oth AS (SELECT d3.vec_id, min(d3.d) AS d FROM d3 "
        "JOIN own ON own.vec_id = d3.vec_id AND d3.cid <> own.cid "
        "GROUP BY 1) "
        "SELECT own.vec_id, CAST(own.cid AS BIGINT) AS cluster, "
        "ROUND(CASE WHEN GREATEST(sqrt(own.d), sqrt(oth.d)) > 0 "
        "THEN (sqrt(oth.d) - sqrt(own.d)) / "
        "GREATEST(sqrt(own.d), sqrt(oth.d)) ELSE 0.0 END, 8) AS sil "
        "FROM own JOIN oth ON oth.vec_id = own.vec_id")
    # shared fixed-2-update kmeans chain ending at the per-vector own
    # assignment (vec_id, cid, d = squared L2 to its round-6 centroid)
    # — the prefix of embed_db_index AND embed_ch_index
    _kmeans2_own = (
        "WITH e AS MATERIALIZED (SELECT vec_id, "
        "CAST(unnest(embedding) AS DOUBLE) AS x, "
        "generate_subscripts(embedding, 1) AS i FROM embeddings), "
        "c0 AS (SELECT vec_id AS cid, i, x FROM e WHERE vec_id < 8), "
        "d1 AS (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c0 c ON c.i = e.i GROUP BY 1, 2), "
        "a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn "
        "FROM d1) WHERE rn = 1), "
        "u1 AS (SELECT a.cid, e.i, ROUND(avg(e.x), 6) AS x "
        "FROM e JOIN a1 a ON a.vec_id = e.vec_id GROUP BY 1, 2), "
        "c1 AS (SELECT c0.cid, c0.i, "
        "COALESCE(u1.x, ROUND(c0.x, 6)) AS x FROM c0 "
        "LEFT JOIN u1 ON u1.cid = c0.cid AND u1.i = c0.i), "
        "d2 AS (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c1 c ON c.i = e.i GROUP BY 1, 2), "
        "a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn "
        "FROM d2) WHERE rn = 1), "
        "u2 AS (SELECT a.cid, e.i, ROUND(avg(e.x), 6) AS x "
        "FROM e JOIN a2 a ON a.vec_id = e.vec_id GROUP BY 1, 2), "
        "c2 AS MATERIALIZED (SELECT c1.cid, c1.i, "
        "COALESCE(u2.x, c1.x) AS x FROM c1 "
        "LEFT JOIN u2 ON u2.cid = c1.cid AND u2.i = c1.i), "
        "d3 AS MATERIALIZED (SELECT e.vec_id, c.cid, "
        "sum((e.x - c.x) * (e.x - c.x)) AS d "
        "FROM e JOIN c2 c ON c.i = e.i GROUP BY 1, 2), "
        "own AS MATERIALIZED (SELECT vec_id, cid, d FROM ("
        "SELECT vec_id, cid, d, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY d, cid) AS rn FROM d3) WHERE rn = 1)")
    base["embed_db_index"] = (
        # Davies-Bouldin per-cluster scores off the same kmeans CTE
        # chain as embed_silhouette: s_i = mean sqrt own-d, m_ij =
        # centroid L2, r_i = max_j (s_i+s_j)/m_ij; round-6 over SUM
        # order; no positive-distance partner pins 0.0
        _kmeans2_own + ", "
        "s AS MATERIALIZED (SELECT cid, CAST(count(*) AS BIGINT) AS n, "
        "sum(sqrt(d)) AS sd FROM own GROUP BY 1), "
        "cd AS (SELECT a.cid AS ca, b.cid AS cb, "
        "sqrt(sum((a.x - b.x) * (a.x - b.x))) AS m "
        "FROM c2 a JOIN c2 b ON a.i = b.i AND a.cid <> b.cid "
        "GROUP BY 1, 2), "
        "r AS (SELECT s1.cid, MAX((s1.sd / s1.n + s2.sd / s2.n) / cd.m) "
        "AS r FROM s s1 JOIN cd ON cd.ca = s1.cid "
        "JOIN s s2 ON s2.cid = cd.cb WHERE cd.m > 0 GROUP BY 1) "
        "SELECT CAST(s.cid AS BIGINT) AS cluster, s.n, "
        "ROUND(COALESCE(r.r, 0.0), 6) AS r "
        "FROM s LEFT JOIN r ON r.cid = s.cid")
    base["embed_ch_index"] = (
        # Calinski-Harabasz variance ratio off the same kmeans chain:
        # W = Σ own squared d, B = Σ nᵢ‖cᵢ−c̄‖² around the n-weighted
        # center of centers, CH = (B·(n−k)) / (W·(k−1)) — the exact op
        # order of the Ray side; round-6 over SUM order; degenerate
        # (k<2, n≤k, W=0) pins 0.0; empty corpus emits no row
        _kmeans2_own + ", "
        "s AS MATERIALIZED (SELECT cid, CAST(count(*) AS BIGINT) AS n, "
        "sum(d) AS w FROM own GROUP BY 1), "
        "tot AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS nt, "
        "CAST(count(*) AS BIGINT) AS kl, sum(w) AS wt FROM s), "
        "cb AS (SELECT c.i, sum(s.n * c.x) / "
        "(SELECT CAST(nt AS DOUBLE) FROM tot) AS xb "
        "FROM c2 c JOIN s ON s.cid = c.cid GROUP BY 1), "
        "bb AS (SELECT sum(s.n * (c.x - cb.xb) * (c.x - cb.xb)) AS b "
        "FROM c2 c JOIN s ON s.cid = c.cid JOIN cb ON cb.i = c.i) "
        "SELECT kl AS k, nt AS n, CASE WHEN kl >= 2 AND nt > kl "
        "AND wt > 0 THEN ROUND((b * CAST(nt - kl AS DOUBLE)) / "
        "(wt * CAST(kl - 1 AS DOUBLE)), 6) ELSE 0.0 END AS ch "
        "FROM tot CROSS JOIN bb WHERE nt > 0")
    base["docs_pack_offsets"] = (
        # concat-and-chunk packing layout: exclusive window sum of
        # whitespace token counts in doc_id order, 256-token sequences
        # crossing doc boundaries - all integer, bit-exact
        r"WITH c AS (SELECT doc_id, "
        r"CAST(len(regexp_extract_all(COALESCE(text, ''), '\S+')) "
        r"AS BIGINT) AS n_tokens FROM documents), "
        r'o AS (SELECT doc_id, n_tokens, COALESCE(SUM(n_tokens) OVER '
        r'(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND '
        r'1 PRECEDING), 0) AS "offset" FROM c) '
        r'SELECT doc_id, n_tokens, "offset", "offset" // 256 AS '
        r'first_seq, ("offset" + n_tokens - 1) // 256 AS last_seq '
        r"FROM o WHERE n_tokens > 0")
    base["events_user_entropy"] = (
        # per-user event-type entropy: integer counts, per-term
        # -(c/n)*ln(c/n), round-8 over summation-order noise;
        # single-type users are exactly 0 (not -0.0)
        "WITH c AS (SELECT user_id, event_type, count(*) AS c "
        "FROM events GROUP BY 1, 2), "
        "s AS (SELECT user_id, CAST(sum(c) AS DOUBLE) AS n, "
        "count(*) AS k FROM c GROUP BY 1), "
        "tt AS (SELECT c.user_id, s.k, "
        "-((CAST(c.c AS DOUBLE)/s.n) * ln(CAST(c.c AS DOUBLE)/s.n)) "
        "AS term FROM c JOIN s ON s.user_id = c.user_id) "
        "SELECT user_id, CASE WHEN any_value(k) = 1 THEN 0.0 "
        "ELSE ROUND(SUM(term), 8) END AS entropy "
        "FROM tt GROUP BY user_id")
    base["events_value_quantiles"] = (
        "SELECT event_type, quantile_disc(value, 0.25) AS p25, "
        "quantile_disc(value, 0.5) AS med, "
        "quantile_disc(value, 0.9) AS p90 FROM events GROUP BY 1")
    base["docs_source_stats"] = (
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
        "quantile_disc(CAST(n_chars AS DOUBLE), 0.5) AS med_chars, "
        "CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars "
        "FROM documents GROUP BY 1")
    base["events_covisit"] = (
        # item-item co-visitation over distinct (user, item) baskets
        # (item = the integer in the props JSON), baskets capped at 64
        # distinct items (quadratic-noise guard, replicated exactly);
        # cosine = c / sqrt(ci*cj) — integers + one IEEE sqrt/divide
        "WITH ui AS (SELECT DISTINCT user_id, "
        "CAST(regexp_replace(COALESCE(props, ''), '[^0-9]', '', 'g') "
        "AS BIGINT) AS item FROM events "
        "WHERE regexp_replace(COALESCE(props, ''), '[^0-9]', '', 'g') "
        "<> ''), "
        "ok AS (SELECT user_id FROM ui GROUP BY 1 "
        "HAVING count(*) BETWEEN 2 AND 64), "
        "u2 AS (SELECT ui.user_id, ui.item FROM ui "
        "JOIN ok ON ok.user_id = ui.user_id), "
        "p AS (SELECT a.item AS i, b.item AS j, "
        "CAST(count(*) AS BIGINT) AS c FROM u2 a "
        "JOIN u2 b ON a.user_id = b.user_id AND a.item < b.item "
        "GROUP BY 1, 2), "
        "ci AS (SELECT item, CAST(count(*) AS BIGINT) AS c "
        "FROM u2 GROUP BY 1) "
        "SELECT p.i, p.j, p.c, "
        "p.c / sqrt(CAST(ca.c * cb.c AS DOUBLE)) AS cosine "
        "FROM p JOIN ci ca ON ca.item = p.i JOIN ci cb ON cb.item = p.j")
    base["events_type_corr"] = (
        # Pearson over the shared day grid (missing cells 0): integer
        # moments, then the SAME fixed float tail as the numpy side —
        # double(n·Sxy − Sx·Sy)/(sqrt(double(n·Sxx−Sx²))·sqrt(...)) —
        # bit-exact; zero-variance series pin 0.0
        "WITH c AS (SELECT event_type AS t, date_trunc('day', ts) "
        "AS day, CAST(count(*) AS BIGINT) AS x FROM events "
        "GROUP BY 1, 2), "
        "d AS (SELECT DISTINCT day FROM c), "
        "ty AS (SELECT DISTINCT t FROM c), "
        "g AS (SELECT ty.t, d.day, COALESCE(c.x, 0) AS x "
        "FROM ty CROSS JOIN d "
        "LEFT JOIN c ON c.t = ty.t AND c.day = d.day), "
        "m AS (SELECT t, sum(x) AS sx, sum(x*x) AS sxx FROM g "
        "GROUP BY 1), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d), "
        "p AS (SELECT a.t AS ta, b.t AS tb, sum(a.x * b.x) AS sxy "
        "FROM g a JOIN g b ON a.day = b.day AND a.t < b.t "
        "GROUP BY 1, 2) "
        "SELECT ta, tb, CASE WHEN (n * ma.sxx - ma.sx * ma.sx) > 0 "
        "AND (n * mb.sxx - mb.sx * mb.sx) > 0 THEN "
        "CAST(n * p.sxy - ma.sx * mb.sx AS DOUBLE) / "
        "(sqrt(CAST(n * ma.sxx - ma.sx * ma.sx AS DOUBLE)) * "
        "sqrt(CAST(n * mb.sxx - mb.sx * mb.sx AS DOUBLE))) "
        "ELSE 0.0 END AS corr "
        "FROM p JOIN m ma ON ma.t = p.ta JOIN m mb ON mb.t = p.tb "
        "CROSS JOIN nn")
    base["mktseg_top3"] = (
        # exact integer revenue basis units: cents × (100 − disc%),
        # both FLOOR(x·100 + 0.5) — identical IEEE ops to the Ray side
        "WITH r AS (SELECT l_orderkey, CAST(SUM("
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * "
        "(100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) "
        "AS BIGINT) AS rev FROM lineitem GROUP BY 1), "
        "cr AS (SELECT o.o_custkey, CAST(SUM(r.rev) AS BIGINT) AS rev "
        "FROM r JOIN orders o ON o.o_orderkey = r.l_orderkey "
        "GROUP BY 1), "
        "j AS (SELECT cu.c_mktsegment AS seg, cr.o_custkey AS custkey, "
        "cr.rev FROM cr JOIN customer cu "
        "ON cu.c_custkey = cr.o_custkey), "
        "rk AS (SELECT seg, custkey, rev, ROW_NUMBER() OVER "
        "(PARTITION BY seg ORDER BY rev DESC, custkey) AS rn FROM j) "
        "SELECT seg, custkey, rev FROM rk WHERE rn <= 3")
    base["events_peak"] = (
        # half-open [minute, minute+30min) intervals: ±1 deltas netted
        # per (type, bucket), integer running sum per type, peak = max,
        # peak_ts = first bucket reaching it (ends-before-starts makes
        # the per-bucket net prefix see every intra-bucket max)
        "WITH b AS (SELECT event_type AS t, "
        "epoch_us(date_trunc('minute', ts)) AS m FROM events), "
        "d AS (SELECT t, m, CAST(count(*) AS BIGINT) AS delta "
        "FROM b GROUP BY 1, 2 "
        "UNION ALL SELECT t, m + 1800000000, "
        "-CAST(count(*) AS BIGINT) FROM b GROUP BY t, m), "
        "c AS (SELECT t, m, CAST(SUM(delta) AS BIGINT) AS delta "
        "FROM d GROUP BY 1, 2), "
        "r AS (SELECT t, m, SUM(delta) OVER (PARTITION BY t "
        "ORDER BY m ROWS UNBOUNDED PRECEDING) AS cur FROM c), "
        "p AS (SELECT t, CAST(MAX(cur) AS BIGINT) AS peak FROM r "
        "GROUP BY 1) "
        "SELECT p.t AS event_type, make_timestamp(MIN(r.m)) AS peak_ts, "
        "p.peak FROM r JOIN p ON p.t = r.t AND r.cur = p.peak "
        "GROUP BY p.t, p.peak")
    base["events_session_sizes"] = (
        "WITH x AS (SELECT user_id, ts, CASE WHEN epoch_us(ts) - "
        "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
        "> 1800000000 THEN 1 ELSE 0 END AS newsess FROM events), "
        "y AS (SELECT user_id, ts, sum(newsess) OVER ("
        "PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) "
        "AS sess FROM x), "
        "s AS (SELECT user_id, sess, CAST(count(*) AS BIGINT) "
        "AS n_events FROM y GROUP BY 1, 2) "
        "SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions "
        "FROM s GROUP BY 1")
    base["region_revenue"] = (
        # same exact integer revenue basis as mktseg_top3
        "SELECT r.r_name AS region, n.n_name AS nation, CAST(SUM("
        "CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) * "
        "(100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT))) "
        "AS BIGINT) AS rev "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "AND s.s_nationkey = c.c_nationkey "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "JOIN region r ON r.r_regionkey = n.n_regionkey "
        "GROUP BY 1, 2")
    base["docs_zipf"] = (
        # least-squares ln(cnt)-on-ln(rank) over the top-100 terms in
        # (cnt DESC, term) order; round-8 over SQL SUM order;
        # degenerate corpora pin slope 0.0
        r"WITH tok AS (SELECT unnest(string_split_regex("
        r"COALESCE(text, ''), '\s+')) AS w FROM documents), "
        "c AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok "
        "WHERE w <> '' GROUP BY 1), "
        "r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) "
        "AS rank FROM c QUALIFY rank <= 100), "
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "SUM(ln(CAST(rank AS DOUBLE))) AS sx, "
        "SUM(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))) "
        "AS sxx, SUM(ln(CAST(cnt AS DOUBLE))) AS sy, "
        "SUM(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))) "
        "AS sxy FROM r) "
        "SELECT n AS n_terms, CASE WHEN n >= 2 "
        "AND (n * sxx - sx * sx) > 0 THEN "
        "ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) "
        "ELSE 0.0 END AS slope FROM m")
    base["events_dau_growth"] = (
        "WITH w AS (SELECT date_trunc('day', ts) AS \"window\", "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY 1) "
        "SELECT \"window\", n_users, CASE WHEN "
        "lag(n_users) OVER (ORDER BY \"window\") IS NULL THEN 0.0 "
        "ELSE CAST(n_users AS DOUBLE) / "
        "lag(n_users) OVER (ORDER BY \"window\") END AS growth FROM w")
    base["customers_no_orders"] = (
        "SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n "
        "FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey) GROUP BY 1")
    base["scc_dag_longest"] = (
        # SCC labels (transitive-closure mutual-reach min) -> distinct
        # cross-component condensed edges -> longest path over the
        # acyclic quotient (recursive depth walk, max per node)
        "WITH RECURSIVE scc AS MATERIALIZED (" + base["scc"] + "), "
        "E AS (SELECT l_orderkey % 512 AS src, l_partkey % 512 AS dst "
        "FROM lineitem GROUP BY 1, 2), "
        "ce AS (SELECT DISTINCT ca.comp AS a, cb.comp AS b FROM E "
        "JOIN scc ca ON ca.vid = E.src "
        "JOIN scc cb ON cb.vid = E.dst WHERE ca.comp <> cb.comp), "
        "walk(v, d) AS (SELECT DISTINCT comp, CAST(0 AS BIGINT) "
        "FROM scc UNION "
        "SELECT ce.b, w.d + 1 FROM walk w JOIN ce ON ce.a = w.v) "
        "SELECT v AS comp, CAST(max(d) AS BIGINT) AS depth FROM walk "
        "GROUP BY 1")
    base["bipartite"] = (
        # min-label components -> multi-source BFS (bound 40, same cap
        # as the engine loop) from each component rep -> equal-parity
        # edges on the simple undirected pair set close odd cycles
        "WITH RECURSIVE E AS (SELECT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem GROUP BY 1, 2), "
        "V AS (SELECT range::BIGINT AS vid FROM range(512)), "
        "E2 AS (SELECT src, dst FROM E "
        "UNION SELECT dst AS src, src AS dst FROM E), "
        "reach(vid, root) AS (SELECT vid, vid FROM V UNION "
        "SELECT e.dst, r.root FROM reach r JOIN E2 e "
        "ON e.src = r.vid), "
        "cc AS (SELECT vid, CAST(min(root) AS BIGINT) AS comp "
        "FROM reach GROUP BY vid), "
        "bfs(vid, lvl) AS (SELECT comp, CAST(0 AS BIGINT) FROM "
        "(SELECT DISTINCT comp FROM cc) UNION "
        "SELECT e.dst, b.lvl + 1 FROM bfs b JOIN E2 e "
        "ON e.src = b.vid WHERE b.lvl < 40), "
        "dist AS (SELECT vid, min(lvl) AS d FROM bfs GROUP BY 1), "
        "SU AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM E WHERE src <> dst), "
        "conf AS (SELECT cc.comp, CAST(count(*) AS BIGINT) AS nc "
        "FROM SU JOIN dist da ON da.vid = SU.a "
        "JOIN dist db ON db.vid = SU.b "
        "JOIN cc ON cc.vid = SU.a "
        "WHERE (da.d + db.d) % 2 = 0 GROUP BY 1), "
        "sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS n "
        "FROM cc GROUP BY 1) "
        "SELECT s.comp, s.n, CAST(COALESCE(c.nc, 0) AS BIGINT) "
        "AS n_conflicts FROM sizes s "
        "LEFT JOIN conf c ON c.comp = s.comp")
    base["pagerank_resid5"] = (
        # the pagerank_iter5 recursion with every iterate kept; resid
        # at step t = Σ_vid |r_t − r_{t−1}| (self-loop 0-weight rows in
        # C keep all 512 vids present each step); round-8 — both sides
        # sum 512 |deltas| in unspecified order
        "WITH RECURSIVE R AS (SELECT l_orderkey % 512 AS src, "
        "l_partkey % 512 AS dst FROM lineitem), "
        "Ew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt "
        "FROM R GROUP BY 1, 2), "
        "deg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS d "
        "FROM R GROUP BY 1), "
        "V AS (SELECT CAST(range AS BIGINT) AS vid FROM range(512)), "
        "C AS (SELECT src, dst, cnt FROM Ew "
        "UNION ALL SELECT vid, vid, 0.0 FROM V), "
        "pr(it, vid, r) AS ("
        "SELECT 0, vid, 1.0 / 512 FROM V "
        "UNION ALL "
        "SELECT p.it + 1, c.dst, (1.0 - 0.85) / 512 + "
        "sum(c.cnt * COALESCE(p.r / (deg.d / 0.85), 0.0)) "
        "FROM pr p JOIN C c ON c.src = p.vid "
        "LEFT JOIN deg ON deg.vid = p.vid "
        "WHERE p.it < 5 GROUP BY p.it, c.dst) "
        "SELECT b.it, ROUND(sum(abs(b.r - a.r)), 8) AS resid "
        "FROM pr a JOIN pr b ON b.vid = a.vid AND b.it = a.it + 1 "
        "GROUP BY 1")
    base["custdist"] = (
        # TPC-H Q13: order count per customer (LEFT JOIN keeps the
        # zero-order customers), then the distribution — all integers
        "WITH oc AS (SELECT c.c_custkey, "
        "CAST(count(o.o_custkey) AS BIGINT) AS c_count "
        "FROM customer c LEFT JOIN orders o "
        "ON o.o_custkey = c.c_custkey GROUP BY 1) "
        "SELECT c_count, CAST(count(*) AS BIGINT) AS n_custs "
        "FROM oc GROUP BY 1")
    base["promo_revenue"] = (
        # TPC-H Q14 per ship month: exact integer revenue basis units
        # cents × (100 − disc%); ratio = the fixed (100.0·promo)/total
        # two-op IEEE tail — bit-exact
        "WITH r AS (SELECT year(l_shipdate) * 100 + month(l_shipdate) "
        "AS ym, CASE WHEN p.p_type = 'PROMO' THEN "
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * "
        "(100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) "
        "ELSE 0 END AS promo, "
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * "
        "(100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey), "
        "m AS (SELECT CAST(ym AS BIGINT) AS ym, "
        "CAST(sum(promo) AS BIGINT) AS promo, "
        "CAST(sum(rev) AS BIGINT) AS total FROM r GROUP BY 1) "
        "SELECT ym, promo, total, CASE WHEN total > 0 THEN "
        "(100.0 * CAST(promo AS DOUBLE)) / CAST(total AS DOUBLE) "
        "ELSE 0.0 END AS ratio FROM m")
    base["disc_revenue"] = (
        # TPC-H Q6: one filtered scan, integer cents × disc% basis
        "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(COALESCE(SUM("
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * "
        "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)), 0) AS BIGINT) "
        "AS rev FROM lineitem "
        "WHERE CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) "
        "BETWEEN 5 AND 7 AND l_quantity < 24")
    base["events_hourly"] = (
        "SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2")
    base["docs_heaps"] = (
        # Heaps vocabulary-growth curve at 16 doc-id thresholds
        # th_i = (max_id·(i+1)) // 16: integer token/vocab cumulatives,
        # round-8 ln-ln least-squares β; empty corpus -> no rows
        r"WITH mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS m "
        r"FROM documents), "
        r"th AS (SELECT CAST(range AS BIGINT) AS ck, "
        r"(mx.m * (CAST(range AS BIGINT) + 1)) // 16 AS t "
        r"FROM range(16) CROSS JOIN mx WHERE mx.m IS NOT NULL), "
        r"c AS (SELECT doc_id, CAST(len(regexp_extract_all("
        r"COALESCE(text, ''), '\S+')) AS BIGINT) AS n FROM documents), "
        r"tk AS (SELECT th.ck, th.t, CAST(COALESCE(sum(c.n), 0) "
        r"AS BIGINT) AS tokens FROM th LEFT JOIN c "
        r"ON c.doc_id <= th.t GROUP BY 1, 2), "
        r"tok AS (SELECT doc_id, unnest(string_split_regex("
        r"COALESCE(text, ''), '\s+')) AS w FROM documents), "
        r"f AS (SELECT w, CAST(min(doc_id) AS BIGINT) AS fd FROM tok "
        r"WHERE w <> '' GROUP BY 1), "
        r"vc AS (SELECT th.ck, CAST(count(f.w) AS BIGINT) AS vocab "
        r"FROM th LEFT JOIN f ON f.fd <= th.t GROUP BY 1), "
        r"pts AS (SELECT tk.ck, tk.tokens, vc.vocab FROM tk "
        r"JOIN vc ON vc.ck = tk.ck), "
        r"m2 AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        r"SUM(ln(CAST(tokens AS DOUBLE))) AS sx, "
        r"SUM(ln(CAST(tokens AS DOUBLE)) * ln(CAST(tokens AS DOUBLE))) "
        r"AS sxx, SUM(ln(CAST(vocab AS DOUBLE))) AS sy, "
        r"SUM(ln(CAST(tokens AS DOUBLE)) * ln(CAST(vocab AS DOUBLE))) "
        r"AS sxy FROM pts WHERE tokens > 0 AND vocab > 0) "
        r"SELECT pts.ck, pts.tokens, pts.vocab, CASE WHEN m2.n >= 2 "
        r"AND (m2.n * m2.sxx - m2.sx * m2.sx) > 0 THEN "
        r"ROUND((m2.n * m2.sxy - m2.sx * m2.sy) / "
        r"(m2.n * m2.sxx - m2.sx * m2.sx), 8) ELSE 0.0 END AS beta "
        r"FROM pts CROSS JOIN m2")
    base["docs_js"] = (
        # pairwise JS divergence of the source unigram distributions:
        # integer (source, term) counts + totals, fixed per-term IEEE
        # sequence p = n/t, 0.5·(p·ln(2p/(p+q)) + q·ln(2q/(p+q)));
        # round-8 over term SUM order (and last-ulp ln differences)
        r"WITH tok AS (SELECT COALESCE(source, '') AS s, "
        r"unnest(string_split_regex(COALESCE(text, ''), '\s+')) AS w "
        r"FROM documents), "
        "c AS (SELECT s, w, CAST(count(*) AS BIGINT) AS cnt FROM tok "
        "WHERE w <> '' GROUP BY 1, 2), "
        "tot AS (SELECT s, CAST(sum(cnt) AS BIGINT) AS t FROM c "
        "GROUP BY 1), "
        "pairs AS (SELECT a.s AS sa, a.t AS ta, b.s AS sb, b.t AS tb "
        "FROM tot a JOIN tot b ON a.s < b.s), "
        "g AS (SELECT p.sa, p.sb, p.ta, p.tb, c.w, "
        "CAST(sum(CASE WHEN c.s = p.sa THEN c.cnt ELSE 0 END) "
        "AS BIGINT) AS na, "
        "CAST(sum(CASE WHEN c.s = p.sb THEN c.cnt ELSE 0 END) "
        "AS BIGINT) AS nb "
        "FROM pairs p JOIN c ON c.s = p.sa OR c.s = p.sb "
        "GROUP BY 1, 2, 3, 4, 5), "
        "t2 AS (SELECT sa, sb, "
        "CAST(na AS DOUBLE) / CAST(ta AS DOUBLE) AS px, "
        "CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE) AS py FROM g), "
        "terms AS (SELECT sa, sb, 0.5 * ("
        "CASE WHEN px > 0 THEN px * ln((2.0 * px) / (px + py)) "
        "ELSE 0.0 END + "
        "CASE WHEN py > 0 THEN py * ln((2.0 * py) / (px + py)) "
        "ELSE 0.0 END) AS v FROM t2) "
        "SELECT sa, sb, ROUND(sum(v), 8) AS js FROM terms "
        "GROUP BY 1, 2")
    base["trade_matrix"] = (
        # Q7-family cross-nation revenue matrix: exact integer basis
        # units, inner joins drop dangling keys on both sides
        "WITH r AS (SELECT l_orderkey, l_suppkey, "
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * "
        "(100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev "
        "FROM lineitem), "
        "j AS (SELECT cu.c_nationkey AS cn, su.s_nationkey AS sn, "
        "r.rev FROM r JOIN orders o ON o.o_orderkey = r.l_orderkey "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey "
        "JOIN supplier su ON su.s_suppkey = r.l_suppkey), "
        "a AS (SELECT cn, sn, CAST(sum(rev) AS BIGINT) AS rev FROM j "
        "GROUP BY 1, 2) "
        "SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation, "
        "a.rev FROM a JOIN nation nc ON nc.n_nationkey = a.cn "
        "JOIN nation ns ON ns.n_nationkey = a.sn")
    base["docs_tfidf"] = (
        # top-20 terms by tfidf = cnt · ln(N/df); ranking on the
        # ROUNDED (8, half-away) score with (score DESC, term) ties —
        # the docs_rrf convention keeps the cut replayable
        r"WITH tok AS (SELECT doc_id, unnest(string_split_regex("
        r"COALESCE(text, ''), '\s+')) AS w FROM documents), "
        "tf AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok "
        "WHERE w <> '' GROUP BY 1), "
        "n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents), "
        "s AS (SELECT w, cnt, df, ROUND(cnt * ln(CAST(nd AS DOUBLE) "
        "/ df), 8) AS tfidf FROM tf, n) "
        "SELECT w AS term, cnt, df, tfidf FROM s "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY tfidf DESC, w) <= 20")
    base["big_orders"] = (
        # Q18 family: total line quantity per order > 150 (integral
        # doubles — the sum is exact in any order), inner joins drop
        # dangling order/customer keys exactly like the Ray side
        "WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS sum_qty "
        "FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150) "
        "SELECT c.c_custkey AS custkey, b.l_orderkey AS orderkey, "
        "b.sum_qty FROM big b "
        "JOIN orders o ON o.o_orderkey = b.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey")
    base["small_qty_revenue"] = (
        # Q17 family: lines below 20% of their part's average quantity,
        # revenue in integer cents per brand; the threshold is the
        # identical two-op IEEE tail 0.2 * (sum/cnt)
        "WITH a AS (SELECT l_partkey, SUM(l_quantity) AS sq, "
        "CAST(count(*) AS BIGINT) AS nq FROM lineitem GROUP BY 1), "
        "s AS (SELECT p.p_brand, CAST(FLOOR(l.l_extendedprice * 100 "
        "+ 0.5) AS BIGINT) AS cents FROM lineitem l "
        "JOIN a ON a.l_partkey = l.l_partkey "
        "JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE l.l_quantity < 0.2 * (a.sq / a.nq)) "
        "SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(sum(cents) AS BIGINT) AS rev FROM s GROUP BY 1")
    base["idle_rich_customers"] = (
        # Q22 family: balance (integer cents) above the positive-
        # balance average, no orders (NOT EXISTS anti-join), grouped
        # per segment; threshold = one IEEE division sum/cnt
        "WITH c2 AS (SELECT c_custkey, c_mktsegment, "
        "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents "
        "FROM customer), "
        "t AS (SELECT CAST(SUM(cents) AS DOUBLE) / "
        "CAST(count(*) AS BIGINT) AS thr FROM c2 WHERE cents > 0) "
        "SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(cents) AS BIGINT) AS sum_cents "
        "FROM c2, t WHERE cents > thr AND NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c2.c_custkey) "
        "GROUP BY 1")
    base["docs_chisq"] = (
        # lang × source contingency chi-square: integer marginals,
        # fixed per-cell IEEE term e = (r·c)/n, (o−e)²/e; round-8 over
        # cell SUM order; NULL categories count as ''
        "WITH ct AS (SELECT COALESCE(lang, '') AS a, "
        "COALESCE(source, '') AS b, CAST(count(*) AS BIGINT) AS o "
        "FROM documents GROUP BY 1, 2), "
        "r AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM ct "
        "GROUP BY 1), "
        "c AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM ct "
        "GROUP BY 1), "
        "nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM ct), "
        "grid AS (SELECT r.ra, c.cb, COALESCE(ct.o, 0) AS o, "
        "(CAST(r.ra AS DOUBLE) * CAST(c.cb AS DOUBLE)) / "
        "(SELECT CAST(n AS DOUBLE) FROM nn) AS e "
        "FROM r CROSS JOIN c LEFT JOIN ct "
        "ON ct.a = r.a AND ct.b = c.b), "
        "s AS (SELECT sum(((CAST(o AS DOUBLE) - e) * "
        "(CAST(o AS DOUBLE) - e)) / e) AS chi2 FROM grid) "
        "SELECT CAST(((SELECT count(*) FROM r) - 1) * "
        "((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof, "
        "nn.n, ROUND(s.chi2, 8) AS chi2 FROM nn CROSS JOIN s "
        "WHERE nn.n IS NOT NULL")
    base["events_autocorr"] = (
        # contiguous day grid (missing days 0), integer moments per
        # lag, the same fixed IEEE Pearson tail as events_type_corr —
        # bit-exact; empty stream -> empty grid -> no rows
        "WITH c AS (SELECT epoch_us(date_trunc('day', ts)) "
        "// 86400000000 AS d, CAST(count(*) AS BIGINT) AS x "
        "FROM events GROUP BY 1), "
        "g AS (SELECT gs.d, COALESCE(c.x, 0) AS x FROM "
        "(SELECT unnest(range((SELECT min(d) FROM c), "
        "(SELECT max(d) FROM c) + 1)) AS d) gs "
        "LEFT JOIN c ON c.d = gs.d), "
        "l AS (SELECT CAST(range AS BIGINT) + 1 AS lag FROM range(7)), "
        "p AS (SELECT l.lag, a.x AS xa, b.x AS xb FROM l "
        "JOIN g a ON TRUE JOIN g b ON b.d = a.d + l.lag), "
        "m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb, "
        "CAST(sum(xa*xa) AS BIGINT) AS saa, "
        "CAST(sum(xb*xb) AS BIGINT) AS sbb, "
        "CAST(sum(xa*xb) AS BIGINT) AS sab FROM p GROUP BY 1) "
        "SELECT lag, n, CASE WHEN n*saa - sa*sa > 0 "
        "AND n*sbb - sb*sb > 0 THEN "
        "CAST(n*sab - sa*sb AS DOUBLE) / "
        "(sqrt(CAST(n*saa - sa*sa AS DOUBLE)) * "
        "sqrt(CAST(n*sbb - sb*sb AS DOUBLE))) ELSE 0.0 END AS ac "
        "FROM m WHERE n >= 2")
    base["events_gap_quantiles"] = (
        # same-user gap preceding each event, (ts, event_id) tie order;
        # exact discrete quantiles (quantile_disc) — bit-exact
        "WITH g AS (SELECT event_type, epoch_us(ts) - "
        "lag(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS gap FROM events) "
        "SELECT event_type, "
        "CAST(quantile_disc(gap, 0.5) AS DOUBLE) AS p50, "
        "CAST(quantile_disc(gap, 0.9) AS DOUBLE) AS p90 "
        "FROM g WHERE gap IS NOT NULL GROUP BY 1")
    base["orders_priority"] = (
        "SELECT o_orderpriority AS priority, "
        "CAST(count(*) AS BIGINT) AS n_orders FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate) GROUP BY 1")
    base["conductance"] = (
        # φ(c) = cut/min(vol, 2m−vol) of the vid%16 labeling over the
        # simple symmetric graph (same U/S derivation as modularity);
        # integer counts + one IEEE divide — bit-exact
        f"{E}, "
        "U AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM E WHERE src <> dst), "
        "S AS (SELECT a AS src, b AS dst FROM U "
        "UNION ALL SELECT b, a FROM U), "
        "v AS (SELECT src % 16 AS comm, "
        "CAST(count(*) AS BIGINT) AS vol, "
        "CAST(count(*) FILTER (src % 16 <> dst % 16) AS BIGINT) AS cut "
        "FROM S GROUP BY 1), "
        "m2 AS (SELECT sum(vol) AS tot FROM v) "
        "SELECT comm, cut, vol, CASE WHEN "
        "least(vol, (SELECT tot FROM m2) - vol) > 0 THEN "
        "CAST(cut AS DOUBLE) / least(vol, (SELECT tot FROM m2) - vol) "
        "ELSE 0.0 END AS phi FROM v")
    base["simrank_iter2"] = (
        # two unrolled SimRank iterations on the 128-vertex distinct
        # quotient: s1 = first-iteration common-in counts scaled by
        # (0.8·cnt)/(d_u·d_v); s2 replays the Aᵀ S A chain as two
        # chained grouped sums (t1 = Aᵀ s1f, s2 = t1 A) with the SAME
        # two-stage summation structure as the mxm pair — round-8
        # absorbs within-sum order noise; diagonal (=1) joins via s1f
        "WITH E AS MATERIALIZED (SELECT DISTINCT l_orderkey % 128 "
        "AS src, l_partkey % 128 AS dst FROM lineitem), "
        "ind AS MATERIALIZED (SELECT dst AS v, "
        "CAST(count(*) AS DOUBLE) AS d FROM E GROUP BY 1), "
        "s1 AS MATERIALIZED (SELECT a.dst AS u, b.dst AS v, "
        "0.8 * CAST(count(*) AS DOUBLE) / (du.d * dv.d) AS s "
        "FROM E a JOIN E b ON b.src = a.src AND a.dst <> b.dst "
        "JOIN ind du ON du.v = a.dst JOIN ind dv ON dv.v = b.dst "
        "GROUP BY a.dst, b.dst, du.d, dv.d), "
        "s1f AS MATERIALIZED (SELECT u, v, s FROM s1 UNION ALL "
        "SELECT CAST(range AS BIGINT), CAST(range AS BIGINT), 1.0 "
        "FROM range(128)), "
        "t1 AS MATERIALIZED (SELECT e.dst AS u, s.v AS j, "
        "SUM(s.s) AS x FROM E e JOIN s1f s ON s.u = e.src "
        "GROUP BY 1, 2), "
        "s2 AS (SELECT t.u, e.dst AS v, "
        "0.8 * SUM(t.x) / (du.d * dv.d) AS s "
        "FROM t1 t JOIN E e ON e.src = t.j "
        "JOIN ind du ON du.v = t.u JOIN ind dv ON dv.v = e.dst "
        "WHERE t.u <> e.dst GROUP BY t.u, e.dst, du.d, dv.d) "
        "SELECT u, v, ROUND(s, 8) AS s FROM s2 WHERE u < v")
    base["events_bloom"] = (
        # Bloom replay: pos(u, i) = splitmix64(xor(u, 2779096485*(i+1)))
        # % 4096; built bits = DISTINCT positions over purchase users,
        # probe hit = all 3 candidate positions set (false positives
        # replay exactly — the bit set is shared across seeds)
        "WITH bu AS (SELECT DISTINCT CAST(user_id AS HUGEINT) AS u "
        "FROM events WHERE event_type = 'purchase'), "
        "bx AS (SELECT u, "
        + _bx("u", "(2779096485 * (CAST(t.i AS HUGEINT) + 1))")
        + " AS x FROM bu, range(3) t(i)), "
        + _sm64_stages_cols("bl", "bx", ["u"], "x") + ", "
        "built AS MATERIALIZED (SELECT DISTINCT "
        "CAST(h % 4096 AS BIGINT) AS pos FROM blf), "
        "pu AS (SELECT CAST(range AS HUGEINT) AS u FROM range(4096)), "
        "px AS (SELECT u, "
        + _bx("u", "(2779096485 * (CAST(t.i AS HUGEINT) + 1))")
        + " AS x FROM pu, range(3) t(i)), "
        + _sm64_stages_cols("pb", "px", ["u"], "x") + ", "
        "pp AS (SELECT u, CAST(h % 4096 AS BIGINT) AS pos FROM pbf) "
        "SELECT CAST(pp.u AS BIGINT) AS uid, "
        "CAST(CASE WHEN count(built.pos) = 3 THEN 1 ELSE 0 END "
        "AS DOUBLE) AS hit "
        "FROM pp LEFT JOIN built ON built.pos = pp.pos GROUP BY pp.u")
    # Borůvka replay, one generated block per round (components at
    # least halve, so ceil(log2(512)) = 9 rounds always terminate):
    # per-component argmin under the strict (w, a, b) order, then
    # labels = min-root connectivity of the forest selected so far
    # (the same reach-CTE shape as the connected_components oracle)
    _mst_rounds = []
    for _r in range(1, 10):
        _p = _r - 1
        _mst_rounds.append(
            f"ce{_r} AS MATERIALIZED (SELECT la.lab AS ca, lb.lab AS cb, "
            f"e.w, e.a, e.b FROM E e JOIN l{_p} la ON la.vid = e.a "
            f"JOIN l{_p} lb ON lb.vid = e.b WHERE la.lab <> lb.lab), "
            f"cb{_r} AS (SELECT ca AS c, w, a, b FROM ce{_r} "
            f"UNION ALL SELECT cb, w, a, b FROM ce{_r}), "
            f"cm{_r} AS MATERIALIZED (SELECT w, a, b FROM ("
            f"SELECT c, w, a, b, row_number() OVER (PARTITION BY c "
            f"ORDER BY w, a, b) AS rn FROM cb{_r}) t WHERE rn = 1), "
            f"sel{_r} AS MATERIALIZED (SELECT DISTINCT "
            f"CAST({_r} AS BIGINT) AS r, w, a, b FROM cm{_r}), "
            f"f{_r} AS MATERIALIZED (SELECT * FROM f{_p} "
            f"UNION ALL SELECT * FROM sel{_r}), "
            f"fe{_r} AS (SELECT a AS src, b AS dst FROM f{_r} "
            f"UNION SELECT b, a FROM f{_r}), "
            f"reach{_r}(vid, root) AS (SELECT vid, vid FROM V "
            f"UNION SELECT e.dst, rr.root FROM reach{_r} rr "
            f"JOIN fe{_r} e ON e.src = rr.vid), "
            f"l{_r} AS MATERIALIZED (SELECT vid, "
            f"CAST(min(root) AS BIGINT) AS lab "
            f"FROM reach{_r} GROUP BY vid)")
    base["mst_forest"] = (
        "WITH RECURSIVE E AS MATERIALIZED (SELECT "
        "LEAST(l_orderkey % 512, l_partkey % 512) AS a, "
        "GREATEST(l_orderkey % 512, l_partkey % 512) AS b, "
        "CAST(count(*) AS DOUBLE) AS w FROM lineitem "
        "WHERE l_orderkey % 512 <> l_partkey % 512 GROUP BY 1, 2), "
        "V AS (SELECT range::BIGINT AS vid FROM range(512)), "
        "l0 AS MATERIALIZED (SELECT vid, vid AS lab FROM V), "
        "f0 AS (SELECT CAST(NULL AS BIGINT) AS r, w, a, b "
        "FROM E WHERE FALSE), "
        + ", ".join(_mst_rounds) + " "
        "SELECT r, a AS u, b AS v, w FROM f9")
    base["widest4"] = (
        # widest-path relaxation: round it+1 rows = max over (it-hop
        # walk + 1 edge) of min(prefix width, edge capacity); final
        # width = max over rounds (monotone). Integer capacities ->
        # exact doubles; the source keeps +inf
        "WITH RECURSIVE E AS MATERIALIZED (SELECT "
        "LEAST(l_orderkey % 512, l_partkey % 512) AS a, "
        "GREATEST(l_orderkey % 512, l_partkey % 512) AS b, "
        "CAST(count(*) AS DOUBLE) AS w FROM lineitem "
        "WHERE l_orderkey % 512 <> l_partkey % 512 GROUP BY 1, 2), "
        "E2 AS (SELECT a AS src, b AS dst, w FROM E "
        "UNION ALL SELECT b, a, w FROM E), "
        "wp(it, vid, wd) AS ("
        "SELECT 0, CAST(0 AS BIGINT), CAST('inf' AS DOUBLE) "
        "UNION ALL "
        "SELECT wp.it + 1, e.dst, MAX(LEAST(wp.wd, e.w)) "
        "FROM wp JOIN E2 e ON e.src = wp.vid "
        "WHERE wp.it < 4 GROUP BY wp.it, e.dst) "
        "SELECT vid, MAX(wd) AS width FROM wp GROUP BY vid")
    # MMR greedy replay: one generated block per selection round —
    # score = 0.7·rel − 0.3·max cosine to the already-selected set,
    # argmax by (score DESC, vec_id) exactly as the driver greedy
    _mmr_rounds = []
    for _r in range(2, 6):
        _p = _r - 1
        _mmr_rounds.append(
            f"m{_r} AS (SELECT c.vec_id, c.embedding, 0.7 * c.rel - "
            f"0.3 * (SELECT MAX(list_cosine_similarity(c.embedding, "
            f"s.embedding)) FROM sel{_p} s) AS score FROM cand c "
            f"WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{_p})), "
            f"p{_r} AS MATERIALIZED (SELECT vec_id, embedding, "
            f"CAST({_r} AS BIGINT) AS rank FROM m{_r} "
            f"ORDER BY score DESC, vec_id LIMIT 1), "
            f"sel{_r} AS MATERIALIZED (SELECT * FROM sel{_p} "
            f"UNION ALL SELECT * FROM p{_r})")
    base["embed_mmr"] = (
        "WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0), "
        "cand AS MATERIALIZED (SELECT e.vec_id, e.embedding, "
        "list_cosine_similarity(e.embedding, q.embedding) AS rel "
        "FROM embeddings e, q WHERE e.vec_id <> 0 "
        "ORDER BY rel DESC, e.vec_id LIMIT 32), "
        "sel1 AS MATERIALIZED (SELECT vec_id, embedding, "
        "CAST(1 AS BIGINT) AS rank FROM cand "
        "ORDER BY rel DESC, vec_id LIMIT 1), "
        + ", ".join(_mmr_rounds) + " "
        "SELECT vec_id, rank FROM sel5")
    base["events_f2"] = (
        # AMS replay: sign(u, r) = 2·(splitmix64(u + r·2^32) mod 2) − 1
        # (the CMS salt convention); integer sign sums are exact in any
        # order, median-of-5 squares = quantile_disc middle element,
        # exact F2 = Σ count² ground truth
        "WITH ix AS (SELECT t.r, CAST(user_id AS HUGEINT) + "
        "CAST(t.r AS HUGEINT) * 4294967296 AS x "
        "FROM events, range(5) t(r)), "
        + _sm64_stages_cols("am", "ix", ["r"], "x") + ", "
        "sg AS MATERIALIZED (SELECT r, SUM(CAST((h % 2) * 2 - 1 "
        "AS BIGINT)) AS s FROM amf GROUP BY r), "
        # empty stream: every sign sum is 0 (the sketch convention) —
        # pad the 5 rows so the all-empty corpus matches the Ray side
        "sg0 AS (SELECT t.r, COALESCE(sg.s, 0) AS s FROM range(5) t(r) "
        "LEFT JOIN sg ON sg.r = t.r), "
        "sq AS (SELECT CAST(r AS BIGINT) AS r, "
        "CAST(s * s AS DOUBLE) AS v FROM sg0), "
        "med AS (SELECT CAST(5 AS BIGINT) AS r, "
        "CAST(quantile_disc(s * s, 0.5) AS DOUBLE) AS v FROM sg0), "
        "ex AS (SELECT CAST(6 AS BIGINT) AS r, "
        "CAST(COALESCE(SUM(c * c), 0) AS DOUBLE) AS v FROM (SELECT "
        "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id)) "
        "SELECT r, v FROM sq UNION ALL SELECT r, v FROM med "
        "UNION ALL SELECT r, v FROM ex")
    base["docs_chunks"] = (
        # chunk j spans tokens [j*48, min(j*48+64, n)) for j*48 < n —
        # pure integer arithmetic from the RE2 token count
        r"WITH n AS (SELECT doc_id, CAST(len(regexp_extract_all("
        r"COALESCE(text, ''), '\S+')) AS BIGINT) AS n FROM documents) "
        r"SELECT doc_id, r.range AS chunk, r.range * 48 AS start, "
        r"LEAST(64, n.n - r.range * 48) AS len "
        r"FROM n JOIN range(65536) r ON r.range * 48 < n.n")
    base["docs_winnow"] = (
        # Winnowing (gram=3, window=8): g-gram code = base-|V| packed
        # vocabulary ranks -> splitmix64 (shared CTE stages); each
        # window start picks its min hash, ties -> rightmost (ORDER BY
        # h, pos DESC); short docs winnow one truncated window; the
        # uint64 hash converts to the signed int64 bit pattern
        r"WITH lst AS MATERIALIZED (SELECT doc_id, list_filter("
        r"string_split_regex(COALESCE(text, ''), '\s+'), "
        r"x -> x <> '') AS ws FROM documents), "
        "tok AS MATERIALIZED (SELECT doc_id, CAST(g.i AS BIGINT) AS p, "
        "ws[g.i] AS w FROM lst, LATERAL (SELECT unnest("
        "generate_series(1, len(ws))) AS i) g), "
        "voc AS MATERIALIZED (SELECT w, CAST(row_number() OVER "
        "(ORDER BY w) - 1 AS HUGEINT) AS r FROM ("
        "SELECT DISTINCT w FROM tok) t), "
        "vn AS (SELECT CAST(count(*) AS HUGEINT) AS v FROM voc), "
        "gr AS MATERIALIZED (SELECT t1.doc_id, t1.p AS pos, "
        "(v1.r * (SELECT v FROM vn) + v2.r) * (SELECT v FROM vn) "
        "+ v3.r AS x "
        "FROM tok t1 JOIN tok t2 ON t2.doc_id = t1.doc_id "
        "AND t2.p = t1.p + 1 "
        "JOIN tok t3 ON t3.doc_id = t1.doc_id AND t3.p = t1.p + 2 "
        "JOIN voc v1 ON v1.w = t1.w JOIN voc v2 ON v2.w = t2.w "
        "JOIN voc v3 ON v3.w = t3.w), "
        + _sm64_stages_cols("wn", "gr", ["doc_id", "pos"], "x") + ", "
        "ng AS MATERIALIZED (SELECT doc_id, max(pos) AS n FROM wnf "
        "GROUP BY 1), "
        "sel AS (SELECT s.doc_id, q.pos, q.h, row_number() OVER ("
        "PARTITION BY s.doc_id, s.pos ORDER BY q.h, q.pos DESC) AS rn "
        "FROM wnf s JOIN ng ON ng.doc_id = s.doc_id "
        "JOIN wnf q ON q.doc_id = s.doc_id "
        "AND q.pos BETWEEN s.pos AND s.pos + 7 "
        "WHERE s.pos <= GREATEST(ng.n - 7, 1)) "
        "SELECT DISTINCT doc_id, pos, "
        "CAST(CASE WHEN h >= 9223372036854775808 "
        "THEN h - 18446744073709551616 ELSE h END AS BIGINT) AS fp "
        "FROM sel WHERE rn = 1")
    base["docs_entropy"] = (
        # char-level Shannon entropy: character split via char-based
        # substr (newline/unicode-safe), identical per-term double-op
        # order -(c/n)*ln(c/n), round-8 over summation-order noise
        "WITH ch AS (SELECT doc_id, substr(text, i, 1) AS c "
        "FROM documents, LATERAL (SELECT unnest(generate_series(1, "
        "length(text))) AS i) g), "
        "cc AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS cnt "
        "FROM ch GROUP BY 1, 2), "
        "n AS (SELECT doc_id, SUM(cnt) AS n FROM cc GROUP BY 1) "
        "SELECT d.doc_id, COALESCE(round(SUM(-(cc.cnt / n.n) * "
        "ln(cc.cnt / n.n)), 8), 0.0) AS entropy "
        "FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id "
        "LEFT JOIN n ON n.doc_id = d.doc_id GROUP BY 1")
    base["docs_blocklist"] = (
        # whole-word alternation, same RE2 pattern the Ray stage compiles
        r"SELECT doc_id, CAST(len(regexp_extract_all(COALESCE(text, ''),"
        r" '\b(click|error|free|winner)\b')) AS BIGINT) AS n_hits "
        r"FROM documents")
    base["events_decay"] = (
        # dyadic 2^-d weights (d = whole days before max ts): every
        # partial sum is exact in float64, so no rounding grain
        "WITH r AS (SELECT max(epoch_us(ts)) AS m FROM events) "
        "SELECT user_id, SUM(CASE WHEN d <= 60 THEN "
        "1.0 / CAST(CAST(1 AS BIGINT) << CAST(LEAST(d, 60) AS BIGINT) "
        "AS DOUBLE) ELSE 0.0 END) AS score "
        "FROM (SELECT user_id, ((SELECT m FROM r) - epoch_us(ts)) "
        "// 86400000000 AS d FROM events) t GROUP BY 1")
    base["embed_pq_topk"] = (
        # PQ-ADC with one-hot codebooks: code = argmax of the subvector
        # element (tie -> lower position); ADC distance = sum over
        # subspaces of ||q_s - e_code||^2, round-6 key (code-vector
        # collisions give EXACTLY equal distance up to summation order;
        # the grain collapses both sides to the nid tie-break)
        "WITH x AS MATERIALIZED (SELECT vec_id, "
        "CAST(t.i - 1 AS BIGINT) AS i, "
        "CAST(embedding[t.i] AS DOUBLE) AS v "
        "FROM embeddings, range(1, 65) t(i)), "
        "xs AS MATERIALIZED (SELECT vec_id, i // 8 AS s, i % 8 AS p, v "
        "FROM x), "
        "codes AS MATERIALIZED (SELECT vec_id, s, p AS code FROM ("
        "SELECT vec_id, s, p, row_number() OVER ("
        "PARTITION BY vec_id, s ORDER BY v DESC, p) AS rn FROM xs) "
        "WHERE rn = 1), "
        "q AS (SELECT * FROM xs WHERE vec_id IN (0, 1, 2)), "
        "lut AS MATERIALIZED (SELECT q.vec_id AS qid, q.s, j.code, "
        "SUM(POWER(q.v - CASE WHEN q.p = j.code THEN 1.0 ELSE 0.0 END, "
        "2)) AS dd FROM q CROSS JOIN (SELECT CAST(range AS BIGINT) "
        "AS code FROM range(8)) j GROUP BY 1, 2, 3), "
        "dist AS (SELECT l.qid, c.vec_id AS nid, round(SUM(l.dd), 6) "
        "AS d FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code "
        "GROUP BY 1, 2) "
        "SELECT query_id, neighbor_id, rank FROM ("
        "SELECT qid AS query_id, nid AS neighbor_id, row_number() OVER "
        "(PARTITION BY qid ORDER BY d, nid) AS rank FROM dist) "
        "WHERE rank <= 10")
    # BPE merge fitting, replayed round by round: symbols render as
    # chr(2)||sym||chr(3) brackets (absent from the corpus), so greedy
    # left-to-right non-overlapping pair merging IS SQL replace(), and
    # adjacent-pair extraction is a list zip over the split symbols.
    # Chained per-round CTEs are MATERIALIZED (DuckDB would otherwise
    # inline and re-evaluate the prefix exponentially).
    _bpe = [
        r"WITH tok AS MATERIALIZED (SELECT unnest(list_filter("
        r"string_split_regex(COALESCE(text, ''), '\s+'), "
        r"x -> x <> '')) AS w FROM documents), "
        r"v0 AS MATERIALIZED (SELECT cnt, regexp_replace(w, '(.)', "
        r"chr(2) || '\1' || chr(3), 'g') AS s FROM ("
        r"SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok "
        r"GROUP BY 1) t)"]
    for _r in range(1, 7):
        _bpe.append(
            f", p{_r} AS MATERIALIZED (SELECT syms[i] AS a, "
            f"syms[i+1] AS b, SUM(cnt) AS c FROM (SELECT cnt, "
            f"str_split(substr(s, 2, length(s) - 2), "
            f"chr(3) || chr(2)) AS syms FROM v{_r - 1}) t, "
            f"LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) "
            f"AS i) g GROUP BY 1, 2), "
            f"b{_r} AS MATERIALIZED (SELECT a, b, c FROM p{_r} "
            f"ORDER BY c DESC, a, b LIMIT 1), "
            # COALESCE to a never-matching pattern when the round ran
            # out of pairs (empty b{r}) — s must pass through unchanged
            f"v{_r} AS MATERIALIZED (SELECT cnt, replace(s, "
            f"COALESCE(chr(2) || (SELECT a FROM b{_r}) || chr(3) || "
            f"chr(2) || (SELECT b FROM b{_r}) || chr(3), chr(1)), "
            f"COALESCE(chr(2) || (SELECT a FROM b{_r}) || "
            f"(SELECT b FROM b{_r}) || chr(3), chr(1))) AS s "
            f"FROM v{_r - 1})")
    base["docs_bpe_merges"] = "".join(_bpe) + " " + " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS step, (SELECT c FROM b{r}) "
        f"AS cnt, (SELECT a || chr(31) || b FROM b{r}) AS pair "
        f"WHERE EXISTS (SELECT 1 FROM b{r})"
        for r in range(1, 7))
    # checkpoint/resume identity: the resumed run must land on exactly
    # the straight-through 5-superstep scores, so the oracle IS the
    # pagerank_iter5 recursion verbatim
    base["pagerank_resume5"] = base["pagerank_iter5"]
    for suite, names in SUITES.items():
        base[suite] = _suite_sql([(n, base[n]) for n in names])
    for suite, (cols, specs, cast) in RENAME_SUITES.items():
        base[suite] = _suite_sql_renamed(
            [(n, base[n], c) for n, c in specs], cols, cast)
    for suite, (valkind, specs) in PACKED_SUITES.items():
        base[suite] = _suite_sql_packed(specs, valkind, base)
    return {name: _normalize_sql_round(sql) for name, sql in base.items()}
