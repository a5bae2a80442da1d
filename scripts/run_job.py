"""Cluster job entrypoint — submit with::

    ray job submit --working-dir . -- \
        python scripts/run_job.py --algorithm pagerank \
        --pages /data/pages_parquet --n-pages 1000000 \
        --checkpoint-dir /data/ckpt --run-id run1 --output /data/out

Reads the Common-Crawl-style pages Parquet (``url, warc_ts, html, text,
lang``), extracts the link graph, runs the requested algorithm with
per-partition checkpoints every ``--checkpoint-every`` supersteps, and
writes the per-vertex result as partitioned Parquet. Re-submitting the
same ``--run-id`` resumes from the latest complete checkpoint.

On the driver-managed sandbox Ray is already local; on a real cluster
``ray.init(address="auto")`` attaches to the running cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python scripts/run_job.py` puts scripts/ (not the repo root) on
# sys.path; `ray job submit --working-dir .` ships the root — handle both
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--algorithm", default="pagerank",
                   choices=["pagerank", "cc", "lpa", "tricount",
                            "bfs", "bfs_parent", "sssp", "hits",
                            "scc", "mis", "color", "closeness",
                            "diameter", "eccentricity", "katz",
                            "matching", "minhash"])
    p.add_argument("--cluster", action="store_true",
                   help="attach to a running Ray cluster "
                        "(ray.init(address='auto')) instead of "
                        "starting a local one")
    p.add_argument("--join-mode", default=None,
                   choices=["materialize", "streaming"],
                   help="override config['join_mode'] for this job "
                        "(streaming = the multi-node barrier-free "
                        "route)")
    p.add_argument("--frontier", default="slice",
                   choices=["slice", "sub"],
                   help="pagerank_inactor frontier transport")
    p.add_argument("--source", type=int, default=0,
                   help="source vertex for bfs/bfs_parent/sssp")
    p.add_argument("--pages", required=True,
                   help="pages Parquet dir (url, warc_ts, html, text, lang)")
    p.add_argument("--n-pages", type=int, required=True)
    p.add_argument("--num-partitions", type=int, default=32)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=10)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--output", default=None)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--hub-split-factor", type=float, default=2.0,
                   help="split any dst range whose edge count exceeds "
                        "this multiple of the per-partition target "
                        "(power-law skew); 0 disables splitting")
    p.add_argument("--metrics-out", default=None)
    args = p.parse_args(argv)

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="auto" if args.cluster else "local",
                 include_dashboard=False)

    if args.join_mode:
        from python_graphblas_ray import config as _gb_config
        _gb_config["join_mode"] = args.join_mode

    from python_graphblas_ray.pipelines.algorithms import (
        approx_diameter, bfs_level, bfs_parent, build_engine,
        closeness_centrality, connected_components, greedy_color, hits,
        label_propagation, maximal_independent_set, pagerank, scc, sssp)
    from python_graphblas_ray.pipelines.ingest import extract_edges
    from python_graphblas_ray.pipelines.triangles import (
        triangle_count_broadcast)
    from python_graphblas_ray.state.checkpoint import (
        CheckpointManager, SuperstepMetrics)

    t0 = time.time()

    if args.algorithm == "minhash":
        # near-dup over the pages' extracted text (doc id = page id):
        # the dedup leg of the cluster-evidence run — streams through
        # the guarded one-exchange MinHash-LSH path
        import pyarrow.compute as pc

        from python_graphblas_ray.pipelines.dedup import minhash_lsh_pairs
        from python_graphblas_ray.pipelines.ingest import (
            extract_text_table)

        docs = extract_text_table(
            ray.data.read_parquet(args.pages, columns=["url", "html"]))

        def _docify(b: pa.Table) -> pa.Table:
            m = pc.extract_regex(b["url"], r"/page/(?P<id>\d+)$")
            return pa.table({
                "doc_id": pc.struct_field(m, "id").cast(pa.int64()),
                "text": b["extracted_text"]})

        pairs = minhash_lsh_pairs(
            docs.map_batches(_docify, batch_format="pyarrow"),
            threshold=0.5)
        npairs = pairs.count()
        print(json.dumps({"algorithm": "minhash", "pairs": int(npairs),
                          "n": args.n_pages,
                          "sec": round(time.time() - t0, 2)}))
        return

    pages = ray.data.read_parquet(args.pages, columns=["url", "html"])
    edges = extract_edges(pages).materialize()

    if args.algorithm == "tricount":
        tri = triangle_count_broadcast(edges, num_tasks=args.num_partitions)
        print(json.dumps({"algorithm": "tricount", "triangles": int(tri),
                          "sec": round(time.time() - t0, 2)}))
        return

    ckpt = (CheckpointManager(args.checkpoint_dir, args.run_id,
                              args.num_partitions)
            if args.checkpoint_dir else None)
    metrics = SuperstepMetrics()
    undirected = args.algorithm in ("cc", "lpa", "mis", "color")
    eng = build_engine(edges, args.n_pages,
                       num_partitions=args.num_partitions,
                       undirected=undirected,
                       weighted=(args.algorithm == "sssp"),
                       hub_split_factor=(args.hub_split_factor or None))

    # The submitted-job path runs the IN-ACTOR forms throughout —
    # O(P) driver work per superstep, vertex state pinned in the
    # partition actors (bit-parity with the broadcast recipes is
    # pinned by tests/test_fx_inactor.py). PageRank with a checkpoint
    # on a hub-split engine falls back to the broadcast path (the
    # slice-checkpoint layout is unsplit-range-keyed).
    if args.algorithm == "pagerank":
        if ckpt is not None and eng.has_hub_split:
            vec, iters, _ = pagerank(
                eng, tol=args.tol, checkpoint=ckpt,
                checkpoint_every=args.checkpoint_every,
                metrics=metrics)
        else:
            vec, iters = eng.pagerank_inactor(
                tol=args.tol, checkpoint=ckpt,
                checkpoint_every=args.checkpoint_every,
                metrics=metrics, frontier=args.frontier)
        col = "rank"
    elif args.algorithm == "cc":
        vec, iters = eng.connected_components_inactor(metrics=metrics)
        col = "comp"
    elif args.algorithm == "bfs":
        vec, _ = eng.bfs_level_inactor(args.source, metrics=metrics)
        iters = len(metrics.records)
        col = "level"
    elif args.algorithm == "bfs_parent":
        vec, _ = eng.bfs_parent_inactor(args.source, metrics=metrics)
        iters = len(metrics.records)
        col = "parent"
    elif args.algorithm == "sssp":
        vec, _ = eng.sssp_inactor(args.source, metrics=metrics)
        iters = len(metrics.records)
        col = "dist"
    elif args.algorithm == "hits":
        vec, _, iters, _ = hits(eng, tol=args.tol, metrics=metrics)
        col = "hub"
    elif args.algorithm == "scc":
        vec, iters, _ = eng.scc_inactor(metrics=metrics)
        col = "comp"
    elif args.algorithm == "mis":
        mis_mask, iters, _ = eng.mis_inactor(metrics=metrics)
        vec = mis_mask.astype(np.int64)
        col = "in_mis"
    elif args.algorithm == "color":
        vec, iters, _ = eng.greedy_color_inactor(metrics=metrics)
        col = "color"
    elif args.algorithm == "closeness":
        vec, _ = eng.closeness_inactor(
            sources=range(0, args.n_pages,
                          max(1, args.n_pages // 8)),
            metrics=metrics)
        iters = len(metrics.records)
        col = "closeness"
    elif args.algorithm == "eccentricity":
        from python_graphblas_ray.pipelines.anf import (
            hyperball_eccentricity)
        vec, _ = hyperball_eccentricity(eng)
        iters = int(vec.max()) if len(vec) else 0
        col = "eccentricity"
    elif args.algorithm == "katz":
        vec = np.ones(args.n_pages, dtype=np.float64)
        for _ in range(20):
            vec = 1.0 + 0.0078125 * eng.spmv("plus_second", vec)
        iters = 20
        col = "katz"
    elif args.algorithm == "matching":
        from python_graphblas_ray.pipelines.matching import (
            maximal_matching)
        mu, mv, mr = maximal_matching(edges, args.n_pages)
        print(json.dumps({"algorithm": "matching",
                          "matched_pairs": int(len(mu)),
                          "rounds": int(mr.max()) if len(mr) else 0,
                          "sec": round(time.time() - t0, 2)}))
        eng.shutdown()
        return
    elif args.algorithm == "diameter":
        d, endpoints, _ = approx_diameter(eng, metrics=metrics)
        print(json.dumps({"algorithm": "diameter", "diameter_lb": int(d),
                          "endpoints": [int(x) for x in endpoints],
                          "sec": round(time.time() - t0, 2)}))
        eng.shutdown()
        return
    else:
        vec, iters = eng.label_propagation_inactor(metrics=metrics)
        col = "label"

    if args.output:
        out = ray.data.from_arrow(pa.table({
            "vid": np.arange(args.n_pages, dtype=np.int64), col: vec}))
        out.repartition(args.num_partitions).write_parquet(args.output)
    if args.metrics_out:
        metrics.dump(args.metrics_out)
    print(json.dumps({
        "algorithm": args.algorithm, "supersteps": int(iters),
        "edges": int(eng.num_edges), "n": args.n_pages,
        "sec": round(time.time() - t0, 2),
        "edges_per_sec": round(eng.num_edges * max(iters, 1) /
                               max(metrics.total_sec, 1e-9), 1),
    }))
    eng.shutdown()


if __name__ == "__main__":
    main()
