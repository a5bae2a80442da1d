"""Benchmark harness — prints ONE JSON line with per-pipeline seconds.

Headline pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
with ``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32):

- ``pages_ingest``     — synthetic Common-Crawl-style pages (sized ∝ sf) →
  link extraction → edge table (the BASELINE.json input_hint front-end).
- ``pagerank``         — engine build + pagerank_3f loop to tol=1e-6 over
  those edges (the north-star metric; edges/sec recorded too).
- ``connected_components`` / ``triangle_count`` — same graph.
- ``minhash_dedup``    — MinHash-LSH near-dup pairs over documents.
- ``embedding_ann``    — brute-force cosine top-10 for 32 queries over
  embeddings.
- ``events_window``    — tumbling-day windowed aggregate over events.

``--scaling``: runs the pagerank headline twice in FRESH processes
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency = (T_8 / T_32) / 4 — the sandbox substitute for the
N vs 4N-node cluster criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import numpy as np  # noqa: F401
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from python_graphblas_ray.pipelines.algorithms import (
        build_engine, connected_components, pagerank)
    from python_graphblas_ray.pipelines.dedup import minhash_lsh_pairs
    from python_graphblas_ray.pipelines.ingest import extract_edges
    from python_graphblas_ray.pipelines.similarity import ann_topk
    from python_graphblas_ray.pipelines.triangles import (
        triangle_count_broadcast)
    from python_graphblas_ray.pipelines.windows import windowed_aggregate
    from python_graphblas_ray.sources.pages import pages_dataset

    sf = _sf_from_dir(sf_dir)
    n_pages = max(2000, int(sf * 1_000_000))  # sf0.1 → 100k pages
    parallelism = max(8, num_cpus * 2)
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    t0 = time.time()
    pages = pages_dataset(n_pages, parallelism=parallelism)
    edges = extract_edges(pages).materialize()
    timings["pages_ingest"] = time.time() - t0

    t0 = time.time()
    eng = build_engine(edges, n_pages, num_partitions=num_cpus)
    timings["graph_build"] = time.time() - t0

    t0 = time.time()
    r, iters, _ = pagerank(eng, tol=1e-6)
    timings["pagerank"] = time.time() - t0
    extra["pagerank_supersteps"] = iters
    extra["num_edges"] = eng.num_edges
    extra["pagerank_edges_per_sec"] = (
        eng.num_edges * iters / timings["pagerank"])
    eng.shutdown()

    t0 = time.time()
    eng_u = build_engine(edges, n_pages, num_partitions=num_cpus,
                         undirected=True)
    timings["graph_build_undirected"] = time.time() - t0
    t0 = time.time()
    f, cc_iters, _ = connected_components(eng_u)
    timings["connected_components"] = time.time() - t0
    eng_u.shutdown()

    t0 = time.time()
    tri = triangle_count_broadcast(edges, num_tasks=num_cpus)
    timings["triangle_count"] = time.time() - t0
    extra["triangles"] = tri

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    n_pairs = pairs.count()
    timings["minhash_dedup"] = time.time() - t0
    extra["neardup_pairs"] = n_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.time()
    ann = ann_topk(emb, query_ids=list(range(32)), k=10)
    ann.count()
    timings["embedding_ann"] = time.time() - t0

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    t0 = time.time()
    windowed_aggregate(ev, keys=("event_type",), every="day").count()
    timings["events_window"] = time.time() - t0

    return {"timings": timings, "extra": extra}


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        # fresh process per parallelism level (clean Ray session each)
        results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--single"],
                env={**os.environ, "RAY_GRAFT_CPUS": str(cpus),
                     "GRAFT_SF_DIR": sf_dir},
                capture_output=True, text=True, timeout=3600)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            results[cpus] = json.loads(line)
        tp8 = results[8]["extra"]["pagerank_edges_per_sec"]
        tp32 = results[32]["extra"]["pagerank_edges_per_sec"]
        eff = (tp32 / tp8) / 4.0
        print(json.dumps({
            "metric": "pagerank scaling efficiency 8→32 cpus",
            "value": round(eff, 4), "unit": "efficiency",
            "edges_per_sec_8": tp8, "edges_per_sec_32": tp32,
            "pagerank_sec_8": results[8]["queries"]["pagerank"],
            "pagerank_sec_32": results[32]["queries"]["pagerank"],
            "sf": _sf_from_dir(sf_dir), "num_cpus": [8, 32],
        }))
        return

    if "--single" in sys.argv or True:
        import ray

        res = run_benchmarks(sf_dir, num_cpus)
        total = sum(res["timings"].values())
        out = {
            "metric": "headline pipeline wall-time",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in res["timings"].items()},
            "sf": _sf_from_dir(sf_dir),
            "num_cpus": num_cpus,
        }
        out.update({k: (round(float(v), 3) if isinstance(v, (float,))
                        else int(v))
                    for k, v in res["extra"].items()})
        print(json.dumps(out))
        ray.shutdown()


if __name__ == "__main__":
    main()
