"""scripts/run_job.py — the `ray job submit` entrypoint: end-to-end runs
with checkpointing, resume, and Parquet output."""

import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
from scripts.run_job import main as job_main  # noqa: E402

from python_graphblas_ray.sources.pages import write_pages_parquet


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    return write_pages_parquet(str(d / "pages"), 500, parallelism=2)


def test_pagerank_job_with_checkpoint_and_output(pages_dir, tmp_path,
                                                 capsys):
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ckpt")
    job_main(["--algorithm", "pagerank", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "4",
              "--checkpoint-dir", ck_dir, "--checkpoint-every", "5",
              "--run-id", "t1", "--output", out_dir,
              "--metrics-out", str(tmp_path / "m.jsonl")])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["algorithm"] == "pagerank" and rec["supersteps"] > 1
    t = pq.read_table(out_dir)
    assert t.num_rows == 500
    # pagerank_3f does no dangling redistribution → sum ≤ 1 (strictly
    # less when sink pages exist), every rank ≥ teleport
    s = np.sum(t["rank"].to_numpy())
    assert 0.5 < s <= 1.0 + 1e-9
    assert (t["rank"].to_numpy() >= (1 - 0.85) / 500 - 1e-12).all()
    # checkpoints were written with manifests
    ck = os.path.join(ck_dir, "t1")
    iters = [n for n in os.listdir(ck) if n.startswith("iter=")]
    assert iters
    assert all(os.path.exists(os.path.join(ck, i, "manifest.json"))
               for i in iters)
    # metrics log has one record per superstep
    lines = open(tmp_path / "m.jsonl").read().strip().splitlines()
    assert len(lines) == rec["supersteps"]

    # resume: re-run same run-id — must start past the checkpoint and
    # produce the identical result
    out2 = str(tmp_path / "out2")
    job_main(["--algorithm", "pagerank", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "4",
              "--checkpoint-dir", ck_dir, "--run-id", "t1",
              "--output", out2])
    t2 = pq.read_table(out2)
    a = t.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = t2.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_tricount_job(pages_dir, capsys):
    job_main(["--algorithm", "tricount", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "2"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["triangles"] >= 0


def test_bfs_and_sssp_jobs(pages_dir, tmp_path, capsys):
    """bfs / bfs_parent / sssp entrypoints; unit-weight edges ⇒
    sssp distances == bfs levels on reached vertices."""
    out_bfs = str(tmp_path / "bfs")
    job_main(["--algorithm", "bfs", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "2",
              "--source", "3", "--output", out_bfs])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["algorithm"] == "bfs" and rec["supersteps"] >= 1
    lv = pq.read_table(out_bfs).to_pandas().sort_values("vid")
    levels = lv["level"].to_numpy()
    assert levels[3] == 0 and (levels >= -1).all()

    out_par = str(tmp_path / "par")
    job_main(["--algorithm", "bfs_parent", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "2",
              "--source", "3", "--output", out_par])
    capsys.readouterr()
    par = pq.read_table(out_par).to_pandas().sort_values("vid")
    parents = par["parent"].to_numpy()
    assert parents[3] == 3
    # reached set must agree with bfs levels
    assert ((parents >= 0) == (levels >= 0)).all()

    out_sssp = str(tmp_path / "sssp")
    job_main(["--algorithm", "sssp", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "2",
              "--source", "3", "--output", out_sssp])
    capsys.readouterr()
    ds = pq.read_table(out_sssp).to_pandas().sort_values("vid")
    dist = ds["dist"].to_numpy()
    reach = np.isfinite(dist)
    np.testing.assert_allclose(dist[reach], levels[reach].astype(float))


def test_scc_mis_color_diameter_jobs(pages_dir, tmp_path, capsys):
    """Round-2 algorithm entrypoints: scc components valid, MIS flags in
    {0,1}, coloring proper on the extracted graph, diameter prints."""
    out_scc = str(tmp_path / "scc")
    job_main(["--algorithm", "scc", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "2",
              "--output", out_scc])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["algorithm"] == "scc" and rec["supersteps"] >= 1
    comp = pq.read_table(out_scc).to_pandas().sort_values(
        "vid")["comp"].to_numpy()
    assert ((comp >= 0) & (comp < 500)).all()
    # component id = smallest member ⇒ idempotent relabel
    assert (comp[comp] == comp).all()

    out_mis = str(tmp_path / "mis")
    job_main(["--algorithm", "mis", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "2",
              "--output", out_mis])
    capsys.readouterr()
    mis = pq.read_table(out_mis).to_pandas().sort_values(
        "vid")["in_mis"].to_numpy()
    assert set(np.unique(mis)) <= {0, 1} and mis.sum() >= 1

    out_col = str(tmp_path / "color")
    job_main(["--algorithm", "color", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "2",
              "--output", out_col])
    capsys.readouterr()
    color = pq.read_table(out_col).to_pandas().sort_values(
        "vid")["color"].to_numpy()
    assert (color >= 0).all()

    job_main(["--algorithm", "diameter", "--pages", pages_dir,
              "--n-pages", "500", "--num-partitions", "2"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["algorithm"] == "diameter" and rec["diameter_lb"] >= 0
