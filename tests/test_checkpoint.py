"""Per-superstep checkpoint + lineage manifest + mid-iteration resume."""

import json
import os

import numpy as np

from graph_data_science_ray import oracle as orc
from graph_data_science_ray.stages.superstep import (
    PartitionedGraph,
    SuperstepEngine,
    latest_complete_iteration,
)
from graph_data_science_ray.pipelines.pagerank import PageRankProgram, pagerank
from graph_data_science_ray.pipelines.wcc import wcc

from conftest import random_graph


def test_checkpoint_layout_and_lineage(ray_session, tmp_path):
    src, dst, _ = random_graph(200, 1000, seed=13)
    ckpt = str(tmp_path / "ckpt")
    res = pagerank(PartitionedGraph.from_arrays(200, src, dst),
                   max_iterations=8, num_parts=3,
                   checkpoint_dir=ckpt, checkpoint_interval=2)
    iters = sorted(int(d.split("=")[1]) for d in os.listdir(ckpt))
    assert 0 in iters and iters[-1] >= 6
    with open(os.path.join(ckpt, f"iter={iters[-1]}", "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["complete"]
    assert manifest["num_parts"] == 3
    assert "edges_per_sec" in manifest["metrics"]
    # every partition's state file is present
    import glob
    files = glob.glob(os.path.join(ckpt, f"iter={iters[-1]}", "part=*.parquet"))
    assert len(files) == 3


def test_resume_mid_iteration_matches_uninterrupted(ray_session, tmp_path):
    """Kill/resume: run 4 iterations with checkpoints, then resume a fresh
    engine (fresh actors) from the checkpoint and finish; scores must be
    identical to an uninterrupted run."""
    src, dst, _ = random_graph(300, 2000, seed=21)
    g = PartitionedGraph.from_arrays(300, src, dst)
    full = pagerank(g, max_iterations=12, num_parts=4, tolerance=0.0)
    full_ranks = full.to_pandas()["rank"].to_numpy()

    ckpt = str(tmp_path / "ckpt")
    # phase 1: crashes after iteration 3 (checkpoint every iteration)
    pagerank(g, max_iterations=4, num_parts=4, tolerance=0.0,
             checkpoint_dir=ckpt, checkpoint_interval=1)
    assert latest_complete_iteration(ckpt) == 3

    # phase 2: fresh engine resumes from iter=3 and continues to 12
    eng = SuperstepEngine(PartitionedGraph.from_arrays(300, src, dst),
                          num_parts=4)
    try:
        res = eng.run(PageRankProgram(tolerance=0.0), max_iterations=12,
                      checkpoint_dir=ckpt, resume=True, collect=("rank",))
    finally:
        eng.shutdown()
    resumed_ranks = res.to_pandas()["rank"].to_numpy()
    assert np.array_equal(resumed_ranks, full_ranks)
    expected, _, _ = orc.pagerank(300, src, dst, tolerance=0.0,
                                  max_iterations=12)
    assert np.allclose(resumed_ranks, expected, atol=1e-9)


def test_resume_with_different_partition_count_fails_gracefully(ray_session, tmp_path):
    """Resume requires the same partition layout; a fresh run works."""
    src, dst, _ = random_graph(100, 400, seed=5)
    ckpt = str(tmp_path / "ckpt")
    pagerank(PartitionedGraph.from_arrays(100, src, dst), max_iterations=3,
             num_parts=2, checkpoint_dir=ckpt, checkpoint_interval=1)
    assert latest_complete_iteration(ckpt) == 2
    res = wcc(PartitionedGraph.from_arrays(100, src, dst), num_parts=2)
    assert res.converged
