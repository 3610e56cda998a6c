"""Cluster job entrypoint — run via `ray job submit -- python tools/run_job.py ...`
(locally: plain `python tools/run_job.py`).

Builds (or reuses) the repo-derived graph and runs the requested
algorithm with per-superstep checkpointing, resuming from the latest
complete checkpoint if --resume is set. Prints one JSON result line.

Example:
  ray job submit --working-dir . -- python tools/run_job.py \\
      --repos /data/repos.parquet --graph-dir /data/graph \\
      --algorithm pagerank --checkpoint-dir /data/ckpt --resume
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repos", help="repo-table parquet (build input)")
    ap.add_argument("--graph-dir", required=True)
    ap.add_argument("--algorithm", default="pagerank",
                    choices=["pagerank", "wcc", "labelprop"])
    ap.add_argument("--num-parts", type=int, default=None)
    ap.add_argument("--max-iterations", type=int, default=20)
    ap.add_argument("--tolerance", type=float, default=1e-7)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-interval", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output", default=None, help="parquet output dir")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from graph_data_science_ray.estimation import check_fits
    from graph_data_science_ray.pipelines.graph_pipeline import build_graph_from_repos
    from graph_data_science_ray.pipelines.labelprop import LabelPropagationProgram
    from graph_data_science_ray.pipelines.pagerank import PageRankProgram
    from graph_data_science_ray.pipelines.wcc import WCCProgram
    from graph_data_science_ray.stages.superstep import (
        PartitionedGraph, SuperstepEngine)

    t0 = time.perf_counter()
    if os.path.exists(os.path.join(args.graph_dir, "manifest.json")):
        graph = PartitionedGraph.from_manifest(args.graph_dir)
    else:
        if not args.repos:
            ap.error("--repos required when graph-dir has no manifest")
        cpus = int(ray.cluster_resources().get("CPU", 8))
        graph = build_graph_from_repos(args.repos, args.graph_dir,
                                       num_parts=args.num_parts or cpus)
    build_sec = time.perf_counter() - t0

    fits, est = check_fits(args.algorithm, graph.n, graph.num_edges,
                           num_parts=args.num_parts or 16)
    if not fits:
        print(json.dumps({"error": "memory estimation gate",
                          "estimate_max_bytes": est.max_bytes,
                          "estimate": est.render()}))
        sys.exit(2)

    engine = SuperstepEngine(graph, num_parts=args.num_parts)
    if args.algorithm == "pagerank":
        prog, collect = PageRankProgram(tolerance=args.tolerance), ("rank",)
        kwargs = {}
    elif args.algorithm == "wcc":
        prog, collect, kwargs = WCCProgram(n=graph.n), ("label",), {}
    else:
        prog = LabelPropagationProgram(graph.n, waves=16)
        collect = ("label",)
        kwargs = {"convergence": "changed", "convergence_window": 16}

    # for labelprop, --max-iterations means SWEEPS (like the library
    # wrapper): one full sweep is `waves` supersteps
    max_supersteps = args.max_iterations
    if args.algorithm == "labelprop":
        max_supersteps = args.max_iterations * 16 + 1

    t0 = time.perf_counter()
    res = engine.run(prog, max_iterations=max_supersteps,
                     checkpoint_dir=args.checkpoint_dir,
                     checkpoint_interval=(args.checkpoint_interval
                                          if args.checkpoint_dir else 0),
                     resume=args.resume, collect=collect, **kwargs)
    algo_sec = time.perf_counter() - t0
    if args.output:
        res.to_dataset().write_parquet(args.output)
    engine.shutdown()
    edges = sum(m["sent_edges"] for m in res.metrics)
    print(json.dumps({
        "algorithm": args.algorithm,
        "num_vertices": graph.n,
        "num_edges": graph.num_edges,
        "build_sec": round(build_sec, 3),
        "algo_sec": round(algo_sec, 3),
        "iterations": len(res.metrics),
        "converged": res.converged,
        "edges_per_sec": round(edges / max(res.total_wall_sec, 1e-9), 1),
        "estimate_bytes": est.max_bytes,
        "output": args.output,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()