"""Per-partition skew probe: run PageRank + WCC on a cached graph and
report per-partition t_emit / t_merge / sent_edges imbalance
(max / median over partitions, summed across supersteps).

Usage: python tools/skew_probe.py [graph_dir] [--iters N]
Default graph: the bench scaling cache
(/tmp/graft_bench/scaling_graph_synth_v8000000_P32).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("graph_dir", nargs="?",
                    default="/tmp/graft_bench/scaling_graph_synth_v8000000_P32")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from graph_data_science_ray.pipelines.pagerank import PageRankProgram
    from graph_data_science_ray.pipelines.wcc import WCCProgram
    from graph_data_science_ray.stages.superstep import (PartitionedGraph,
                                                         SuperstepEngine)

    graph = PartitionedGraph.from_manifest(args.graph_dir)
    engine = SuperstepEngine(graph)
    out = {"graph": args.graph_dir, "num_edges": graph.num_edges,
           "num_parts": engine.P}
    try:
        # warm both flows + actors outside measurement
        engine.run(PageRankProgram(tolerance=0.0), max_iterations=2,
                   collect=("rank",))
        engine.run(WCCProgram(n=graph.n), max_iterations=2,
                   collect=("label",))
        for name, prog, iters in (
                ("pagerank", PageRankProgram(tolerance=0.0), args.iters),
                ("wcc", WCCProgram(n=graph.n), args.iters)):
            res = engine.run(prog, max_iterations=iters,
                             collect=(prog.state_keys[0],))
            sums: dict[str, np.ndarray] = {}
            for m in res.metrics:
                for k, vals in m.get("phase_parts", {}).items():
                    sums[k] = sums.get(k, 0) + np.asarray(vals)
                sums["sent_edges"] = (sums.get("sent_edges", 0)
                                      + np.asarray(m.get("sent_parts", [])))
            rep = {}
            for k, v in sums.items():
                med = float(np.median(v))
                rep[k] = {
                    "max": round(float(v.max()), 4),
                    "median": round(med, 4),
                    "imbalance": round(float(v.max()) / med, 3)
                    if med > 0 else None,
                }
            out[name] = rep
    finally:
        engine.shutdown()
    json.dump(out, sys.stdout, indent=1)
    print()
    ray.shutdown()


if __name__ == "__main__":
    main()
