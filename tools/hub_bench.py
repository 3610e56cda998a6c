"""Hub-splitting at scale: planted mega-hub graph, split vs unsplit.

Generates (once, cached) a synthetic graph with pareto background
degrees plus `--hubs` planted mega-hubs of degree `--hub-deg`, then
runs PageRank + WCC with hub splitting off and on, reporting
per-partition emit-time / sent-message imbalance and wall time.

Usage: python tools/hub_bench.py [--vertices 2000000] [--hubs 8]
           [--hub-deg 1000000] [--iters 8]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/graft_bench"


def skewed_edges_ds(n_vertices: int, n_hubs: int, hub_deg: int,
                    avg_degree: float = 8.0, seed: int = 42):
    """Pareto background + planted mega-hubs (vids 0..n_hubs-1 each get
    hub_deg extra uniform out-edges), generated distributed."""
    import pyarrow as pa
    import ray.data as rd

    A = 2.5
    scale = avg_degree * (A - 2.0) / (A - 1.0)

    def _u01(x, salt):
        x = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + \
            np.uint64(salt)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    def gen(t: pa.Table) -> pa.Table:
        v = t["id"].to_numpy()
        u = np.maximum(_u01(v, seed), 1e-12)
        deg = np.minimum(np.maximum(
            (np.power(u, -1.0 / (A - 1.0)) * scale).astype(np.int64), 1),
            100000)
        deg = deg + np.where(v < n_hubs, hub_deg, 0)
        src = np.repeat(v, deg)
        starts = np.cumsum(deg) - deg
        within = np.arange(len(src), dtype=np.int64) - np.repeat(starts, deg)
        dst = (_u01(src * np.int64(131071) + within, seed + 1)
               * n_vertices).astype(np.int64)
        keep = src != dst
        return pa.table({"src": src[keep], "dst": dst[keep]})

    return rd.range(n_vertices, override_num_blocks=256).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=2_000_000)
    ap.add_argument("--hubs", type=int, default=8)
    ap.add_argument("--hub-deg", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--parts", type=int, default=32)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from graph_data_science_ray.pipelines.pagerank import PageRankProgram
    from graph_data_science_ray.pipelines.wcc import WCCProgram
    from graph_data_science_ray.sources.graph_build import build_int_graph
    from graph_data_science_ray.stages.superstep import (PartitionedGraph,
                                                         SuperstepEngine)

    gdir = os.path.join(
        CACHE, f"hubbench_v{args.vertices}_h{args.hubs}x{args.hub_deg}"
               f"_P{args.parts}")
    if not os.path.exists(os.path.join(gdir, "manifest.json")):
        print("building planted-hub graph (one-time, cached) ...",
              file=sys.stderr)
        build_int_graph(
            skewed_edges_ds(args.vertices, args.hubs, args.hub_deg),
            gdir, args.vertices, args.parts, dedup=True,
            lineage={"source": "hub_bench", "hubs": args.hubs,
                     "hub_deg": args.hub_deg})
    graph = PartitionedGraph.from_manifest(gdir)

    def measure(thr):
        import time
        engine = SuperstepEngine(graph, hub_degree_threshold=thr)
        out = {}
        try:
            engine.run(PageRankProgram(tolerance=0.0), max_iterations=2,
                       collect=("rank",))  # warm
            engine.run(WCCProgram(n=graph.n), max_iterations=2,
                       collect=("label",))
            for name, prog, iters in (
                    ("pagerank", PageRankProgram(tolerance=0.0),
                     args.iters),
                    ("wcc", WCCProgram(n=graph.n), args.iters)):
                t0 = time.perf_counter()
                res = engine.run(prog, max_iterations=iters,
                                 collect=(prog.state_keys[0],))
                wall = time.perf_counter() - t0
                emit = np.zeros(engine.P)
                sent = np.zeros(engine.P)
                for m in res.metrics:
                    emit += np.asarray(m["phase_parts"]["t_emit"])
                    sent += np.asarray(m["sent_parts"])
                out[name] = {
                    "wall_sec": round(wall, 3),
                    "emit_imbalance": round(
                        float(emit.max() / np.median(emit)), 3),
                    "sent_imbalance": round(
                        float(sent.max() / np.median(sent)), 3),
                    "sent_total": int(sent.sum()),
                }
        finally:
            engine.shutdown()
        return out

    result = {
        "graph": gdir, "num_edges": graph.num_edges,
        "unsplit": measure(None),
        "split": measure("auto"),
        "auto_threshold": max(65536,
                              graph.num_edges // (8 * args.parts)),
    }
    json.dump(result, sys.stdout, indent=1)
    print()
    ray.shutdown()


if __name__ == "__main__":
    main()
