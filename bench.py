"""Benchmark harness — prints ONE JSON line to stdout.

Headline: the north-rule pipeline on the deterministic synthetic repo
table — build the repo→repo graph (derive + encode + partition), then run
PageRank (20 supersteps) and WCC on the superstep engine, reporting
edges/sec per-superstep throughput. Also times the sf-dir queries.

Env:
  RAY_GRAFT_CPUS    cpus for ray.init (default 32)
  GRAFT_SF_DIR      testdata dir (default /root/testdata/sf0.1)
  GRAFT_BENCH_REPOS repo count for the synthetic graph (default 200000)

--scaling: runs the bench twice in fresh processes (8 and 32 cpus) on the
same input and reports both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_DIR = "/tmp/graft_bench"
SKIP_QUERIES = {"triangle_count", "local_clustering", "co_supply_edges",
                "label_propagation"}  # superlinear on the near-complete
                                      # sf0.1 co-supply graph / rows-only


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_repos = int(os.environ.get("GRAFT_BENCH_REPOS", "200000"))

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from graph_data_science_ray.sources.repo_source import write_repo_table
    from graph_data_science_ray.pipelines.graph_pipeline import build_graph_from_repos
    from graph_data_science_ray.pipelines.pagerank import PageRankProgram
    from graph_data_science_ray.pipelines.wcc import WCCProgram
    from graph_data_science_ray.stages.superstep import SuperstepEngine

    os.makedirs(BENCH_DIR, exist_ok=True)
    repos_path = os.path.join(BENCH_DIR, f"repos_n{n_repos}_s42.parquet")
    if not os.path.exists(repos_path):
        log(f"generating repo table n={n_repos} ...")
        write_repo_table(repos_path, n_repos, files_per_repo=3,
                         avg_imports_per_file=5, seed=42)
    # warm the page cache so we measure compute + shuffle, not cold reads
    with open(repos_path, "rb") as f:
        while f.read(1 << 24):
            pass

    detail: dict = {"num_repos": n_repos}
    graph_dir = os.path.join(BENCH_DIR, f"graph_n{n_repos}_P{num_cpus}")
    t0 = time.perf_counter()
    import shutil
    shutil.rmtree(graph_dir, ignore_errors=True)
    graph = build_graph_from_repos(repos_path, graph_dir, num_parts=num_cpus,
                                   verify_digest=True)
    detail["graph_build_sec"] = round(time.perf_counter() - t0, 3)
    detail["num_vertices"] = graph.n
    detail["num_edges"] = graph.num_edges
    log(f"graph: {graph.n} vertices, {graph.num_edges} edges, "
        f"build {detail['graph_build_sec']}s")

    engine = SuperstepEngine(graph)
    t0 = time.perf_counter()
    pr = engine.run(PageRankProgram(tolerance=0.0), max_iterations=20,
                    collect=("rank",))
    pr_sec = time.perf_counter() - t0
    pr_edges = sum(m["sent_edges"] for m in pr.metrics)
    pr_step_wall = sum(m["wall_sec"] for m in pr.metrics)
    detail["pagerank_sec"] = round(pr_sec, 3)
    detail["pagerank_iterations"] = len(pr.metrics)
    detail["pagerank_edges_per_sec"] = round(pr_edges / pr_step_wall, 1)
    log(f"pagerank: {pr_sec:.2f}s, {detail['pagerank_edges_per_sec']:.0f} edges/s")

    t0 = time.perf_counter()
    cc = engine.run(WCCProgram(), max_iterations=100, collect=("label",))
    wcc_sec = time.perf_counter() - t0
    cc_edges = sum(m["sent_edges"] for m in cc.metrics)
    cc_step_wall = sum(m["wall_sec"] for m in cc.metrics)
    detail["wcc_sec"] = round(wcc_sec, 3)
    detail["wcc_iterations"] = len(cc.metrics)
    detail["wcc_edges_per_sec"] = round(cc_edges / max(cc_step_wall, 1e-9), 1)
    engine.shutdown()
    log(f"wcc: {wcc_sec:.2f}s in {len(cc.metrics)} iterations")

    headline = pr_sec + wcc_sec
    detail["superstep_edges_per_sec"] = round(
        (pr_edges + cc_edges) / (pr_step_wall + cc_step_wall), 1)

    queries: dict[str, float] = {}
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    for name, fn in entrymod.queries().items():
        if name in SKIP_QUERIES:
            continue
        t0 = time.perf_counter()
        try:
            result = fn(sf_dir)
            import ray.data as rd
            if isinstance(result, rd.Dataset):
                result.count()
            queries[name] = round(time.perf_counter() - t0, 3)
            log(f"query {name}: {queries[name]}s")
        except Exception as e:  # keep the bench line intact
            log(f"query {name} FAILED: {e}")
            queries[name] = -1.0

    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "repo_graph_pagerank_wcc_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": num_cpus,
        "detail": detail,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    env_common = dict(os.environ)
    results = {}
    for cpus in (8, 32):
        env = dict(env_common, RAY_GRAFT_CPUS=str(cpus))
        log(f"--- scaling run: {cpus} cpus ---")
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True)
        sys.stderr.write(proc.stderr[-2000:])
        line = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["value"]
    t32 = results[32]["value"]
    tp8 = results[8]["detail"]["superstep_edges_per_sec"]
    tp32 = results[32]["detail"]["superstep_edges_per_sec"]
    return {
        "metric": "scaling_8_to_32",
        "sec_8": t8,
        "sec_32": t32,
        "superstep_edges_per_sec_8": tp8,
        "superstep_edges_per_sec_32": tp32,
        "scaling_efficiency_wall": round((t8 / t32) / 4.0, 3),
        "scaling_efficiency_superstep": round((tp32 / tp8) / 4.0, 3),
        "num_repos": results[32]["detail"]["num_repos"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
