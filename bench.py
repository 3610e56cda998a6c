"""Benchmark harness — prints ONE JSON line to stdout.

Headline: the north-rule pipeline on the deterministic synthetic repo
table — build the repo→repo graph (derive + encode + partition), then run
PageRank (20 supersteps) and WCC on the superstep engine, reporting
edges/sec per-superstep throughput. Also times the sf-dir queries.

Env:
  RAY_GRAFT_CPUS    cpus for ray.init (default 32)
  GRAFT_SF_DIR      testdata dir (default /root/testdata/sf0.1)
  GRAFT_BENCH_REPOS repo count for the synthetic graph (default 200000)

--scaling: runs the superstep bench in fresh taskset-pinned processes at
GRAFT_SCALING_CPUS levels (default 4,16,32) on the same cached 103M-edge
input and reports throughput at each level, the pairwise scaling
efficiencies, and the same-day STREAM memory-bandwidth envelope those
single-box efficiencies are bounded by (tools/membw_probe.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_DIR = "/tmp/graft_bench"
SKIP_QUERIES = {"triangle_count", "triangle_stream", "local_clustering",
                "transitivity", "co_supply_edges",
                "node_similarity", "node_similarity_cosine",
                "node_similarity_bottomk", "louvain",  # superlinear on the
                "label_propagation",  # near-complete sf0.1 co-supply graph
                "influence_max",  # CELF round-1 sweep is O(V · cascade)
                                  # — minutes on the dense sf0.1 graph;
                                  # value-checked at sf0.01 instead
                "max_k_cut",      # wave-scheduled sweeps don't converge
                                  # fast on the dense sf0.1 graph (206 s)
                "link_prediction",  # full pipeline (split+FastRP+GD
                                    # epochs); exercised at sf0.01
                "nc_pipeline_select",  # CV model selection = 7 trainer
                                       # fits; exercised at sf0.01
                "all_pairs"}      # O(V²) output on the sf0.1 graph


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _quick_membw(num_cpus: int) -> float | None:
    """One STREAM reading at the bench cpu level (tools/membw_probe.py,
    single level) — the same-artifact envelope for the headline trials.
    Evidence, not a dependency: None on failure."""
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "membw_probe.py")
    try:
        mp = subprocess.run(
            [sys.executable, probe, str(num_cpus)],
            capture_output=True, text=True, timeout=120)
        runs = json.loads(mp.stdout.strip().splitlines()[-1])["runs"]
        return runs[str(num_cpus)]
    except Exception as exc:
        log(f"membw probe failed: {exc}")
        return None


def _warm_page_cache(path: str) -> None:
    """Read file(s) once so timed runs measure compute, not cold I/O."""
    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass


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
    # many files, not one: single-file reads cap derivation parallelism
    # at the row-group layout (measured flat 8→32 cpus in round 2)
    repos_path = os.path.join(BENCH_DIR, f"repos_n{n_repos}_s42_sharded")
    if not os.path.exists(repos_path):
        log(f"generating repo table n={n_repos} ...")
        write_repo_table(repos_path, n_repos, num_files=128,
                         files_per_repo=3, avg_imports_per_file=5, seed=42)
    _warm_page_cache(repos_path)

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
    # warm: spawn workers + load BOTH flows outside the timed section
    engine.run(PageRankProgram(tolerance=0.0), max_iterations=2,
               collect=("rank",))
    engine.run(WCCProgram(n=graph.n), max_iterations=2, collect=("label",))

    # best-of-3 with a per-trial STREAM envelope: this VM's effective
    # memory bandwidth swings 3-10x between windows (r3: the same code
    # measured 2.7s in the driver artifact and 1.5s on a quiet host),
    # so each trial carries the membw reading that makes a slow number
    # attributable INSIDE the artifact
    trials = []
    for t in range(3):
        gbps = _quick_membw(num_cpus)
        t0 = time.perf_counter()
        pr = engine.run(PageRankProgram(tolerance=0.0), max_iterations=20,
                        collect=("rank",))
        pr_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        cc = engine.run(WCCProgram(n=graph.n), max_iterations=100,
                        collect=("label",))
        wcc_sec = time.perf_counter() - t0
        trial = {
            "pagerank_sec": round(pr_sec, 3),
            "wcc_sec": round(wcc_sec, 3),
            "membw_gbps_before": gbps,
            "pr_edges": sum(m["sent_edges"] for m in pr.metrics),
            "pr_step_wall": sum(m["wall_sec"] for m in pr.metrics),
            "cc_edges": sum(m["sent_edges"] for m in cc.metrics),
            "cc_step_wall": sum(m["wall_sec"] for m in cc.metrics),
            "pagerank_iterations": len(pr.metrics),
            "wcc_iterations": len(cc.metrics),
        }
        trials.append(trial)
        log(f"trial {t}: PR {pr_sec:.2f}s + WCC {wcc_sec:.2f}s "
            f"(membw {gbps} GB/s)")
    engine.shutdown()
    detail["membw_gbps_after"] = _quick_membw(num_cpus)

    best = min(trials, key=lambda tr: tr["pagerank_sec"] + tr["wcc_sec"])
    detail["pagerank_sec"] = best["pagerank_sec"]
    detail["pagerank_iterations"] = best["pagerank_iterations"]
    detail["pagerank_edges_per_sec"] = round(
        best["pr_edges"] / max(best["pr_step_wall"], 1e-9), 1)
    detail["wcc_sec"] = best["wcc_sec"]
    detail["wcc_iterations"] = best["wcc_iterations"]
    detail["wcc_edges_per_sec"] = round(
        best["cc_edges"] / max(best["cc_step_wall"], 1e-9), 1)
    detail["trials"] = [
        {k: tr[k] for k in ("pagerank_sec", "wcc_sec",
                            "membw_gbps_before")} for tr in trials]
    headline = best["pagerank_sec"] + best["wcc_sec"]
    detail["superstep_edges_per_sec"] = round(
        (best["pr_edges"] + best["cc_edges"])
        / max(best["pr_step_wall"] + best["cc_step_wall"], 1e-9), 1)
    log(f"headline (best of 3): {headline:.3f}s")

    # per-query attribution (r5): each query runs best-of-2 (min-of-N
    # timing absorbs one bad host window — r4's betweenness/closeness/
    # bfs_hops regressions were single-shot and unattributable), and a
    # STREAM membw stamp every 10 queries pins which hardware window
    # each group ran in, INSIDE the artifact
    queries: dict[str, float] = {}
    query_trials: dict[str, list[float]] = {}
    membw_stamps: list[dict] = []
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    import ray.data as rd
    for name, fn in entrymod.queries().items():
        if name in SKIP_QUERIES:
            continue
        if len(queries) % 10 == 0:
            membw_stamps.append({"before_query": name,
                                 "gbps": _quick_membw(num_cpus)})
        trials_q: list[float] = []
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                result = fn(sf_dir)
                if isinstance(result, rd.Dataset):
                    result.count()
                trials_q.append(round(time.perf_counter() - t0, 3))
            queries[name] = min(trials_q)
            query_trials[name] = trials_q
            log(f"query {name}: {queries[name]}s (trials {trials_q})")
        except Exception as e:  # keep the bench line intact
            log(f"query {name} FAILED: {e}")
            queries[name] = -1.0
    detail["query_trials"] = query_trials
    detail["query_membw_stamps"] = membw_stamps

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


def scaling_edges_ds(n_vertices: int, avg_degree: float = 13.5,
                     seed: int = 42):
    """Deterministic synthetic edge Dataset at superstep-scaling size:
    pareto-skewed out-degrees (hot senders), uniform targets — generated
    fully distributed (hash-derived per vertex/edge; no driver arrays,
    no string materialization). ~n_vertices*avg_degree edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    A = 2.5  # pareto shape (same as sources.generator power_law)
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
        raw = np.power(u, -1.0 / (A - 1.0))  # pareto+1 inverse CDF
        deg = np.minimum(np.maximum((raw * scale).astype(np.int64), 1),
                         100000)
        src = np.repeat(v, deg)
        starts = np.cumsum(deg) - deg
        within = np.arange(len(src), dtype=np.int64) - np.repeat(starts, deg)
        dst = (_u01(src * np.int64(131071) + within, seed + 1)
               * n_vertices).astype(np.int64)
        keep = src != dst
        return pa.table({"src": src[keep], "dst": dst[keep]})

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    return rd.range(n_vertices, override_num_blocks=8 * cpus).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True)


def run_scaling_child(num_cpus: int) -> dict:
    """One scaling measurement at a given cpu count, on a SHARED cached
    graph (fixed P=32 layout → byte-identical work at both levels).

    Superstep scaling runs on a ~100M-edge synthetic power-law graph
    (compute-bound at 32 cpus — the 18M-edge repo graph hits the
    ~25 ms/superstep latency floor; see BASELINE.md r1 analysis); the
    CPU-bound edge-derivation phase is timed separately on the cached
    repo TABLE (regex extraction + sha256 need real content strings)."""
    n_repos = int(os.environ.get("GRAFT_SCALING_REPOS", "1500000"))
    n_vertices = int(os.environ.get("GRAFT_SCALING_VERTICES", "8000000"))
    P = 32
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from graph_data_science_ray.sources.repo_source import write_repo_table
    from graph_data_science_ray.sources.graph_build import build_int_graph
    from graph_data_science_ray.pipelines.pagerank import PageRankProgram
    from graph_data_science_ray.pipelines.wcc import WCCProgram
    from graph_data_science_ray.stages.superstep import (
        PartitionedGraph, SuperstepEngine)

    os.makedirs(BENCH_DIR, exist_ok=True)
    repos_path = os.path.join(BENCH_DIR, f"repos_n{n_repos}_s42_sharded")
    if not os.path.exists(repos_path):
        log(f"generating scaling repo table n={n_repos} ...")
        write_repo_table(repos_path, n_repos, num_files=128,
                         files_per_repo=3, avg_imports_per_file=8, seed=42)
    graph_dir = os.path.join(BENCH_DIR,
                             f"scaling_graph_synth_v{n_vertices}_P{P}")
    if not os.path.exists(os.path.join(graph_dir, "manifest.json")):
        log("building synthetic scaling graph (one-time, cached) ...")
        build_int_graph(scaling_edges_ds(n_vertices), graph_dir,
                        n_vertices, P, dedup=True,
                        lineage={"source": "scaling_edges_ds",
                                 "seed": 42})
    graph = PartitionedGraph.from_manifest(graph_dir)

    # CPU-bound phase: edge derivation (regex extraction + sha256)
    import ray.data as rd
    from graph_data_science_ray.sources.edge_derivation import derive_edges
    _warm_page_cache(repos_path)
    # spawn the whole worker-process pool before timing anything
    rd.range(1_000_000, override_num_blocks=4 * num_cpus).map_batches(
        lambda b: b).count()
    t0 = time.perf_counter()
    n_candidates = derive_edges(
        rd.read_parquet(repos_path,
                        columns=["repo", "path", "commit", "content"],
                        override_num_blocks=4 * num_cpus)).count()
    derive_sec = time.perf_counter() - t0

    engine = SuperstepEngine(graph)
    # warm actors + BOTH flow blocks outside the timed sections (WCC
    # needs the 'in' blocks; loading them inside the timed run would
    # charge one-time graph load to per-superstep throughput)
    engine.run(PageRankProgram(tolerance=0.0), max_iterations=3,
               collect=("rank",))
    engine.run(WCCProgram(n=graph.n), max_iterations=2, collect=("label",))
    t0 = time.perf_counter()
    pr = engine.run(PageRankProgram(tolerance=0.0), max_iterations=20,
                    collect=("rank",))
    pr_sec = time.perf_counter() - t0
    pr_edges = sum(m["sent_edges"] for m in pr.metrics)
    t0 = time.perf_counter()
    cc = engine.run(WCCProgram(n=graph.n), max_iterations=100, collect=("label",))
    wcc_sec = time.perf_counter() - t0
    cc_edges = sum(m["sent_edges"] for m in cc.metrics)
    engine.shutdown()
    def phase_sums(res):
        """Σ over supersteps of the slowest partition's per-phase time —
        where the superstep critical path goes (merge vs compute vs
        emit/pack)."""
        keys = ("t_merge", "t_compute", "t_emit", "t_pack", "t_fetch")
        return {k: round(sum(m.get("phase_max", {}).get(k, 0.0)
                             for m in res.metrics), 3) for k in keys}

    out = {
        "num_cpus": num_cpus,
        "num_vertices": graph.n,
        "num_edges": graph.num_edges,
        "derive_sec": round(derive_sec, 3),
        "derive_rows_per_sec": round(3 * n_repos / derive_sec, 1),
        "pagerank_sec": round(pr_sec, 3),
        "wcc_sec": round(wcc_sec, 3),
        "pagerank_phases": phase_sums(pr),
        "wcc_phases": phase_sums(cc),
        "superstep_edges_per_sec": round(
            (pr_edges + cc_edges) / (pr.total_wall_sec + cc.total_wall_sec), 1),
    }
    ray.shutdown()
    return out


def _membw_probe(levels) -> dict | None:
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "membw_probe.py")
    try:
        mp = subprocess.run(
            [sys.executable, probe, ",".join(map(str, levels))],
            capture_output=True, text=True, timeout=600)
        return json.loads(mp.stdout.strip().splitlines()[-1])["runs"]
    except Exception as exc:  # probe is evidence, not a dependency
        log(f"membw probe failed: {exc}")
        return None


def run_scaling() -> dict:
    """N-vs-4N scaling evidence. GRAFT_SCALING_CPUS (default "4,16,32")
    lists the parallelism levels; efficiencies are reported for every
    consecutive pair. Each child is taskset-pinned —
    ray.init(num_cpus=N) is logical accounting only, so the engine's
    P=32 fractional-CPU actors would otherwise burn every physical
    core even in the low-cpu run.

    GRAFT_SCALING_TRIALS (default 3): this VM's effective memory
    bandwidth swings ~3-10x between 5-minute windows (measured via the
    STREAM probe: 19 -> 217 GB/s at 32 cores within 15 minutes), so
    one sequential 4->16->32 sweep can land different levels in
    different hardware windows and report nonsense efficiencies
    (including superlinear). Levels are therefore run back-to-back
    ALTERNATING across trials, each metric's per-level best-of-trials
    is used for the pair efficiencies (standard min-of-N timing), and
    every trial + a per-trial STREAM envelope is kept in the artifact
    so the window variance is visible."""
    levels = [int(c) for c in os.environ.get(
        "GRAFT_SCALING_CPUS", "4,16,32").split(",")]
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
    all_runs: dict[int, list] = {c: [] for c in levels}
    membw_trials: list = []
    for trial in range(trials):
        # same-window STREAM envelope: the superstep hot kernels are
        # streaming passes, so on ONE box their N->4N efficiency is
        # bounded by the memory-bandwidth curve (a real N->4N cluster
        # adds memory systems with the nodes).
        membw_trials.append(_membw_probe(levels))
        for cpus in levels:
            log(f"--- scaling trial {trial}: {cpus} cpus ---")
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--scaling-child", str(cpus)]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(
                cmd, env=dict(os.environ), capture_output=True, text=True)
            sys.stderr.write(proc.stderr[-2000:])
            line = proc.stdout.strip().splitlines()[-1]
            all_runs[cpus].append(json.loads(line))

    results = {}
    for cpus in levels:
        rs = all_runs[cpus]
        best = dict(rs[0])
        best["pagerank_sec"] = min(r["pagerank_sec"] for r in rs)
        best["wcc_sec"] = min(r["wcc_sec"] for r in rs)
        best["derive_sec"] = min(r["derive_sec"] for r in rs)
        best["derive_rows_per_sec"] = max(r["derive_rows_per_sec"]
                                          for r in rs)
        best["superstep_edges_per_sec"] = max(
            r["superstep_edges_per_sec"] for r in rs)
        results[cpus] = best

    membw = None
    ok = [m for m in membw_trials if m]
    if ok:
        membw = {k: max(m.get(k, 0.0) for m in ok) for k in ok[0]}

    def eff(lo, hi, factor):
        return round((hi / lo) / factor, 3)

    out = {"metric": "scaling_" + "_".join(map(str, levels)),
           "runs": results, "pairs": {}, "trials": trials,
           "all_trials": {str(c): all_runs[c] for c in levels},
           "membw_trials": membw_trials}
    if membw is not None:
        out["membw_gbps"] = membw
    for a, b in zip(levels, levels[1:]):
        ra, rb = results[a], results[b]
        f = b / a
        pair = {
            "superstep": eff(ra["superstep_edges_per_sec"],
                             rb["superstep_edges_per_sec"], f),
            "pagerank": eff(1.0 / ra["pagerank_sec"],
                            1.0 / rb["pagerank_sec"], f),
            "wcc": eff(1.0 / ra["wcc_sec"], 1.0 / rb["wcc_sec"], f),
            "derivation": eff(ra["derive_rows_per_sec"],
                              rb["derive_rows_per_sec"], f),
        }
        if membw is not None:
            env = eff(membw.get(str(a), membw.get(a)),
                      membw.get(str(b), membw.get(b)), f)
            pair["membw_envelope"] = env
            pair["superstep_vs_envelope"] = round(
                pair["superstep"] / env, 3) if env else None
        out["pairs"][f"{a}->{b}"] = pair
    return out


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--scaling-child") + 1])
        print(json.dumps(run_scaling_child(cpus)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
