"""Scaling probe for the round-5 analytics layer (bucket join +
running-window), the same N-vs-4N methodology as bench.py --scaling:
fresh taskset-pinned child processes per cpu level, levels alternated
across trials, per-level best-of-trials, per-trial STREAM envelope.

Input is a cached synthetic star-schema pair sized so the exchanges
dominate fixed costs (default 20M-row fact / 2M-row dim — override
with GRAFT_OLAP_ROWS / GRAFT_OLAP_DIM):

  fact(key, grp, ts, cents)   key ~ U[0, dim), grp ~ U[0,128), ts
                              a shuffled permutation, cents ~ U
  dim(key, attr)              attr = key % 64

Timed pipelines (both ONE bounded exchange over pruned reads):
  join:   bucket_join(fact, dim, on=key) -> per-batch rollup by attr
          -> aggregate_rows (the revenue_by_nation shape)
  window: grouped_running_sum(fact; grp, order ts, cents)
          consumed by a per-batch fold (nothing driver-side)

Usage: python tools/olap_scaling_probe.py            # parent sweep
       python tools/olap_scaling_probe.py --child N  # one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_DIR = "/tmp/graft_bench"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _dataset_dir(n_rows: int, n_dim: int) -> str:
    return os.path.join(BENCH_DIR, f"olap_scale_v2_f{n_rows}_d{n_dim}")


def _build(n_rows: int, n_dim: int) -> str:
    """One-time cached build: 64 fact shards + 8 dim shards, each
    shard generated from a block-index-seeded RNG (deterministic,
    parallel, no driver-side arrays)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = _dataset_dir(n_rows, n_dim)
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    log(f"building olap scaling tables at {out} ...")
    os.makedirs(os.path.join(out, "fact"), exist_ok=True)
    os.makedirs(os.path.join(out, "dim"), exist_ok=True)
    shards = 64
    per = n_rows // shards
    for i in range(shards):
        rng = np.random.default_rng(1000 + i)
        ts = rng.permutation(per).astype(np.int64) * shards + i
        t = pa.table({
            "key": rng.integers(0, n_dim, per).astype(np.int64),
            # >= 2x max cpu level groups, or the window stage's
            # parallelism is capped by group count, not cpus
            "grp": rng.integers(0, 128, per).astype(np.int64),
            "ts": ts,
            "cents": rng.integers(100, 10_000_000, per).astype(np.int64),
        })
        pq.write_table(t, os.path.join(out, "fact", f"part-{i:03d}.parquet"))
    dshards = 8
    dper = n_dim // dshards
    for i in range(dshards):
        keys = np.arange(i * dper, (i + 1) * dper, dtype=np.int64)
        t = pa.table({"key": keys, "attr": keys % 64})
        pq.write_table(t, os.path.join(out, "dim", f"part-{i:03d}.parquet"))
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok\n")
    return out


def run_child(num_cpus: int) -> dict:
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    n_rows = int(os.environ.get("GRAFT_OLAP_ROWS", "20000000"))
    n_dim = int(os.environ.get("GRAFT_OLAP_DIM", "2000000"))
    path = _build(n_rows, n_dim)

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from graph_data_science_ray.functions.join import bucket_join
    from graph_data_science_ray.functions.olap import grouped_running_sum
    from graph_data_science_ray.stages.shuffle import aggregate_rows

    def fact(cols):
        return rd.read_parquet(os.path.join(path, "fact"), columns=cols)

    # --- join pipeline ---------------------------------------------
    t0 = time.monotonic()
    # bucket counts FIXED across cpu levels — identical work per
    # level is what makes the efficiency ratio meaningful (same rule
    # as bench.py's fixed P=32 graph layout)
    # buckets >> cores (sort-reduce carries ~one bucket per task);
    # the join's per-side compaction is capped at 64 blocks internally
    joined = bucket_join(fact(["key", "cents"]),
                         rd.read_parquet(os.path.join(path, "dim")),
                         on="key", left_cols=["cents"],
                         right_cols=["attr"], num_buckets=256)

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("attr", as_index=False)["cents"].sum()
        g["n"] = np.int64(1)
        return g

    res = aggregate_rows(
        joined.map_batches(rollup, batch_format="pandas"),
        ["attr"], ["cents", "n"], num_buckets=8).to_pandas()
    join_sec = time.monotonic() - t0
    assert len(res) == 64, len(res)

    # --- window pipeline -------------------------------------------
    t0 = time.monotonic()
    win = grouped_running_sum(fact(["grp", "ts", "cents"]),
                              group_col="grp", order_cols=["ts"],
                              value_col="cents", out_col="run",
                              num_buckets=1024)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"rows": [np.int64(len(df))],
                             "hi": [df["run"].max() if len(df) else 0]})

    folded = win.map_batches(fold, batch_format="pandas").to_pandas()
    window_sec = time.monotonic() - t0
    assert int(folded["rows"].sum()) == n_rows

    ray.shutdown()
    return {"num_cpus": num_cpus, "n_rows": n_rows,
            "join_sec": round(join_sec, 3),
            "join_rows_per_sec": round(n_rows / join_sec, 1),
            "window_sec": round(window_sec, 3),
            "window_rows_per_sec": round(n_rows / window_sec, 1)}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        print(json.dumps(run_child(int(sys.argv[2]))))
        return

    levels = [int(c) for c in os.environ.get(
        "GRAFT_SCALING_CPUS", "4,16,32").split(",")]
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "2"))
    _build(int(os.environ.get("GRAFT_OLAP_ROWS", "20000000")),
           int(os.environ.get("GRAFT_OLAP_DIM", "2000000")))

    membw_trials = []
    all_runs: dict[int, list] = {c: [] for c in levels}
    probe = os.path.join(REPO, "tools", "membw_probe.py")
    for trial in range(trials):
        try:
            mp = subprocess.run(
                [sys.executable, probe, ",".join(map(str, levels))],
                capture_output=True, text=True, timeout=300)
            membw_trials.append(json.loads(
                mp.stdout.strip().splitlines()[-1])["runs"])
        except Exception as exc:
            log(f"membw probe failed: {exc}")
            membw_trials.append(None)
        for cpus in levels:
            log(f"--- olap scaling trial {trial}: {cpus} cpus ---")
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", str(cpus)]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(cmd, env=dict(os.environ),
                                  capture_output=True, text=True)
            sys.stderr.write(proc.stderr[-1500:])
            all_runs[cpus].append(
                json.loads(proc.stdout.strip().splitlines()[-1]))

    best = {}
    for cpus in levels:
        rs = all_runs[cpus]
        best[cpus] = {
            "join_rows_per_sec": max(r["join_rows_per_sec"] for r in rs),
            "window_rows_per_sec": max(r["window_rows_per_sec"]
                                       for r in rs),
        }
    out = {"metric": "olap_scaling_" + "_".join(map(str, levels)),
           "runs": best, "pairs": {}, "trials": trials,
           "all_trials": {str(c): all_runs[c] for c in levels},
           "membw_trials": membw_trials}
    for a, b in zip(levels, levels[1:]):
        f = b / a
        out["pairs"][f"{a}->{b}"] = {
            "join": round(best[b]["join_rows_per_sec"]
                          / best[a]["join_rows_per_sec"] / f, 3),
            "window": round(best[b]["window_rows_per_sec"]
                            / best[a]["window_rows_per_sec"] / f, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
