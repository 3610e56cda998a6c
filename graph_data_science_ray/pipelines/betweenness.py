"""Betweenness centrality — batched Brandes forward/backward passes as
supersteps (algo/src/main/java/org/neo4j/gds/betweenness/
BetweennessCentrality.java:50-211, SelectionStrategy.java for source
sampling).

Up to `batch_size` (≤62) sources run per engine-run PAIR, one message
vector component per source (the MSBFSDistProgram pattern, but with
float path-count lanes instead of visit bits — Brandes needs σ, not
just reachability):

  forward  — BFS levels with a SUM reducer per lane: a vertex first
             reached in lane j at level d gets σ_j(v) = Σ σ_j(u) over
             its level-(d-1) predecessors; "first reached" is detected
             by msgs[:, j] > 0 (path counts are ≥1, so a zero lane
             means no message), so one send_mask covers all lanes with
             non-frontier lanes zeroed in send_value.
  backward — lanes processed deepest-first, each aligned to its own
             max level: lane j's level-ℓ vertices send
             (1+δ_j(w))/σ_j(w) along REVERSE edges in superstep
             it = max_level_j - ℓ; receivers at level ℓ-1 accumulate
             δ_j(u) += σ_j(u) · Σ messages. Zero lanes are harmless
             (add 0).
  betweenness(v) += Σ_j δ_j(v), v ≠ s_j.

Forward state (dist/sigma) never lands on the driver: the backward
program receives the forward run's per-partition state-table REFS and
each worker fetches only its own partition's slice zero-copy
(round 4 — the previous design's driver round-trip materialized two
[n, 62] list columns through pandas and re-broadcast them as one
O(n·k) plasma object per batch, which dominated betweenness wall time).
Per-lane max levels and the final per-vertex delta sums reduce through
small Ray tasks over the same refs.

Sampled approximation: pass `sources` (the reference's samplingSize
random-source strategy); full exact = all vertices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..stages.superstep import (PartitionedGraph, SuperstepEngine,
                                _pa_to_np)
from ..stages.vertex_program import SUM, StepOutput, VertexProgram, WorkerContext

# Lanes per engine-run pair. Unlike the MS-BFS kernels this batch is
# NOT bit-limited (σ/δ are float64 COLUMNS, not bits) — the bound is
# message/state width: n_local × lanes × 8 B. Measured on the 215k-
# vertex star forest (100 sources, 8 cpus): 62 lanes 10.8 s vs 128
# lanes 11.8 s — wider batches ship proportionally wider [n, k] dense
# state and don't pay for the saved per-run fixed cost, so keep 62.
_MAX_BATCH = 62


class _ForwardBatchProgram(VertexProgram):
    reducer = SUM
    flow = "out"
    msg_dtype = "float64"
    state_keys = ("dist", "sigma")

    def __init__(self, source_vids: np.ndarray):
        self.source_vids = np.asarray(source_vids, dtype=np.int64)
        self.msg_dim = int(len(self.source_vids))

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        k = self.msg_dim
        dist = np.full((ctx.n_local, k), -1, dtype=np.int64)
        sigma = np.zeros((ctx.n_local, k))
        gids = ctx.global_ids()
        for j, s in enumerate(self.source_vids):
            here = gids == s
            dist[here, j] = 0
            sigma[here, j] = 1.0
        return {"dist": dist, "sigma": sigma}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        dist, sigma = state["dist"], state["sigma"]
        if iteration == 0:
            newly = dist == 0
        elif msgs is None:
            newly = np.zeros(dist.shape, dtype=bool)
        else:
            newly = (msgs > 0) & (dist < 0)
            dist[newly] = iteration
            sigma[newly] = msgs[newly]
        send_value = np.where(newly, sigma, 0.0)
        return StepOutput(send_mask=newly.any(axis=1), send_value=send_value,
                          halt_mask=active.copy())


class _BackwardBatchProgram(VertexProgram):
    reducer = SUM
    flow = "in"          # messages travel against edge direction
    msg_dtype = "float64"
    state_keys = ("delta",)

    def __init__(self, fwd_state_refs: list, max_levels: np.ndarray):
        # per-partition refs to the FORWARD run's state tables
        # (vid, dist, sigma) — each worker fetches only its own slice
        self.fwd_state_refs = fwd_state_refs
        self.max_levels = np.asarray(max_levels, dtype=np.int64)
        self.msg_dim = int(len(self.max_levels))

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        tbl = ray.get(self.fwd_state_refs[ctx.part])
        return {
            "delta": np.zeros((ctx.n_local, self.msg_dim)),
            "dist": _pa_to_np(tbl["dist"]),
            "sigma": _pa_to_np(tbl["sigma"]),
        }

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        # lane j's level-L vertices both RECEIVE (from level L+1's sends
        # last superstep) and SEND in superstep it = max_levels[j] - L,
        # in that order — delta is complete before it is forwarded.
        levels = self.max_levels[None, :] - iteration     # [1, k]
        dist = state["dist"]
        delta = state["delta"]
        at_level = dist == levels
        if iteration > 0 and msgs is not None:
            delta = delta + np.where(at_level, state["sigma"] * msgs, 0.0)
            state["delta"] = delta
        send_cols = at_level & (levels > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            val = np.where(state["sigma"] > 0,
                           (1.0 + delta) / state["sigma"], 0.0)
        return StepOutput(send_mask=send_cols.any(axis=1),
                          send_value=np.where(send_cols, val, 0.0),
                          halt_mask=active.copy())


@ray.remote(num_cpus=0)
def _lane_max_levels(tbl) -> np.ndarray:
    """Per-lane max BFS level in one partition's forward state table."""
    d = _pa_to_np(tbl["dist"])
    if len(d) == 0:
        return np.full(d.shape[1] if d.ndim == 2 else 0, -1, np.int64)
    return d.max(axis=0)


@ray.remote(num_cpus=0)
def _delta_rowsum(tbl, batch: np.ndarray):
    """(vids, Σ_lanes delta) for one partition, with each source's own
    lane zeroed (≙ betweenness's source exclusion)."""
    delta = _pa_to_np(tbl["delta"])
    vid = tbl["vid"].to_numpy(zero_copy_only=False)
    if len(vid) == 0:       # partition owning zero vertices (n < P)
        return vid, np.zeros(0)
    pos = np.searchsorted(vid, batch)
    safe = np.minimum(pos, len(vid) - 1)
    hit = (pos < len(vid)) & (vid[safe] == batch)
    delta[safe[hit], np.flatnonzero(hit)] = 0.0
    return vid, delta.sum(axis=1)


def betweenness(
    graph: PartitionedGraph,
    sources: np.ndarray | None = None,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
    batch_size: int = _MAX_BATCH,
) -> pd.DataFrame:
    """(vid, score). sources=None → exact (every vertex a source)."""
    n = graph.n
    srcs = (np.arange(n, dtype=np.int64) if sources is None
            else np.asarray(sources, dtype=np.int64))
    batch_size = max(1, min(batch_size, _MAX_BATCH))
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    score = np.zeros(n)
    try:
        for lo in range(0, len(srcs), batch_size):
            batch = srcs[lo:lo + batch_size]
            fwd = eng.run(_ForwardBatchProgram(batch),
                          max_iterations=n + 1, collect=("dist", "sigma"))
            # per-lane max level via per-partition reduce (the [n, k]
            # forward state itself never leaves the workers/plasma)
            max_levels = np.max(
                ray.get([_lane_max_levels.remote(r)
                         for r in fwd.state_refs]), axis=0)
            if (max_levels <= 0).all():
                continue
            bwd = eng.run(
                _BackwardBatchProgram(fwd.state_refs,
                                      np.maximum(max_levels, 0)),
                max_iterations=int(max_levels.max()) + 1,
                collect=("delta",))
            for vid, s in ray.get([_delta_rowsum.remote(r, batch)
                                   for r in bwd.state_refs]):
                score[vid] += s
    finally:
        if engine is None:
            eng.shutdown()
    return pd.DataFrame({"vid": np.arange(n, dtype=np.int64), "score": score})