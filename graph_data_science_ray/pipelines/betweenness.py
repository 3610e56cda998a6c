"""Betweenness centrality — Brandes forward/backward passes as supersteps
(algo/src/main/java/org/neo4j/gds/betweenness/BetweennessCentrality.java:
50-211, SelectionStrategy.java for source sampling).

Per source s:
  forward  — BFS levels with a SUM reducer: a vertex first reached at
             level d gets σ(v) = Σ σ(u) over its level-(d-1)
             predecessors (path counts), since all messages of one
             superstep come from the previous frontier.
  backward — levels processed deepest-first: level-ℓ vertices send
             (1+δ(w))/σ(w) along REVERSE edges; receivers at level ℓ-1
             accumulate δ(u) += σ(u) · Σ messages (receivers know their
             own level, so a same-level or deeper sender's message is
             simply ignored — but by construction only level-ℓ vertices
             send in that superstep).
  betweenness(v) += δ(v) for v ≠ s.

Sampled approximation: pass `sources` (the reference's samplingSize
random-source strategy); full exact = all vertices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph, SuperstepEngine
from ..stages.vertex_program import SUM, StepOutput, VertexProgram, WorkerContext


class _ForwardProgram(VertexProgram):
    reducer = SUM
    flow = "out"
    msg_dtype = "float64"
    state_keys = ("dist", "sigma")

    def __init__(self, source_vid: int):
        self.source_vid = source_vid

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        dist = np.full(ctx.n_local, -1, dtype=np.int64)
        sigma = np.zeros(ctx.n_local)
        src_local = ctx.global_ids() == self.source_vid
        dist[src_local] = 0
        sigma[src_local] = 1.0
        return {"dist": dist, "sigma": sigma}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        dist, sigma = state["dist"], state["sigma"]
        if iteration == 0:
            frontier = dist == 0
        else:
            frontier = has_msg & (dist < 0)
            dist[frontier] = iteration
            sigma[frontier] = msgs[frontier]
            state["dist"], state["sigma"] = dist, sigma
        return StepOutput(send_mask=frontier, send_value=sigma,
                          halt_mask=active.copy())


class _BackwardProgram(VertexProgram):
    reducer = SUM
    flow = "in"          # messages travel against edge direction
    msg_dtype = "float64"
    state_keys = ("delta",)

    def __init__(self, dist: np.ndarray, sigma: np.ndarray, max_level: int):
        # per-vid forward results, broadcast inside the pickled program
        self.dist = dist
        self.sigma = sigma
        self.max_level = max_level

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        gids = ctx.global_ids()
        return {
            "delta": np.zeros(ctx.n_local),
            "dist": self.dist[gids],
            "sigma": self.sigma[gids],
        }

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        # level-L vertices both RECEIVE (from level L+1's sends last
        # superstep) and SEND in superstep it = max_level - L, in that
        # order — delta is complete before it is forwarded.
        level = self.max_level - iteration
        dist = state["dist"]
        delta = state["delta"]
        if iteration > 0:
            upd = has_msg & (dist == level)
            delta = delta + np.where(upd, state["sigma"] * msgs, 0.0)
            state["delta"] = delta
        send_mask = (dist == level) & (level > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            send_value = np.where(state["sigma"] > 0,
                                  (1.0 + delta) / state["sigma"], 0.0)
        return StepOutput(send_mask=send_mask, send_value=send_value,
                          halt_mask=active.copy())


def betweenness(
    graph: PartitionedGraph,
    sources: np.ndarray | None = None,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> pd.DataFrame:
    """(vid, score). sources=None → exact (every vertex a source)."""
    n = graph.n
    srcs = (np.arange(n, dtype=np.int64) if sources is None
            else np.asarray(sources, dtype=np.int64))
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    score = np.zeros(n)
    try:
        for s in srcs:
            fwd = eng.run(_ForwardProgram(int(s)), max_iterations=n + 1,
                          collect=("dist", "sigma"))
            fdf = fwd.to_pandas()
            dist = np.full(n, -1, dtype=np.int64)
            sigma = np.zeros(n)
            dist[fdf["vid"].to_numpy()] = fdf["dist"].to_numpy()
            sigma[fdf["vid"].to_numpy()] = fdf["sigma"].to_numpy()
            max_level = int(dist.max())
            if max_level <= 0:
                continue
            bwd = eng.run(_BackwardProgram(dist, sigma, max_level),
                          max_iterations=max_level + 1, collect=("delta",))
            bdf = bwd.to_pandas()
            delta = np.zeros(n)
            delta[bdf["vid"].to_numpy()] = bdf["delta"].to_numpy()
            delta[s] = 0.0
            score += delta
    finally:
        if engine is None:
            eng.shutdown()
    return pd.DataFrame({"vid": np.arange(n, dtype=np.int64), "score": score})