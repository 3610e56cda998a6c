"""Traversal algorithms on the superstep engine: BFS, SSSP, and
multi-source-BFS closeness / harmonic centrality.

  - BFS ≙ paths/traverse/BFS.java: frontier rounds with a min reducer
    (first arrival = hop distance), optional maxDepth cutoff.
  - SSSP ≙ paths/delta/DeltaStepping.java semantics at convergence:
    Bellman-Ford-style relaxation rounds — message = dist + edge weight
    (edge_combine='add'), min reducer; exact shortest distances at
    fixpoint (matches Dijkstra output).
  - MS-BFS ≙ msbfs/MultiSourceBFS.java: 62 sources per wave as an int64
    bitmask column with a bitwise-OR reducer; per-superstep newly-visited
    bits accumulate farness (Σ d) and reciprocal (Σ 1/d) sums.
    Closeness = reached/farness (beta/closeness/DefaultCentralityComputer
    .java:25-31), Wasserman-Faust = that × reached/(n-1); harmonic =
    Σ(1/d) / (n-1) (alpha/.../harmonic/HarmonicCentrality.java).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph, SuperstepEngine, SuperstepResult
from ..stages.vertex_program import MIN, OR, StepOutput, VertexProgram, WorkerContext

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount(x: np.ndarray) -> np.ndarray:
    return _POP[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


class BFSProgram(VertexProgram):
    reducer = MIN
    msg_dtype = "int64"
    state_keys = ("dist",)

    def __init__(self, source_vid: int, max_depth: int | None = None,
                 flow: str = "out"):
        self.source_vid = source_vid
        self.max_depth = max_depth
        self.flow = flow

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        dist = np.full(ctx.n_local, -1, dtype=np.int64)
        dist[ctx.global_ids() == self.source_vid] = 0
        return {"dist": dist}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        dist = state["dist"]
        if iteration == 0:
            send_mask = dist == 0
        else:
            upd = has_msg & (dist < 0)
            dist[upd] = msgs[upd]
            state["dist"] = dist
            send_mask = upd
        if self.max_depth is not None and iteration >= self.max_depth:
            send_mask = np.zeros_like(send_mask)
        return StepOutput(send_mask=send_mask, send_value=dist + 1,
                          halt_mask=active.copy())


def bfs(graph: PartitionedGraph, source_vid: int,
        max_depth: int | None = None, flow: str = "out",
        num_parts: int | None = None,
        engine: SuperstepEngine | None = None) -> SuperstepResult:
    """(vid, dist) hop distances; -1 = unreachable."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    try:
        return eng.run(BFSProgram(source_vid, max_depth, flow),
                       max_iterations=graph.n + 1, collect=("dist",))
    finally:
        if engine is None:
            eng.shutdown()


class SSSPProgram(VertexProgram):
    reducer = MIN
    msg_dtype = "float64"
    use_edge_weights = True
    edge_combine = "add"
    state_keys = ("dist",)

    def __init__(self, source_vid: int, flow: str = "out"):
        self.source_vid = source_vid
        self.flow = flow

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        dist = np.full(ctx.n_local, np.inf)
        dist[ctx.global_ids() == self.source_vid] = 0.0
        return {"dist": dist}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        dist = state["dist"]
        if iteration == 0:
            send_mask = dist == 0.0
        else:
            cand = np.where(has_msg, msgs, np.inf)
            upd = cand < dist
            dist = np.where(upd, cand, dist)
            state["dist"] = dist
            send_mask = upd
        return StepOutput(send_mask=send_mask, send_value=dist,
                          halt_mask=active.copy())


def sssp(graph: PartitionedGraph, source_vid: int, flow: str = "out",
         num_parts: int | None = None,
         engine: SuperstepEngine | None = None) -> SuperstepResult:
    """(vid, dist) weighted shortest distances; inf = unreachable.
    Requires non-negative weights (like the reference's Dijkstra)."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    try:
        return eng.run(SSSPProgram(source_vid, flow),
                       max_iterations=graph.n + 1, collect=("dist",))
    finally:
        if engine is None:
            eng.shutdown()


class MSBFSProgram(VertexProgram):
    reducer = OR
    msg_dtype = "int64"
    state_keys = ("farness", "recip", "reached")

    def __init__(self, wave_sources: np.ndarray, flow: str = "both"):
        assert len(wave_sources) <= 62
        self.wave_sources = np.asarray(wave_sources, dtype=np.int64)
        self.flow = flow

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        visited = np.zeros(ctx.n_local, dtype=np.int64)
        gids = ctx.global_ids()
        for bit, src in enumerate(self.wave_sources):
            visited[gids == src] |= np.int64(1) << np.int64(bit)
        return {
            "visited": visited,
            "farness": np.zeros(ctx.n_local),
            "recip": np.zeros(ctx.n_local),
            "reached": np.zeros(ctx.n_local, dtype=np.int64),
        }

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        visited = state["visited"]
        if iteration == 0:
            new = visited.copy()
        else:
            incoming = np.where(has_msg, msgs, 0)
            new = incoming & ~visited
            cnt = _popcount(new)
            state["farness"] += iteration * cnt
            state["recip"] += np.where(cnt > 0, cnt / iteration, 0.0)
            state["reached"] += cnt
            visited |= new
            state["visited"] = visited
        send_mask = new != 0
        return StepOutput(send_mask=send_mask, send_value=new,
                          halt_mask=active.copy())


def closeness_harmonic(
    graph: PartitionedGraph,
    flow: str = "both",
    wasserman_faust: bool = False,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> pd.DataFrame:
    """All-sources MS-BFS in 62-source waves → per-vertex
    (closeness, harmonic). Distances measured INTO each vertex from the
    wave sources (symmetric for flow='both')."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    n = graph.n
    farness = np.zeros(n)
    recip = np.zeros(n)
    reached = np.zeros(n, dtype=np.int64)
    try:
        for lo in range(0, n, 62):
            wave = np.arange(lo, min(lo + 62, n), dtype=np.int64)
            res = eng.run(MSBFSProgram(wave, flow=flow),
                          max_iterations=n + 1,
                          collect=("farness", "recip", "reached"))
            df = res.to_pandas()
            vids = df["vid"].to_numpy()
            farness[vids] += df["farness"].to_numpy()
            recip[vids] += df["recip"].to_numpy()
            reached[vids] += df["reached"].to_numpy()
    finally:
        if engine is None:
            eng.shutdown()
    with np.errstate(divide="ignore", invalid="ignore"):
        closeness = np.where(farness > 0, reached / farness, 0.0)
        if wasserman_faust and n > 1:
            closeness = closeness * (reached / (n - 1.0))
        harmonic = recip / max(n - 1, 1)
    return pd.DataFrame({
        "vid": np.arange(n, dtype=np.int64),
        "closeness": closeness,
        "harmonic": harmonic,
    })