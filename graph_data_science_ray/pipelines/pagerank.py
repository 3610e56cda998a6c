"""PageRank as a superstep VertexProgram.

Reproduces the reference's delta-push Pregel formulation exactly
(algo/src/main/java/org/neo4j/gds/pagerank/PageRankComputation.java):

  - init: rank = alpha = 1 - dampingFactor (unnormalized; scores sum ≈ N),
    or alpha only on sourceNodes for personalized PageRank (:69-74)
  - initial superstep always sends rank/degree (no tolerance check, :90)
  - later: delta = dampingFactor * Σ messages; rank += delta (:86-87);
    send delta/degree iff delta > tolerance else voteToHalt (:90-97)
  - degree = out-degree, or Σ out-edge weights when weighted; each message
    is multiplied by the edge weight (applyRelationshipWeight, :106-108)
  - message reducer: Sum (:102); defaults dampingFactor=0.85,
    maxIterations=20, tolerance=1e-7 (PageRankConfig.java:43,50,56)
"""

from __future__ import annotations

import numpy as np

from ..stages.superstep import PartitionedGraph, SuperstepEngine, SuperstepResult
from ..stages.vertex_program import SUM, StepOutput, VertexProgram, WorkerContext


class PageRankProgram(VertexProgram):
    reducer = SUM
    flow = "out"
    msg_dtype = "float64"
    state_keys = ("rank", "delta")

    def __init__(self, damping: float = 0.85, tolerance: float = 1e-7,
                 source_vids: list[int] | None = None, weighted: bool = False):
        self.damping = damping
        self.tolerance = tolerance
        self.source_vids = None if source_vids is None else np.asarray(
            sorted(source_vids), dtype=np.int64)
        self.weighted = weighted
        self.use_edge_weights = weighted

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        alpha = 1.0 - self.damping
        if self.source_vids is None:
            rank = np.full(ctx.n_local, alpha, dtype=np.float64)
        else:
            rank = np.zeros(ctx.n_local, dtype=np.float64)
            gids = ctx.global_ids()
            rank[np.isin(gids, self.source_vids)] = alpha
        return {"rank": rank, "delta": rank.copy()}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        initial = iteration == 0
        if initial:
            delta = state["delta"]
            halt = None
            send_mask = active.copy()
        else:
            delta = np.where(active & has_msg, self.damping * (msgs if msgs is not None else 0.0), 0.0)
            state["rank"] = np.where(active, state["rank"] + delta, state["rank"])
            state["delta"] = delta
            send_mask = active & (delta > self.tolerance)
            halt = active & ~send_mask
        deg = ctx.degree("out", weighted=self.weighted).astype(np.float64)
        send_value = np.divide(delta, deg, out=np.zeros_like(delta), where=deg > 0)
        return StepOutput(send_mask=send_mask, send_value=send_value, halt_mask=halt)


def pagerank(
    graph: PartitionedGraph,
    damping: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    source_vids: list[int] | None = None,
    weighted: bool = False,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
    **engine_kwargs,
) -> SuperstepResult:
    """Run PageRank; result state has columns (vid, rank)."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    prog = PageRankProgram(damping=damping, tolerance=tolerance,
                           source_vids=source_vids, weighted=weighted)
    try:
        return eng.run(prog, max_iterations=max_iterations, collect=("rank",),
                       **engine_kwargs)
    finally:
        if engine is None:
            eng.shutdown()
