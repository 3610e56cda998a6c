"""ArticleRank and Eigenvector centrality on the superstep engine.

ArticleRank (algo/src/main/java/org/neo4j/gds/pagerank/
ArticleRankComputation.java): identical delta-push skeleton to PageRank
except each message is delta / (degree + averageDegree) (:99), where
averageDegree is the mean out-degree.

Eigenvector (algo/.../pagerank/EigenvectorComputation.java): power
iteration with A + I — init rank = 1/|V| (or 1/|sources|); every
superstep nextRank = rank + Σ messages, sends nextRank / weightDenominator
(1 unweighted, Σ out-weights weighted, messages × edge weight);
masterCompute L2-normalizes nextRank into rank after every iteration and
converges when every |normalized - previous| ≤ tolerance (:112-162).
The master hook runs barriered on the driver (engine 'needs_master').
"""

from __future__ import annotations

import numpy as np

from ..stages.superstep import PartitionedGraph, SuperstepEngine, SuperstepResult
from ..stages.vertex_program import SUM, StepOutput, VertexProgram, WorkerContext
from .pagerank import PageRankProgram


class ArticleRankProgram(PageRankProgram):
    def __init__(self, avg_degree: float, **kwargs):
        super().__init__(**kwargs)
        self.avg_degree = avg_degree

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        out = super().compute(ctx, state, msgs, has_msg, active, iteration)
        # re-divide: parent sent delta/degree, ArticleRank sends
        # delta/(degree + avgDegree)
        deg = ctx.degree("out", weighted=self.weighted).astype(np.float64)
        delta = state["delta"]
        out.send_value = np.divide(delta, deg + self.avg_degree,
                                   out=np.zeros_like(delta),
                                   where=(deg + self.avg_degree) > 0)
        return out


def article_rank(
    graph: PartitionedGraph,
    damping: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    weighted: bool = False,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
    **engine_kwargs,
) -> SuperstepResult:
    avg_degree = graph.num_edges / max(graph.n, 1)
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    prog = ArticleRankProgram(avg_degree, damping=damping,
                              tolerance=tolerance, weighted=weighted)
    try:
        return eng.run(prog, max_iterations=max_iterations, collect=("rank",),
                       **engine_kwargs)
    finally:
        if engine is None:
            eng.shutdown()


class EigenvectorProgram(VertexProgram):
    reducer = SUM
    flow = "out"
    msg_dtype = "float64"
    state_keys = ("rank",)
    needs_master = True

    def __init__(self, tolerance: float = 1e-7,
                 source_vids: list[int] | None = None,
                 weighted: bool = False):
        self.tolerance = tolerance
        self.source_vids = None if source_vids is None else np.asarray(
            sorted(source_vids), dtype=np.int64)
        self.weighted = weighted
        self.use_edge_weights = weighted

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        if self.source_vids is None:
            rank = np.full(ctx.n_local, 1.0 / ctx.n_global)
        else:
            rank = np.zeros(ctx.n_local)
            rank[np.isin(ctx.global_ids(), self.source_vids)] = \
                1.0 / len(self.source_vids)
        return {"rank": rank, "next_rank": rank.copy()}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        next_rank = state["rank"].copy()
        if iteration > 0 and msgs is not None:
            next_rank += np.where(has_msg, msgs, 0.0)
        state["next_rank"] = next_rank
        if self.weighted:
            denom = ctx.degree("out", weighted=True).astype(np.float64)
            send_value = np.divide(next_rank, denom,
                                   out=np.zeros_like(next_rank),
                                   where=denom > 0)
        else:
            send_value = next_rank  # weightDenominator == 1 unweighted
        return StepOutput(
            send_mask=np.ones(ctx.n_local, dtype=bool),
            send_value=send_value,
            master_partial=float((next_rank * next_rank).sum()),
        )

    def master_combine(self, partials: list) -> float:
        return float(np.sqrt(sum(p for p in partials if p is not None)))

    def apply_master(self, ctx, state, l2_norm: float) -> bool:
        normalized = (state["next_rank"] / l2_norm if l2_norm > 0
                      else state["next_rank"])
        converged = bool(
            np.abs(normalized - state["rank"]).max() <= self.tolerance
        ) if ctx.n_local else True
        state["rank"] = normalized
        return converged


def eigenvector(
    graph: PartitionedGraph,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    source_vids: list[int] | None = None,
    weighted: bool = False,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
    **engine_kwargs,
) -> SuperstepResult:
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    prog = EigenvectorProgram(tolerance=tolerance, source_vids=source_vids,
                              weighted=weighted)
    try:
        return eng.run(prog, max_iterations=max_iterations, collect=("rank",),
                       **engine_kwargs)
    finally:
        if engine is None:
            eng.shutdown()