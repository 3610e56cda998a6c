"""HITS (hubs & authorities) — parity with gds.alpha.hits
(alpha/alpha-proc/src/main/java/org/neo4j/gds/pregel/Hits.java): Pregel
authority/hub iterations.

Each HITS iteration = two supersteps with alternating flow:
  even superstep: hubs send along OUT edges → receivers sum into auth;
  odd  superstep: authorities send along IN (reverse) edges → hubs.
The program flips its own flow between supersteps (both blocks load up
front via flow='both'). Normalization is linear, so instead of the
reference's per-iteration masterCompute normalization the final vectors
are L2-normalized once at collection — the normalized fixpoint is
identical and the loop needs no barrier."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph, SuperstepEngine
from ..stages.vertex_program import SUM, StepOutput, VertexProgram, WorkerContext


class HITSProgram(VertexProgram):
    reducer = SUM
    flow = "both"      # ensures both blocks load; flipped per superstep
    msg_dtype = "float64"
    state_keys = ("auth", "hub")

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        self.flow = "both"
        return {"auth": np.ones(ctx.n_local), "hub": np.ones(ctx.n_local)}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        even = iteration % 2 == 0
        if iteration > 0:
            side = "auth" if iteration % 2 == 1 else "hub"
            state[side] = np.where(has_msg, msgs, 0.0)
        if even:
            self.flow = "out"      # hubs → authorities
            send_value = state["hub"]
        else:
            self.flow = "in"       # authorities → hubs
            send_value = state["auth"]
        return StepOutput(
            send_mask=np.ones(ctx.n_local, dtype=bool),
            send_value=send_value,
        )


def hits(
    graph: PartitionedGraph,
    hits_iterations: int = 20,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> pd.DataFrame:
    """(vid, auth, hub), L2-normalized, after hits_iterations iterations."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    try:
        res = eng.run(HITSProgram(), max_iterations=2 * hits_iterations + 1,
                      collect=("auth", "hub"))
    finally:
        if engine is None:
            eng.shutdown()
    df = res.to_pandas()
    for col in ("auth", "hub"):
        norm = np.linalg.norm(df[col].to_numpy())
        if norm > 0:
            df[col] = df[col] / norm
    return df