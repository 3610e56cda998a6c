"""Label Propagation as wave-scheduled Gauss-Seidel vote supersteps.

Reference semantics (algo/src/main/java/org/neo4j/gds/labelpropagation/):
  - init label = seedProperty if present, else maxSeedLabel + vid + 1
    (InitStep.java:58-79; unseeded ⇒ effectively own id)
  - a vertex adopts the label with the greatest total vote weight among its
    OUT-neighbors; vote weight = relationshipWeight * nodeWeight(neighbor);
    tie → smaller label id (ComputeStepConsumer.java:44-77); a vertex with
    no out-neighbors keeps its label
  - the reference sweep is ASYNCHRONOUS Gauss-Seidel in ascending node
    order (ComputeStep.java:82-92) — votes always read the freshest labels
  - converges when a full sweep changes no label
    (LabelPropagation.java:127-136); default maxIterations=10 sweeps

Distributed schedule: one sweep = ``waves`` sub-supersteps; wave w updates
the contiguous vid range [w·n/K, (w+1)·n/K) using votes computed from the
CURRENT labels (the engine's target-range scatter restricts each message
round to the next wave's vertices). With waves == n this IS the reference's
sequential ascending sweep (exact label equality — used for fixture-scale
validation); with a small constant wave count (default 16) it is a
deterministic, parallel, oscillation-free approximation whose total
per-sweep message volume is still O(E) (each edge is scattered in exactly
the one wave containing its target). Plain synchronous Jacobi (waves=1)
is also available but can oscillate on bipartite-ish structures — the
reason the reference went asynchronous.

Message flow: a vertex needs the labels of its out-neighbors, so each
label owner pushes (label, weight) along REVERSED edges (flow='in');
votes are pre-reduced per (destination, label) on the sender (combiner)
and merged with max-weight/min-label argmax at the receiver.
"""

from __future__ import annotations

import numpy as np

from ..stages.superstep import PartitionedGraph, SuperstepEngine, SuperstepResult
from ..stages.vertex_program import VOTE, StepOutput, VertexProgram, WorkerContext

# below this vertex count, default to the exact sequential schedule
_EXACT_THRESHOLD = 4096


class LabelPropagationProgram(VertexProgram):
    reducer = VOTE
    flow = "in"
    msg_dtype = "int64"
    state_keys = ("label",)

    def __init__(self, n: int, waves: int,
                 seeds: np.ndarray | None = None,
                 node_weight: np.ndarray | None = None):
        # seeds / node_weight are global per-vid arrays (broadcast inside the
        # pickled program — fine for property columns that fit the driver;
        # a Parquet property-column path would slice per partition instead).
        self.n = n
        self.waves = max(1, min(waves, n)) if n else 1
        self.seeds = seeds
        self.node_weight = node_weight
        # contiguous wave boundaries over global vids
        self.bounds = np.linspace(0, n, self.waves + 1).astype(np.int64)

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        gids = ctx.global_ids()
        if self.seeds is not None:
            label = np.asarray(self.seeds, dtype=np.int64)[gids]
        else:
            label = gids + 1  # maxSeedLabel(=0) + originalNodeId + 1
        nw = (np.ones(ctx.n_local, dtype=np.float64)
              if self.node_weight is None
              else np.asarray(self.node_weight, dtype=np.float64)[gids])
        return {"label": label, "node_weight": nw}

    def _wave_range(self, w: int) -> tuple[int, int]:
        return int(self.bounds[w]), int(self.bounds[w + 1])

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        label = state["label"]
        changed = 0
        if iteration > 0:
            lo, hi = self._wave_range((iteration - 1) % self.waves)
            gids = ctx.global_ids()
            upd = has_msg & (gids >= lo) & (gids < hi)
            new_label = np.where(upd, msgs, label)
            changed = int((new_label != label).sum())
            state["label"] = new_label
            label = new_label
        return StepOutput(
            send_mask=np.ones(ctx.n_local, dtype=bool),
            send_value=label,
            halt_mask=None,
            changed=changed,
            vote_weight=state["node_weight"],
            target_range=self._wave_range(iteration % self.waves),
        )


def label_propagation(
    graph: PartitionedGraph,
    seeds: np.ndarray | None = None,
    node_weight: np.ndarray | None = None,
    max_iterations: int = 10,
    waves: int | None = None,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
    **engine_kwargs,
) -> SuperstepResult:
    """Run label propagation; result state has columns (vid, label).

    max_iterations counts full sweeps (reference default 10). waves=None
    picks the exact sequential schedule for small graphs and 16 waves per
    sweep at scale."""
    if waves is None:
        waves = graph.n if graph.n <= _EXACT_THRESHOLD else 16
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    prog = LabelPropagationProgram(graph.n, waves, seeds=seeds,
                                   node_weight=node_weight)
    try:
        return eng.run(prog, max_iterations=max_iterations * prog.waves + 1,
                       convergence="changed", convergence_window=prog.waves,
                       collect=("label",), **engine_kwargs)
    finally:
        if engine is None:
            eng.shutdown()