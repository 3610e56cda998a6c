"""K-1 Coloring — parity with gds.beta.k1coloring
(beta/k1coloring/K1Coloring.java): greedy Çatalyürek-style parallel
coloring with conflict-resolution rounds.

Superstep form with the OR reducer: each vertex broadcasts the bit of
its current color (colors < 62 per round window); a vertex that sees its
own color bit among LOWER-ID neighbors (deterministic priority — the
reference resolves conflicts by node id) recolors to the smallest color
not used by any neighbor. Converges when no vertex recolors.

Colors are unbounded in principle; vertices whose neighborhood saturates
the 62-bit window take the smallest free color ≥ the window (rare: needs
degree ≥ 62 conflicts)."""

from __future__ import annotations

import numpy as np

from ..stages.superstep import PartitionedGraph, SuperstepEngine, SuperstepResult
from ..stages.vertex_program import OR, StepOutput, VertexProgram, WorkerContext

_BITS = 62


class K1ColoringProgram(VertexProgram):
    reducer = OR
    flow = "both"
    msg_dtype = "int64"
    state_keys = ("color",)

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        return {"color": np.zeros(ctx.n_local, dtype=np.int64)}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        color = state["color"]
        changed = 0
        if iteration > 0:
            neigh_bits = np.where(has_msg, msgs, 0)
            own_bit = np.where(color < _BITS,
                               np.int64(1) << np.minimum(color, _BITS - 1), 0)
            conflict = (neigh_bits & own_bit) != 0
            if conflict.any():
                # smallest free color: lowest zero bit of the neighbor mask
                free = (~neigh_bits) & ((np.int64(1) << np.int64(_BITS)) - 1)
                # isolate lowest set bit of `free`; log2 gives its index
                lowest = free & -free
                new_color = np.where(
                    lowest > 0,
                    np.round(np.log2(lowest.astype(np.float64))).astype(np.int64),
                    _BITS)
                color = np.where(conflict, new_color, color)
                changed = int(conflict.sum())
                state["color"] = color
        bits = np.where(color < _BITS,
                        np.int64(1) << np.minimum(color, _BITS - 1), 0)
        return StepOutput(
            send_mask=np.ones(ctx.n_local, dtype=bool),
            send_value=bits,
            changed=changed if iteration > 0 else ctx.n_local,
        )


def k1_coloring(
    graph: PartitionedGraph,
    max_iterations: int = 50,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> SuperstepResult:
    """(vid, color) proper coloring of the undirected simple graph."""
    # orient the constraint: only messages from lower-id to higher-id
    # vertices matter for conflicts — build the low→high oriented graph
    if graph.kind == "arrays":
        u = np.minimum(graph.src, graph.dst)
        v = np.maximum(graph.src, graph.dst)
        keep = u != v
        pairs = np.unique(np.stack([u[keep], v[keep]], axis=1), axis=0)
        oriented = PartitionedGraph.from_arrays(graph.n, pairs[:, 0],
                                                pairs[:, 1])
    else:
        # distributed orientation: canonicalize inside map_batches, then
        # re-lay-out (dedup'd) into a temp partitioned graph dir
        import tempfile

        import pyarrow as pa

        from ..sources.graph_build import build_int_graph

        def orient(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            u = np.minimum(s, d)
            v = np.maximum(s, d)
            keep = u != v
            return pa.table({"src": u[keep], "dst": v[keep]})

        oriented_ds = graph.edges_dataset(("src", "dst"), flow="out") \
            .map_batches(orient, batch_format="pyarrow",
                         zero_copy_batch=True)
        oriented = build_int_graph(
            oriented_ds, tempfile.mkdtemp(prefix="gds_k1_oriented_"),
            graph.n, graph.num_parts_layout,
            lineage={"source": graph.path, "derivation": "k1_oriented"})
        oriented.owns_dir = True
    prog = K1ColoringProgram()
    prog.flow = "out"  # low-id → high-id constraint flow only
    eng = engine or SuperstepEngine(oriented, num_parts=num_parts)
    try:
        return eng.run(prog, max_iterations=max_iterations,
                       convergence="changed", collect=("color",))
    finally:
        if engine is None:
            eng.shutdown()
        oriented.cleanup()