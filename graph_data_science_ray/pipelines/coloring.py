"""K-1 Coloring — parity with gds.beta.k1coloring
(beta/k1coloring/K1Coloring.java): greedy Çatalyürek-style parallel
coloring with conflict-resolution rounds.

Superstep form with the OR reducer: each vertex broadcasts the bit of
its current color relative to the active 62-color window; a vertex that
sees its own color bit among LOWER-ID neighbors (deterministic priority
— the reference resolves conflicts by node id) recolors to the smallest
free color within the window. Converges when no vertex recolors.

Colors are unbounded, matching the reference's per-node BitSet of
forbidden colors: each engine run resolves one 62-color window
[62w, 62(w+1)); vertices whose lower-id neighborhood saturates the
window take the sentinel color 62(w+1) and are re-run in the next
window (they stay silent — a sentinel color never equals a resolved
color, so resolved windows are final). The driver loops windows until
no vertex overflows; colors carry between waves as the engine's
per-partition state refs (never an O(V) driver array)."""

from __future__ import annotations

import numpy as np
import ray

from ..stages.superstep import PartitionedGraph, SuperstepEngine, SuperstepResult
from ..stages.vertex_program import OR, StepOutput, VertexProgram, WorkerContext

_BITS = 62


@ray.remote(num_cpus=0)
def _max_color(table) -> int:
    """Per-partition max color (num_cpus=0: the engine's workers may
    hold every CPU reservation — see CLAUDE.md invariant)."""
    import pyarrow.compute as pc
    if table.num_rows == 0:
        return -1
    return int(pc.max(table["color"]).as_py())


class K1ColoringProgram(VertexProgram):
    reducer = OR
    flow = "both"
    msg_dtype = "int64"
    state_keys = ("color",)

    def __init__(self, base: int = 0, prev_refs: list | None = None):
        # window w resolves colors [base, base + 62); prev_refs are the
        # previous window's per-partition state tables (local order),
        # absent for the first window where every vertex starts at 0
        self.base = int(base)
        self.prev_refs = prev_refs

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        if self.prev_refs is None:
            return {"color": np.zeros(ctx.n_local, dtype=np.int64)}
        t = ray.get(self.prev_refs[ctx.part])
        color = t["color"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(color) != ctx.n_local:
            raise ValueError(
                f"wave state misaligned: partition {ctx.part} carried "
                f"{len(color)} colors for {ctx.n_local} local vertices "
                "(window runs must reuse the same engine/partition count)")
        return {"color": color.copy()}

    def _bits(self, color: np.ndarray) -> np.ndarray:
        """Broadcast bit of (color - base) for vertices inside the
        window; resolved (< base) and overflowed (>= base+62) vertices
        are silent."""
        rel = color - self.base
        inside = (rel >= 0) & (rel < _BITS)
        return np.where(inside,
                        np.int64(1) << np.minimum(np.maximum(rel, 0),
                                                  _BITS - 1), 0)

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        color = state["color"]
        changed = 0
        if iteration > 0:
            neigh_bits = np.where(has_msg, msgs, 0)
            own_bit = self._bits(color)
            conflict = (neigh_bits & own_bit) != 0
            if conflict.any():
                # smallest free color in the window: lowest zero bit of
                # the neighbor mask; a saturated mask (free == 0) defers
                # the vertex to the next window via the sentinel base+62
                free = (~neigh_bits) & ((np.int64(1) << np.int64(_BITS)) - 1)
                lowest = free & -free
                new_rel = np.where(
                    lowest > 0,
                    np.round(np.log2(lowest.astype(np.float64))).astype(np.int64),
                    _BITS)
                color = np.where(conflict, self.base + new_rel, color)
                changed = int(conflict.sum())
                state["color"] = color
        return StepOutput(
            send_mask=np.ones(ctx.n_local, dtype=bool),
            send_value=self._bits(color),
            changed=changed if iteration > 0 else ctx.n_local,
        )


def k1_coloring(
    graph: PartitionedGraph,
    max_iterations: int = 1000,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> SuperstepResult:
    """(vid, color) proper coloring of the undirected simple graph.

    max_iterations bounds each 62-color window's conflict rounds. Our
    rounds are finer-grained than the reference's sweeps (a contested
    window can settle as slowly as ~one color per round — measured on
    K_80), so the default is a generous safety cap, not a tuning knob:
    converged runs stop early and are unaffected by it."""
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
    eng = engine or SuperstepEngine(oriented, num_parts=num_parts)
    try:
        base = 0
        prev_refs = None
        # each window resolves 62 colors, so ceil(n/62) windows always
        # suffice (a greedy coloring never exceeds n colors)
        max_waves = max(1, -(-graph.n // _BITS))
        res = None
        for _ in range(max_waves):
            prog = K1ColoringProgram(base=base, prev_refs=prev_refs)
            prog.flow = "out"  # low-id → high-id constraint flow only
            res = eng.run(prog, max_iterations=max_iterations,
                          convergence="changed", collect=("color",))
            top = max(ray.get([_max_color.remote(r)
                               for r in res.state_refs]), default=-1)
            if top < base + _BITS:
                break
            prev_refs = res.state_refs
            base += _BITS
        return res
    finally:
        if engine is None:
            eng.shutdown()
        oriented.cleanup()
