"""Strongly connected components — parity with gds.scc
(alpha/.../impl/scc/SccAlgorithm.java, Tarjan-based sequential) via the
distributed FORWARD-COLORING / BACKWARD-WAVE scheme (Orzan's coloring
algorithm — the standard Pregel formulation):

  repeat until every vertex is assigned:
    1. coloring: min-label propagation along OUT edges among unassigned
       vertices → color(v) = min unassigned ancestor (vids that reach v);
       vertices with color(v) == v are roots.
    2. backward wave: from each root c, propagate along IN edges through
       vertices with color == c → exactly {v : v →* c ∧ c →* v} = SCC(c).
       All roots run in ONE superstep program: the wave value is -scc
       (successor colors are ≤ own color, so a MAX-combine — MIN over
       negated values — can never mask the matching root's message).
    3. mark assigned; the minimum unassigned vid is always a root, so
       every round retires ≥ 1 SCC (in practice most of them).

Component ids are the minimum vid in each SCC, matching the WCC
convention. The per-round assigned/color masks ride inside the program
object (an O(V) bool/int broadcast per round — same cost class as the
result collection)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph, SuperstepEngine
from ..stages.vertex_program import MIN, StepOutput, VertexProgram

_I64MAX = np.iinfo(np.int64).max


class _ForwardColorProgram(VertexProgram):
    reducer = MIN
    flow = "out"
    msg_dtype = "int64"
    state_keys = ("color",)

    def __init__(self, assigned: np.ndarray):
        self.assigned = assigned

    def init_state(self, ctx):
        gids = ctx.global_ids()
        color = np.where(self.assigned[gids], _I64MAX, gids)
        return {"color": color, "unassigned": ~self.assigned[gids]}

    def compute(self, ctx, state, msgs, has_msg, active, iteration):
        color = state["color"]
        un = state["unassigned"]
        if iteration == 0:
            send_mask = un.copy()
            changed = int(un.sum())
        else:
            upd = un & has_msg & (msgs < color)
            color = np.where(upd, msgs, color)
            state["color"] = color
            send_mask = upd
            changed = int(upd.sum())
        return StepOutput(send_mask=send_mask, send_value=color,
                          halt_mask=active.copy(), changed=changed)


class _BackwardWaveProgram(VertexProgram):
    reducer = MIN
    flow = "in"
    msg_dtype = "int64"
    state_keys = ("scc",)

    def __init__(self, color: np.ndarray, assigned: np.ndarray):
        self.color = color
        self.assigned = assigned

    def init_state(self, ctx):
        gids = ctx.global_ids()
        color = self.color[gids]
        un = ~self.assigned[gids]
        scc = np.where(un & (color == gids), gids, np.int64(-1))
        return {"scc": scc, "color": color, "unassigned": un}

    def compute(self, ctx, state, msgs, has_msg, active, iteration):
        scc = state["scc"]
        if iteration == 0:
            send_mask = scc >= 0
        else:
            # wave value is -root; successors' colors ≤ own color, so the
            # MIN over negated values (= MAX over roots) surfaces the
            # matching root whenever one arrived
            val = np.where(has_msg, -msgs, np.int64(-1))
            acc = (state["unassigned"] & (scc < 0) & has_msg
                   & (val == state["color"]))
            scc = np.where(acc, state["color"], scc)
            state["scc"] = scc
            send_mask = acc
        return StepOutput(send_mask=send_mask, send_value=-scc,
                          halt_mask=active.copy())


def scc(
    graph: PartitionedGraph,
    max_rounds: int = 100,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> pd.DataFrame:
    """(vid, component) — component = min vid in the SCC."""
    n = graph.n
    assigned = np.zeros(n, dtype=bool)
    out = np.arange(n, dtype=np.int64)  # isolated vertices: own SCC
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    try:
        for _ in range(max_rounds):
            if assigned.all():
                break
            res = eng.run(_ForwardColorProgram(assigned.copy()),
                          max_iterations=n + 2, collect=("color",))
            df = res.to_pandas()
            color = np.full(n, _I64MAX, dtype=np.int64)
            color[df["vid"].to_numpy()] = df["color"].to_numpy()
            res = eng.run(_BackwardWaveProgram(color, assigned.copy()),
                          max_iterations=n + 2, collect=("scc",))
            df = res.to_pandas()
            scc_vals = np.full(n, -1, dtype=np.int64)
            scc_vals[df["vid"].to_numpy()] = df["scc"].to_numpy()
            newly = (scc_vals >= 0) & ~assigned
            if not newly.any():
                break
            out[newly] = scc_vals[newly]
            assigned |= newly
    finally:
        if engine is None:
            eng.shutdown()
    return pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                         "component": out})


def scc_reference(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Iterative Tarjan oracle (min-vid component ids) for tests."""
    indptr_order = np.lexsort((dst, src))
    s, d = src[indptr_order], dst[indptr_order]
    indptr = np.searchsorted(s, np.arange(n + 1))
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] >= 0:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            for ei in range(indptr[v] + pi, indptr[v + 1]):
                w = d[ei]
                if index[w] < 0:
                    work[-1] = (v, ei - indptr[v] + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                cid = min(members)
                for w in members:
                    comp[w] = cid
    return comp
