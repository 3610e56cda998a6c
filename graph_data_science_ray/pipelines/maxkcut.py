"""Approximate Maximum k-Cut — parity with gds.alpha.maxkcut
(alpha/.../impl/approxmaxkcut/ApproxMaxKCut.java: random assignment +
local-search moves maximizing the cut weight).

Superstep form on the engine's VOTE reducer (the Louvain local-moving
pattern): each vertex's neighbors vote with (set label, edge weight);
the adjust_votes hook appends ALL k sets as zero-weight candidates and
NEGATES the tallies, so the vote winner is the set minimizing same-set
neighbor weight — i.e. maximizing the vertex's cut contribution.
Wave-scheduled Gauss-Seidel updates (ascending vid ranges) prevent the
two-coloring oscillation of synchronous updates; converged when a full
sweep moves nothing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.superstep import PartitionedGraph, SuperstepEngine
from ..stages.vertex_program import VOTE, StepOutput, VertexProgram


def _hash_mod(x: np.ndarray, k: int, seed: int) -> np.ndarray:
    h = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return (h % np.uint64(k)).astype(np.int64)


class MaxKCutProgram(VertexProgram):
    reducer = VOTE
    flow = "both"
    msg_dtype = "int64"
    use_edge_weights = True
    edge_combine = "mul"
    state_keys = ("label",)

    def __init__(self, n: int, k: int, waves: int, seed: int = 42):
        self.n = n
        self.k = k
        self.waves = max(1, min(waves, n)) if n else 1
        self.bounds = np.linspace(0, n, self.waves + 1).astype(np.int64)
        self.seed = seed

    def identity(self):
        return None

    def init_state(self, ctx):
        gids = ctx.global_ids()
        return {"label": _hash_mod(gids, self.k, self.seed)}

    def _wave_range(self, w: int) -> tuple[int, int]:
        return int(self.bounds[w]), int(self.bounds[w + 1])

    def adjust_votes(self, idx, lbl, wgt, state):
        # candidates: every set, zero same-set weight where no neighbor
        uidx = np.unique(idx)
        kk = self.k
        idx = np.concatenate([idx, np.repeat(uidx, kk)])
        lbl = np.concatenate([lbl, np.tile(np.arange(kk, dtype=np.int64),
                                           len(uidx))])
        wgt = np.concatenate([wgt, np.zeros(len(uidx) * kk)])
        order = np.lexsort((lbl, idx))
        idx, lbl, wgt = idx[order], lbl[order], wgt[order]
        grp = np.flatnonzero(
            np.r_[True, (idx[1:] != idx[:-1]) | (lbl[1:] != lbl[:-1])])
        idx, lbl = idx[grp], lbl[grp]
        wgt = np.add.reduceat(wgt, grp)
        # winner = max of NEGATED same-set weight = min same-set weight
        return idx, lbl, -wgt

    def compute(self, ctx, state, msgs, has_msg, active, iteration):
        label = state["label"]
        changed = 0
        if iteration > 0 and msgs is not None:
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
            changed=changed,
            target_range=self._wave_range(iteration % self.waves),
        )


def _cut_weight(graph: PartitionedGraph, labels: np.ndarray) -> float:
    labels_ref = ray.put(np.asarray(labels, dtype=np.int64))
    cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")

    def partial(t: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = (t["weight"].to_numpy(zero_copy_only=False)
             if "weight" in t.column_names else np.ones(len(src)))
        return pa.table({"w": [float(w[lab[src] != lab[dst]].sum())]})

    ds = graph.edges_dataset(cols, flow="out").map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return float(ds.sum(on="w") or 0.0)


def approx_max_k_cut(
    graph: PartitionedGraph,
    k: int = 2,
    max_sweeps: int = 8,
    seed: int = 42,
    num_parts: int | None = None,
) -> tuple[pd.DataFrame, float]:
    """((vid, community), cut_weight) — community ∈ [0, k)."""
    n = graph.n
    waves = n if n <= 2048 else 16
    prog = MaxKCutProgram(n, k, waves, seed=seed)
    eng = SuperstepEngine(graph, num_parts=num_parts)
    try:
        res = eng.run(prog, max_iterations=max_sweeps * prog.waves + 2,
                      convergence="changed", convergence_window=prog.waves,
                      collect=("label",))
    finally:
        eng.shutdown()
    df = res.to_pandas()
    labels = np.zeros(n, dtype=np.int64)
    labels[df["vid"].to_numpy()] = df["label"].to_numpy()
    cut = _cut_weight(graph, labels)
    out = pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                        "community": labels})
    return out, cut
