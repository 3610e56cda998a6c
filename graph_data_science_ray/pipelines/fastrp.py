"""FastRP node embeddings — parity with gds.fastRP
(embeddings/fastrp/FastRP.java:1-476: very sparse random projection,
normalizationStrength-scaled init, per-iteration neighbor averaging +
L2 row normalization, iterationWeights-weighted sum).

Runs on the superstep engine's vector-valued message bundles (msg_dim):
each superstep every vertex SUM-receives its neighbors' current [d]
vectors, averages by degree, L2-normalizes locally (row-local — no
masterCompute barrier needed) and accumulates weight_i * E_i into the
result column. Messages are the engine's packed per-sender [rows, d]
blocks with sender-side segmented-reduce combining, so per-superstep
traffic is O(P · V · d) worst case, never O(E · d).

The initial projection is hash-seeded per (vid, dim) — deterministic
and independent of partitioning, so distributed output is bit-identical
to the NumPy reference (tests/oracle)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph, SuperstepEngine
from ..stages.vertex_program import SUM, StepOutput, VertexProgram

_SQRT3 = np.sqrt(3.0)


def sparse_random_projection(vids: np.ndarray, dim: int,
                             seed: int = 42) -> np.ndarray:
    """Very sparse random projection (Achlioptas / Li et al., the scheme
    FastRP.java's initRandomVectors uses): +sqrt(3) w.p. 1/6, -sqrt(3)
    w.p. 1/6, else 0 — hash-derived per (seed, vid, dim) so any worker
    generates the same rows for the vids it owns."""
    vids = np.asarray(vids, dtype=np.uint64)
    j = np.arange(dim, dtype=np.uint64)
    x = (vids[:, None] * np.uint64(0x9E3779B97F4A7C15)
         + j[None, :] * np.uint64(0xC2B2AE3D27D4EB4F)
         + np.uint64(seed))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    u = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    out = np.zeros(u.shape, dtype=np.float64)
    out[u < 1.0 / 6.0] = _SQRT3
    out[u > 5.0 / 6.0] = -_SQRT3
    return out


def _l2_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class FastRPProgram(VertexProgram):
    reducer = SUM
    state_keys = ("emb",)

    def __init__(self, dim: int, iteration_weights: list[float],
                 normalization_strength: float = 0.0,
                 flow: str = "out", weighted: bool = False, seed: int = 42):
        self.msg_dim = dim
        self.dim = dim
        self.iteration_weights = list(iteration_weights)
        self.normalization_strength = normalization_strength
        self.flow = flow
        self.weighted = weighted
        self.use_edge_weights = weighted
        self.seed = seed

    def init_state(self, ctx):
        gids = ctx.global_ids()
        cur = sparse_random_projection(gids, self.dim, self.seed)
        if self.normalization_strength != 0.0:
            deg = ctx.degree(self.flow, weighted=self.weighted).astype(
                np.float64)
            scale = np.power(np.maximum(deg, 1.0),
                             self.normalization_strength)
            cur = cur * scale[:, None]
        return {"cur": cur,
                "emb": np.zeros((ctx.n_local, self.dim), dtype=np.float64)}

    def compute(self, ctx, state, msgs, has_msg, active, iteration):
        n_local = ctx.n_local
        last = len(self.iteration_weights)
        # the pipelined engine may run look-ahead supersteps past the
        # last weighted iteration — they must be no-ops
        if 0 < iteration <= last:
            deg = ctx.degree(self.flow, weighted=self.weighted).astype(
                np.float64)
            avg = np.zeros((n_local, self.dim), dtype=np.float64)
            if msgs is not None:
                np.divide(msgs, np.maximum(deg, 1.0)[:, None], out=avg,
                          where=(deg > 0)[:, None])
            cur = _l2_rows(avg)
            state["cur"] = cur
            state["emb"] = (state["emb"]
                            + self.iteration_weights[iteration - 1] * cur)
        done = iteration >= last
        send_mask = (np.zeros(n_local, dtype=bool) if done
                     else np.ones(n_local, dtype=bool))
        halt = np.ones(n_local, dtype=bool) if done else None
        return StepOutput(send_mask=send_mask, send_value=state["cur"],
                          halt_mask=halt)


def fastrp(
    graph: PartitionedGraph,
    dim: int = 64,
    iteration_weights: list[float] | None = None,
    normalization_strength: float = 0.0,
    weighted: bool = False,
    seed: int = 42,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> pd.DataFrame:
    """(vid, emb) — emb a list column of length `dim`. Defaults mirror
    FastRPBaseConfig: iterationWeights [0.0, 1.0, 1.0]."""
    if iteration_weights is None:
        iteration_weights = [0.0, 1.0, 1.0]
    prog = FastRPProgram(dim, iteration_weights,
                         normalization_strength=normalization_strength,
                         weighted=weighted, seed=seed)
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    try:
        res = eng.run(prog, max_iterations=len(iteration_weights) + 2,
                      collect=("emb",))
    finally:
        if engine is None:
            eng.shutdown()
    return res.to_pandas()


def fastrp_reference(n: int, src: np.ndarray, dst: np.ndarray,
                     dim: int, iteration_weights: list[float],
                     normalization_strength: float = 0.0,
                     weight: np.ndarray | None = None,
                     seed: int = 42) -> np.ndarray:
    """NumPy oracle: same init, mean-propagation, L2 + weighted sum."""
    cur = sparse_random_projection(np.arange(n), dim, seed)
    w = np.ones(len(src)) if weight is None else weight.astype(np.float64)
    deg = np.bincount(src, weights=w, minlength=n)
    if normalization_strength != 0.0:
        cur = cur * np.power(np.maximum(deg, 1.0),
                             normalization_strength)[:, None]
    emb = np.zeros((n, dim))
    for iw in iteration_weights:
        msgs = np.zeros((n, dim))
        np.add.at(msgs, dst, cur[src] * w[:, None])
        avg = np.divide(msgs, np.maximum(deg, 1.0)[:, None],
                        out=np.zeros_like(msgs), where=(deg > 0)[:, None])
        cur = _l2_rows(avg)
        emb += iw * cur
    return emb
