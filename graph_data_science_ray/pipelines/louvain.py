"""Louvain community detection + modularity — parity with gds.louvain
(louvain/Louvain.java:52-176: ModularityOptimization per level →
community contraction into a supergraph, ≤ maxLevels, dendrogram).

Round-1 shape: the per-level LOCAL-MOVING phase runs the classic
sequential Gauss-Seidel sweep (deterministic ascending order — the same
semantics the reference's concurrency=1 path optimizes; its distributed
form is the wave-scheduled vote-superstep used by label propagation,
with community volumes broadcast via the master hook — phase-2 work).
CONTRACTION re-keys the edge list by community and aggregates parallel
edges — the distributed groupby step. Modularity is a vectorized
edge-table computation.

Undirected interpretation: input directed edges are symmetrized; each
undirected edge counted once in m.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph


def modularity(n: int, src: np.ndarray, dst: np.ndarray,
               weight: np.ndarray | None, labels: np.ndarray) -> float:
    """Q = Σ_c [ in_c/(2m) − (vol_c/(2m))² ] over the symmetrized graph.

    Vectorized over the edge table (the distributed form is two
    groupby-sums keyed by community)."""
    w = np.ones(len(src)) if weight is None else weight.astype(np.float64)
    # symmetrize: each directed edge contributes w to both endpoints' vol
    two_m = 2.0 * w.sum()
    if two_m == 0:
        return 0.0
    vol = np.bincount(src, weights=w, minlength=n) + \
        np.bincount(dst, weights=w, minlength=n)
    same = labels[src] == labels[dst]
    in_w = np.bincount(labels[src[same]], weights=2.0 * w[same],
                       minlength=labels.max() + 1)
    vol_c = np.bincount(labels, weights=vol, minlength=labels.max() + 1)
    return float((in_w / two_m).sum() - ((vol_c / two_m) ** 2).sum())


def _local_moving(n: int, src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                  max_sweeps: int = 10) -> np.ndarray:
    """Gauss-Seidel modularity-gain sweeps over the symmetric adjacency."""
    # symmetric CSR with weights (self-loops kept: contracted internals)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    order = np.lexsort((d, s))
    s, d, ww = s[order], d[order], ww[order]
    indptr = np.searchsorted(s, np.arange(n + 1))

    deg = np.bincount(s, weights=ww, minlength=n)  # 2w self-loops intended
    two_m = float(w.sum() * 2.0)
    if two_m == 0:
        return np.arange(n, dtype=np.int64)
    labels = np.arange(n, dtype=np.int64)
    vol = deg.copy()  # per-community volume

    for _ in range(max_sweeps):
        moved = 0
        for v in range(n):
            lo, hi = indptr[v], indptr[v + 1]
            if lo == hi:
                continue
            nbr = d[lo:hi]
            wv = ww[lo:hi]
            own = labels[v]
            # k_v,in per neighbor community (self-loops excluded)
            ext = nbr != v
            cl = labels[nbr[ext]]
            k_in: dict[int, float] = {}
            for c, x in zip(cl.tolist(), wv[ext].tolist()):
                k_in[c] = k_in.get(c, 0.0) + x
            k_in.setdefault(own, 0.0)
            kv = deg[v]
            best_c, best_gain = own, -np.inf
            for c in sorted(k_in):
                volc = vol[c] - (kv if c == own else 0.0)
                gain = k_in[c] - kv * volc / two_m
                if gain > best_gain + 1e-15:
                    best_gain, best_c = gain, c
            if best_c != own:
                vol[own] -= kv
                vol[best_c] += kv
                labels[v] = best_c
                moved += 1
        if moved == 0:
            break
    return labels


def louvain(
    graph: PartitionedGraph,
    max_levels: int = 10,
    max_sweeps: int = 10,
) -> tuple[pd.DataFrame, list[float]]:
    """Returns ((vid, community), modularity per level). Community ids
    are representative original vids (stable across runs)."""
    if graph.kind != "arrays":
        raise NotImplementedError("louvain currently takes in-memory graphs")
    n = graph.n
    src = graph.src.copy()
    dst = graph.dst.copy()
    w = (np.ones(len(src)) if graph.weight is None
         else graph.weight.astype(np.float64))
    mapping = np.arange(n, dtype=np.int64)  # original vid -> current node
    mods: list[float] = []

    for _level in range(max_levels):
        m = len(np.unique(np.concatenate([src, dst]))) if len(src) else 0
        cur_n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 0
        if cur_n == 0:
            break
        labels = _local_moving(cur_n, src, dst, w, max_sweeps=max_sweeps)
        q = modularity(cur_n, src, dst, w, labels)
        if mods and q <= mods[-1] + 1e-12:
            break
        mods.append(q)
        mapping = labels[mapping]
        # contraction: re-key edges by community, aggregate parallel edges
        # (the distributed groupby step — stages.shuffle.distinct_rows with
        # a sum aggregate at scale)
        csrc, cdst = labels[src], labels[dst]
        df = pd.DataFrame({"s": csrc, "d": cdst, "w": w})
        agg = df.groupby(["s", "d"], sort=False)["w"].sum().reset_index()
        src = agg["s"].to_numpy(np.int64)
        dst = agg["d"].to_numpy(np.int64)
        w = agg["w"].to_numpy(np.float64)
        if len(np.unique(labels)) == m:
            break

    # densify community ids to representative min original vid
    final = mapping
    uniq = np.unique(final)
    rep = {c: int(np.min(np.flatnonzero(final == c))) for c in uniq}
    community = np.array([rep[c] for c in final], dtype=np.int64)
    out = pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                        "community": community})
    return out, mods