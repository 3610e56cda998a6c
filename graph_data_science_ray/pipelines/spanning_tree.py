"""Minimum spanning tree/forest — parity with gds.spanningTree
(alpha/.../spanningtree/Prim.java semantics: undirected weighted MST;
minimum by default, tie-break toward smaller endpoint ids).

Distributed formulation: BORŮVKA rounds over plasma edge blocks (the
textbook distributed MST — Prim's frontier heap is inherently
sequential, but both produce a minimum spanning forest; with distinct
weights the edge sets are identical, with ties Borůvka's lexicographic
(w, u, v) rule makes the output deterministic):

  repeat O(log V) times:
    1. one task per edge block: relabel endpoints by current component
       (broadcast label array), drop internal edges (the shrunken
       block is the task's plasma return — next round reads it, no
       Dataset job), emit the per-block minimum (w, u, v) candidate
       per component;
    2. tree-combine the per-block partials in tasks (min is
       order-independent under the (w, u, v) total order) so the
       driver receives ≤ #components rows;
    3. driver union-find over the chosen edges (tiny).

Each round at least halves the component count. Only the label array
(O(V)) and the per-round chosen edges (≤ #components) are
driver-resident; rounds pay task dispatch, not Dataset-job fixed
costs (r4 — the per-round map_batches+groupby pipeline spent ~1 s of
fixed cost per round at query scale)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.superstep import PartitionedGraph


# MST per (graph path, weighted) — q_spanning_tree and q_k_spanning_tree
# run Borůvka on the same cached graph; recomputing it is pure waste.
_MST_CACHE: dict = {}

_COMBINE_FANIN = 8


def _min_per_comp(comp, cw, cu, cv):
    order = np.lexsort((cv, cu, cw, comp))
    comp, cu, cv, cw = comp[order], cu[order], cv[order], cw[order]
    first = np.r_[True, comp[1:] != comp[:-1]] if len(comp) else \
        np.empty(0, bool)
    return comp[first], cw[first], cu[first], cv[first]


@ray.remote(num_returns=2)
def _boruvka_block(tbl: pa.Table, labels: np.ndarray):
    """(shrunken external-edge block, per-component min candidates)
    for one round — the block return stays in plasma for the next
    round."""
    src = tbl["src"].to_numpy(zero_copy_only=False)
    dst = tbl["dst"].to_numpy(zero_copy_only=False)
    w = tbl["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    ls, ld = labels[src], labels[dst]
    ext = ls != ld
    src, dst, w = src[ext], dst[ext], w[ext]
    ls, ld = ls[ext], ld[ext]
    block = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                      "weight": pa.array(w)})
    # each edge is a candidate for BOTH endpoint components;
    # keep the per-block minimum (w, u, v) per component
    comp = np.concatenate([ls, ld])
    cu = np.concatenate([np.minimum(src, dst)] * 2)
    cv = np.concatenate([np.maximum(src, dst)] * 2)
    cw = np.concatenate([w, w])
    comp, cw, cu, cv = _min_per_comp(comp, cw, cu, cv)
    part = pa.table({"comp": pa.array(comp), "w": pa.array(cw),
                     "u": pa.array(cu), "v": pa.array(cv)})
    return block, part


@ray.remote
def _min_combine(*parts: pa.Table) -> pa.Table:
    """Tree-reduce stage: min (w, u, v) per component across partial
    tables (order-independent under the total order)."""
    t = pa.concat_tables(parts)
    comp, cw, cu, cv = _min_per_comp(
        t["comp"].to_numpy(zero_copy_only=False),
        t["w"].to_numpy(zero_copy_only=False),
        t["u"].to_numpy(zero_copy_only=False),
        t["v"].to_numpy(zero_copy_only=False))
    return pa.table({"comp": pa.array(comp), "w": pa.array(cw),
                     "u": pa.array(cu), "v": pa.array(cv)})


def spanning_tree(graph: PartitionedGraph,
                  max_rounds: int = 64) -> pd.DataFrame:
    """(src, dst, weight) MST/forest edges, canonical src < dst."""
    cache_key = ((graph.path, graph.weighted, max_rounds)
                 if graph.kind == "parquet" else None)
    if cache_key is not None and cache_key in _MST_CACHE:
        return _MST_CACHE[cache_key].copy()
    n = graph.n
    labels = np.arange(n, dtype=np.int64)
    chosen_s, chosen_d, chosen_w = [], [], []
    # Materialize the edge blocks once; each round's tasks return the
    # shrunken blocks (internal edges can never re-become external).
    block_refs = graph.edges_dataset(
        ("src", "dst", "weight"), flow="out").materialize() \
        .to_arrow_refs()

    for _ in range(max_rounds):
        labels_ref = ray.put(labels)
        outs = [_boruvka_block.remote(r, labels_ref)
                for r in block_refs]
        block_refs = [o[0] for o in outs]
        part_refs = [o[1] for o in outs]
        while len(part_refs) > 1:
            part_refs = [
                _min_combine.remote(*part_refs[i:i + _COMBINE_FANIN])
                for i in range(0, len(part_refs), _COMBINE_FANIN)]
        best = ray.get(part_refs[0]).to_pandas() if part_refs else \
            pd.DataFrame()
        if best.empty:
            break
        u = best["u"].to_numpy(np.int64)
        v = best["v"].to_numpy(np.int64)
        w = best["w"].to_numpy(np.float64)
        # union-find over the chosen edges; dedup (u, v) first — both
        # endpoint components may have picked the same edge
        uniq = pd.DataFrame({"u": u, "v": v, "w": w}).drop_duplicates(
            ["u", "v"])
        merged_any = False
        for uu, vv, ww in uniq.itertuples(index=False):
            ru, rv = labels[uu], labels[vv]
            while ru != labels[ru]:
                ru = labels[ru]
            while rv != labels[rv]:
                rv = labels[rv]
            if ru == rv:
                continue
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            labels[hi] = lo
            chosen_s.append(int(uu))
            chosen_d.append(int(vv))
            chosen_w.append(float(ww))
            merged_any = True
        # path-compress labels fully (vectorized pointer jumping)
        while True:
            nxt = labels[labels]
            if np.array_equal(nxt, labels):
                break
            labels = nxt
        if not merged_any:
            break

    out = pd.DataFrame({"src": np.array(chosen_s, dtype=np.int64),
                        "dst": np.array(chosen_d, dtype=np.int64),
                        "weight": np.array(chosen_w, dtype=np.float64)})
    out = out.sort_values(["src", "dst"]).reset_index(drop=True)
    if cache_key is not None:
        _MST_CACHE[cache_key] = out.copy()
    return out


def k_spanning_tree(graph: PartitionedGraph, k: int,
                    max_rounds: int = 64) -> pd.DataFrame:
    """(vid, cluster) — gds.alpha.kSpanningTree: cut the MST into k
    clusters by removing its k-1 heaviest edges (min variant); cluster
    id = min vid in each resulting component."""
    mst = spanning_tree(graph, max_rounds=max_rounds)
    if len(mst):
        # drop the k-1 heaviest MST edges (deterministic tie-break)
        drop = mst.sort_values(["weight", "src", "dst"],
                               ascending=[False, True, True]).head(
            max(0, k - 1))
        keep = mst.drop(drop.index)
    else:
        keep = mst
    from .wcc import _local_min_labels
    labels = _local_min_labels(
        graph.n, np.arange(graph.n, dtype=np.int64),
        keep["src"].to_numpy(np.int64), keep["dst"].to_numpy(np.int64))
    return pd.DataFrame({"vid": np.arange(graph.n, dtype=np.int64),
                         "cluster": labels})


def prim_reference(n: int, src: np.ndarray, dst: np.ndarray,
                   w: np.ndarray) -> float:
    """Total MST/forest weight oracle (Prim per component)."""
    import heapq
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    order = np.lexsort((d, s))
    s, d, ww = s[order], d[order], ww[order]
    indptr = np.searchsorted(s, np.arange(n + 1))
    visited = np.zeros(n, dtype=bool)
    total = 0.0
    for root in range(n):
        if visited[root]:
            continue
        visited[root] = True
        heap = []
        for ei in range(indptr[root], indptr[root + 1]):
            heapq.heappush(heap, (float(ww[ei]), int(d[ei])))
        while heap:
            cost, v = heapq.heappop(heap)
            if visited[v]:
                continue
            visited[v] = True
            total += cost
            for ei in range(indptr[v], indptr[v + 1]):
                if not visited[d[ei]]:
                    heapq.heappush(heap, (float(ww[ei]), int(d[ei])))
    return total
