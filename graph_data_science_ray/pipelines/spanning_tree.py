"""Minimum spanning tree/forest — parity with gds.spanningTree
(alpha/.../spanningtree/Prim.java semantics: undirected weighted MST;
minimum by default, tie-break toward smaller endpoint ids).

Distributed formulation: BORŮVKA rounds over the edge Dataset (the
textbook distributed MST — Prim's frontier heap is inherently
sequential, but both produce a minimum spanning forest; with distinct
weights the edge sets are identical, with ties Borůvka's lexicographic
(w, u, v) rule makes the output deterministic):

  repeat O(log V) times:
    1. map_batches: relabel edge endpoints by current component
       (broadcast label array), drop internal edges;
    2. per-component minimum outgoing edge via compact per-batch
       partials + hash-bucketed min-combine;
    3. driver union-find over the ≤ #components chosen edges (tiny).

Each round at least halves the component count. Only the label array
(O(V)) and the per-round chosen edges (≤ #components) are
driver-resident."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.superstep import PartitionedGraph


# MST per (graph path, weighted) — q_spanning_tree and q_k_spanning_tree
# run Borůvka on the same cached graph; recomputing it is pure waste.
_MST_CACHE: dict = {}


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
    # Materialize the external-edge set once, then shrink it each round
    # (internal edges can never re-become external) — avoids re-reading
    # the full edge parquet every Borůvka round (O(rounds·E) I/O).
    edges = graph.edges_dataset(("src", "dst", "weight"),
                                flow="out").materialize()

    for _ in range(max_rounds):
        labels_ref = ray.put(labels)

        def keep_external(t: pa.Table) -> pa.Table:
            lab = ray.get(labels_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            ext = lab[src] != lab[dst]
            return t.filter(pa.array(ext))

        edges = edges.map_batches(keep_external, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
        if edges.count() == 0:
            break

        def partial(t: pa.Table) -> pa.Table:
            lab = ray.get(labels_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
            ls, ld = lab[src], lab[dst]
            # each edge is a candidate for BOTH endpoint components;
            # keep the per-batch minimum (w, u, v) per component
            comp = np.concatenate([ls, ld])
            cu = np.concatenate([np.minimum(src, dst)] * 2)
            cv = np.concatenate([np.maximum(src, dst)] * 2)
            cw = np.concatenate([w, w])
            order = np.lexsort((cv, cu, cw, comp))
            comp, cu, cv, cw = comp[order], cu[order], cv[order], cw[order]
            first = np.r_[True, comp[1:] != comp[:-1]]
            return pa.table({"comp": comp[first], "w": cw[first],
                             "u": cu[first], "v": cv[first]})

        partials = edges.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True)

        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__bucket"] = df["comp"].to_numpy() % 32
            return df

        def min_kernel(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(["comp", "w", "u", "v"])
            return g.drop_duplicates("comp", keep="first")[
                ["comp", "w", "u", "v"]]

        best = (partials.map_batches(add_bucket, batch_format="pandas")
                .groupby("__bucket")
                .map_groups(min_kernel, batch_format="pandas")
                .to_pandas())
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
