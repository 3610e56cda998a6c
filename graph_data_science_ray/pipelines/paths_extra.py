"""Point-to-point path queries: Dijkstra (with target), A*, Yen's K
shortest loopless paths — parity with paths/dijkstra/Dijkstra.java,
paths/astar/AStar.java, paths/yens/Yens.java.

These are PER-QUERY lookups (one source/target pair), sequential in the
reference too; they run on a CSR streamed once from the partitioned
blocks. The distributed all-targets form is
``traversal.shortest_path_predecessors``."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph


def _weighted_csr(graph: PartitionedGraph):
    if graph.kind == "arrays":
        src, dst = graph.src, graph.dst
        w = (graph.weight if graph.weight is not None
             else np.ones(len(src)))
    else:
        cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")
        parts = {c: [] for c in ("src", "dst", "weight")}
        for batch in graph.edges_dataset(cols, flow="out").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"):
            parts["src"].append(batch["src"].to_numpy(zero_copy_only=False))
            parts["dst"].append(batch["dst"].to_numpy(zero_copy_only=False))
            parts["weight"].append(
                batch["weight"].to_numpy(zero_copy_only=False)
                if "weight" in batch.column_names
                else np.ones(len(parts["src"][-1])))
        if not parts["src"]:
            e = np.empty(0, np.int64)
            return (np.zeros(graph.n + 1, np.int64), e,
                    np.empty(0, np.float64))
        src = np.concatenate(parts["src"])
        dst = np.concatenate(parts["dst"])
        w = np.concatenate(parts["weight"])
    order = np.lexsort((dst, src))
    s, d, ww = src[order], dst[order], w[order].astype(np.float64)
    indptr = np.searchsorted(s, np.arange(graph.n + 1))
    return indptr, d, ww


def _dijkstra_csr(indptr, indices, weights, source: int, target: int,
                  heuristic: np.ndarray | None = None,
                  banned_edges: set | None = None,
                  banned_nodes: np.ndarray | None = None):
    """Binary-heap Dijkstra / A* over the CSR; returns (cost, path) or
    (inf, []). Deterministic tie-break: smaller vid pops first. The
    per-settle relaxation is vectorized over the vertex's whole
    adjacency slice — only improved entries touch the Python heap."""
    n = len(indptr) - 1
    dist = np.full(n, np.inf)
    pred = np.full(n, -1, dtype=np.int64)
    dist[source] = 0.0
    h0 = 0.0 if heuristic is None else heuristic[source]
    heap = [(h0, source)]
    done = np.zeros(n, dtype=bool)
    # banned edges grouped by source for vectorized masking
    banned_by_src: dict[int, np.ndarray] = {}
    if banned_edges:
        for (a, b) in banned_edges:
            banned_by_src.setdefault(a, []).append(b)
        banned_by_src = {a: np.asarray(bs, dtype=np.int64)
                         for a, bs in banned_by_src.items()}
    while heap:
        _, v = heapq.heappop(heap)
        if done[v]:
            continue
        if v == target:
            break
        done[v] = True
        lo, hi = indptr[v], indptr[v + 1]
        nb = indices[lo:hi]
        nd = dist[v] + weights[lo:hi]
        if len(nb) > 1:
            # parallel edges: keep the cheapest per neighbor (slice is
            # dst-sorted, duplicates adjacent)
            runs = np.flatnonzero(np.r_[True, nb[1:] != nb[:-1]])
            if len(runs) != len(nb):
                nb = nb[runs]
                nd = np.minimum.reduceat(nd, runs)
        ok = ~done[nb]
        if banned_nodes is not None:
            ok &= ~banned_nodes[nb]
        if v in banned_by_src:
            ok &= ~np.isin(nb, banned_by_src[v])
        # min-predecessor tie-break: equal-cost relaxations keep the
        # smaller v, and v increases monotonically per settle order only
        # within equal dist — handle ties explicitly
        tie = ok & (nd == dist[nb]) & (v < pred[nb])
        pred[nb[tie]] = v
        upd = ok & (nd < dist[nb])
        if upd.any():
            un, und = nb[upd], nd[upd]
            dist[un] = und
            pred[un] = v
            fs = und if heuristic is None else und + heuristic[un]
            for f, u in zip(fs.tolist(), un.tolist()):
                heapq.heappush(heap, (f, u))
    if not np.isfinite(dist[target]):
        return np.inf, []
    path = [int(target)]
    v = int(target)
    while v != source:
        v = int(pred[v])
        path.append(v)
    return float(dist[target]), path[::-1]


def dijkstra_path(graph: PartitionedGraph, source: int, target: int,
                  ) -> tuple[float, list[int]]:
    """(cost, path) single-pair shortest path."""
    indptr, indices, weights = _weighted_csr(graph)
    return _dijkstra_csr(indptr, indices, weights, source, target)


def astar_path(graph: PartitionedGraph, source: int, target: int,
               latitude: np.ndarray, longitude: np.ndarray,
               ) -> tuple[float, list[int]]:
    """A* with the haversine heuristic (AStar.java uses lat/lon great-
    circle distance as the admissible estimate)."""
    lat_t, lon_t = np.radians(latitude[target]), np.radians(longitude[target])
    lat, lon = np.radians(latitude), np.radians(longitude)
    dphi = lat - lat_t
    dlmb = lon - lon_t
    a = (np.sin(dphi / 2) ** 2
         + np.cos(lat) * np.cos(lat_t) * np.sin(dlmb / 2) ** 2)
    heuristic = 2 * 6371.0 * np.arcsin(np.sqrt(np.clip(a, 0, 1)))
    indptr, indices, weights = _weighted_csr(graph)
    return _dijkstra_csr(indptr, indices, weights, source, target,
                         heuristic=heuristic)


def yens_k_shortest(graph: PartitionedGraph, source: int, target: int,
                    k: int = 3) -> pd.DataFrame:
    """(rank, total_cost, path) — Yen's K loopless shortest paths
    (Yens.java): spur-node deviations with the root's edges blocked and
    root-path nodes banned, candidates kept in a min-heap."""
    indptr, indices, weights = _weighted_csr(graph)
    cost0, p0 = _dijkstra_csr(indptr, indices, weights, source, target)
    if not p0:
        return pd.DataFrame({"rank": [], "total_cost": [], "path": []})

    def edge_cost(u, v):
        for ei in range(indptr[u], indptr[u + 1]):
            if indices[ei] == v:
                return float(weights[ei])
        return np.inf

    paths = [(cost0, p0)]
    candidates: list[tuple[float, list[int]]] = []
    seen = {tuple(p0)}
    while len(paths) < k:
        prev_cost, prev_path = paths[-1]
        for i in range(len(prev_path) - 1):
            spur = prev_path[i]
            root = prev_path[: i + 1]
            banned_edges = set()
            for pc, pp in paths:
                if len(pp) > i and pp[: i + 1] == root:
                    banned_edges.add((pp[i], pp[i + 1]))
            banned_nodes = np.zeros(len(indptr) - 1, dtype=bool)
            for v in root[:-1]:
                banned_nodes[v] = True
            spur_cost, spur_path = _dijkstra_csr(
                indptr, indices, weights, spur, target,
                banned_edges=banned_edges, banned_nodes=banned_nodes)
            if not spur_path:
                continue
            total = spur_path if i == 0 else root[:-1] + spur_path
            key = tuple(total)
            if key in seen:
                continue
            root_cost = sum(edge_cost(root[j], root[j + 1])
                            for j in range(len(root) - 1))
            heapq.heappush(candidates, (root_cost + spur_cost, total))
            seen.add(key)
        if not candidates:
            break
        paths.append(heapq.heappop(candidates))
    return pd.DataFrame({
        "rank": np.arange(len(paths), dtype=np.int64),
        "total_cost": [round(c, 9) for c, _ in paths],
        "path": [p for _, p in paths],
    })
