"""Point-to-point path queries: Dijkstra (with target), A*, Yen's K
shortest loopless paths — parity with paths/dijkstra/Dijkstra.java,
paths/astar/AStar.java, paths/yens/Yens.java.

These are PER-QUERY lookups (one source/target pair), sequential in the
reference too. The driver runs the heap; adjacency comes from a backend
chosen by graph kind:

  - arrays kind (small by contract): a driver-local CSR.
  - parquet kind: ``_ShardedAdj`` — one zero-CPU lookup actor per
    partition holds that partition's out-edge CSR (vid % P ownership,
    the same layout the superstep engine uses) and serves batched
    adjacency slices. The driver holds only O(V) dist/pred arrays plus
    an adjacency cache of the vertices the search actually touched —
    never the O(E) edge set. Lookups are amortized by prefetching the
    current heap contents (the next settles) in one RPC, and Yen's
    repeated spur searches re-hit the warm cache.

The distributed all-targets form is
``traversal.shortest_path_predecessors``.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray

from ..stages.superstep import PartitionedGraph

_PREFETCH = 256  # heap entries pulled per adjacency RPC


class _LocalAdj:
    """Driver-local CSR accessor (arrays-kind graphs)."""

    def __init__(self, indptr, indices, weights):
        self.indptr, self.indices, self.weights = indptr, indices, weights

    def get(self, v: int):
        lo, hi = self.indptr[v], self.indptr[v + 1]
        return self.indices[lo:hi], self.weights[lo:hi]

    def prefetch(self, vids) -> None:
        pass

    def close(self) -> None:
        pass


@ray.remote(num_cpus=0)
class _AdjShard:
    """One partition's out-edge CSR, loaded once, serving batched
    adjacency lookups. num_cpus=0: a lookup service, not a compute
    pool — full-CPU actors would hold reservations and starve
    concurrent Dataset stages (see CLAUDE.md invariants)."""

    def __init__(self, files: list[str], weighted: bool):
        import pyarrow.parquet as pq
        cols = ["src", "dst"] + (["weight"] if weighted else [])
        srcs, dsts, ws = [], [], []
        for f in files:
            t = pq.read_table(f, columns=cols)
            srcs.append(t["src"].to_numpy(zero_copy_only=False))
            dsts.append(t["dst"].to_numpy(zero_copy_only=False))
            ws.append(t["weight"].to_numpy(zero_copy_only=False)
                      if weighted else np.ones(len(srcs[-1])))
        if srcs:
            src = np.concatenate(srcs)
            order = np.lexsort((np.concatenate(dsts), src))
            self.src = src[order]
            self.dst = np.concatenate(dsts)[order]
            self.w = np.concatenate(ws)[order].astype(np.float64)
        else:
            self.src = np.empty(0, np.int64)
            self.dst = np.empty(0, np.int64)
            self.w = np.empty(0, np.float64)

    def adj(self, vids: np.ndarray):
        """(offsets[len+1], nbrs, weights) — concatenated dst-sorted
        adjacency slices for the requested vertices."""
        lo = np.searchsorted(self.src, vids, side="left")
        hi = np.searchsorted(self.src, vids, side="right")
        offsets = np.zeros(len(vids) + 1, dtype=np.int64)
        offsets[1:] = np.cumsum(hi - lo)
        if offsets[-1] == 0:
            return offsets, np.empty(0, np.int64), np.empty(0, np.float64)
        idx = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)])
        return offsets, self.dst[idx], self.w[idx]


class _ShardedAdj:
    """Actor-shard-backed adjacency with a driver-side cache. Spur
    tasks rebuild a borrowing accessor from the same actor handles
    (``from_actors``) — shards are loaded once, searched from many
    processes."""

    def __init__(self, graph: PartitionedGraph | None, actors=None,
                 P: int | None = None):
        if graph is None:
            self.P = P
            self.actors = list(actors)
            self.owns_actors = False
        else:
            import re
            self.P = graph.num_parts_layout
            by_part: dict[int, list[str]] = {p: [] for p in range(self.P)}
            for f in graph.flow_files("out"):
                m = re.search(r"part=(\d+)", f)
                by_part[int(m.group(1))].append(f)
            self.actors = [
                _AdjShard.remote(by_part[p], graph.weighted)
                for p in range(self.P)]
            self.owns_actors = True
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    @classmethod
    def from_actors(cls, actors, P: int) -> "_ShardedAdj":
        return cls(None, actors=actors, P=P)

    def prefetch(self, vids) -> None:
        need: dict[int, list[int]] = {}
        for v in vids:
            v = int(v)
            if v not in self.cache:
                need.setdefault(v % self.P, []).append(v)
        if not need:
            return
        futs = {p: self.actors[p].adj.remote(
                    np.asarray(vs, dtype=np.int64))
                for p, vs in need.items()}
        for p, fut in futs.items():
            offsets, nbrs, w = ray.get(fut)
            for i, v in enumerate(need[p]):
                a, b = offsets[i], offsets[i + 1]
                self.cache[v] = (nbrs[a:b], w[a:b])

    def get(self, v: int):
        if v not in self.cache:
            self.prefetch([v])
        return self.cache[v]

    def close(self) -> None:
        if self.owns_actors:
            for a in self.actors:
                ray.kill(a)
        self.actors = []


def _local_csr(graph: PartitionedGraph) -> _LocalAdj:
    src, dst = graph.src, graph.dst
    w = (graph.weight if graph.weight is not None
         else np.ones(len(src)))
    order = np.lexsort((dst, src))
    s, d, ww = src[order], dst[order], w[order].astype(np.float64)
    indptr = np.searchsorted(s, np.arange(graph.n + 1))
    return _LocalAdj(indptr, d, ww)


def _adjacency(graph: PartitionedGraph):
    """Backend by graph kind: driver CSR for (small) arrays graphs,
    shard actors for parquet graphs."""
    if graph.kind == "arrays":
        return _local_csr(graph)
    return _ShardedAdj(graph)


def _dijkstra(adj, n: int, source: int, target: int,
              heuristic: np.ndarray | None = None,
              banned_edges: set | None = None,
              banned_nodes: np.ndarray | None = None):
    """Binary-heap Dijkstra / A* over an adjacency accessor; returns
    (cost, path) or (inf, []). Deterministic tie-break: smaller vid pops
    first. The per-settle relaxation is vectorized over the vertex's
    whole adjacency slice — only improved entries touch the Python
    heap. Sharded backends are fed by prefetching the heap's pending
    entries (the upcoming settles) in one batched RPC."""
    dist = np.full(n, np.inf)
    pred = np.full(n, -1, dtype=np.int64)
    dist[source] = 0.0
    h0 = 0.0 if heuristic is None else heuristic[source]
    heap = [(h0, source)]
    done = np.zeros(n, dtype=bool)
    banned_by_src: dict[int, np.ndarray] = {}
    if banned_edges:
        for (a, b) in banned_edges:
            banned_by_src.setdefault(a, []).append(b)
        banned_by_src = {a: np.asarray(bs, dtype=np.int64)
                         for a, bs in banned_by_src.items()}
    adj.prefetch([source])
    while heap:
        _, v = heapq.heappop(heap)
        if done[v]:
            continue
        if v == target:
            break
        done[v] = True
        if isinstance(adj, _ShardedAdj) and v not in adj.cache:
            hints = {u for _, u in heap[:_PREFETCH] if not done[u]}
            hints.add(v)
            adj.prefetch(hints)
        nb, wslice = adj.get(v)
        nd = dist[v] + wslice
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
    adj = _adjacency(graph)
    try:
        return _dijkstra(adj, graph.n, source, target)
    finally:
        adj.close()


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
    adj = _adjacency(graph)
    try:
        return _dijkstra(adj, graph.n, source, target,
                         heuristic=heuristic)
    finally:
        adj.close()


def yens_k_shortest(graph: PartitionedGraph, source: int, target: int,
                    k: int = 3) -> pd.DataFrame:
    """(rank, total_cost, path) — Yen's K loopless shortest paths
    (Yens.java): spur-node deviations with the root's edges blocked and
    root-path nodes banned, candidates kept in a min-heap. All spur
    searches share one adjacency backend (and, sharded, its warm
    driver cache)."""
    adj = _adjacency(graph)
    try:
        return _yens(adj, graph.n, source, target, k)
    finally:
        adj.close()


def _adj_descriptor(adj) -> tuple:
    """Picklable accessor descriptor for spur tasks: sharded adjacency
    ships the actor HANDLES (shards load once, searched from many
    processes); local CSR ships one plasma ref of the three arrays."""
    if isinstance(adj, _ShardedAdj):
        return ("sharded", adj.actors, adj.P)
    return ("local", ray.put((adj.indptr, adj.indices, adj.weights)))


def _adj_from_descriptor(desc):
    if desc[0] == "sharded":
        return _ShardedAdj.from_actors(desc[1], desc[2])
    return _LocalAdj(*ray.get(desc[1]))


@ray.remote
def _spur_task(desc, n: int, spur: int, target: int,
               banned_edges: list, banned_node_ids: list):
    """One Yen's spur search in a worker: rebuild the adjacency
    accessor from the descriptor and run the banned Dijkstra."""
    adj = _adj_from_descriptor(desc)
    banned_nodes = None
    if banned_node_ids:
        banned_nodes = np.zeros(n, dtype=bool)
        banned_nodes[np.asarray(banned_node_ids, dtype=np.int64)] = True
    return _dijkstra(adj, n, spur, target,
                     banned_edges=set(map(tuple, banned_edges)) or None,
                     banned_nodes=banned_nodes)


def _yens(adj, n: int, source: int, target: int, k: int) -> pd.DataFrame:
    """Spur searches within one Yen's iteration are independent, so
    they run as PARALLEL Ray tasks against the shared adjacency backend
    (actor shards for parquet graphs; a plasma CSR for arrays graphs).
    Results are folded in spur order and candidates keep the (cost,
    path-lexicographic) heap order, so the output is bit-identical to
    the sequential loop."""
    cost0, p0 = _dijkstra(adj, n, source, target)
    if not p0:
        return pd.DataFrame({"rank": [], "total_cost": [], "path": []})

    def edge_cost(u, v):
        nb, w = adj.get(u)
        hits = np.flatnonzero(nb == v)
        return float(w[hits].min()) if len(hits) else np.inf

    desc = _adj_descriptor(adj)
    paths = [(cost0, p0)]
    candidates: list[tuple[float, list[int]]] = []
    seen = {tuple(p0)}
    while len(paths) < k:
        prev_cost, prev_path = paths[-1]
        jobs = []
        for i in range(len(prev_path) - 1):
            spur = prev_path[i]
            root = prev_path[: i + 1]
            banned_edges = set()
            for pc, pp in paths:
                if len(pp) > i and pp[: i + 1] == root:
                    banned_edges.add((pp[i], pp[i + 1]))
            fut = _spur_task.remote(desc, n, spur, target,
                                    sorted(banned_edges), root[:-1])
            jobs.append((i, root, fut))
        for i, root, fut in jobs:
            spur_cost, spur_path = ray.get(fut)
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
