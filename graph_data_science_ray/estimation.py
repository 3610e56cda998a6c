"""Memory estimation — parity with the reference's estimate procs
(memory-usage module, MemoryEstimations; gated upfront in
executor/.../ProcedureExecutor.java:79 MemoryUsageValidator).

The reference builds a TREE of named components with min/max byte
ranges from (nodeCount, relationshipCount, concurrency, config) and
refuses to run when the estimate exceeds free heap. This module mirrors
that shape for the Ray engine: ``estimate(algorithm, V, E, P,
**config)`` returns a component tree whose formulas are read off the
ACTUAL allocations in stages/superstep.py and the per-algorithm
programs (CSR block arrays, per-vertex state columns, message
accumulators, packed bundles), with min = steady state and max = the
transient peak (load-time double-residency, dense bundle worst case).

Per-partition peaks matter more than totals on a cluster: the result
carries ``per_partition_bytes`` (the admission number to compare
against one worker's share of a node) next to ``total_bytes``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# measured from FlowBlock: gather_local + combined_key + perm (8 B each)
# + tgt_global (8) + vtx_offsets (amortized) ≈ 32-40 B per edge per flow
_EDGE_BYTES_PER_FLOW = (32, 40)
_WEIGHT_BYTES = 8          # optional per-edge weight column
_F64 = 8
_I64 = 8
_BOOL = 1


@dataclass
class Component:
    name: str
    min_bytes: int
    max_bytes: int
    children: list["Component"] = field(default_factory=list)

    def render(self, depth: int = 0) -> str:
        pad = "  " * depth
        lines = [f"{pad}{self.name}: "
                 f"[{_human(self.min_bytes)} ... {_human(self.max_bytes)}]"]
        for c in self.children:
            lines.append(c.render(depth + 1))
        return "\n".join(lines)


@dataclass
class MemoryEstimate:
    algorithm: str
    num_vertices: int
    num_edges: int
    num_parts: int
    tree: Component

    @property
    def min_bytes(self) -> int:
        return self.tree.min_bytes

    @property
    def max_bytes(self) -> int:
        return self.tree.max_bytes

    @property
    def per_partition_bytes(self) -> int:
        """Peak bytes resident on ONE partition worker (state and
        blocks split by ownership; every partition holds its own
        accumulator + incoming bundle slices)."""
        return -(-self.max_bytes // max(1, self.num_parts))

    def render(self) -> str:
        head = (f"{self.algorithm}: V={self.num_vertices} "
                f"E={self.num_edges} P={self.num_parts}\n")
        return head + self.tree.render()


def _human(b: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if b < 1024 or unit == "TiB":
            return f"{b:.0f} {unit}" if unit == "B" else f"{b:.1f} {unit}"
        b /= 1024
    return f"{b} B"


def _blocks(E: int, flows: int, weighted: bool) -> Component:
    per = _EDGE_BYTES_PER_FLOW
    w = _WEIGHT_BYTES if weighted else 0
    return Component("csr blocks",
                     E * (per[0] + w) * flows,
                     E * (per[1] + w) * flows)


def _state(V: int, bytes_per_vertex: float, name: str = "vertex state",
           transient_factor: float = 1.0) -> Component:
    base = int(V * bytes_per_vertex)
    return Component(name, base, int(base * transient_factor))


def _messages(V: int, P: int, width: int = _F64) -> Component:
    """Merge accumulator (V·width split over parts) + in-flight packed
    bundles: dense worst case one slot per (sender, dest vertex) pair
    collapses to ≤ 2·V·width after the sender-side partial reduce
    (double-buffered by the pipelined LAG)."""
    return Component("messages", 2 * V * width, 3 * V * width)


# per-algorithm: (flows, fn(V, E, P, config) -> [state components])
def _pagerank_state(V, E, P, c):
    return [_state(V, 2 * _F64 + _BOOL)]        # rank + delta + halted


def _wcc_state(V, E, P, c):
    return [_state(V, _I64 + _BOOL)]


def _labelprop_state(V, E, P, c):
    return [_state(V, 2 * _I64 + _F64)]


def _fastrp_state(V, E, P, c):
    d = int(c.get("dim", 64))
    return [_state(V, 2 * d * _F64, "embeddings (cur + emb)")]


def _betweenness_state(V, E, P, c):
    k = int(c.get("batch_size", 62))
    return [_state(V, 2 * k * _F64, f"dist+sigma lanes (k={k})"),
            _state(V, k * _F64, "delta lanes"),
            _state(V, _F64, "scores")]


def _msbfs_state(V, E, P, c):
    return [_state(V, 4 * _I64, "visited + farness + recip + reached")]


def _node2vec_state(V, E, P, c):
    d = int(c.get("dim", 64))
    return [_state(V, 2 * d * _F64, "in/out embeddings")]


def _graphsage_state(V, E, P, c):
    d = int(c.get("dim", 32))
    layers = int(c.get("layers", 2))
    s = int(c.get("sample_size", 10))
    return [_state(V, d * _F64 * (1 + layers), "layer activations"),
            Component("sampled neighborhoods",
                      V * s * _I64, V * s * layers * _I64)]


def _kmeans_state(V, E, P, c):
    d = int(c.get("dim", 2))
    return [_state(V, (_I64 + d * _F64), "assignment + coords")]


def _knn_state(V, E, P, c):
    k = int(c.get("k", 10))
    return [_state(V, k * (_I64 + _F64) * 2,
                   f"neighbor lists (k={k}, double-buffered)")]


def _minhash_state(V, E, P, c):
    perm = int(c.get("num_perm", 64))
    bands = int(c.get("bands", 16))
    return [Component("signatures", V * perm * _I64, V * perm * _I64),
            Component("band rows", V * bands * 3 * _I64,
                      V * bands * 3 * _I64)]


def _louvain_state(V, E, P, c):
    return [_state(V, 2 * _I64 + 2 * _F64,
                   "labels + volumes (level 0; contracted levels ≪)")]


def _hits_state(V, E, P, c):
    return [_state(V, 2 * _F64, "auth + hub")]


def _triangles_state(V, E, P, c):
    # wedge volume is the shuffle payload, not resident state: bounded
    # by sum of oriented deg² ≤ E^1.5 spread over buckets
    import math
    wedge = int(min(E ** 1.5, E * math.sqrt(max(E, 1))))
    return [_state(V, _I64, "per-node counts"),
            Component("wedge shuffle (streamed, per-bucket resident)",
                      3 * _I64 * wedge // max(1, P),
                      5 * _I64 * wedge // max(1, P))]


_MODELS: dict[str, tuple[int, object]] = {
    "pagerank": (1, _pagerank_state),
    "articlerank": (1, _pagerank_state),
    "eigenvector": (1, _pagerank_state),
    "wcc": (2, _wcc_state),
    "labelprop": (1, _labelprop_state),
    "label_propagation": (1, _labelprop_state),
    "fastrp": (1, _fastrp_state),
    "betweenness": (2, _betweenness_state),
    "closeness": (2, _msbfs_state),
    "msbfs": (2, _msbfs_state),
    "bfs": (1, _wcc_state),
    "sssp": (1, _wcc_state),
    "node2vec": (1, _node2vec_state),
    "graphsage": (1, _graphsage_state),
    "kmeans": (0, _kmeans_state),
    "knn": (0, _knn_state),
    "minhash_dedup": (0, _minhash_state),
    "louvain": (2, _louvain_state),
    "hits": (2, _hits_state),
    "triangles": (1, _triangles_state),
    "triangle_count": (1, _triangles_state),
}


def estimate(algorithm: str, num_vertices: int, num_edges: int,
             num_parts: int = 16, weighted: bool = False,
             **config) -> MemoryEstimate:
    """Component-tree estimate for one algorithm run (graph blocks +
    state + messages), ≙ the reference's `.estimate` procs."""
    algo = algorithm.lower()
    if algo not in _MODELS:
        raise ValueError(
            f"no estimation model for '{algorithm}'; "
            f"available: {sorted(_MODELS)}")
    flows, state_fn = _MODELS[algo]
    children = []
    if flows:
        children.append(_blocks(num_edges, flows, weighted))
    children.extend(state_fn(num_vertices, num_edges, num_parts, config))
    if flows:
        w = _F64
        if algo == "fastrp":
            w = _F64 * int(config.get("dim", 64))
        elif algo == "betweenness":
            w = _F64 * int(config.get("batch_size", 62))
        children.append(_messages(num_vertices, num_parts, w))
    tree = Component(algo, sum(c.min_bytes for c in children),
                     sum(c.max_bytes for c in children), children)
    return MemoryEstimate(algorithm=algo, num_vertices=num_vertices,
                          num_edges=num_edges, num_parts=num_parts,
                          tree=tree)


def estimate_bytes(algorithm: str, num_vertices: int, num_edges: int,
                   num_parts: int | None = None) -> dict:
    """Flat round-2 API (kept for callers/tests): block / state /
    message / total bytes from the component tree."""
    est = estimate(algorithm, num_vertices, num_edges,
                   num_parts or 16)
    block = state = messages = 0
    for c in est.tree.children:
        if c.name == "csr blocks":
            block += c.max_bytes
        elif c.name == "messages":
            messages += c.max_bytes
        else:
            state += c.max_bytes
    return {"block_bytes": block, "state_bytes": state,
            "message_bytes": messages,
            "total_bytes": block + state + messages}


def check_fits(algorithm: str, num_vertices: int, num_edges: int,
               headroom: float = 0.5, num_parts: int = 16,
               **config) -> tuple[bool, MemoryEstimate]:
    """Admission gate: estimated max vs the Ray cluster's memory
    (≙ MemoryUsageValidator). Returns (fits, estimate)."""
    import ray
    est = estimate(algorithm, num_vertices, num_edges, num_parts,
                   **config)
    mem = ray.cluster_resources().get("memory", 0) + \
        ray.cluster_resources().get("object_store_memory", 0)
    return est.max_bytes <= headroom * mem, est
