"""Memory estimation — parity with the reference's estimate procs
(memory-usage module, MemoryEstimations; gated upfront in
executor/.../ProcedureExecutor.java:79 MemoryUsageValidator).

Estimates bytes for graph blocks + per-algorithm state from
(num_vertices, num_edges, num_parts), mirroring the reference's
per-node/per-rel cost model (BASELINE.md table):
PageRank ≈ 3 doubles/node (+vote bit), WCC = 1 long/node, LP = 1
long + 1 double/node, TC = 1 long/node. The engine adds the CSR block
arrays (~40 B/edge/flow incl. permutation) and message bundles
(≤ 8 B/vertex/partition in dense phases).

Used as the admission check before building an engine: compare against
ray.cluster_resources() like the reference compares against free heap.
"""

from __future__ import annotations

_EDGE_BYTES_PER_FLOW = 40   # gather_local + combined_key + tgt_global + perm + offsets
_BUNDLE_BYTES = 8           # dense message slot

_ALGO_STATE_BYTES = {
    "pagerank": 3 * 8 + 1,        # rank + delta + messenger slot + vote bit
    "articlerank": 3 * 8 + 1,
    "eigenvector": 4 * 8,
    "wcc": 2 * 8,                 # label + message slot
    "labelprop": 3 * 8,           # label + node weight + winner
    "triangles": 8,               # per-node counts
    "bfs": 2 * 8,
    "sssp": 2 * 8,
    "closeness": 4 * 8,           # visited + farness + recip + reached
    "hits": 3 * 8,
}

_FLOWS = {
    "pagerank": 1, "articlerank": 1, "eigenvector": 1, "bfs": 1, "sssp": 1,
    "hits": 2, "wcc": 2, "labelprop": 1, "closeness": 2, "triangles": 1,
}


def estimate_bytes(algorithm: str, num_vertices: int, num_edges: int,
                   num_parts: int | None = None) -> dict:
    """{'block_bytes', 'state_bytes', 'message_bytes', 'total_bytes'}."""
    algo = algorithm.lower()
    if algo not in _ALGO_STATE_BYTES:
        raise ValueError(f"no estimation model for '{algorithm}'")
    flows = _FLOWS[algo]
    block = num_edges * _EDGE_BYTES_PER_FLOW * flows
    state = num_vertices * _ALGO_STATE_BYTES[algo]
    # dense worst case: every partition holds a bundle covering V slots
    messages = num_vertices * _BUNDLE_BYTES * 2  # in-flight double buffering
    return {
        "block_bytes": block,
        "state_bytes": state,
        "message_bytes": messages,
        "total_bytes": block + state + messages,
    }


def check_fits(algorithm: str, num_vertices: int, num_edges: int,
               headroom: float = 0.5) -> tuple[bool, dict]:
    """Admission gate: estimated total vs the Ray cluster's memory
    (≙ MemoryUsageValidator). Returns (fits, estimate)."""
    import ray
    est = estimate_bytes(algorithm, num_vertices, num_edges)
    mem = ray.cluster_resources().get("memory", 0) + \
        ray.cluster_resources().get("object_store_memory", 0)
    return est["total_bytes"] <= headroom * mem, est