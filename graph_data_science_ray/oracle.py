"""Single-process NumPy oracle implementing the reference semantics verbatim.

Used ONLY by tests to cross-check the distributed engine on fixtures and
seeded random graphs. Each function mirrors the reference implementation:

  - pagerank: delta-push Pregel formulation of
    algo/src/main/java/org/neo4j/gds/pagerank/PageRankComputation.java
    (init rank=alpha=1-d, initial superstep always sends rank/degree,
    later supersteps delta = d * sum(messages), send delta/degree iff
    delta > tolerance, vote-to-halt otherwise; reducing messenger treats
    a reduced value equal to the identity as "no message";
    convergence = no messages sent AND all voted halt,
    ranIterations = 0-based index of the converged iteration —
    pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:154-195).
  - wcc: union-find with union-by-min (component id = min member vid,
    core/.../paged/dss/HugeAtomicDisjointSetStruct.java:163-189), optional
    weight threshold (edges kept iff weight > threshold, Wcc.java:305-310).
  - label_propagation: asynchronous Gauss-Seidel sweep in node order,
    votes from out-neighbors weighted by relWeight * nodeWeight(neighbor),
    max weight wins, tie -> smaller label
    (algo/.../labelpropagation/ComputeStep.java, ComputeStepConsumer.java).
  - triangle_count: node-iterator sorted-adjacency intersection with
    A < B < C emission and maxDegree exclusion (-1 sentinel,
    algo/.../triangle/IntersectingTriangleCount.java:57,154-170).
"""

from __future__ import annotations

import numpy as np


def pagerank(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None = None,
    damping: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    source_nodes: list[int] | None = None,
) -> tuple[np.ndarray, int, bool]:
    """Returns (scores, ran_iterations, converged)."""
    alpha = 1.0 - damping
    if weight is not None:
        deg = np.bincount(src, weights=weight, minlength=n)
        # message along edge e = (delta / deg[src]) * weight[e]
        edge_w = weight.astype(np.float64)
    else:
        deg = np.bincount(src, minlength=n).astype(np.float64)
        edge_w = np.ones(len(src), dtype=np.float64)

    rank = np.full(n, alpha, dtype=np.float64)
    if source_nodes is not None:
        rank[:] = 0.0
        rank[np.asarray(source_nodes, dtype=np.int64)] = alpha

    halted = np.zeros(n, dtype=bool)
    recv = np.zeros(n, dtype=np.float64)  # reduced (Sum) messages; identity 0
    converged = False
    it = 0
    for it in range(max_iterations):
        has_msg = recv != 0.0
        initial = it == 0
        active = np.ones(n, dtype=bool) if initial else (has_msg | ~halted)
        if initial:
            delta = rank.copy()
        else:
            delta = np.where(active, damping * recv, 0.0)
            rank = np.where(active, rank + delta, rank)
        # vote bits cleared for every computed node, re-set on voteToHalt
        halted = halted & ~active
        send_mask = active & (initial | (delta > tolerance))
        halted |= active & ~send_mask  # voteToHalt
        senders = send_mask & (deg > 0)
        edge_sel = senders[src]
        msgs = (delta[src[edge_sel]] / deg[src[edge_sel]]) * edge_w[edge_sel]
        recv = np.bincount(dst[edge_sel], weights=msgs, minlength=n)
        if len(msgs) == 0 and halted.all():
            converged = True
            break
    return rank, it, converged


def article_rank(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    damping: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
) -> tuple[np.ndarray, int, bool]:
    """ArticleRank: PageRank delta-push with message =
    delta / (degree + averageDegree)
    (algo/.../pagerank/ArticleRankComputation.java:99)."""
    alpha = 1.0 - damping
    deg = np.bincount(src, minlength=n).astype(np.float64)
    avg_degree = len(src) / max(n, 1)
    rank = np.full(n, alpha, dtype=np.float64)
    halted = np.zeros(n, dtype=bool)
    recv = np.zeros(n, dtype=np.float64)
    converged = False
    it = 0
    for it in range(max_iterations):
        has_msg = recv != 0.0
        initial = it == 0
        active = np.ones(n, dtype=bool) if initial else (has_msg | ~halted)
        if initial:
            delta = rank.copy()
        else:
            delta = np.where(active, damping * recv, 0.0)
            rank = np.where(active, rank + delta, rank)
        halted = halted & ~active
        send_mask = active & (initial | (delta > tolerance))
        halted |= active & ~send_mask
        senders = send_mask & (deg > 0)
        edge_sel = senders[src]
        msgs = delta[src[edge_sel]] / (deg[src[edge_sel]] + avg_degree)
        recv = np.bincount(dst[edge_sel], weights=msgs, minlength=n)
        if len(msgs) == 0 and halted.all():
            converged = True
            break
    return rank, it, converged


def wcc(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None = None,
    threshold: float | None = None,
    seeds: np.ndarray | None = None,
) -> np.ndarray:
    """Union-by-min connected components (edges treated as undirected).

    Unseeded: component id = min member vid. Seeded: component label =
    min(seed-or-vid-derived initial label) per component — the engine's
    hash-min convention; reference seeding semantics are id-based and
    match the min convention on its fixtures.
    """
    if threshold is not None:
        if weight is None:
            raise ValueError("threshold requires weights")
        keep = weight > threshold
        src, dst = src[keep], dst[keep]
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src.tolist(), dst.tolist()):
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by min: smaller root wins
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    comp = np.array([find(i) for i in range(n)], dtype=np.int64)
    if seeds is not None:
        # label of a component = min initial label among members
        out = np.empty(n, dtype=np.int64)
        for c in np.unique(comp):
            members = comp == c
            out[members] = seeds[members].min()
        return out
    return comp


def label_propagation(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None = None,
    node_weight: np.ndarray | None = None,
    seeds: np.ndarray | None = None,
    max_iterations: int = 10,
) -> np.ndarray:
    """Asynchronous (Gauss-Seidel, ascending node order) label propagation."""
    if seeds is not None:
        max_seed = int(seeds.max()) if len(seeds) else 0
        labels = seeds.astype(np.int64).copy()
        # reference: nodes WITHOUT a seed get maxSeed + id + 1; seeded keep seed
    else:
        labels = np.arange(n, dtype=np.int64) + 1  # maxSeed(=0) + id + 1
    w = np.ones(len(src)) if weight is None else weight.astype(np.float64)
    nw = np.ones(n) if node_weight is None else node_weight.astype(np.float64)

    # out-adjacency
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted, w_sorted = src[order], dst[order], w[order]
    offsets = np.searchsorted(s_sorted, np.arange(n + 1))

    for _ in range(max_iterations):
        changed = False
        for v in range(n):
            lo, hi = offsets[v], offsets[v + 1]
            if lo == hi:
                continue
            votes: dict[int, float] = {}
            for t, rw in zip(d_sorted[lo:hi].tolist(), w_sorted[lo:hi].tolist()):
                lbl = int(labels[t])
                votes[lbl] = votes.get(lbl, 0.0) + rw * nw[t]
            best_label, best_w = int(labels[v]), float("-inf")
            for lbl in sorted(votes):  # ascending: ties resolve to smaller label
                if votes[lbl] > best_w:
                    best_w = votes[lbl]
                    best_label = lbl
            if best_label != labels[v]:
                labels[v] = best_label
                changed = True
        if not changed:
            break
    return labels


def triangle_count(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    max_degree: int | None = None,
) -> tuple[np.ndarray, int]:
    """Exact per-node triangle counts on the undirected simple graph.

    Input edges are symmetrized and dedup'd. Returns (per_node, global);
    nodes with degree > max_degree are excluded with count -1 and do not
    participate in any counted triangle.
    """
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    keep = u != v
    u, v = u[keep], v[keep]
    pairs = np.unique(np.stack([u, v], axis=1), axis=0)
    u, v = pairs[:, 0], pairs[:, 1]
    deg = np.bincount(u, minlength=n)
    excluded = np.zeros(n, dtype=bool)
    if max_degree is not None:
        excluded = deg > max_degree
        keep = ~excluded[u] & ~excluded[v]
        u, v = u[keep], v[keep]
    adj = {i: set() for i in range(n)}
    for a, b in zip(u.tolist(), v.tolist()):
        adj[a].add(b)
    counts = np.zeros(n, dtype=np.int64)
    total = 0
    for a in range(n):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    counts[a] += 1
                    counts[b] += 1
                    counts[c] += 1
                    total += 1
    counts[excluded] = -1
    return counts, total


def local_clustering_coefficient(
    triangles: np.ndarray, degrees: np.ndarray
) -> np.ndarray:
    """C(v) = 2*T(v) / (deg(v)*(deg(v)-1)); excluded (-1) and deg<2 -> 0.

    Mirrors algo/.../triangle/LocalClusteringCoefficient.java:118-127.
    """
    d = degrees.astype(np.float64)
    denom = d * (d - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = 2.0 * triangles / denom
    c = np.where((triangles < 0) | (denom <= 0), 0.0, c)
    return c
