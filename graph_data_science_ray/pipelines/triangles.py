"""Triangle counting + local clustering coefficient as Ray Data stages.

The reference counts triangles by sorted-adjacency intersection per node
over a shared-memory CSR (algo/src/main/java/org/neo4j/gds/triangle/
IntersectingTriangleCount.java:85-170, GraphIntersect.java:63-134), with:
  - UNDIRECTED simple-graph semantics (parallel edges dedup'd)
  - each triangle (A<B<C) found once, +1 to each corner and the global count
  - ``maxDegree``: nodes with degree above it are excluded and marked -1
    (IntersectingTriangleCount.java:57,154-157)

Distributed formulation (no shared memory): the classic degree-ordered
wedge join —
  1. canonicalize + dedup the undirected edge set (groupby shuffle)
  2. total-order vertices by (degree, vid); orient every edge from the
     lower- to the higher-ranked endpoint → out-degree ≤ O(√E) per node
  3. bucket oriented edges by source; per bucket, generate wedges
     (b, c) from each source's oriented neighbor pairs (vectorized pair
     expansion) and probe them against the oriented edge set
  4. per-node counts = groupby-sum over the three corners of each match

Scale notes: the degree/rank arrays and the probe key set are dense
int64 arrays broadcast via ``ray.put`` (fine to ~10⁸ vertices / ~10⁹
edges per node of worker RAM); beyond that the probe becomes a
partitioned sort-merge join on (b, c) buckets — same shape, one more
shuffle. Wedge volume is bounded by Σ d_oriented² ≤ O(E^1.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.superstep import PartitionedGraph


def _edge_dataset(graph: PartitionedGraph) -> rd.Dataset:
    return graph.edges_dataset(("src", "dst"), flow="out")


def _pairs_within_groups(group_end: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All index pairs (i < j) within consecutive groups.

    group_end[k] = exclusive end offset of the group containing element k.
    Fully vectorized (no per-group Python loop)."""
    m = len(group_end)
    cnt = group_end - np.arange(m) - 1
    total = int(cnt.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    left = np.repeat(np.arange(m, dtype=np.int64), cnt)
    run_start = np.cumsum(cnt) - cnt
    k = np.arange(total, dtype=np.int64) - np.repeat(run_start, cnt)
    right = left + 1 + k
    return left, right


def _wedge_kernel(group: pd.DataFrame, rank_ref, keys_ref, n: int) -> pd.DataFrame:
    """Per-bucket wedge generation + probe against the oriented edge set.

    rank/keys are ``ray.put`` broadcasts — fetched zero-copy from the
    local object store once per group."""
    rank = ray.get(rank_ref)
    keys = ray.get(keys_ref)  # sorted int64 a*n+b keys of oriented edges
    a = group["a"].to_numpy()
    b = group["b"].to_numpy()
    rb = rank[b]
    order = np.lexsort((rb, a))
    a, b = a[order], b[order]
    # group end offsets per element (groups are runs of equal a)
    change = np.flatnonzero(np.r_[a[1:] != a[:-1], True]) + 1
    group_end = np.repeat(change, np.diff(np.r_[0, change]))
    li, ri = _pairs_within_groups(group_end)
    if len(li) == 0:
        return pd.DataFrame({"vid": np.empty(0, np.int64),
                             "cnt": np.empty(0, np.int64)})
    wb, wc = b[li], b[ri]       # rank[wb] < rank[wc] by construction
    probe = wb * n + wc
    pos = np.searchsorted(keys, probe)
    pos = np.minimum(pos, len(keys) - 1)
    hit = keys[pos] == probe
    ta, tb, tc = a[li][hit], wb[hit], wc[hit]
    corners = np.concatenate([ta, tb, tc])
    vids, cnts = np.unique(corners, return_counts=True)
    out = pd.DataFrame({"vid": vids, "cnt": cnts})
    # one sentinel row carries this bucket's triangle total
    out = pd.concat([out, pd.DataFrame({"vid": [-1], "cnt": [len(ta)]})],
                    ignore_index=True)
    return out


def triangle_count(
    graph: PartitionedGraph,
    max_degree: int | None = None,
    num_buckets: int | None = None,
) -> tuple[np.ndarray, int]:
    """Exact per-node triangle counts + global count.

    Returns (per_node int64 array over dense vids, global_triangles);
    excluded nodes (degree > max_degree) get -1.
    """
    n = graph.n
    edges = _edge_dataset(graph)

    def canonical(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = t["src"]
        d = t["dst"]
        u = pc.min_element_wise(s, d)
        v = pc.max_element_wise(s, d)
        keep = pc.not_equal(u, v)
        return pa.table({"u": pc.filter(u, keep), "v": pc.filter(v, keep)})

    from ..stages.shuffle import distinct_rows
    distinct = distinct_rows(
        edges.map_batches(canonical, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["u", "v"])

    # degree of the simple undirected graph (streamed partial bincounts)
    deg = np.zeros(n, dtype=np.int64)
    u_np_parts, v_np_parts = [], []
    for batch in distinct.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        bu = batch["u"].to_numpy(zero_copy_only=False)
        bv = batch["v"].to_numpy(zero_copy_only=False)
        deg += np.bincount(bu, minlength=n)
        deg += np.bincount(bv, minlength=n)
        u_np_parts.append(bu)
        v_np_parts.append(bv)
    u_all = np.concatenate(u_np_parts) if u_np_parts else np.empty(0, np.int64)
    v_all = np.concatenate(v_np_parts) if v_np_parts else np.empty(0, np.int64)

    excluded = np.zeros(n, dtype=bool)
    if max_degree is not None:
        excluded = deg > max_degree
        keep = ~excluded[u_all] & ~excluded[v_all]
        u_all, v_all = u_all[keep], v_all[keep]

    # total order by (degree, vid); orient low rank -> high rank
    rank = np.empty(n, dtype=np.int64)
    rank[np.lexsort((np.arange(n), deg))] = np.arange(n)
    swap = rank[u_all] > rank[v_all]
    a = np.where(swap, v_all, u_all)
    b = np.where(swap, u_all, v_all)
    keys = np.sort(a * n + b)

    if len(a) == 0:
        per_node = np.zeros(n, dtype=np.int64)
        per_node[excluded] = -1
        return per_node, 0

    cpus = int(ray.cluster_resources().get("CPU", 4))
    nb = num_buckets or max(4, cpus)
    rank_ref = ray.put(rank)
    keys_ref = ray.put(keys)

    oriented = rd.from_arrow(pa.table({
        "a": a, "b": b, "bucket": (a % nb).astype(np.int64)}))
    counts = (
        oriented.groupby("bucket")
        .map_groups(_wedge_kernel, batch_format="pandas",
                    fn_args=(rank_ref, keys_ref, n))
        .groupby("vid").sum("cnt")
    )
    per_node = np.zeros(n, dtype=np.int64)
    global_count = 0
    for batch in counts.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        vids = batch["vid"].to_numpy(zero_copy_only=False)
        cnts = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        sentinel = vids == -1
        global_count += int(cnts[sentinel].sum())
        per_node[vids[~sentinel]] = cnts[~sentinel]
    per_node[excluded] = -1
    return per_node, global_count


def local_clustering_coefficient(
    graph: PartitionedGraph,
    max_degree: int | None = None,
    triangles: np.ndarray | None = None,
) -> np.ndarray:
    """C(v) = 2*T(v) / (deg(v)·(deg(v)−1)) over the simple undirected graph;
    excluded (-1) and degree<2 nodes → 0. ``triangles`` may reuse a
    precomputed triangle-count property (reference seedProperty path,
    LocalClusteringCoefficient.java:69-127)."""
    if triangles is None:
        triangles, _ = triangle_count(graph, max_degree=max_degree)
    # recompute the simple-graph degree
    edges = _edge_dataset(graph)
    n = graph.n
    deg = np.zeros(n, dtype=np.int64)
    parts = []
    for batch in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        parts.append((np.minimum(s, d), np.maximum(s, d)))
    if parts:
        u = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts])
        keep = u != v
        uniq = np.unique(np.stack([u[keep], v[keep]], axis=1), axis=0)
        deg += np.bincount(uniq[:, 0], minlength=n)
        deg += np.bincount(uniq[:, 1], minlength=n)
    d = deg.astype(np.float64)
    denom = d * (d - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = 2.0 * triangles / denom
    return np.where((triangles < 0) | (denom <= 0), 0.0, c)
