"""Triangle counting + local clustering coefficient as Ray Data stages.

The reference counts triangles by sorted-adjacency intersection per node
over a shared-memory CSR (algo/src/main/java/org/neo4j/gds/triangle/
IntersectingTriangleCount.java:85-170, GraphIntersect.java:63-134), with:
  - UNDIRECTED simple-graph semantics (parallel edges dedup'd)
  - each triangle (A<B<C) found once, +1 to each corner and the global count
  - ``maxDegree``: nodes with degree above it are excluded and marked -1
    (IntersectingTriangleCount.java:57,154-157)

Distributed formulation (no shared memory, no driver edge arrays): the
classic degree-ordered wedge join as TWO hash shuffles —
  1. canonicalize + dedup the undirected edge set (bucketed distinct)
  2. total-order vertices by (degree, vid); orient every edge from the
     lower- to the higher-ranked endpoint → out-degree ≤ O(√E) per node
  3. shuffle A: bucket oriented edges by source; per bucket, generate
     wedges (a, b, c) from each source's oriented neighbor pairs
     (vectorized pair expansion)
  4. shuffle B: partitioned probe join — wedges keyed by (b, c) and
     oriented edges keyed by (a, b) are hash-bucketed into the SAME
     bucket space and joined per bucket with a sorted-key searchsorted
     kernel; a wedge that finds its closing edge is a triangle
  5. per-node counts stream back as compact (vid, cnt) partials

Driver state is O(V) only (degree/rank arrays — the same budget the
superstep engine's label arrays use); the edge set itself never leaves
the object store. Wedge volume is bounded by Σ d_oriented² ≤ O(E^1.5)
and is spread across the bucket shuffle, so skewed hubs cost one bucket,
not the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.superstep import PartitionedGraph

_HASH_MIX = 1000003


def _edge_dataset(graph: PartitionedGraph) -> rd.Dataset:
    return graph.edges_dataset(("src", "dst"), flow="out")


def _canonical(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    s = t["src"]
    d = t["dst"]
    u = pc.min_element_wise(s, d)
    v = pc.max_element_wise(s, d)
    keep = pc.not_equal(u, v)
    return pa.table({"u": pc.filter(u, keep), "v": pc.filter(v, keep)})


def _distinct_edges(graph: PartitionedGraph) -> rd.Dataset:
    from ..stages.shuffle import distinct_rows
    return distinct_rows(
        _edge_dataset(graph).map_batches(
            _canonical, batch_format="pyarrow", zero_copy_batch=True),
        ["u", "v"])


def _simple_degree(distinct: rd.Dataset, n: int) -> np.ndarray:
    """Degree over the distinct (u < v) edge set — the driver receives
    only compact per-batch (vid, cnt) partials, never the edges."""
    deg = np.zeros(n, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        vids, cnts = np.unique(np.concatenate([u, v]), return_counts=True)
        return pa.table({"vid": vids, "cnt": cnts})

    compact = distinct.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
    for batch in compact.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
        # np.add.at: iter_batches may coalesce partials from different
        # map tasks, so a vid can repeat within one driver batch
        np.add.at(deg, batch["vid"].to_numpy(zero_copy_only=False),
                  batch["cnt"].to_numpy(zero_copy_only=False))
    return deg


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


def _wedge_kernel(group: pd.DataFrame, rank_ref, nb: int) -> pd.DataFrame:
    """Per-source-bucket wedge generation: every oriented neighbor pair
    (b, c) of a source a (rank[b] < rank[c]) is a wedge to be closed by
    the oriented edge (b, c). Output is keyed for the probe shuffle."""
    rank = ray.get(rank_ref)
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
        e = np.empty(0, np.int64)
        return pd.DataFrame({"x": e, "y": e, "z": e, "bucket": e,
                             "kind": e})
    wb, wc = b[li], b[ri]       # rank[wb] < rank[wc] by construction
    return pd.DataFrame({
        "x": a[li], "y": wb, "z": wc,
        "bucket": (wb * _HASH_MIX + wc) % nb,
        "kind": np.zeros(len(li), np.int64),
    })


def _probe_kernel(group: pd.DataFrame, n: int) -> pd.DataFrame:
    """Per-bucket sort-merge probe: wedges (kind 0) against oriented
    edges (kind 1) sharing the same (y, z) hash bucket."""
    kind = group["kind"].to_numpy()
    y = group["y"].to_numpy()
    z = group["z"].to_numpy()
    is_edge = kind == 1
    keys = np.sort(y[is_edge] * n + z[is_edge])
    wy, wz = y[~is_edge], z[~is_edge]
    wx = group["x"].to_numpy()[~is_edge]
    if len(keys) == 0 or len(wy) == 0:
        return pd.DataFrame({"vid": np.array([-1], np.int64),
                             "cnt": np.array([0], np.int64)})
    probe = wy * n + wz
    pos = np.searchsorted(keys, probe)
    pos = np.minimum(pos, len(keys) - 1)
    hit = keys[pos] == probe
    ta, tb, tc = wx[hit], wy[hit], wz[hit]
    corners = np.concatenate([ta, tb, tc])
    vids, cnts = np.unique(corners, return_counts=True)
    out = pd.DataFrame({"vid": vids, "cnt": cnts})
    # one sentinel row carries this bucket's triangle total
    return pd.concat(
        [out, pd.DataFrame({"vid": [-1], "cnt": [len(ta)]})],
        ignore_index=True)


def _wedge_probe_union(
    graph: PartitionedGraph,
    max_degree: int | None,
    num_buckets: int | None,
) -> tuple[rd.Dataset, int, np.ndarray, np.ndarray]:
    """Shared plumbing for counting AND listing: distinct undirected
    edges → degree-ordered orientation → wedge + probe rows keyed into
    the same bucket space. Returns (union_ds, n, excluded, deg)."""
    n = graph.n
    distinct = _distinct_edges(graph).materialize()
    deg = _simple_degree(distinct, n)

    excluded = np.zeros(n, dtype=bool)
    if max_degree is not None:
        excluded = deg > max_degree

    # total order by (degree, vid); orient low rank -> high rank
    rank = np.empty(n, dtype=np.int64)
    rank[np.lexsort((np.arange(n), deg))] = np.arange(n)

    cpus = int(ray.cluster_resources().get("CPU", 4))
    nb = num_buckets or max(4, cpus)
    rank_ref = ray.put(rank)
    excl_ref = ray.put(excluded)

    def orient(t: pa.Table) -> pa.Table:
        rk = ray.get(rank_ref)
        ex = ray.get(excl_ref)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        keep = ~ex[u] & ~ex[v]
        u, v = u[keep], v[keep]
        swap = rk[u] > rk[v]
        a = np.where(swap, v, u)
        b = np.where(swap, u, v)
        return pa.table({"a": a, "b": b, "g": a % nb})

    oriented = distinct.map_batches(orient, batch_format="pyarrow",
                                    zero_copy_batch=True)

    wedges = (oriented.groupby("g")
              .map_groups(_wedge_kernel, batch_format="pandas",
                          fn_args=(rank_ref, nb)))

    def as_probe_side(df: pd.DataFrame) -> pd.DataFrame:
        # pandas output so the union with the map_groups wedge blocks is
        # homogeneous (mixed Arrow/pandas blocks break sort sampling)
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        return pd.DataFrame({
            "x": np.full(len(a), -1, np.int64), "y": a, "z": b,
            "bucket": (a * _HASH_MIX + b) % nb,
            "kind": np.ones(len(a), np.int64),
        })

    probes = oriented.map_batches(as_probe_side, batch_format="pandas")
    return wedges.union(probes), n, excluded, deg


def _stream_kernel(group: pd.DataFrame, n: int) -> pd.DataFrame:
    """Per-bucket probe emitting the TRIANGLES themselves, vid-sorted
    (node_a < node_b < node_c) — ≙ the reference's TriangleStream
    (alpha/.../impl/triangle/TriangleStream.java)."""
    kind = group["kind"].to_numpy()
    y = group["y"].to_numpy()
    z = group["z"].to_numpy()
    is_edge = kind == 1
    keys = np.sort(y[is_edge] * n + z[is_edge])
    wy, wz = y[~is_edge], z[~is_edge]
    wx = group["x"].to_numpy()[~is_edge]
    e = np.empty(0, np.int64)
    if len(keys) == 0 or len(wy) == 0:
        return pd.DataFrame({"node_a": e, "node_b": e, "node_c": e})
    probe = wy * n + wz
    pos = np.minimum(np.searchsorted(keys, probe), len(keys) - 1)
    hit = keys[pos] == probe
    tri = np.sort(np.stack([wx[hit], wy[hit], wz[hit]], axis=1), axis=1)
    return pd.DataFrame({"node_a": tri[:, 0], "node_b": tri[:, 1],
                         "node_c": tri[:, 2]})


def triangle_stream(
    graph: PartitionedGraph,
    max_degree: int | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-triangle rowset (node_a < node_b < node_c by vid), each
    triangle exactly once — the same wedge-probe machinery as the
    counts, with the probe kernel emitting hits instead of folding
    them; the triangle set streams as a Dataset (never
    driver-resident)."""
    union, n, _excluded, _deg = _wedge_probe_union(graph, max_degree,
                                                   num_buckets)
    return (union.groupby("bucket")
            .map_groups(_stream_kernel, batch_format="pandas",
                        fn_args=(n,)))


def _triangle_stats(
    graph: PartitionedGraph,
    max_degree: int | None = None,
    num_buckets: int | None = None,
) -> tuple[np.ndarray, int, np.ndarray]:
    """(per_node triangles, global count, simple-graph degree)."""
    union, n, excluded, deg = _wedge_probe_union(graph, max_degree,
                                                 num_buckets)
    counts = (union.groupby("bucket")
              .map_groups(_probe_kernel, batch_format="pandas", fn_args=(n,)))

    per_node = np.zeros(n, dtype=np.int64)
    global_count = 0
    for batch in counts.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"):
        vids = batch["vid"].to_numpy(zero_copy_only=False)
        cnts = batch["cnt"].to_numpy(zero_copy_only=False)
        sentinel = vids == -1
        global_count += int(cnts[sentinel].sum())
        np.add.at(per_node, vids[~sentinel], cnts[~sentinel])
    per_node[excluded] = -1
    return per_node, global_count, deg


def triangle_count(
    graph: PartitionedGraph,
    max_degree: int | None = None,
    num_buckets: int | None = None,
) -> tuple[np.ndarray, int]:
    """Exact per-node triangle counts + global count.

    Returns (per_node int64 array over dense vids, global_triangles);
    excluded nodes (degree > max_degree) get -1.
    """
    per_node, global_count, _deg = _triangle_stats(
        graph, max_degree=max_degree, num_buckets=num_buckets)
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
        triangles, _, deg = _triangle_stats(graph, max_degree=max_degree)
    else:
        # degree streamed as compact partials — no driver edge pass
        deg = _simple_degree(_distinct_edges(graph), graph.n)
    d = deg.astype(np.float64)
    denom = d * (d - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = 2.0 * triangles / denom
    return np.where((triangles < 0) | (denom <= 0), 0.0, c)
