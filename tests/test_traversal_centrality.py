"""BFS / SSSP / MS-BFS closeness+harmonic / ArticleRank / Eigenvector vs
NumPy oracles."""

import collections
import heapq

import numpy as np
import pytest

from graph_data_science_ray import oracle as orc
from graph_data_science_ray.stages.superstep import PartitionedGraph
from graph_data_science_ray.pipelines.centrality import article_rank, eigenvector
from graph_data_science_ray.pipelines.traversal import (
    bfs,
    closeness_harmonic,
    sssp,
)

from conftest import random_graph


def bfs_oracle(n, src, dst, s):
    adj = collections.defaultdict(list)
    for a, b in zip(src, dst):
        adj[a].append(b)
    dist = np.full(n, -1, np.int64)
    dist[s] = 0
    frontier = [s]
    while frontier:
        nxt = []
        for v in frontier:
            for t in adj[v]:
                if dist[t] < 0:
                    dist[t] = dist[v] + 1
                    nxt.append(t)
        frontier = nxt
    return dist


def dijkstra_oracle(n, src, dst, w, s):
    adj = collections.defaultdict(list)
    for a, b, ww in zip(src, dst, w):
        adj[a].append((b, ww))
    dist = np.full(n, np.inf)
    dist[s] = 0.0
    h = [(0.0, s)]
    while h:
        d, v = heapq.heappop(h)
        if d > dist[v]:
            continue
        for t, ww in adj[v]:
            nd = d + ww
            if nd < dist[t]:
                dist[t] = nd
                heapq.heappush(h, (nd, t))
    return dist


@pytest.mark.parametrize("num_parts", [1, 4])
def test_bfs_vs_oracle(ray_session, num_parts):
    src, dst, _ = random_graph(300, 1500, seed=3)
    g = PartitionedGraph.from_arrays(300, src, dst)
    res = bfs(g, source_vid=0, num_parts=num_parts)
    assert np.array_equal(res.to_pandas()["dist"].to_numpy(),
                          bfs_oracle(300, src, dst, 0))


def test_bfs_max_depth(ray_session):
    src, dst, _ = random_graph(200, 800, seed=4)
    g = PartitionedGraph.from_arrays(200, src, dst)
    full = bfs_oracle(200, src, dst, 0)
    res = bfs(g, source_vid=0, max_depth=2, num_parts=2)
    got = res.to_pandas()["dist"].to_numpy()
    expected = np.where((full >= 0) & (full <= 2), full, -1)
    assert np.array_equal(got, expected)


@pytest.mark.parametrize("num_parts", [1, 4])
def test_sssp_vs_dijkstra(ray_session, num_parts):
    src, dst, w = random_graph(300, 1500, seed=3, weighted=True)
    g = PartitionedGraph.from_arrays(300, src, dst, w)
    res = sssp(g, source_vid=0, num_parts=num_parts)
    assert np.allclose(res.to_pandas()["dist"].to_numpy(),
                       dijkstra_oracle(300, src, dst, w, 0), atol=1e-12)


@pytest.mark.parametrize("num_parts", [1, 4])
def test_delta_stepping_vs_dijkstra(ray_session, num_parts):
    src, dst, w = random_graph(300, 1500, seed=3, weighted=True)
    g = PartitionedGraph.from_arrays(300, src, dst, w)
    res = sssp(g, source_vid=0, num_parts=num_parts, delta=float(w.mean()))
    assert np.allclose(res.to_pandas()["dist"].to_numpy(),
                       dijkstra_oracle(300, src, dst, w, 0), atol=1e-12)


def test_delta_stepping_fewer_relaxations(ray_session):
    # Heterogeneous weights make Bellman-Ford cascade: far vertices
    # scatter provisional distances that later improve and re-scatter.
    # Delta-stepping's bucket schedule holds them back until their
    # bucket is reached, so total edge relaxations drop.
    src, dst, w = random_graph(400, 4000, seed=11, weighted=True)
    w = w ** 3 * 10.0  # spread the weight scale
    g = PartitionedGraph.from_arrays(400, src, dst, w)
    bf = sssp(g, source_vid=0, num_parts=2)
    ds = sssp(g, source_vid=0, num_parts=2, delta=float(np.median(w)) * 4)
    assert np.allclose(bf.to_pandas()["dist"].to_numpy(),
                       ds.to_pandas()["dist"].to_numpy(), atol=1e-12)
    bf_sends = sum(m["sent_edges"] for m in bf.metrics)
    ds_sends = sum(m["sent_edges"] for m in ds.metrics)
    assert ds_sends < bf_sends, (ds_sends, bf_sends)


def test_closeness_harmonic_vs_brute(ray_session):
    src, dst, _ = random_graph(60, 250, seed=8)
    g = PartitionedGraph.from_arrays(60, src, dst)
    df = closeness_harmonic(g, num_parts=3)
    # undirected all-pairs BFS oracle
    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        adj[a].add(b)
        adj[b].add(a)
    us = np.array([a for a in adj for _ in adj[a]])
    vs = np.array([b for a in adj for b in adj[a]])
    n = 60
    far = np.zeros(n)
    rec = np.zeros(n)
    reach = np.zeros(n)
    for s in range(n):
        ds = bfs_oracle(n, us, vs, s)
        for v in range(n):
            if ds[v] > 0:
                far[v] += ds[v]
                rec[v] += 1.0 / ds[v]
                reach[v] += 1
    close_exp = np.where(far > 0, reach / far, 0)
    assert np.allclose(df["closeness"].to_numpy(), close_exp)
    assert np.allclose(df["harmonic"].to_numpy(), rec / (n - 1))


@pytest.mark.parametrize("num_parts", [1, 4])
def test_article_rank_vs_oracle(ray_session, num_parts):
    src, dst, _ = random_graph(200, 1200, seed=6)
    g = PartitionedGraph.from_arrays(200, src, dst)
    expected, _, _ = orc.article_rank(200, src, dst, max_iterations=20,
                                      tolerance=0.0)
    res = article_rank(g, max_iterations=20, tolerance=0.0,
                       num_parts=num_parts)
    assert np.allclose(res.to_pandas()["rank"].to_numpy(), expected, atol=1e-9)


def test_eigenvector_vs_power_iteration(ray_session):
    src, dst, _ = random_graph(100, 600, seed=5)
    g = PartitionedGraph.from_arrays(100, src, dst)
    res = eigenvector(g, max_iterations=30, tolerance=1e-10, num_parts=4)
    rank = np.full(100, 1 / 100.0)
    M = np.zeros((100, 100))
    for a, b in zip(src, dst):
        M[b, a] += 1.0
    for _ in range(res.ran_iterations + 1):
        nxt = rank + M @ rank
        rank = nxt / np.linalg.norm(nxt)
    assert res.converged
    assert np.allclose(res.to_pandas()["rank"].to_numpy(), rank, atol=1e-6)