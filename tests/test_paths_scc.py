"""Dijkstra path tracking, DFS, SCC, and community metrics."""

import numpy as np
import pytest

from graph_data_science_ray.pipelines.community_metrics import (
    conductance, modularity_by_community)
from graph_data_science_ray.pipelines.scc import scc, scc_reference
from graph_data_science_ray.pipelines.traversal import (
    dfs, reconstruct_path, shortest_path_predecessors)
from graph_data_science_ray.stages.superstep import PartitionedGraph


@pytest.fixture(scope="module")
def weighted_digraph(ray_session):
    # 0→1(1), 0→2(4), 1→2(2), 2→3(1), 1→3(5), 4 isolated
    src = np.array([0, 0, 1, 2, 1], dtype=np.int64)
    dst = np.array([1, 2, 2, 3, 3], dtype=np.int64)
    w = np.array([1.0, 4.0, 2.0, 1.0, 5.0])
    return PartitionedGraph.from_arrays(5, src, dst, w)


def test_sssp_paths_and_reconstruction(weighted_digraph):
    out = shortest_path_predecessors(weighted_digraph, 0, num_parts=2)
    dist = out.set_index("vid")["dist"]
    pred = out.set_index("vid")["pred"]
    assert dist.loc[0] == 0 and pred.loc[0] == -1
    assert dist.loc[1] == 1 and pred.loc[1] == 0
    assert dist.loc[2] == 3 and pred.loc[2] == 1   # 0→1→2 beats 0→2
    assert dist.loc[3] == 4 and pred.loc[3] == 2
    assert not np.isfinite(dist.loc[4]) and pred.loc[4] == -1
    assert reconstruct_path(out, 3) == [0, 1, 2, 3]
    assert reconstruct_path(out, 4) == []


def test_dfs_preorder(ray_session):
    # star + chain: 0-{1,2}, 2-3 (undirected)
    src = np.array([0, 0, 2, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 0, 0, 2], dtype=np.int64)
    g = PartitionedGraph.from_arrays(4, src, dst)
    out = dfs(g, 0)
    assert out["vid"].tolist() == [0, 1, 2, 3]
    assert out["depth"].tolist() == [0, 1, 1, 2]
    capped = dfs(g, 0, max_depth=1)
    assert capped["vid"].tolist() == [0, 1, 2]


def test_scc_matches_tarjan(ray_session):
    rng = np.random.default_rng(19)
    n = 60
    src = rng.integers(0, n, 180).astype(np.int64)
    dst = rng.integers(0, n, 180).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = PartitionedGraph.from_arrays(n, src, dst)
    got = scc(g, num_parts=3).sort_values("vid")["component"].to_numpy()
    exp = scc_reference(n, src, dst)
    assert (got == exp).all()


def test_scc_cycle_and_dag(ray_session):
    # 0→1→2→0 cycle, 3→0 feeder, 4 isolated
    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 0, 0], dtype=np.int64)
    g = PartitionedGraph.from_arrays(5, src, dst)
    got = scc(g, num_parts=2).sort_values("vid")["component"].to_numpy()
    assert got.tolist() == [0, 0, 0, 3, 4]


def test_community_metrics(ray_session):
    # two triangles joined by one edge; labels = triangle id
    src = np.array([0, 1, 2, 3, 4, 5, 2], dtype=np.int64)
    dst = np.array([1, 2, 0, 4, 5, 3, 3], dtype=np.int64)
    g = PartitionedGraph.from_arrays(6, src, dst)
    labels = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    cond = conductance(g, labels).set_index("community")["conductance"]
    # each community: vol = 2*3 + 1 = 7, cut = 1 → 1/7
    assert np.isclose(cond.loc[0], 1 / 7)
    assert np.isclose(cond.loc[1], 1 / 7)
    q = modularity_by_community(g, labels)
    # matches the arrays-based modularity on identical labels
    from graph_data_science_ray.pipelines.louvain import modularity
    expect = modularity(6, src, dst, None, labels)
    assert np.isclose(q["modularity"].sum(), expect)
