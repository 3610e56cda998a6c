"""Triangle count + LCC pipeline vs golden fixture and oracle."""

import numpy as np

from graph_data_science_ray import oracle as orc
from graph_data_science_ray.sources import fixtures as fx
from graph_data_science_ray.stages.superstep import PartitionedGraph
from graph_data_science_ray.pipelines.triangles import (
    local_clustering_coefficient,
    triangle_count,
    triangle_stream,
)

from conftest import random_graph


def test_triangles_doc(ray_session):
    t = fx.triangles_doc()
    g = PartitionedGraph.from_arrays(t.n, t.src, t.dst)
    per, total = triangle_count(g)
    assert np.array_equal(per, t.expected["triangles"])
    assert total == t.expected["global_triangles"]


def test_triangles_max_degree(ray_session):
    t = fx.triangles_doc()
    g = PartitionedGraph.from_arrays(t.n, t.src, t.dst)
    per, total = triangle_count(g, max_degree=4)
    assert np.array_equal(per, t.expected["triangles_maxdeg4"])
    assert total == t.expected["global_triangles_maxdeg4"]


def test_lcc_doc(ray_session):
    t = fx.triangles_doc()
    g = PartitionedGraph.from_arrays(t.n, t.src, t.dst)
    assert np.allclose(local_clustering_coefficient(g), t.expected["lcc"])


def test_triangles_random_vs_oracle(ray_session):
    src, dst, _ = random_graph(300, 2500, seed=5)
    expected_per, expected_total = orc.triangle_count(300, src, dst)
    per, total = triangle_count(PartitionedGraph.from_arrays(300, src, dst))
    assert np.array_equal(per, expected_per)
    assert total == expected_total


def test_triangle_stream_matches_bruteforce(ray_session):
    """Every triangle exactly once, vid-sorted (a < b < c), and the
    stream's corner counts reproduce triangle_count."""
    src, dst, _ = random_graph(120, 900, seed=7)
    g = PartitionedGraph.from_arrays(120, src, dst)
    tri = triangle_stream(g).to_pandas()
    got = set(map(tuple, tri[["node_a", "node_b", "node_c"]]
                  .to_numpy().tolist()))
    assert len(got) == len(tri)   # no duplicates
    adj = [set() for _ in range(120)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    want = {(a, b, c)
            for a in range(120) for b in adj[a] if b > a
            for c in (adj[a] & adj[b]) if c > b}
    assert got == want
    per, total = triangle_count(g)
    assert len(tri) == total
    corners = np.bincount(
        tri[["node_a", "node_b", "node_c"]].to_numpy().ravel(),
        minlength=120)
    assert np.array_equal(corners, per)


def test_triangles_random_max_degree_vs_oracle(ray_session):
    src, dst, _ = random_graph(200, 1500, seed=9)
    expected_per, expected_total = orc.triangle_count(200, src, dst, max_degree=20)
    per, total = triangle_count(PartitionedGraph.from_arrays(200, src, dst),
                                max_degree=20)
    assert np.array_equal(per, expected_per)
    assert total == expected_total
