"""Parallelism-16 determinism (FIXTURES.md protocol) and skew behavior
on power-law graphs (north-rule: skew handled explicitly)."""

import numpy as np
import pytest

from graph_data_science_ray import oracle as orc
from graph_data_science_ray.sources.generator import generate_random_graph
from graph_data_science_ray.stages.superstep import (
    PartitionedGraph,
    SuperstepEngine,
)
from graph_data_science_ray.pipelines.pagerank import PageRankProgram, pagerank
from graph_data_science_ray.pipelines.wcc import wcc

from conftest import random_graph


def test_pagerank_parallelism_16(ray_session):
    src, dst, _ = random_graph(400, 2400, seed=17)
    expected, _, _ = orc.pagerank(400, src, dst, max_iterations=15)
    for parts in (1, 4, 16):
        res = pagerank(PartitionedGraph.from_arrays(400, src, dst),
                       max_iterations=15, num_parts=parts)
        assert np.allclose(res.to_pandas()["rank"].to_numpy(), expected,
                           atol=1e-12)


def test_wcc_parallelism_16(ray_session):
    src, dst, _ = random_graph(400, 900, seed=18)
    expected = orc.wcc(400, src, dst)
    for parts in (1, 4, 16):
        res = wcc(PartitionedGraph.from_arrays(400, src, dst),
                  num_parts=parts)
        assert np.array_equal(res.to_pandas()["label"].to_numpy(), expected)


def test_powerlaw_skew_correct_and_balanced(ray_session):
    """A hub with ~20% of all edges: results stay exact and the modulo
    vertex partitioning keeps per-worker edge counts bounded (the hub's
    out-edges land on one worker; receive-side hot spots never exceed P
    partial values by construction)."""
    src, dst, _ = generate_random_graph(2000, 6, "power_law", seed=5)
    # graft an extreme hub
    hub_edges = 4000
    rng = np.random.default_rng(0)
    src = np.concatenate([src, np.zeros(hub_edges, dtype=np.int64)])
    dst = np.concatenate([dst, rng.integers(0, 2000, hub_edges)])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    expected, _, _ = orc.pagerank(2000, src, dst, max_iterations=10)
    g = PartitionedGraph.from_arrays(2000, src, dst)
    eng = SuperstepEngine(g, num_parts=8)
    try:
        res = eng.run(PageRankProgram(), max_iterations=10, collect=("rank",))
        assert np.allclose(res.to_pandas()["rank"].to_numpy(), expected,
                           atol=1e-9)
        # skew visibility: per-iteration metrics exist and walls are sane
        walls = [m["wall_sec"] for m in res.metrics]
        assert len(walls) == 10 and max(walls) < 5.0
    finally:
        eng.shutdown()


def test_empty_and_single_vertex_graphs(ray_session):
    e = np.empty(0, dtype=np.int64)
    res = pagerank(PartitionedGraph.from_arrays(3, e, e), max_iterations=5,
                   num_parts=2)
    assert np.allclose(res.to_pandas()["rank"].to_numpy(), 0.15)
    res = wcc(PartitionedGraph.from_arrays(1, e, e), num_parts=2)
    assert res.to_pandas()["label"].tolist() == [0]