"""Distributed engine vs golden fixtures and the NumPy oracle, across
parallelism levels (FIXTURES.md correctness protocol)."""

import numpy as np
import pytest

from graph_data_science_ray import oracle as orc
from graph_data_science_ray.sources import fixtures as fx
from graph_data_science_ray.stages.superstep import PartitionedGraph
from graph_data_science_ray.pipelines.pagerank import pagerank
from graph_data_science_ray.pipelines.wcc import wcc
from graph_data_science_ray.pipelines.labelprop import label_propagation

from conftest import random_graph


def partition_sets(labels):
    out = {}
    for i, l in enumerate(labels):
        out.setdefault(l, set()).add(i)
    return sorted(out.values(), key=min)


@pytest.mark.parametrize("num_parts", [1, 4])
def test_pagerank_wiki(ray_session, num_parts):
    g = fx.pagerank_wiki()
    res = pagerank(PartitionedGraph.from_arrays(g.n, g.src, g.dst),
                   tolerance=0, max_iterations=41, num_parts=num_parts)
    df = res.to_pandas()
    assert np.allclose(df["rank"].to_numpy(), g.expected["rank"], atol=1e-5)
    assert res.ran_iterations == 41


def test_pagerank_tolerance_iteration_counts(ray_session):
    g = fx.pagerank_wiki()
    for tol, expected in g.expected["tolerance_iterations"].items():
        res = pagerank(PartitionedGraph.from_arrays(g.n, g.src, g.dst),
                       tolerance=tol, max_iterations=40, num_parts=3)
        assert res.ran_iterations == expected and res.converged


def test_pagerank_personalized(ray_session):
    g = fx.pagerank_wiki()
    res = pagerank(PartitionedGraph.from_arrays(g.n, g.src, g.dst),
                   tolerance=0, max_iterations=41, num_parts=4,
                   source_vids=[g.vid("a"), g.vid("e")])
    assert np.allclose(res.to_pandas()["rank"], g.expected["personalized_ae"],
                       atol=1e-5)
    res = pagerank(PartitionedGraph.from_arrays(g.n, g.src, g.dst),
                   tolerance=0, max_iterations=41, num_parts=4,
                   source_vids=[g.vid("k"), g.vid("b")])
    assert np.allclose(res.to_pandas()["rank"], g.expected["personalized_kb"],
                       atol=1e-5)


def test_pagerank_doc_weighted(ray_session):
    d = fx.pagerank_doc()
    res = pagerank(PartitionedGraph.from_arrays(d.n, d.src, d.dst, d.weight),
                   max_iterations=20, num_parts=4)
    assert np.allclose(res.to_pandas()["rank"], d.expected["rank_unweighted"],
                       atol=1e-6)
    res = pagerank(PartitionedGraph.from_arrays(d.n, d.src, d.dst, d.weight),
                   max_iterations=20, num_parts=4, weighted=True)
    assert np.allclose(res.to_pandas()["rank"], d.expected["rank_weighted"],
                       atol=1e-6)


@pytest.mark.parametrize("num_parts", [1, 4])
def test_pagerank_random_vs_oracle(ray_session, num_parts):
    src, dst, w = random_graph(500, 3000, seed=7, weighted=True)
    expected, _, _ = orc.pagerank(500, src, dst, weight=w, max_iterations=15)
    res = pagerank(PartitionedGraph.from_arrays(500, src, dst, w),
                   max_iterations=15, num_parts=num_parts, weighted=True)
    assert np.allclose(res.to_pandas()["rank"].to_numpy(), expected, atol=1e-9)


@pytest.mark.parametrize("num_parts", [1, 4])
def test_wcc_doc(ray_session, num_parts):
    w = fx.wcc_doc()
    res = wcc(PartitionedGraph.from_arrays(w.n, w.src, w.dst, w.weight),
              num_parts=num_parts)
    assert np.array_equal(res.to_pandas()["label"], w.expected["components"])


def test_wcc_threshold(ray_session):
    w = fx.wcc_doc()
    res = wcc(PartitionedGraph.from_arrays(w.n, w.src, w.dst, w.weight),
              threshold=1.0, num_parts=4)
    assert np.array_equal(res.to_pandas()["label"],
                          w.expected["components_threshold_1"])


def test_wcc_chains(ray_session):
    ch = fx.wcc_chains()
    res = wcc(PartitionedGraph.from_arrays(ch.n, ch.src, ch.dst), num_parts=4)
    assert np.array_equal(res.to_pandas()["label"], ch.expected["components"])


@pytest.mark.parametrize("num_parts", [1, 3, 4])
def test_wcc_random_vs_oracle(ray_session, num_parts):
    src, dst, _ = random_graph(800, 1200, seed=11)
    expected = orc.wcc(800, src, dst)
    res = wcc(PartitionedGraph.from_arrays(800, src, dst), num_parts=num_parts)
    assert np.array_equal(res.to_pandas()["label"].to_numpy(), expected)


def test_wcc_seeded(ray_session):
    w = fx.wcc_doc()
    seeds = np.array([10, 11, 12, 13, 14, 15], dtype=np.int64)
    res = wcc(PartitionedGraph.from_arrays(w.n, w.src, w.dst), seeds=seeds,
              num_parts=2)
    # components {0,1,2} and {3,4,5} -> min seed labels 10 and 13
    assert np.array_equal(res.to_pandas()["label"], [10, 10, 10, 13, 13, 13])


@pytest.mark.parametrize("num_parts", [1, 4])
def test_labelprop_doc(ray_session, num_parts):
    lp = fx.labelprop_doc()
    res = label_propagation(PartitionedGraph.from_arrays(lp.n, lp.src, lp.dst),
                            num_parts=num_parts)
    assert partition_sets(res.to_pandas()["label"]) == sorted(
        lp.expected["partition_unweighted"], key=min)


def test_labelprop_weighted_and_seeded(ray_session):
    lp = fx.labelprop_doc()
    res = label_propagation(
        PartitionedGraph.from_arrays(lp.n, lp.src, lp.dst, lp.weight),
        num_parts=4)
    assert partition_sets(res.to_pandas()["label"]) == sorted(
        lp.expected["partition_weighted"], key=min)
    res = label_propagation(PartitionedGraph.from_arrays(lp.n, lp.src, lp.dst),
                            seeds=lp.seeds, num_parts=4)
    assert np.array_equal(res.to_pandas()["label"], lp.expected["labels_seeded"])


@pytest.mark.parametrize("num_parts", [1, 4])
def test_labelprop_exact_schedule_vs_oracle(ray_session, num_parts):
    """waves == n reproduces the reference's sequential ascending sweep."""
    src, dst, w = random_graph(80, 320, seed=3, weighted=True)
    expected = orc.label_propagation(80, src, dst, weight=w, max_iterations=5)
    res = label_propagation(PartitionedGraph.from_arrays(80, src, dst, w),
                            max_iterations=5, num_parts=num_parts, waves=80)
    assert np.array_equal(res.to_pandas()["label"].to_numpy(), expected)
