"""Destination-group (node-affinity) bundle routing.

With node_affinity the engine packs one message bundle per destination
NODE instead of one per sender, so a multi-node cluster pulls only its
own partitions' segments across the wire. On one node the default
single group is byte-identical to the classic wire format; explicit
partition groups simulate a multi-node routing table and must produce
identical results.
"""

import numpy as np
import pytest

from graph_data_science_ray.pipelines.labelprop import \
    LabelPropagationProgram
from graph_data_science_ray.pipelines.pagerank import PageRankProgram
from graph_data_science_ray.pipelines.wcc import WCCProgram
from graph_data_science_ray.stages.superstep import (PartitionedGraph,
                                                     SuperstepEngine)

pytestmark = pytest.mark.usefixtures("ray_session")

N = 800


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(3)
    src = rng.integers(0, N, 3000)
    dst = rng.integers(0, N, 3000)
    keep = src != dst
    return PartitionedGraph.from_arrays(N, src[keep], dst[keep])


def _run(graph, groups, prog, iters, key, **ekw):
    e = SuperstepEngine(graph, num_parts=8, node_affinity=groups, **ekw)
    try:
        r = e.run(prog, max_iterations=iters, collect=(key,))
        return r.to_pandas()[key].to_numpy(), r.ran_iterations
    finally:
        e.shutdown()


@pytest.mark.parametrize("groups", [
    [[0, 1, 2, 3], [4, 5, 6, 7]],            # two "nodes"
    [[0, 2, 4, 6], [1, 3, 5, 7]],            # interleaved placement
    [[0], [1], [2], [3], [4], [5], [6], [7]],  # one part per node
], ids=["halves", "interleaved", "singletons"])
def test_grouped_routing_matches_default(graph, groups):
    for prog_f, iters, key, exact in (
            (lambda: PageRankProgram(tolerance=0.0), 12, "rank", False),
            (lambda: WCCProgram(n=N), 50, "label", True),
            (lambda: LabelPropagationProgram(n=N, waves=4), 30, "label",
             True)):
        base, i0 = _run(graph, False, prog_f(), iters, key)
        split, i1 = _run(graph, groups, prog_f(), iters, key)
        assert i0 == i1
        if exact:
            assert np.array_equal(base, split)
        else:
            np.testing.assert_allclose(base, split, rtol=1e-12)


def test_grouped_routing_with_hub_split(graph):
    """Groups compose with hot-vertex splitting (hub sections are
    sliced per group)."""
    rng = np.random.default_rng(9)
    src = np.r_[rng.integers(0, N, 2000), np.full(500, 11)]
    dst = np.r_[rng.integers(0, N, 2000),
                rng.choice(N, 500, replace=False)]
    keep = src != dst
    g = PartitionedGraph.from_arrays(N, src[keep], dst[keep])
    base, _ = _run(g, False, PageRankProgram(tolerance=0.0), 10, "rank")
    split, _ = _run(g, [[0, 1, 2, 3], [4, 5, 6, 7]],
                    PageRankProgram(tolerance=0.0), 10, "rank",
                    hub_degree_threshold=100)
    np.testing.assert_allclose(base, split, rtol=1e-9)


def test_auto_affinity_single_node_is_one_group(graph):
    # node_affinity=True and the r5 "auto" default both resolve to one
    # group on a single node (byte-identical classic wire format)
    for mode in (True, "auto"):
        e = SuperstepEngine(graph, num_parts=8, node_affinity=mode)
        try:
            assert len(e.groups) == 1
            assert e.groups[0] == list(range(8))
        finally:
            e.shutdown()
    e = SuperstepEngine(graph, num_parts=8)  # the default IS auto
    try:
        assert e.groups == [list(range(8))]
    finally:
        e.shutdown()


def test_groups_from_node_ids_placement_detection():
    from graph_data_science_ray.stages.superstep import groups_from_node_ids
    # single node → one group
    assert groups_from_node_ids(["n0"] * 6) == [list(range(6))]
    # two nodes, contiguous halves
    assert groups_from_node_ids(["a", "a", "b", "b"]) == [[0, 1], [2, 3]]
    # interleaved placement still partitions correctly, deterministic
    # group order by node id
    assert groups_from_node_ids(["b", "a", "b", "a"]) == [[1, 3], [0, 2]]
    # every partition appears exactly once
    g = groups_from_node_ids(["x", "y", "z", "y", "x"])
    assert sorted(q for grp in g for q in grp) == list(range(5))


def test_bad_groups_rejected(graph):
    with pytest.raises(ValueError):
        SuperstepEngine(graph, num_parts=8,
                        node_affinity=[[0, 1], [2, 3]])  # incomplete
