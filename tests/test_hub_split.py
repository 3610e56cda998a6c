"""Hot-vertex (hub) splitting — skew-aware scatter routing.

A vertex whose per-flow degree reaches the engine's
``hub_degree_threshold`` has its edges re-routed at load time to the
partitions owning their targets; each superstep the owner ships one
value per (hub, destination partition) instead of scattering O(degree)
locally (stages/superstep.py module docstring; the distributed answer
to the reference's degree partitioning,
core/.../partition/PartitionUtils.java:40-131).

Every reducer / flow / feature combination must produce the same
result split and unsplit: SUM (PageRank), MIN+edge-add+master
(SSSP / delta-stepping), OR (MSBFS), VOTE+target_range (label
propagation), vector SUM (FastRP), per-superstep flow flipping (HITS),
and checkpoint/resume.
"""

import numpy as np
import pytest

from graph_data_science_ray.pipelines.fastrp import FastRPProgram
from graph_data_science_ray.pipelines.hits import HITSProgram
from graph_data_science_ray.pipelines.labelprop import \
    LabelPropagationProgram
from graph_data_science_ray.pipelines.pagerank import PageRankProgram
from graph_data_science_ray.pipelines.traversal import (
    DeltaSteppingProgram, MSBFSProgram, SSSPProgram)
from graph_data_science_ray.pipelines.wcc import WCCProgram
from graph_data_science_ray.stages.superstep import (PartitionedGraph,
                                                     SuperstepEngine)

pytestmark = pytest.mark.usefixtures("ray_session")

N = 1200


@pytest.fixture(scope="module")
def skewed_graph():
    """Random graph with a planted out-hub (vertex 3, degree ~900) and
    a planted in-hub (vertex 11, degree ~800) — both far above the
    test threshold of 100."""
    rng = np.random.default_rng(1)
    src = rng.integers(0, N, 4000)
    dst = rng.integers(0, N, 4000)
    src = np.r_[src, np.full(900, 3), rng.choice(N, 800, replace=False)]
    dst = np.r_[dst, rng.choice(N, 900, replace=False), np.full(800, 11)]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).round(3)
    return (PartitionedGraph.from_arrays(N, src, dst),
            PartitionedGraph.from_arrays(N, src, dst, weight=w))


def _run(graph, thr, prog, iters, keys):
    e = SuperstepEngine(graph, num_parts=8, hub_degree_threshold=thr)
    try:
        r = e.run(prog, max_iterations=iters, collect=keys)
        return r.to_pandas(), r
    finally:
        e.shutdown()


def _col(df, k):
    v = df[k].to_numpy()
    return np.stack(v) if v.dtype == object else v


CASES = [
    ("pagerank", False, lambda: PageRankProgram(tolerance=0.0), 15,
     ("rank",), False),
    ("wcc", False, lambda: WCCProgram(n=N), 50, ("label",), True),
    ("labelprop_vote_tr", False,
     lambda: LabelPropagationProgram(n=N, waves=4), 40, ("label",), True),
    ("sssp_min_weighted", True, lambda: SSSPProgram(source_vid=3), 60,
     ("dist",), False),
    ("delta_stepping_master", True,
     lambda: DeltaSteppingProgram(source_vid=3, delta=1.0), 80,
     ("dist",), False),
    ("msbfs_or_both", False, lambda: MSBFSProgram(np.arange(10)), 30,
     ("reached", "farness"), True),
    ("fastrp_vector_sum", False,
     lambda: FastRPProgram(dim=8, iteration_weights=[0.0, 1.0, 1.0]), 6,
     ("emb",), False),
    ("hits_flow_flip", False, lambda: HITSProgram(), 12,
     ("auth", "hub"), False),
]


@pytest.mark.parametrize(
    "name,weighted,prog_f,iters,keys,exact",
    CASES, ids=[c[0] for c in CASES])
def test_split_matches_unsplit(skewed_graph, name, weighted, prog_f,
                               iters, keys, exact):
    g = skewed_graph[1] if weighted else skewed_graph[0]
    base, rb = _run(g, None, prog_f(), iters, keys)
    split, rs = _run(g, 100, prog_f(), iters, keys)
    assert rb.ran_iterations == rs.ran_iterations
    for k in keys:
        a, c = _col(base, k), _col(split, k)
        if exact and a.dtype.kind in "iu":
            assert np.array_equal(a, c), k
        else:
            np.testing.assert_allclose(a.astype(float), c.astype(float),
                                       rtol=1e-9, atol=1e-12)


def test_default_threshold_never_triggers_on_small_graphs(skewed_graph):
    """The 'auto' threshold floors at 65536 — small/oracle graphs keep
    the exact unsplit layout (byte-identical message order)."""
    import ray
    e = SuperstepEngine(skewed_graph[0], num_parts=8)
    try:
        assert e.hub_threshold >= 65536
        e._ensure_blocks("out")
        assert not any(ray.get([w.has_hubs.remote("out")
                                for w in e.workers]))
    finally:
        e.shutdown()


def test_hub_scatter_balances_emit_load():
    """A mega-hub (degree = half the edges) must not concentrate its
    scatter on one partition: with splitting, per-partition emitted
    messages even out and total traffic drops (one value per
    (hub, dest-partition) instead of per reduced target)."""
    rng = np.random.default_rng(7)
    n = 4000
    hub_deg = 3000
    src = np.r_[rng.integers(0, n, 3000), np.full(hub_deg, 17)]
    dst = np.r_[rng.integers(0, n, 3000),
                rng.choice(n, hub_deg, replace=False)]
    keep = src != dst
    g = PartitionedGraph.from_arrays(n, src[keep], dst[keep])

    def sent_parts(thr):
        e = SuperstepEngine(g, num_parts=8, hub_degree_threshold=thr)
        try:
            r = e.run(PageRankProgram(tolerance=0.0), max_iterations=6,
                      collect=("rank",))
            tot = np.zeros(8)
            for m in r.metrics:
                tot += np.asarray(m["sent_parts"])
            return tot
        finally:
            e.shutdown()

    base = sent_parts(None)
    split = sent_parts(100)
    # owner partition of vertex 17 (17 % 8 = 1) dominates unsplit
    assert base.max() / np.median(base) > 1.8
    assert split.max() / np.median(split) < 1.3
    assert split.sum() < base.sum()


def test_checkpoint_resume_with_hubs(tmp_path):
    rng = np.random.default_rng(2)
    n = 1000
    src = np.r_[rng.integers(0, n, 3000), np.full(700, 5)]
    dst = np.r_[rng.integers(0, n, 3000), rng.choice(n, 700, replace=False)]
    keep = src != dst
    g = PartitionedGraph.from_arrays(n, src[keep], dst[keep])
    d = str(tmp_path / "ckpt")
    e = SuperstepEngine(g, num_parts=8, hub_degree_threshold=100)
    try:
        e.run(PageRankProgram(tolerance=0.0), max_iterations=7,
              collect=("rank",), checkpoint_dir=d, checkpoint_interval=3)
    finally:
        e.shutdown()
    e = SuperstepEngine(g, num_parts=8, hub_degree_threshold=100)
    try:
        resumed = e.run(PageRankProgram(tolerance=0.0), max_iterations=12,
                        collect=("rank",), checkpoint_dir=d,
                        resume=True).to_pandas()
    finally:
        e.shutdown()
    e = SuperstepEngine(g, num_parts=8, hub_degree_threshold=None)
    try:
        base = e.run(PageRankProgram(tolerance=0.0), max_iterations=12,
                     collect=("rank",)).to_pandas()
    finally:
        e.shutdown()
    np.testing.assert_allclose(base["rank"], resumed["rank"], rtol=1e-9)
