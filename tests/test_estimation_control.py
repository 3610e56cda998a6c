"""Memory estimation trees + engine termination flag / progress
tracker (reference parity: MemoryEstimations / MemoryUsageValidator,
TerminationFlag, ProgressTracker)."""

import numpy as np
import pytest

from graph_data_science_ray.estimation import (check_fits, estimate,
                                               estimate_bytes)
from graph_data_science_ray.pipelines.pagerank import PageRankProgram
from graph_data_science_ray.stages.superstep import (PartitionedGraph,
                                                     ProgressTracker,
                                                     SuperstepEngine,
                                                     TerminationFlag)


def test_estimate_tree_structure():
    est = estimate("pagerank", 1_000_000, 10_000_000, num_parts=32)
    assert est.min_bytes > 0 and est.max_bytes >= est.min_bytes
    names = [c.name for c in est.tree.children]
    assert "csr blocks" in names and "messages" in names
    assert est.per_partition_bytes * 32 >= est.max_bytes
    assert "pagerank" in est.render()
    # state column formula matches the actual allocation (rank f64 +
    # delta f64 + halted bool per vertex)
    state = next(c for c in est.tree.children
                 if c.name not in ("csr blocks", "messages"))
    assert state.min_bytes == 1_000_000 * (2 * 8 + 1)


def test_estimate_config_aware():
    small = estimate("fastrp", 100_000, 1_000_000, dim=16)
    big = estimate("fastrp", 100_000, 1_000_000, dim=256)
    assert big.max_bytes > 4 * small.max_bytes
    b62 = estimate("betweenness", 100_000, 1_000_000, batch_size=62)
    b8 = estimate("betweenness", 100_000, 1_000_000, batch_size=8)
    assert b62.max_bytes > b8.max_bytes


def test_estimate_monotone_and_flat_api():
    lo = estimate_bytes("wcc", 1000, 10_000)
    hi = estimate_bytes("wcc", 1_000_000, 10_000_000)
    assert hi["total_bytes"] > lo["total_bytes"]
    assert set(lo) == {"block_bytes", "state_bytes", "message_bytes",
                       "total_bytes"}
    with pytest.raises(ValueError):
        estimate("nope", 10, 10)


def test_check_fits_gate(ray_session):
    ok, est = check_fits("pagerank", 1000, 5000)
    assert ok and est.max_bytes > 0
    bad, est2 = check_fits("fastrp", 10**12, 10**13, dim=512)
    assert not bad


@pytest.fixture()
def small_graph():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 500, 2000)
    dst = rng.integers(0, 500, 2000)
    keep = src != dst
    return PartitionedGraph.from_arrays(500, src[keep], dst[keep])


def test_termination_flag_stops_early(ray_session, small_graph):
    flag = TerminationFlag()
    flag.stop()
    e = SuperstepEngine(small_graph, num_parts=4)
    try:
        res = e.run(PageRankProgram(tolerance=0.0), max_iterations=20,
                    collect=("rank",), termination=flag)
    finally:
        e.shutdown()
    assert res.terminated and not res.converged
    assert len(res.metrics) == 0


def test_termination_mid_run_keeps_partial_state(ray_session,
                                                 small_graph):
    class AfterN(TerminationFlag):
        def __init__(self, n):
            super().__init__()
            self.calls = 0
            self.n = n

        def running(self):
            self.calls += 1
            return self.calls <= self.n

    e = SuperstepEngine(small_graph, num_parts=4)
    try:
        res = e.run(PageRankProgram(tolerance=0.0), max_iterations=20,
                    collect=("rank",), termination=AfterN(5))
    finally:
        e.shutdown()
    assert res.terminated
    # partial state still collectable and plausible
    df = res.to_pandas()
    assert len(df) == 500 and np.isfinite(df["rank"]).all()
    assert 0 < len(res.metrics) < 20


def test_wallclock_budget():
    flag = TerminationFlag(max_seconds=0.0)
    import time
    time.sleep(0.01)
    assert not flag.running()


def test_progress_tracker_engine_ticks(ray_session, small_graph):
    tracker = ProgressTracker("pagerank-job")
    e = SuperstepEngine(small_graph, num_parts=4)
    try:
        res = e.run(PageRankProgram(tolerance=0.0), max_iterations=8,
                    collect=("rank",), tracker=tracker)
    finally:
        e.shutdown()
    # one subtask opened/closed, one tick per recorded iteration
    assert any(ev[1] == "PageRankProgram" for ev in tracker.events)
    ticks = [ev for ev in tracker.events
             if ev[1] == "PageRankProgram" and len(ev) == 4 and ev[2] > 0]
    assert len(ticks) >= len(res.metrics) - 2   # LAG-deep pipeline
    assert len(tracker.stack) == 1              # subtask closed


def test_progress_tracker_nesting():
    t = ProgressTracker("outer")
    t.begin_subtask("phase-1", volume=3)
    t.log_progress()
    t.log_progress(2)
    t.end_subtask()
    t.begin_subtask("phase-2")
    t.end_subtask()
    assert len(t.stack) == 1
    ends = [e for e in t.events if len(e) == 5 and e[4] == "end"]
    assert [e[1] for e in ends] == ["phase-1", "phase-2"]
    assert ends[0][2] == 3   # done == volume
