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


def test_yens_k_shortest(weighted_digraph):
    from graph_data_science_ray.pipelines.paths_extra import (
        dijkstra_path, yens_k_shortest)
    cost, path = dijkstra_path(weighted_digraph, 0, 3)
    assert cost == 4 and path == [0, 1, 2, 3]
    out = yens_k_shortest(weighted_digraph, 0, 3, k=3)
    assert out["total_cost"].tolist() == [4.0, 5.0, 6.0]
    assert out["path"].tolist() == [[0, 1, 2, 3], [0, 2, 3], [0, 1, 3]]


def test_yens_sharded_parquet_matches_arrays(ray_session, tmp_path):
    """The shard-actor adjacency backend (parquet graphs, no driver CSR)
    returns bit-identical Dijkstra/Yens results to the arrays-kind
    driver CSR on the same random weighted digraph."""
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.pipelines.paths_extra import (
        dijkstra_path, yens_k_shortest)
    from graph_data_science_ray.sources.graph_build import build_int_graph
    rng = np.random.default_rng(47)
    n = 80
    src = rng.integers(0, n, 400).astype(np.int64)
    dst = rng.integers(0, n, 400).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 9, len(src)).astype(np.float64)
    ga = PartitionedGraph.from_arrays(n, src, dst, w)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst, "weight": w}))
    gp = build_int_graph(ds, str(tmp_path / "g"), n, 4,
                         aggregation="min", weight_col="weight")
    assert gp.kind == "parquet"
    ca, pa_ = dijkstra_path(ga, 0, n - 1)
    cp, pp = dijkstra_path(gp, 0, n - 1)
    assert ca == cp and pa_ == pp
    ya = yens_k_shortest(ga, 0, n - 1, k=4)
    yp = yens_k_shortest(gp, 0, n - 1, k=4)
    assert ya["total_cost"].tolist() == yp["total_cost"].tolist()
    assert ya["path"].tolist() == yp["path"].tolist()


def test_spanning_tree_matches_prim(ray_session):
    from graph_data_science_ray.pipelines.spanning_tree import (
        prim_reference, spanning_tree)
    rng = np.random.default_rng(23)
    n = 40
    src = rng.integers(0, n, 150).astype(np.int64)
    dst = rng.integers(0, n, 150).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.permutation(len(src)).astype(np.float64) + 1.0  # distinct
    g = PartitionedGraph.from_arrays(n, src, dst, w)
    mst = spanning_tree(g)
    total = mst["weight"].sum()
    expect = prim_reference(n, src, dst, w)
    assert np.isclose(total, expect)
    # forest: |edges| = n - #components
    from graph_data_science_ray.pipelines.wcc import _local_min_labels
    labels = _local_min_labels(n, np.arange(n, dtype=np.int64), src, dst)
    assert len(mst) == n - len(np.unique(labels))


def test_split_relationships(ray_session):
    from graph_data_science_ray.pipelines.split import split_relationships
    rng = np.random.default_rng(31)
    n = 200
    u = rng.integers(0, n, 600).astype(np.int64)
    v = rng.integers(0, n, 600).astype(np.int64)
    keep = u != v
    lo, hi = np.minimum(u[keep], v[keep]), np.maximum(u[keep], v[keep])
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    g = PartitionedGraph.from_arrays(n, pairs[:, 0], pairs[:, 1])
    train, test = split_relationships(g, holdout_fraction=0.3, seed=7)
    tr = train.to_pandas()
    te = test.to_pandas()
    n_pos = int((te["label"] == 1).sum())
    n_neg = int((te["label"] == 0).sum())
    assert len(tr) + n_pos == len(pairs)
    assert 0.15 * len(pairs) < n_pos < 0.45 * len(pairs)
    assert n_neg <= n_pos  # limit() caps at the positive count
    edge_set = {(int(a), int(b)) for a, b in pairs}
    neg = te[te["label"] == 0]
    for a, b in zip(neg["src"], neg["dst"]):
        assert (int(a), int(b)) not in edge_set and a < b
    # deterministic across reruns
    _, test2 = split_relationships(g, holdout_fraction=0.3, seed=7)
    te2 = test2.to_pandas()
    assert set(map(tuple, te.to_numpy())) == set(map(tuple, te2.to_numpy()))


def test_all_pairs_distances(ray_session):
    from graph_data_science_ray.pipelines.traversal import (
        all_pairs_distances)
    # chain 0-1-2-3 (undirected) + isolated 4
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    g = PartitionedGraph.from_arrays(5, src, dst)
    df = all_pairs_distances(g, flow="both", num_parts=2)
    got = {(int(r.source), int(r.target)): int(r.dist)
           for r in df.itertuples()}
    assert got[(0, 3)] == 3 and got[(3, 0)] == 3
    assert got[(1, 2)] == 1 and got[(2, 2)] == 0
    assert (4, 0) not in got and got[(4, 4)] == 0
    # 70 sources forces two MS-BFS waves
    g2 = PartitionedGraph.from_arrays(
        70, np.arange(69, dtype=np.int64),
        np.arange(1, 70, dtype=np.int64))
    d2 = all_pairs_distances(g2, flow="both", num_parts=2)
    m = {(int(r.source), int(r.target)): int(r.dist)
         for r in d2.itertuples()}
    assert m[(0, 69)] == 69 and m[(65, 2)] == 63


def test_parquet_graph_coloring_filter_threshold(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.pipelines.coloring import k1_coloring
    from graph_data_science_ray.pipelines.subgraph import filter_graph
    from graph_data_science_ray.pipelines.wcc import wcc
    from graph_data_science_ray.sources.graph_build import build_int_graph
    rng = np.random.default_rng(41)
    n = 50
    src = rng.integers(0, n, 200).astype(np.int64)
    dst = rng.integers(0, n, 200).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 4, len(src)).astype(np.float64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst, "weight": w}))
    g = build_int_graph(ds, str(tmp_path / "g"), n, 4, symmetrize=True,
                        aggregation="sum", weight_col="weight")
    # k1 coloring on the parquet graph is proper
    colors = k1_coloring(g).to_pandas().sort_values("vid")["color"].to_numpy()
    cu, cv = np.minimum(src, dst), np.maximum(src, dst)
    assert (colors[cu] != colors[cv]).all()
    # distributed filter drops low-weight edges; WCC threshold agrees
    # with an arrays-side filter of the same symmetrized/aggregated graph
    filt = filter_graph(g, edge_predicate=lambda s, d, ww: ww > 2.5,
                        out_dir=str(tmp_path / "f"))
    assert filt.kind == "parquet" and filt.num_edges < g.num_edges
    got = wcc(g, threshold=2.5).to_pandas().sort_values("vid")
    ef = filt.edges_dataset(("src", "dst")).to_pandas()
    from graph_data_science_ray.pipelines.wcc import _local_min_labels
    exp = _local_min_labels(n, np.arange(n, dtype=np.int64),
                            ef["src"].to_numpy(), ef["dst"].to_numpy())
    assert (got["label"].to_numpy() == exp).all()


def test_celf_influence(ray_session):
    from graph_data_science_ray.pipelines.influence import (
        celf_influence_maximization)
    # hub 0 → 1..9 plus a separate chain 10→11→12: the hub must be the
    # first seed, and gains must be non-increasing (submodularity)
    src = np.concatenate([np.zeros(9, np.int64),
                          np.array([10, 11], np.int64)])
    dst = np.concatenate([np.arange(1, 10, dtype=np.int64),
                          np.array([11, 12], np.int64)])
    g = PartitionedGraph.from_arrays(13, src, dst)
    out = celf_influence_maximization(g, seed_set_size=3,
                                      propagation_probability=0.5,
                                      monte_carlo_simulations=62)
    assert out["node"].iloc[0] == 0
    gains = out["spread_gain"].to_numpy()
    assert (np.diff(gains) <= 1e-9).all()
    # deterministic
    out2 = celf_influence_maximization(g, seed_set_size=3,
                                       propagation_probability=0.5,
                                       monte_carlo_simulations=62)
    assert out["node"].tolist() == out2["node"].tolist()


def test_graph_summary(ray_session):
    from graph_data_science_ray.catalog import graph_summary
    src = np.array([0, 0, 0, 1], dtype=np.int64)
    dst = np.array([1, 2, 3, 2], dtype=np.int64)
    g = PartitionedGraph.from_arrays(4, src, dst)
    s = graph_summary(g, orientation="undirected")
    assert s["nodeCount"] == 4 and s["relationshipCount"] == 4
    assert s["degreeMax"] == 3.0 and s["degreeMean"] == 2.0
    assert s["degreeP50"] == 2.0


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
