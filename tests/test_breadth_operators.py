"""CollapsePath, random walks, node similarity, generator, catalog,
subgraph filter, and result modes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.catalog import GraphCatalog
from graph_data_science_ray.sources.generator import generate_random_graph
from graph_data_science_ray.stages.superstep import PartitionedGraph
from graph_data_science_ray.pipelines.collapse_path import collapse_path
from graph_data_science_ray.pipelines.degree import degree_centrality
from graph_data_science_ray.pipelines import modes
from graph_data_science_ray.pipelines.similarity_graph import node_similarity
from graph_data_science_ray.pipelines.subgraph import filter_graph
from graph_data_science_ray.pipelines.walks import random_walks
from graph_data_science_ray.pipelines.wcc import wcc

from conftest import random_graph


def test_collapse_path_matches_pandas_join(ray_session):
    rng = np.random.default_rng(3)
    e1 = pd.DataFrame({"src": rng.integers(0, 50, 200),
                       "dst": rng.integers(50, 80, 200)})
    e2 = pd.DataFrame({"src": rng.integers(50, 80, 150),
                       "dst": rng.integers(80, 120, 150)})
    got = collapse_path(rd.from_pandas(e1), rd.from_pandas(e2)).to_pandas()
    want = (e1.merge(e2, left_on="dst", right_on="src",
                     suffixes=("_l", "_r"))[["src_l", "dst_r"]]
            .rename(columns={"src_l": "src", "dst_r": "dst"})
            .drop_duplicates().sort_values(["src", "dst"])
            .reset_index(drop=True))
    got = got.sort_values(["src", "dst"]).reset_index(drop=True)
    assert got.equals(want)


def test_random_walks_deterministic_and_valid(ray_session):
    src, dst, _ = random_graph(100, 800, seed=2)
    g = PartitionedGraph.from_arrays(100, src, dst)
    w1 = random_walks(g, walk_length=6, walks_per_node=2, seed=9)
    w2 = random_walks(g, walk_length=6, walks_per_node=2, seed=9)
    assert w1.equals(w2)
    # every consecutive (vid, next) is a real edge
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for wid, grp in w1.groupby("walk_id"):
        vids = grp.sort_values("step")["vid"].tolist()
        for a, b in zip(vids, vids[1:]):
            assert (a, b) in edge_set
    assert w1.groupby("walk_id")["step"].min().eq(0).all()


def test_node_similarity_vs_brute_force(ray_session):
    src, dst, _ = random_graph(60, 400, seed=4)
    g = PartitionedGraph.from_arrays(60, src, dst)
    got = node_similarity(g, top_k=None, similarity_cutoff=1e-9)
    # brute force
    neigh = {v: set() for v in range(60)}
    for a, b in zip(src, dst):
        neigh[a].add(b)
    expected = {}
    for a in range(60):
        for b in range(a + 1, 60):
            if not neigh[a] or not neigh[b]:
                continue
            inter = len(neigh[a] & neigh[b])
            if inter == 0:
                continue
            expected[(a, b)] = inter / len(neigh[a] | neigh[b])
    got_pairs = {(min(r.node1, r.node2), max(r.node1, r.node2)): r.similarity
                 for r in got.itertuples()}
    assert set(got_pairs) == set(expected)
    for k, v in expected.items():
        assert abs(got_pairs[k] - v) < 1e-12


def test_node_similarity_topk(ray_session):
    src, dst, _ = random_graph(60, 400, seed=4)
    g = PartitionedGraph.from_arrays(60, src, dst)
    got = node_similarity(g, top_k=3)
    assert got.groupby("node1").size().max() <= 3


def test_node_similarity_cosine_weighted(ray_session):
    """Weighted cosine (r4: the reference's weighted similarity
    computer) vs brute force over aggregated edge-weight vectors."""
    rng = np.random.default_rng(5)
    src, dst, _ = random_graph(40, 250, seed=5)
    # distinct edges with integer weights (pre-aggregated contract)
    e = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = e[:, 0], e[:, 1]
    w = rng.integers(1, 6, len(src)).astype(np.float64)
    g = PartitionedGraph.from_arrays(40, src, dst, w)
    got = node_similarity(g, metric="cosine", top_k=None,
                          similarity_cutoff=1e-9)
    vec = {v: {} for v in range(40)}
    for a, b, ww in zip(src, dst, w):
        vec[a][b] = ww
    import math
    expected = {}
    for a in range(40):
        for b in range(a + 1, 40):
            shared = set(vec[a]) & set(vec[b])
            if not shared:
                continue
            dot = sum(vec[a][t] * vec[b][t] for t in shared)
            na = math.sqrt(sum(x * x for x in vec[a].values()))
            nb = math.sqrt(sum(x * x for x in vec[b].values()))
            expected[(a, b)] = dot / (na * nb)
    got_pairs = {(min(r.node1, r.node2), max(r.node1, r.node2)):
                 r.similarity for r in got.itertuples()}
    assert set(got_pairs) == set(expected)
    for k, v in expected.items():
        assert abs(got_pairs[k] - v) < 1e-12


def test_node_similarity_bottomk_requires_topk_none(ray_session):
    import pytest as _pytest
    src, dst, _ = random_graph(20, 60, seed=1)
    g = PartitionedGraph.from_arrays(20, src, dst)
    with _pytest.raises(ValueError):
        node_similarity(g, bottom_k=2)   # top_k left at its default


def test_node_similarity_bottomk(ray_session):
    src, dst, _ = random_graph(60, 400, seed=4)
    g = PartitionedGraph.from_arrays(60, src, dst)
    full = node_similarity(g, top_k=None, similarity_cutoff=1e-9)
    bot = node_similarity(g, top_k=None, bottom_k=2,
                          similarity_cutoff=1e-9)
    assert bot.groupby("node1").size().max() <= 2
    # each node's bottom-2 really are its smallest similarities
    for n1, grp in bot.groupby("node1"):
        all_sims = np.sort(full[full["node1"] == n1]
                           ["similarity"].to_numpy())
        got = np.sort(grp["similarity"].to_numpy())
        np.testing.assert_allclose(got, all_sims[:len(got)], rtol=1e-12)


def test_generator_semantics():
    src, dst, _ = generate_random_graph(1000, 8, "uniform", seed=1)
    deg = np.bincount(src, minlength=1000)
    assert (deg == 8).all()
    src, dst, _ = generate_random_graph(1000, 8, "power_law", seed=1)
    deg = np.bincount(src, minlength=1000)
    assert deg.min() >= 1 and deg.max() > 4 * 8  # heavy tail
    s2, d2, _ = generate_random_graph(1000, 8, "power_law", seed=1)
    assert np.array_equal(src, s2) and np.array_equal(dst, d2)


def test_subgraph_filter(ray_session):
    src, dst, w = random_graph(100, 500, seed=6, weighted=True)
    g = PartitionedGraph.from_arrays(100, src, dst, w)
    fg = filter_graph(g, edge_predicate=lambda s, d, ww: ww > 0.5)
    assert fg.num_edges == int((w > 0.5).sum())
    mask = np.zeros(100, dtype=bool)
    mask[:50] = True
    fg = filter_graph(g, vertex_mask=mask)
    assert (fg.src < 50).all() and (fg.dst < 50).all()


def test_catalog_and_modes_roundtrip(ray_session, tmp_path):
    from graph_data_science_ray.sources.repo_source import write_repo_table
    from graph_data_science_ray.pipelines.graph_pipeline import build_graph_from_repos
    catalog = GraphCatalog(str(tmp_path / "catalog"))
    path, _, _ = write_repo_table(str(tmp_path / "repos.parquet"), 80, seed=3)
    g = build_graph_from_repos(path, catalog.path_for("repograph"),
                               num_parts=2)
    assert catalog.exists("repograph")
    listed = catalog.list()
    assert listed[0]["graphName"] == "repograph"
    assert listed[0]["nodeCount"] == g.n

    res = wcc(catalog.get("repograph"))
    # stream with original keys
    df = modes.stream(res, graph=g)
    assert {"vid", "label", "repo"} <= set(df.columns)
    # stats summary
    st = modes.stats(res)
    assert st["count"] == g.n and "communityCount" in st and "p50" in st
    # mutate + read back
    modes.mutate(res, g, "component")
    back = modes.read_property(g, "component")
    assert np.array_equal(back["label"].to_numpy(),
                          res.to_pandas()["label"].to_numpy())
    # write to external sink
    out = modes.write(res, str(tmp_path / "export"))
    assert len(rd.read_parquet(out).to_pandas()) == g.n
    assert catalog.drop("repograph")
    assert not catalog.exists("repograph")


def test_degree_centrality_parquet_and_arrays(ray_session, tmp_path):
    src, dst, w = random_graph(50, 300, seed=5, weighted=True)
    g = PartitionedGraph.from_arrays(50, src, dst, w)
    out = degree_centrality(g, orientation="natural")
    assert np.array_equal(out["score"].to_numpy(),
                          np.bincount(src, minlength=50).astype(float))
    out = degree_centrality(g, orientation="undirected", weighted=True)
    expected = (np.bincount(src, weights=w, minlength=50)
                + np.bincount(dst, weights=w, minlength=50))
    assert np.allclose(out["score"].to_numpy(), expected)