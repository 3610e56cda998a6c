"""Repo-table synthesis → edge derivation → graph build, end-to-end,
including the per-row content sha256 invariant (north rule)."""

import glob
import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from graph_data_science_ray import oracle as orc
from graph_data_science_ray.sources.edge_derivation import file_digests
from graph_data_science_ray.sources.repo_source import repo_name, write_repo_table
from graph_data_science_ray.pipelines.graph_pipeline import build_graph_from_repos
from graph_data_science_ray.pipelines.pagerank import pagerank
from graph_data_science_ray.pipelines.wcc import wcc


N_REPOS = 300


@pytest.fixture(scope="module")
def repo_fixture(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("repo_graph")
    path, tsrc, tdst = write_repo_table(str(base / "repos.parquet"), N_REPOS,
                                        seed=42)
    graph = build_graph_from_repos(path, str(base / "graph"), num_parts=4)
    # generator indices -> sorted-name vids
    names = sorted(repo_name(i) for i in range(N_REPOS))
    vid_of = {nm: i for i, nm in enumerate(names)}
    idx2vid = np.array([vid_of[repo_name(i)] for i in range(N_REPOS)])
    return path, graph, idx2vid[tsrc], idx2vid[tdst]


def test_vertices_and_edge_set(repo_fixture):
    path, graph, esrc, edst = repo_fixture
    assert graph.n == N_REPOS
    parts = []
    for f in glob.glob(f"{graph.path}/out/part=*/*.parquet"):
        t = pq.read_table(f)
        parts.append(np.stack([t["src"].to_numpy(), t["dst"].to_numpy()], axis=1))
    built = np.unique(np.concatenate(parts), axis=0)
    want = np.unique(np.stack([esrc, edst], axis=1), axis=0)
    assert np.array_equal(built, want)
    # out and in layouts carry the same edge multiset
    parts = []
    for f in glob.glob(f"{graph.path}/in/part=*/*.parquet"):
        t = pq.read_table(f)
        parts.append(np.stack([t["src"].to_numpy(), t["dst"].to_numpy()], axis=1))
    built_in = np.unique(np.concatenate(parts), axis=0)
    assert np.array_equal(built_in, want)


def test_sha256_invariant(repo_fixture):
    """Pipeline-computed sha256 per row equals independent hashing of the
    source table (content survives the derivation end-to-end)."""
    path, graph, _, _ = repo_fixture
    src_table = pq.read_table(path)
    expected = {}
    for repo, p, commit, content in zip(
            src_table["repo"].to_pylist(), src_table["path"].to_pylist(),
            src_table["commit"].to_pylist(), src_table["content"].to_pylist()):
        expected[(repo, p, commit)] = hashlib.sha256(content.encode()).hexdigest()
    got = file_digests(rd.read_parquet(path)).to_pandas()
    assert len(got) == len(expected)
    for row in got.itertuples():
        assert expected[(row.repo, row.path, row.commit)] == row.sha256
    # and the aggregate digest is recorded in the manifest lineage
    import json, os
    with open(os.path.join(graph.path, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["lineage"]["content_sha256_xor"]


def test_pagerank_on_built_graph(repo_fixture):
    _, graph, esrc, edst = repo_fixture
    expected, _, _ = orc.pagerank(N_REPOS, esrc, edst, max_iterations=20)
    res = pagerank(graph, max_iterations=20)
    assert np.allclose(res.to_pandas()["rank"].to_numpy(), expected, atol=1e-9)


def test_wcc_on_built_graph(repo_fixture):
    _, graph, esrc, edst = repo_fixture
    expected = orc.wcc(N_REPOS, esrc, edst)
    res = wcc(graph)
    assert np.array_equal(res.to_pandas()["label"].to_numpy(), expected)


def test_count_aggregation(ray_session, tmp_path):
    """aggregation='count' gives parallel-import multiplicity as weight."""
    path, _, _ = write_repo_table(str(tmp_path / "repos.parquet"), 50, seed=1)
    g = build_graph_from_repos(path, str(tmp_path / "graph"), num_parts=2,
                               aggregation="count")
    assert g.weighted
    t = pq.read_table(glob.glob(f"{g.path}/out/part=*/*.parquet")[0])
    assert "weight" in t.column_names
    assert (t["weight"].to_numpy() >= 1.0).all()


def test_distributed_id_assignment_matches_driver_path(
        ray_session, tmp_path):
    """build_graph(distributed_ids=True) — the no-driver-name-array
    IdMap (sort-ranked vids + hash-bucketed encode joins) — must
    produce the identical graph."""
    from graph_data_science_ray.sources.edge_derivation import derive_edges
    from graph_data_science_ray.sources.graph_build import build_graph
    path, _, _ = write_repo_table(str(tmp_path / "repos.parquet"), 120,
                                  seed=9)
    cols = ["repo", "path", "commit", "content"]
    edges_a = derive_edges(rd.read_parquet(path, columns=cols))
    ga = build_graph(edges_a, str(tmp_path / "ga"), num_parts=3)
    edges_b = derive_edges(rd.read_parquet(path, columns=cols))
    gb = build_graph(edges_b, str(tmp_path / "gb"), num_parts=3,
                     distributed_ids=True)
    assert gb.n == ga.n and gb.num_edges == ga.num_edges

    def edge_set(g):
        parts = []
        for f in glob.glob(f"{g.path}/out/part=*/*.parquet"):
            t = pq.read_table(f)
            parts.append(np.stack([t["src"].to_numpy(),
                                   t["dst"].to_numpy()], axis=1))
        return np.unique(np.concatenate(parts), axis=0)

    assert np.array_equal(edge_set(ga), edge_set(gb))
    # vertices directory form reads back with identical (vid, repo) rows
    va = pq.read_table(f"{ga.path}/vertices.parquet").to_pandas()
    vb = pq.read_table(f"{gb.path}/vertices.parquet").to_pandas()
    vb = vb[["vid", "repo"]].sort_values("vid").reset_index(drop=True)
    assert va.equals(vb)


def test_incremental_graph_builder(ray_session, tmp_path):
    """GraphBuilder (Cypher-aggregation analogue): mixed array/Dataset
    batches, single build pass, parity with the direct path."""
    import pyarrow as pa

    from graph_data_science_ray.sources.graph_build import (
        GraphBuilder, build_int_graph)
    from graph_data_science_ray.pipelines.pagerank import pagerank

    b = GraphBuilder(symmetrize=True)
    b.add_edges([0, 1, 2], [1, 2, 3])
    b.add_edges_dataset(rd.from_arrow(pa.table(
        {"src": np.array([3, 4], dtype=np.int64),
         "dst": np.array([4, 0], dtype=np.int64)})))
    b.add_edges([2], [0])
    g = b.build(str(tmp_path / "inc"), num_parts=2)   # n inferred = 5
    assert g.n == 5

    all_src = np.array([0, 1, 2, 3, 4, 2], dtype=np.int64)
    all_dst = np.array([1, 2, 3, 4, 0, 0], dtype=np.int64)
    g2 = build_int_graph(
        rd.from_arrow(pa.table({"src": all_src, "dst": all_dst})),
        str(tmp_path / "direct"), 5, 2, symmetrize=True)
    pr1 = pagerank(g, max_iterations=10).to_pandas().sort_values("vid")
    pr2 = pagerank(g2, max_iterations=10).to_pandas().sort_values("vid")
    np.testing.assert_allclose(pr1["rank"].to_numpy(),
                               pr2["rank"].to_numpy(), rtol=1e-12)


def test_min_max_edge_aggregation(ray_session, tmp_path):
    """Parallel-edge MIN/MAX weight folding at load (reference
    Aggregation.MIN/MAX)."""
    import pyarrow as pa

    from graph_data_science_ray.sources.graph_build import build_int_graph
    src = np.array([0, 0, 0, 1], dtype=np.int64)
    dst = np.array([1, 1, 1, 2], dtype=np.int64)
    w = np.array([3.0, 1.0, 2.0, 5.0])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w}))
    for how, expect01 in (("min", 1.0), ("max", 3.0)):
        g = build_int_graph(ds, str(tmp_path / how), 3, 2,
                            aggregation=how, weight_col="w")
        assert g.weighted
        rows = []
        for f in glob.glob(f"{g.path}/out/part=*/*.parquet"):
            rows.append(pq.read_table(f).to_pandas())
        import pandas as pd
        edges = pd.concat(rows)
        e01 = edges[(edges["src"] == 0) & (edges["dst"] == 1)]
        assert len(e01) == 1 and e01["weight"].iloc[0] == expect01
        e12 = edges[(edges["src"] == 1) & (edges["dst"] == 2)]
        assert e12["weight"].iloc[0] == 5.0


def test_csv_graph_roundtrip(ray_session, tmp_path):
    import numpy as np

    from graph_data_science_ray.sources import csv_io
    from graph_data_science_ray.stages.superstep import PartitionedGraph

    src = np.array([0, 0, 1, 2, 4], dtype=np.int64)
    dst = np.array([1, 2, 3, 3, 5], dtype=np.int64)
    w = np.array([1.0, 2.0, 0.5, 3.0, 1.5])
    g = PartitionedGraph.from_arrays(6, src, dst, w)
    hdr = csv_io.export_graph_csv(g, str(tmp_path / "csv"))
    assert hdr["n"] == 6 and hdr["weighted"]
    g2 = csv_io.import_graph_csv(str(tmp_path / "csv"),
                                 str(tmp_path / "graph"), num_parts=2)
    assert g2.n == 6 and g2.weighted
    e = (g2.edges_dataset(("src", "dst", "weight"), flow="out")
         .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    assert e["src"].tolist() == src.tolist()
    assert e["dst"].tolist() == dst.tolist()
    assert e["weight"].tolist() == w.tolist()


def test_edge_list_readers(ray_session, tmp_path):
    import json as _json

    from graph_data_science_ray.sources import csv_io

    rows = [{"u": 0, "v": 1, "w": 1.5}, {"u": 1, "v": 2, "w": 2.0}]
    jpath = tmp_path / "edges.jsonl"
    jpath.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    cpath = tmp_path / "edges.csv"
    cpath.write_text("u,v,w\n0,1,1.5\n1,2,2.0\n")
    for reader, path in ((csv_io.edge_list_from_json, jpath),
                         (csv_io.edge_list_from_csv, cpath)):
        df = (reader([str(path)], src_col="u", dst_col="v", weight_col="w")
              .to_pandas().sort_values("src").reset_index(drop=True))
        assert df["src"].tolist() == [0, 1]
        assert df["dst"].tolist() == [1, 2]
        assert df["weight"].tolist() == [1.5, 2.0]
        assert str(df["src"].dtype) == "int64"
