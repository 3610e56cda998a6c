"""FastRP (vector-message engine path) and NN-Descent KNN."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.functions.ann import brute_force_topk
from graph_data_science_ray.functions.nn_descent import knn_descent
from graph_data_science_ray.pipelines.fastrp import (fastrp,
                                                     fastrp_reference)
from graph_data_science_ray.stages.superstep import PartitionedGraph


@pytest.fixture(scope="module")
def sym_graph(ray_session):
    rng = np.random.default_rng(11)
    n = 150
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    return n, s, d


def test_fastrp_matches_numpy_reference(sym_graph):
    n, s, d = sym_graph
    g = PartitionedGraph.from_arrays(n, s, d)
    df = fastrp(g, dim=16, iteration_weights=[0.0, 1.0, 0.5], num_parts=4)
    emb = np.stack(df.sort_values("vid")["emb"].to_numpy())
    ref = fastrp_reference(n, s, d, 16, [0.0, 1.0, 0.5])
    assert emb.shape == (n, 16)
    assert np.abs(emb - ref).max() < 1e-12


def test_fastrp_weighted_normalized(sym_graph):
    n, s, d = sym_graph
    rng = np.random.default_rng(5)
    w = rng.random(len(s)) + 0.1
    g = PartitionedGraph.from_arrays(n, s, d, w)
    df = fastrp(g, dim=8, iteration_weights=[1.0, 1.0],
                normalization_strength=-0.5, weighted=True, num_parts=4)
    emb = np.stack(df.sort_values("vid")["emb"].to_numpy())
    ref = fastrp_reference(n, s, d, 8, [1.0, 1.0],
                           normalization_strength=-0.5, weight=w)
    assert np.abs(emb - ref).max() < 1e-12


def test_fastrp_partition_invariant(sym_graph):
    n, s, d = sym_graph
    g = PartitionedGraph.from_arrays(n, s, d)
    a = fastrp(g, dim=8, iteration_weights=[1.0], num_parts=2)
    b = fastrp(g, dim=8, iteration_weights=[1.0], num_parts=4)
    ea = np.stack(a.sort_values("vid")["emb"].to_numpy())
    eb = np.stack(b.sort_values("vid")["emb"].to_numpy())
    assert np.abs(ea - eb).max() < 1e-12


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    rng = np.random.default_rng(3)
    n, dim = 300, 16
    vecs = rng.standard_normal((n, dim))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float64())),
    }))
    return ds, vecs


def test_knn_descent_recall(vec_ds):
    ds, vecs = vec_ds
    n, k = len(vecs), 8
    approx = knn_descent(ds, k=k, max_iterations=6, delta=0.02)
    assert set(approx["node"]) == set(range(n))
    assert (approx.groupby("node").size() == k).all()
    assert (approx["node"] != approx["neighbor"]).all()
    bf = brute_force_topk(ds, vecs, k=k + 1)
    bf = bf[bf["query_id"] != bf["vec_id"]]
    bf = (bf.sort_values(["query_id", "score", "vec_id"],
                         ascending=[True, False, True])
          .groupby("query_id").head(k))
    hits = 0
    truth = bf.groupby("query_id")["vec_id"].apply(set)
    for node, grp in approx.groupby("node"):
        hits += len(set(grp["neighbor"]) & truth[node])
    recall = hits / (n * k)
    assert recall >= 0.85, recall


def test_knn_descent_scores_are_exact_cosine(vec_ds):
    ds, vecs = vec_ds
    approx = knn_descent(ds, k=5, max_iterations=4, delta=0.05)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    got = approx.head(50)
    expect = np.einsum("ij,ij->i", norm[got["node"].to_numpy()],
                       norm[got["neighbor"].to_numpy()])
    assert np.allclose(got["score"].to_numpy(), expect, atol=1e-9)
