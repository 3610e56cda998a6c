"""MaxKCut, k-spanning-tree clusters, and Node2Vec embeddings."""

import numpy as np
import pytest

from graph_data_science_ray.stages.superstep import PartitionedGraph


@pytest.fixture(scope="module")
def two_cliques(ray_session):
    """Two 6-cliques joined by a single bridge edge (undirected sym)."""
    n = 12
    edges = []
    for base in (0, 6):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges.append((0, 6))
    e = np.array(edges, dtype=np.int64)
    s = np.concatenate([e[:, 0], e[:, 1]])
    d = np.concatenate([e[:, 1], e[:, 0]])
    return n, s, d


def test_max_k_cut_bipartite(ray_session):
    """On a complete bipartite graph the optimal 2-cut is the
    bipartition — local search must find it exactly."""
    from graph_data_science_ray.pipelines.maxkcut import approx_max_k_cut
    left = np.repeat(np.arange(4, dtype=np.int64), 4)
    right = np.tile(np.arange(4, 8, dtype=np.int64), 4)
    s = np.concatenate([left, right])
    d = np.concatenate([right, left])
    g = PartitionedGraph.from_arrays(8, s, d)
    df, cut = approx_max_k_cut(g, k=2, seed=1)
    lab = df.sort_values("vid")["community"].to_numpy()
    assert len(set(lab[:4])) == 1 and len(set(lab[4:])) == 1
    assert lab[0] != lab[4]
    assert cut == 32.0  # every one of the 16 undirected edges ×2 dirs cut


def test_k_spanning_tree_clusters(ray_session):
    from graph_data_science_ray.pipelines.spanning_tree import (
        k_spanning_tree)
    # chain 0-1-2-3-4-5 with one heavy middle edge → k=2 splits there
    s = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    d = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    w = np.array([1.0, 1.0, 9.0, 1.0, 1.0])
    g = PartitionedGraph.from_arrays(6, s, d, w)
    out = k_spanning_tree(g, k=2)
    c = out.sort_values("vid")["cluster"].to_numpy()
    assert c.tolist() == [0, 0, 0, 3, 3, 3]


def test_link_prediction_pipeline(ray_session, tmp_path):
    """Held-out clique edges must score above random non-edges."""
    from graph_data_science_ray.pipelines.link_prediction import (
        ModelCatalog, train_link_prediction)
    rng = np.random.default_rng(13)
    # three 10-cliques → strong community structure
    n = 30
    edges = []
    for base in (0, 10, 20):
        for i in range(10):
            for j in range(i + 1, 10):
                edges.append((base + i, base + j))
    e = np.array(edges, dtype=np.int64)
    g = PartitionedGraph.from_arrays(n, e[:, 0], e[:, 1])
    model = train_link_prediction(g, dim=16, epochs=40, seed=5)
    assert model["test_auc"] > 0.7, model["test_auc"]
    cat = ModelCatalog(str(tmp_path / "models"))
    cat.store("lp", model)
    assert cat.exists("lp") and cat.list() == ["lp"]
    loaded = cat.load("lp")
    assert np.allclose(loaded["weights"], model["weights"])
    assert loaded["test_auc"] == pytest.approx(model["test_auc"])
    assert cat.drop("lp") and not cat.exists("lp")


def test_node_classification_pipeline(ray_session):
    """Clique membership must be learnable from FastRP features."""
    from graph_data_science_ray.pipelines.node_classification import (
        train_node_classification)
    n = 30
    edges = []
    for base in (0, 10, 20):
        for i in range(10):
            for j in range(i + 1, 10):
                edges.append((base + i, base + j))
    e = np.array(edges, dtype=np.int64)
    s = np.concatenate([e[:, 0], e[:, 1]])
    d = np.concatenate([e[:, 1], e[:, 0]])
    g = PartitionedGraph.from_arrays(n, s, d)
    labels = np.repeat(np.array([7, 3, 5], dtype=np.int64), 10)
    model = train_node_classification(g, labels, dim=16, epochs=60,
                                      seed=2)
    assert model["test_accuracy"] >= 0.8, model["test_accuracy"]
    assert sorted(model["classes"]) == [3, 5, 7]


def test_node2vec_clique_structure(two_cliques):
    """Intra-clique similarity must exceed cross-clique similarity."""
    from graph_data_science_ray.pipelines.node2vec import node2vec
    n, s, d = two_cliques
    g = PartitionedGraph.from_arrays(n, s, d)
    df = node2vec(g, dim=16, walk_length=15, walks_per_node=8, window=4,
                  epochs=4, seed=3)
    emb = np.stack(df.sort_values("vid")["emb"].to_numpy())
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                           1e-12)
    sims = emb @ emb.T
    intra = (np.mean([sims[i, j] for i in range(6) for j in range(6)
                      if i != j])
             + np.mean([sims[i, j] for i in range(6, 12)
                        for j in range(6, 12) if i != j])) / 2
    cross = np.mean(sims[:6, 6:])
    assert intra > cross, (intra, cross)
    # deterministic
    df2 = node2vec(g, dim=16, walk_length=15, walks_per_node=8, window=4,
                   epochs=4, seed=3)
    emb2 = np.stack(df2.sort_values("vid")["emb"].to_numpy())
    assert np.allclose(np.stack(df.sort_values("vid")["emb"].to_numpy()),
                       emb2)


def test_pca_matches_numpy_on_embeddings():
    import numpy as np
    import ray.data as rd
    from graph_data_science_ray.functions.pca import pca_components
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["embedding"])
    r = pca_components(ds, k=5)
    X = np.vstack(ds.to_pandas()["embedding"].to_numpy()).astype(
        np.float64)
    Xc = X - X.mean(axis=0)
    ref = np.linalg.eigvalsh(Xc.T @ Xc / (len(X) - 1))[::-1][:5]
    assert np.allclose(r["eigenvalues"], ref, atol=1e-8)
    assert r["n"] == len(X)
    # components are unit-norm and orthogonal
    C = r["components"]
    assert np.allclose(C @ C.T, np.eye(5), atol=1e-8)


def test_pca_recovers_planted_axis():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.pca import pca_components
    rng = np.random.default_rng(4)
    axis = np.zeros(16)
    axis[3] = 1.0
    X = (rng.normal(0, 10, (600, 1)) * axis
         + rng.normal(0, 0.1, (600, 16)))
    df = pd.DataFrame({"embedding": list(X.astype(np.float32))})
    parts = [d for _, d in df.groupby(np.arange(len(df)) % 5)]
    r = pca_components(rd.from_pandas(parts), k=2)
    top = r["components"][0]
    assert abs(top[3]) > 0.99           # planted axis recovered
    assert top[3] > 0                    # deterministic sign
    assert r["explained_ratio"][0] > 0.9


def test_pca_transform_variance_matches_eigenvalues():
    import numpy as np
    import ray.data as rd
    from graph_data_science_ray.functions.pca import (pca_components,
                                                      pca_transform)
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    X = np.vstack(ds.to_pandas()["embedding"].to_numpy()).astype(
        np.float64)
    r = pca_components(ds, k=3)
    proj = (pca_transform(ds, r["components"], mean=X.mean(axis=0))
            .to_pandas())
    P = np.vstack(proj["projected"].to_numpy()).astype(np.float64)
    # per-axis variance of the projection == the eigenvalues
    assert np.allclose(P.var(axis=0, ddof=1), r["eigenvalues"],
                       rtol=1e-5)
    assert "vec_id" in proj.columns and len(proj) == len(X)
