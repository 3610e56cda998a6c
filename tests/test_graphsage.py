"""GraphSage: gradient-check, structure quality, determinism, catalog
roundtrip (reference semantics: GraphSageModelTrainer / MeanAggregator /
GraphSageLoss / GraphSageEmbeddingsGenerator)."""

import numpy as np
import pytest

from graph_data_science_ray.pipelines.graphsage import (
    _forward, _loss_and_grad, _unpack_weights, default_features,
    graphsage_embeddings, graphsage_train)
from graph_data_science_ray.stages.superstep import PartitionedGraph


def _two_cliques(k: int = 8):
    """Two k-cliques bridged by one edge, symmetrized."""
    src, dst = [], []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    src.append(base + i)
                    dst.append(base + j)
    src += [0, k]
    dst += [k, 0]
    return PartitionedGraph.from_arrays(
        2 * k, np.array(src, np.int64), np.array(dst, np.int64))


def test_gradient_check():
    """Analytic weight gradients match finite differences through the
    full forward (mean-agg layers + sigmoid + row-normalize + loss)."""
    rng = np.random.default_rng(0)
    b, f, dim = 3, 4, 5
    # synthetic batch structure: 3b level-0 rows, ragged neighborhoods
    counts0 = rng.integers(0, 3, size=3 * b)
    m1 = 14
    adj0 = (rng.integers(0, m1, size=3 * b),
            rng.integers(0, m1, size=int(counts0.sum())), counts0)
    counts1 = rng.integers(0, 4, size=m1)
    m2 = 20
    adj1 = (rng.integers(0, m2, size=m1),
            rng.integers(0, m2, size=int(counts1.sum())), counts1)
    batch = {"b": b, "X": rng.normal(size=(m2, f)),
             "adj": [adj0, adj1]}
    Ws = [rng.normal(scale=0.5, size=(dim, f)),
          rng.normal(scale=0.5, size=(dim, dim))]
    _, grads = _loss_and_grad(batch, Ws, "sigmoid", 2.0)
    eps = 1e-6
    for j in range(2):
        for _ in range(10):
            r = rng.integers(0, Ws[j].shape[0])
            c = rng.integers(0, Ws[j].shape[1])
            Wp = [W.copy() for W in Ws]
            Wm = [W.copy() for W in Ws]
            Wp[j][r, c] += eps
            Wm[j][r, c] -= eps
            lp, _ = _loss_and_grad(batch, Wp, "sigmoid", 2.0)
            lm, _ = _loss_and_grad(batch, Wm, "sigmoid", 2.0)
            num = (lp - lm) / (2 * eps)
            assert abs(num - grads[j][r, c]) < 1e-4 * max(1.0, abs(num))


def test_relu_gradient_check():
    rng = np.random.default_rng(3)
    b, f, dim = 2, 3, 4
    counts0 = rng.integers(1, 3, size=3 * b)
    adj0 = (rng.integers(0, 9, size=3 * b),
            rng.integers(0, 9, size=int(counts0.sum())), counts0)
    batch = {"b": b, "X": rng.normal(size=(9, f)), "adj": [adj0]}
    Ws = [rng.normal(scale=0.5, size=(dim, f))]
    _, grads = _loss_and_grad(batch, Ws, "relu", 1.0)
    eps = 1e-6
    for _ in range(10):
        r = rng.integers(0, dim)
        c = rng.integers(0, f)
        Wp = [Ws[0].copy()]
        Wm = [Ws[0].copy()]
        Wp[0][r, c] += eps
        Wm[0][r, c] -= eps
        lp, _ = _loss_and_grad(batch, Wp, "relu", 1.0)
        lm, _ = _loss_and_grad(batch, Wm, "relu", 1.0)
        num = (lp - lm) / (2 * eps)
        assert abs(num - grads[0][r, c]) < 1e-4 * max(1.0, abs(num))


def test_embeddings_normalized_and_structured():
    g = _two_cliques(8)
    feats = default_features(g)
    model = graphsage_train(g, feats, embedding_dim=8,
                            sample_sizes=(5, 3), epochs=3,
                            max_iterations=8, batch_size=8, seed=1)
    df = graphsage_embeddings(g, feats, model)
    assert len(df) == g.n
    E = np.stack(df.sort_values("vid")["emb"].to_numpy())
    norms = np.linalg.norm(E, axis=1)
    assert np.allclose(norms[norms > 0], 1.0, atol=1e-9)
    assert len(model["epoch_losses"]) >= 1
    assert np.isfinite(model["epoch_losses"]).all()


def test_determinism():
    g = _two_cliques(5)
    feats = default_features(g)
    m1 = graphsage_train(g, feats, embedding_dim=6, sample_sizes=(4,),
                         epochs=1, max_iterations=3, batch_size=5, seed=7)
    m2 = graphsage_train(g, feats, embedding_dim=6, sample_sizes=(4,),
                         epochs=1, max_iterations=3, batch_size=5, seed=7)
    assert np.array_equal(m1["weights"], m2["weights"])
    e1 = graphsage_embeddings(g, feats, m1)
    e2 = graphsage_embeddings(g, feats, m2)
    assert np.array_equal(np.stack(e1["emb"].to_numpy()),
                          np.stack(e2["emb"].to_numpy()))


def test_catalog_roundtrip(tmp_path):
    from graph_data_science_ray.pipelines.link_prediction import ModelCatalog
    g = _two_cliques(4)
    feats = default_features(g)
    model = graphsage_train(g, feats, embedding_dim=4, sample_sizes=(3,),
                            epochs=1, max_iterations=2, batch_size=4,
                            seed=2)
    cat = ModelCatalog(str(tmp_path))
    cat.store("sage", model)
    loaded = cat.load("sage")
    assert np.allclose(loaded["weights"], model["weights"])
    assert [tuple(s) for s in loaded["shapes"]] == \
        [tuple(s) for s in model["shapes"]]
    assert _unpack_weights(loaded)[0].shape == (4, feats.shape[1])
    e1 = graphsage_embeddings(g, feats, model)
    e2 = graphsage_embeddings(g, feats, loaded)
    assert np.allclose(np.stack(e1["emb"].to_numpy()),
                       np.stack(e2["emb"].to_numpy()))


def test_forward_mean_includes_self():
    """One node, one neighbor: the aggregated mean must be
    (h_self + h_nbr) / 2 (MultiMean closed-neighborhood semantics)."""
    X = np.array([[2.0], [4.0]])
    adj = (np.array([0]), np.array([1]), np.array([1]))
    W = [np.array([[1.0]])]
    E, _, caches = _forward({"b": 1, "X": X, "adj": [adj]}, W, "sigmoid")
    _, M, _, _ = caches[0]
    assert np.allclose(M, [[3.0]])


def test_pool_gradient_check():
    """Analytic gradients for the max-pooling aggregator match finite
    differences (incl. the tie-split max routing with duplicate sampled
    neighbors)."""
    from graph_data_science_ray.pipelines.graphsage import _loss_and_grad
    rng = np.random.default_rng(7)
    b, f, dim = 3, 4, 5
    counts0 = rng.integers(0, 3, size=3 * b)
    m1 = 14
    nbr0 = rng.integers(0, m1, size=int(counts0.sum()))
    if len(nbr0) >= 2:
        nbr0[1] = nbr0[0]   # force a duplicate neighbor (max tie)
    adj0 = (rng.integers(0, m1, size=3 * b), nbr0, counts0)
    counts1 = rng.integers(0, 4, size=m1)
    m2 = 20
    adj1 = (rng.integers(0, m2, size=m1),
            rng.integers(0, m2, size=int(counts1.sum())), counts1)
    batch = {"b": b, "X": rng.normal(size=(m2, f)),
             "adj": [adj0, adj1]}
    Ws = []
    for cols in (f, dim):
        Ws.append(rng.normal(scale=0.5, size=(dim, cols)))   # W_pool
        Ws.append(rng.normal(scale=0.2, size=dim))            # b_pool
        Ws.append(rng.normal(scale=0.5, size=(dim, cols)))   # W_self
        Ws.append(rng.normal(scale=0.5, size=(dim, dim)))    # W_neigh
    _, grads = _loss_and_grad(batch, Ws, "sigmoid", 2.0, "pool")
    eps = 1e-6
    for j in range(len(Ws)):
        for _ in range(6):
            idx = tuple(rng.integers(0, s) for s in Ws[j].shape)
            Wp = [W.copy() for W in Ws]
            Wm = [W.copy() for W in Ws]
            Wp[j][idx] += eps
            Wm[j][idx] -= eps
            lp, _ = _loss_and_grad(batch, Wp, "sigmoid", 2.0, "pool")
            lm, _ = _loss_and_grad(batch, Wm, "sigmoid", 2.0, "pool")
            num = (lp - lm) / (2 * eps)
            assert abs(num - grads[j][idx]) < 1e-4 * max(1.0, abs(num)), \
                (j, idx, num, grads[j][idx])


def test_pool_train_and_embed(ray_session):
    """Pool-aggregator training runs end-to-end; embeddings are
    normalized, deterministic, and cluster by clique."""
    g = _two_cliques(6)
    feats = default_features(g)
    model = graphsage_train(g, feats, embedding_dim=8, sample_sizes=(5, 3),
                            epochs=2, max_iterations=4, batch_size=6,
                            seed=3, aggregator="pool")
    assert model["aggregator"] == "pool"
    df = graphsage_embeddings(g, feats, model)
    E = np.stack(df.sort_values("vid")["emb"].to_numpy())
    np.testing.assert_allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-9)
    df2 = graphsage_embeddings(g, feats, model)
    np.testing.assert_array_equal(
        np.stack(df2.sort_values("vid")["emb"].to_numpy()), E)
    assert np.isfinite(model["epoch_losses"]).all()
