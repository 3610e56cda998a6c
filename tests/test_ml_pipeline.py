"""Configurable pipeline orchestration + random-forest trainer."""

import numpy as np
import pytest

from graph_data_science_ray.stages.superstep import PartitionedGraph


def three_cliques():
    n = 30
    edges = []
    for base in (0, 10, 20):
        for i in range(10):
            for j in range(i + 1, 10):
                edges.append((base + i, base + j))
    e = np.array(edges, dtype=np.int64)
    s = np.concatenate([e[:, 0], e[:, 1]])
    d = np.concatenate([e[:, 1], e[:, 0]])
    labels = np.repeat(np.array([7, 3, 5], dtype=np.int64), 10)
    return PartitionedGraph.from_arrays(n, s, d), labels


def test_cart_separable():
    from graph_data_science_ray.pipelines.ml_pipeline import (
        _fit_tree, _tree_proba)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 3))
    y = (X[:, 1] > 0.3).astype(np.int64)
    tree = _fit_tree(X, y, 2, max_depth=4, min_split=2,
                     feature_frac=1.0, rng=np.random.default_rng(1))
    pred = np.argmax(_tree_proba(tree, X), axis=1)
    assert (pred == y).mean() > 0.95


def test_forest_multiclass(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml_pipeline import (
        forest_predict_proba, train_random_forest)
    rng = np.random.default_rng(3)
    X = rng.normal(size=(600, 4))
    y = (X[:, 0] > 0).astype(np.int64) + 2 * (X[:, 2] > 0).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "f": pa.FixedSizeListArray.from_arrays(pa.array(X.reshape(-1)), 4),
        "y": y, "row": np.arange(600, dtype=np.int64)}))
    forest = train_random_forest(ds, num_classes=4, trees=8, max_depth=6,
                                 seed=9)
    assert len(forest) == 8
    pred = np.argmax(forest_predict_proba(forest, X), axis=1)
    assert (pred == y).mean() > 0.9
    # deterministic retrain
    forest2 = train_random_forest(ds, num_classes=4, trees=8, max_depth=6,
                                  seed=9)
    pred2 = np.argmax(forest_predict_proba(forest2, X), axis=1)
    assert np.array_equal(pred, pred2)


def test_nc_pipeline_configurable_steps(ray_session):
    from graph_data_science_ray.pipelines.ml_pipeline import (
        NodeClassificationPipeline)
    g, labels = three_cliques()
    pipe = (NodeClassificationPipeline()
            .add_node_property("fastRP", dim=16, seed=2)
            .add_node_property("degree"))
    model = pipe.train(g, labels, seed=2, epochs=60)
    assert model["steps"] == ["fastRP", "degree"]
    assert model["test_accuracy"] >= 0.8, model["test_accuracy"]
    assert sorted(model["classes"]) == [3, 5, 7]


def test_nc_pipeline_random_forest(ray_session):
    from graph_data_science_ray.pipelines.ml_pipeline import (
        NodeClassificationPipeline)
    g, labels = three_cliques()
    pipe = (NodeClassificationPipeline()
            .add_node_property("fastRP", dim=16, seed=2))
    model = pipe.train(g, labels, method="randomForest", seed=2,
                       trees=8, max_depth=6)
    assert model["method"] == "randomForest"
    assert model["test_accuracy"] >= 0.8, model["test_accuracy"]


def test_nc_pipeline_mlp(ray_session):
    from graph_data_science_ray.pipelines.ml_pipeline import (
        NodeClassificationPipeline)
    g, labels = three_cliques()
    pipe = (NodeClassificationPipeline()
            .add_node_property("fastRP", dim=16, seed=2))
    model = pipe.train(g, labels, method="mlp", seed=2,
                       hidden=16, epochs=60)
    assert model["method"] == "mlp"
    assert "mlp" in model["model"]
    assert model["test_accuracy"] >= 0.8, model["test_accuracy"]
    # deterministic retrain
    model2 = pipe.train(g, labels, method="mlp", seed=2,
                        hidden=16, epochs=60)
    for a, b in zip(model["model"]["mlp"], model2["model"]["mlp"]):
        assert np.array_equal(a, b)


def test_lp_pipeline_random_forest(ray_session):
    from graph_data_science_ray.pipelines.ml_pipeline import (
        LinkPredictionPipeline)
    # two dense cliques: held-out intra-clique edges should score high
    n = 40
    edges = []
    for base in (0, 20):
        for i in range(20):
            for j in range(i + 1, 20):
                edges.append((base + i, base + j))
    e = np.array(edges, dtype=np.int64)
    g = PartitionedGraph.from_arrays(n, e[:, 0], e[:, 1])
    pipe = (LinkPredictionPipeline()
            .add_node_property("fastRP", dim=16, seed=5)
            .add_feature("hadamard"))
    model = pipe.train(g, method="randomForest", seed=5, trees=8,
                       max_depth=6)
    assert model["test_auc"] > 0.7, model["test_auc"]


def test_forest_model_catalog_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.pipelines.link_prediction import ModelCatalog
    from graph_data_science_ray.pipelines.ml_pipeline import (
        forest_predict_proba, train_random_forest)
    rng = np.random.default_rng(11)
    X = rng.normal(size=(200, 3))
    y = (X[:, 0] > 0).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "f": pa.FixedSizeListArray.from_arrays(pa.array(X.reshape(-1)), 3),
        "y": y, "row": np.arange(200, dtype=np.int64)}))
    forest = train_random_forest(ds, num_classes=2, trees=4, max_depth=4,
                                 seed=1)
    cat = ModelCatalog(str(tmp_path))
    cat.store("rf", {"forest": forest, "method": "randomForest",
                     "test_accuracy": 0.9})
    back = cat.load("rf")
    assert back["method"] == "randomForest"
    assert len(back["forest"]) == 4
    np.testing.assert_array_equal(
        forest_predict_proba(back["forest"], X),
        forest_predict_proba(forest, X))


def test_unknown_step_rejected():
    from graph_data_science_ray.pipelines.ml_pipeline import (
        NodeClassificationPipeline)
    with pytest.raises(ValueError):
        NodeClassificationPipeline().add_node_property("nope")


def test_random_search_space():
    from graph_data_science_ray.pipelines.ml_pipeline import random_search
    cands = random_search({
        "method": "logisticRegression",
        "epochs": 40,
        "learning_rate": {"range": [1e-3, 1.0], "log": True},
        "trees": {"range": [4, 16], "int": True},
    }, trials=8, seed=5)
    assert len(cands) == 8
    for method, cfg in cands:
        assert method == "logisticRegression"
        assert cfg["epochs"] == 40
        assert 1e-3 <= cfg["learning_rate"] <= 1.0
        assert isinstance(cfg["trees"], int) and 4 <= cfg["trees"] <= 16
    # seeded determinism
    assert cands == random_search({
        "method": "logisticRegression",
        "epochs": 40,
        "learning_rate": {"range": [1e-3, 1.0], "log": True},
        "trees": {"range": [4, 16], "int": True},
    }, trials=8, seed=5)


def test_nc_shard_trainer_matches_numpy_replica(ray_session):
    """The shard-actor trainer (r4: per-vid-range shards held across
    epochs, partials summed in fixed shard order) must match an
    in-memory NumPy replica of the same computation — the distributed
    machinery adds no nondeterminism — and repeat runs must be
    byte-identical."""
    from graph_data_science_ray.pipelines.ml_pipeline import (
        NodeClassificationPipeline)
    from graph_data_science_ray.pipelines.node_classification import (
        _hash_u01, _softmax)
    g, labels = three_cliques()
    pipe = (NodeClassificationPipeline()
            .add_node_property("fastRP", dim=16, seed=2))
    m1 = pipe.train(g, labels, seed=2, epochs=40)
    m2 = pipe.train(g, labels, seed=2, epochs=40)
    W1 = m1["model"]["weights"]
    assert np.array_equal(W1, m2["model"]["weights"])

    # NumPy replica: same features, same split, same per-shard partial
    # structure (single shard at this size), same update expressions
    from graph_data_science_ray.pipelines.ml_pipeline import (
        compute_node_properties)
    F = compute_node_properties(g, pipe.node_property_steps)
    vids = np.arange(g.n)
    classes, y = np.unique(labels, return_inverse=True)
    test = _hash_u01(vids, 2 + 99) < 0.3
    grp = (_hash_u01(vids, 2 + 7) * 1).astype(np.int64)
    grp[test] = -1
    X = F[vids][grp >= 0]
    yy = y[grp >= 0]
    n_train = int((grp >= 0).sum())
    W = np.zeros((F.shape[1] + 1, len(classes)))
    for _ in range(40):
        P = _softmax(X @ W[:-1] + W[-1])
        P[np.arange(len(yy)), yy] -= 1.0
        gsum = np.vstack([X.T @ P, P.sum(axis=0)])
        gsum[:-1] += 1e-4 * W[:-1] * n_train
        W = W - 0.5 * gsum / max(1, n_train)
    np.testing.assert_allclose(W1, W, rtol=1e-12, atol=1e-15)


def test_nc_model_selection_picks_better_candidate(ray_session):
    """CV selection must prefer a real trainer over a 0-epoch dud
    (all-zero weights predict class 0 for everything)."""
    from graph_data_science_ray.pipelines.ml_pipeline import (
        NodeClassificationPipeline)
    g, labels = three_cliques()
    pipe = (NodeClassificationPipeline()
            .add_node_property("fastRP", dim=16, seed=2))
    out = pipe.train_with_selection(
        g, labels,
        candidates=[("logisticRegression", {"epochs": 0}),
                    ("logisticRegression", {"epochs": 60}),
                    ("randomForest", {"trees": 8, "max_depth": 6})],
        folds=3, seed=2)
    assert out["best_index"] != 0
    assert len(out["validation_scores"]) == 3
    assert out["validation_scores"][out["best_index"]] == max(
        out["validation_scores"])
    assert out["test_accuracy"] >= 0.8, out
    assert out["candidates"] == ["logisticRegression",
                                 "logisticRegression", "randomForest"]
