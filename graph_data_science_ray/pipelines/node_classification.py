"""Node-classification pipeline — parity with
gds.beta.pipeline.nodeClassification (pipeline/.../nodePipeline/:
node-property feature steps → node split → multiclass logistic
regression → accuracy/holdout metrics; models live in the same
catalog as link prediction).

Ray-Data shape (r4): FastRP features sliced into the shared
ml_pipeline shard-actor pool (each shard holds its vid-range rows
across every epoch; one epoch = one round of small RPCs with
fixed-order partial sums) — no per-epoch Dataset job, no whole-matrix
broadcast pulled per task."""

from __future__ import annotations

import numpy as np

from ..stages.superstep import PartitionedGraph


def _hash_u01(x: np.ndarray, salt: int) -> np.ndarray:
    x = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(salt)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def train_node_classification(
    graph: PartitionedGraph,
    labels: np.ndarray,
    label_mask: np.ndarray | None = None,
    dim: int = 32,
    holdout_fraction: float = 0.3,
    epochs: int = 60,
    learning_rate: float = 0.5,
    l2_penalty: float = 1e-4,
    seed: int = 42,
) -> dict:
    """labels: int array over vids (label_mask selects labeled vids;
    default: all). Returns {weights [d+1, k], classes, test_accuracy}."""
    from .fastrp import fastrp
    n = graph.n
    if label_mask is None:
        label_mask = np.ones(n, dtype=bool)
    emb_df = fastrp(graph, dim=dim, iteration_weights=[0.0, 1.0, 1.0],
                    seed=seed)
    emb = np.zeros((n, dim))
    emb[emb_df["vid"].to_numpy()] = np.stack(emb_df["emb"].to_numpy())

    vids = np.flatnonzero(label_mask)
    classes, y_all = np.unique(labels[vids], return_inverse=True)
    k = len(classes)
    test = _hash_u01(vids, seed + 99) < holdout_fraction
    n_train = int((~test).sum())
    grp = np.where(test, -1, 0).astype(np.int64)
    from .ml_pipeline import _nc_accuracy, _nc_fit, _NCShardPool
    pool = _NCShardPool(vids, y_all.astype(np.int64), grp, emb[vids])
    try:
        model = _nc_fit(pool, dim, k, "logisticRegression",
                        {"epochs": epochs,
                         "learning_rate": learning_rate,
                         "l2_penalty": l2_penalty},
                        -1, n_train, seed)
        acc = _nc_accuracy(pool, model, -1)
    finally:
        pool.shutdown()
    return {"weights": model["weights"], "classes": classes.tolist(),
            "test_accuracy": acc, "dim": dim}
