"""Node-classification pipeline — parity with
gds.beta.pipeline.nodeClassification (pipeline/.../nodePipeline/:
node-property feature steps → node split → multiclass logistic
regression → accuracy/holdout metrics; models live in the same
catalog as link prediction).

Ray-Data shape mirrors link_prediction: FastRP features against the
broadcast matrix, deterministic hash-based node holdout, and
synchronous distributed softmax-regression gradient descent (per-batch
[d+1, k] partials summed per epoch)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

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
    ds = rd.from_arrow(pa.table({
        "vid": vids, "y": y_all.astype(np.int64), "test": test}))
    emb_ref = ray.put(emb)

    d = dim
    W = np.zeros((d + 1, k))
    n_train = int((~test).sum())
    for _ in range(epochs):
        wref = ray.put(W)

        def grad(t: pa.Table) -> pa.Table:
            Wl = ray.get(wref)
            E = ray.get(emb_ref)
            m = ~t["test"].to_numpy(zero_copy_only=False)
            v = t["vid"].to_numpy(zero_copy_only=False)[m]
            y = t["y"].to_numpy(zero_copy_only=False)[m]
            X = E[v]
            P = _softmax(X @ Wl[:-1] + Wl[-1])
            P[np.arange(len(y)), y] -= 1.0
            g = np.vstack([X.T @ P, P.sum(axis=0)])
            return pa.table({"g": pa.FixedSizeListArray.from_arrays(
                pa.array(g.reshape(-1)), g.size)})

        parts = ds.map_batches(grad, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        gsum = np.sum(np.stack([np.asarray(v) for v in parts["g"]]),
                      axis=0).reshape(d + 1, k)
        gsum[:-1] += l2_penalty * W[:-1] * n_train
        W = W - learning_rate * gsum / max(1, n_train)

    # held-out accuracy, distributed
    wref = ray.put(W)

    def score(t: pa.Table) -> pa.Table:
        Wl = ray.get(wref)
        E = ray.get(emb_ref)
        m = t["test"].to_numpy(zero_copy_only=False)
        v = t["vid"].to_numpy(zero_copy_only=False)[m]
        y = t["y"].to_numpy(zero_copy_only=False)[m]
        pred = np.argmax(E[v] @ Wl[:-1] + Wl[-1], axis=1)
        return pa.table({"correct": [int((pred == y).sum())],
                         "total": [int(len(y))]})

    s = ds.map_batches(score, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    total = int(s["total"].sum())
    acc = float(s["correct"].sum()) / total if total else 0.0
    return {"weights": W, "classes": classes.tolist(),
            "test_accuracy": acc, "dim": dim}
