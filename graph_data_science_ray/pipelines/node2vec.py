"""Node2Vec — parity with gds.beta.node2vec
(embeddings/node2vec/Node2Vec.java + Node2VecModel.java: biased
second-order random walks → skip-gram with negative sampling).

Ray-Data shape:
  1. walks come from ``pipelines.walks.random_walks_ds`` (the
     p/q-biased shard-routed walker — a Dataset end-to-end);
  2. (center, context) training pairs are a distributed window
     expansion (``walks.walk_window_pairs``: walk_id-bucketed
     map_groups; the pair table never lands on the driver);
  3. training is SYNCHRONOUS data-parallel SGD: each epoch broadcasts
     the current (center, context) embedding matrices, map_batches
     computes per-batch gradient PARTIALS (compact per-touched-row
     sums), a bucketed groupby-sum combines them, and the driver
     applies the update with the reference's linear learning-rate decay.
     The reference trains asynchronously (hogwild); synchronous SGD
     reaches the same objective deterministically — embeddings are
     checked for neighborhood-structure quality, not bitwise parity.
Negative samples draw from the unigram^0.75 distribution like the
reference, hash-seeded per (pair, epoch) so runs are reproducible."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.superstep import PartitionedGraph


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


def _hash_u01(x: np.ndarray, salt: int) -> np.ndarray:
    x = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(salt)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)




def node2vec(
    graph: PartitionedGraph,
    dim: int = 32,
    walk_length: int = 20,
    walks_per_node: int = 4,
    window: int = 5,
    return_factor: float = 1.0,
    in_out_factor: float = 1.0,
    negative_samples: int = 5,
    epochs: int = 3,
    learning_rate: float = 0.025,
    min_learning_rate: float = 0.0001,
    seed: int = 42,
) -> pd.DataFrame:
    """(vid, emb) skip-gram embeddings over p/q-biased walks."""
    from .walks import random_walks_ds, walk_window_pairs
    n = graph.n
    walks_ds = random_walks_ds(graph, walk_length=walk_length,
                               walks_per_node=walks_per_node, seed=seed,
                               return_factor=return_factor,
                               in_out_factor=in_out_factor)
    # distributed window expansion: walks bucket by walk_id, pairs stay
    # a Dataset; pair_id is a deterministic (walk, step, offset) code so
    # negative sampling reproduces under any partitioning
    pairs_ds = walk_window_pairs(
        walks_ds, window, walk_length).select_columns(
        ["center", "context", "pair_id"]).materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                             "emb": [np.zeros(dim)] * n})
    # unigram^0.75 negative-sampling table (cumulative, broadcast):
    # distributed compact partial bincounts over the pair table
    def _freq_partial(t: pa.Table) -> pa.Table:
        c = t["center"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table({"vid": u, "cnt": cnt})

    fp = pairs_ds.map_batches(_freq_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    freq = np.zeros(n)
    np.add.at(freq, fp["vid"].to_numpy(np.int64),
              fp["cnt"].to_numpy(np.float64))
    freq **= 0.75
    cum = np.cumsum(freq / freq.sum())
    cum_ref = ray.put(cum)

    rng = np.random.default_rng(seed)
    W = (rng.random((n, dim)) - 0.5) / dim   # center embeddings
    C = np.zeros((n, dim))                    # context embeddings

    for epoch in range(epochs):
        lr = max(min_learning_rate,
                 learning_rate * (1.0 - epoch / max(1, epochs)))
        wref = ray.put(W)
        cref = ray.put(C)

        def grad_batch(t: pa.Table, epoch=epoch, lr=lr) -> pa.Table:
            Wl = ray.get(wref)
            Cl = ray.get(cref)
            cuml = ray.get(cum_ref)
            ctr = t["center"].to_numpy(zero_copy_only=False)
            ctx = t["context"].to_numpy(zero_copy_only=False)
            pid = t["pair_id"].to_numpy(zero_copy_only=False)
            m = len(ctr)
            gW = np.zeros((m, Wl.shape[1]))
            # positive pair
            wv = Wl[ctr]
            cv = Cl[ctx]
            g = _sigmoid((wv * cv).sum(axis=1)) - 1.0   # ∂loss/∂score
            gW += g[:, None] * cv
            gC_rows = [ctx]
            gC_vals = [g[:, None] * wv]
            # negatives
            for s in range(negative_samples):
                neg = np.searchsorted(
                    cuml, _hash_u01(pid * np.int64(negative_samples) + s,
                                    seed + 31 * epoch + s))
                gn = _sigmoid((wv * Cl[neg]).sum(axis=1))
                gW += gn[:, None] * Cl[neg]
                gC_rows.append(neg)
                gC_vals.append(gn[:, None] * wv)
            # compact per-row partials
            rows_w, inv_w = np.unique(ctr, return_inverse=True)
            agg_w = np.zeros((len(rows_w), Wl.shape[1]))
            np.add.at(agg_w, inv_w, gW)
            rows_c = np.concatenate(gC_rows)
            vals_c = np.vstack(gC_vals)
            urows_c, inv_c = np.unique(rows_c, return_inverse=True)
            agg_c = np.zeros((len(urows_c), Wl.shape[1]))
            np.add.at(agg_c, inv_c, vals_c)
            return pa.table({
                "row": np.concatenate([rows_w, urows_c]),
                "side": np.concatenate([
                    np.zeros(len(rows_w), np.int64),
                    np.ones(len(urows_c), np.int64)]),
                "grad": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.vstack([agg_w, agg_c]).reshape(-1)),
                    Wl.shape[1]),
            })

        grads = pairs_ds.map_batches(grad_batch, batch_format="pyarrow",
                                     zero_copy_batch=True,
                                     batch_size=1 << 16).to_pandas()
        rows = grads["row"].to_numpy(np.int64)
        side = grads["side"].to_numpy(np.int64)
        g = np.stack([np.asarray(v) for v in grads["grad"]])
        scale = lr / max(1.0, n_pairs / max(1, len(grads)))
        for s_val, M in ((0, W), (1, C)):
            sel = side == s_val
            np.add.at(M, rows[sel], -scale * g[sel])
    emb = W + C  # standard skip-gram output combination
    return pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                         "emb": list(emb)})
