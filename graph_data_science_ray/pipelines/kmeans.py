"""K-Means — parity with gds.kmeans (kmeans/Kmeans.java): Lloyd
iterations over per-node property vectors.

Ray shape: centroids broadcast via ray.put; assignment + per-cluster
partial sums are one vectorized map_batches pass per iteration; the
driver combines partials (k×dim — tiny) into new centroids. Seeded
initial centroids come from the first k rows in id order (deterministic,
matching the reference's seeded sampling intent)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.ann import _batch_matrix


def kmeans(
    ds: rd.Dataset,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 10,
    tolerance: float = 1e-4,
    seed: int = 42,
) -> tuple[pd.DataFrame, np.ndarray, int]:
    """Returns (assignments (id, cluster), centroids [k, dim], iterations)."""
    # seed centroids = the k smallest-id rows; a per-batch partial min-k
    # + tiny driver combine, NOT ds.sort().limit(k) (a full all-to-all
    # sort of the table to fetch k rows)
    def min_k(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return t.take(pa.array(take))

    first = (ds.map_batches(min_k, batch_format="pyarrow",
                            zero_copy_batch=True)
             .to_pandas()
             .sort_values(id_col, kind="stable")
             .head(k))
    centroids = np.array([np.asarray(v, dtype=np.float64)
                          for v in first[vec_col]])
    ran = 0
    for it in range(max_iterations):
        cref = ray.put(centroids)

        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _batch_matrix(t, vec_col)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c))
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "vsum": pa.array(sums.tolist(),
                                 type=pa.list_(pa.float64())),
                "count": pa.array(counts.astype(np.int64)),
            })

        parts = ds.map_batches(partials, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for row in parts.itertuples():
            sums[row.cluster] += np.asarray(row.vsum)
            counts[row.cluster] += row.count
        new_centroids = np.where(counts[:, None] > 0,
                                 sums / np.maximum(counts[:, None], 1),
                                 centroids)
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        ran = it + 1
        if shift <= tolerance:
            break

    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _batch_matrix(t, vec_col)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(d2.argmin(axis=1).astype(np.int64))})

    out = ds.map_batches(assign, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    return out, centroids, ran