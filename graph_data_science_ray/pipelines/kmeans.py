"""K-Means — parity with gds.kmeans (kmeans/Kmeans.java): Lloyd
iterations over per-node property vectors.

Ray shape (r4): the table's blocks are materialized ONCE as
arrow-table refs; each Lloyd iteration is one round of small tasks
over the same plasma blocks (centroids ride inline — k×dim, tiny) and
the driver combines the per-block partial sums in fixed block order —
no per-iteration Dataset job. Seeded initial centroids come from the
first k rows in id order (deterministic, matching the reference's
seeded sampling intent)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.ann import _batch_matrix


@ray.remote
def _lloyd_partials(tbl: pa.Table, centroids: np.ndarray,
                    vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """One block's (per-cluster vector sums, counts) for one Lloyd
    iteration — same kernel the Dataset pass ran, now over a stable
    plasma block so iterations pay task-dispatch, not Dataset-job,
    fixed costs."""
    m = _batch_matrix(tbl, vec_col)
    d2 = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    sums = np.zeros_like(centroids)
    np.add.at(sums, assign, m)
    counts = np.bincount(assign, minlength=len(centroids))
    return sums, counts.astype(np.int64)


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

    ds = ds.materialize()
    first = (ds.map_batches(min_k, batch_format="pyarrow",
                            zero_copy_batch=True)
             .to_pandas()
             .sort_values(id_col, kind="stable")
             .head(k))
    centroids = np.array([np.asarray(v, dtype=np.float64)
                          for v in first[vec_col]])
    refs = ds.to_arrow_refs()
    ran = 0
    for it in range(max_iterations):
        parts = ray.get([_lloyd_partials.remote(r, centroids, vec_col)
                         for r in refs])
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for s, c in parts:            # fixed block order
            sums += s
            counts += c
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