"""Distributed PCA for tall-skinny embedding matrices.

The standard scheme for small dimension d (here 64): ONE
``map_batches`` pass emits per-block moment partials — n, Σx (d,) and
XᵀX (d×d) — so the exchange and the driver fold are O(blocks · d²),
never O(N). The driver assembles the covariance and eigendecomposes a
d×d matrix. Components get a deterministic sign convention (the
largest-|loading| coordinate is made positive) so runs are comparable.

Public-knowledge basis: covariance PCA / method of moments; the same
partial-moment fold as functions/olap.grouped_corr, lifted to
matrices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def pca_components(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    k: int = 8,
) -> dict:
    """Top-k principal components of the vector column. Returns
    ``{"n", "eigenvalues" (k,), "explained_ratio" (k,),
    "components" (k, d)}``. Eigenvalues are of the SAMPLE covariance
    (n−1 denominator), sorted descending."""

    def partial(t: pa.Table) -> pd.DataFrame:
        X = np.vstack(t[vec_col].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        return pd.DataFrame({
            "n": [np.int64(len(X))],
            "d": [np.int64(X.shape[1])],
            "s": [X.sum(axis=0).tobytes()],
            "xtx": [np.ascontiguousarray(X.T @ X).tobytes()],
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        raise ValueError("empty dataset")
    d = int(parts["d"].iloc[0])
    n = int(parts["n"].sum())
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for _, row in parts.iterrows():
        s += np.frombuffer(row["s"], dtype=np.float64)
        xtx += np.frombuffer(row["xtx"],
                             dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T
    # deterministic sign: largest-|loading| coordinate positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(np.trace(cov))
    return {"n": n, "eigenvalues": evals,
            "explained_ratio": evals / total if total > 0 else evals,
            "components": comps}


def pca_transform(
    ds: rd.Dataset,
    components: np.ndarray,
    mean: np.ndarray | None = None,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> rd.Dataset:
    """Project the vector column onto fitted components: the (k, d)
    matrix is put in the object store ONCE and every batch is one
    matmul — the broadcast-small-side pattern, no shuffle. Keeps all
    other columns; output vectors are float32 lists of length k."""
    import ray
    comp_ref = ray.put(np.ascontiguousarray(components, np.float64))
    mean_ref = ray.put(None if mean is None
                       else np.asarray(mean, np.float64))

    def project(t: pa.Table) -> pa.Table:
        C = ray.get(comp_ref)
        m = ray.get(mean_ref)
        X = np.vstack(t[vec_col].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        if m is not None:
            X = X - m
        P = (X @ C.T).astype(np.float32)
        out = t.drop_columns([vec_col])
        return out.append_column(
            out_col, pa.array(list(P), type=pa.list_(pa.float32())))

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)
