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


def _topk_by_score_then_id(scores: np.ndarray, ids: np.ndarray, k: int):
    """Per-row top-k of a [Q, B] score matrix with a DETERMINISTIC
    tie-break (score desc, id asc) — plain argpartition can drop the
    smaller id at an exact tie on the k-boundary, making the partial
    top-k depend on block layout.  Linear-time selection (no full row
    argsort): columns are pre-sorted by id asc, the k-th score comes
    from np.partition, rows strictly above it are taken outright, and
    boundary ties fill the remainder in column (= id) order via a
    cumulative count.  Returns (q_idx, col_idx) flat index arrays of
    length Q*k into the REORDERED column space plus the reordered
    ids/scores."""
    id_order = np.argsort(ids, kind="stable")
    ids_s = ids[id_order]
    scores_s = scores[:, id_order]
    kth = -np.partition(-scores_s, k - 1, axis=1)[:, k - 1]  # [Q]
    gt = scores_s > kth[:, None]
    need = k - gt.sum(axis=1)                                # ≥ 1
    tie = scores_s == kth[:, None]
    take_tie = tie & (np.cumsum(tie, axis=1) <= need[:, None])
    q_idx, col_idx = np.nonzero(gt | take_tie)
    return q_idx, col_idx, ids_s, scores_s


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
        # per-query partial top-k within this batch (ties → smaller id)
        q_idx, v_idx, ids_s, scores_s = _topk_by_score_then_id(
            scores, ids, k)
        return pa.table({
            "query_id": pa.array(q_idx, type=pa.int64()),
            "vec_id": pa.array(ids_s[v_idx], type=pa.int64()),
            "score": pa.array(scores_s[q_idx, v_idx], type=pa.float64()),
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
    from ..stages.resources import stage_cpus
    partials = embeddings.map_batches(
        _BruteScorer, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(qref, k, id_col, vec_col),
        num_cpus=stage_cpus("ann"),
        concurrency=concurrency).to_pandas()
    if partials.empty:
        return pd.DataFrame({"query_id": [], "vec_id": [], "score": [],
                             "rank": []})
    # one vectorized global merge: the partial top-k tables are tiny
    # (Q×k per input batch), so sort + per-query head(k) is plenty
    out = (partials.sort_values(["query_id", "score", "vec_id"],
                                ascending=[True, False, True])
           .groupby("query_id", sort=False).head(k).reset_index(drop=True))
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out


def _local_lloyd(X: np.ndarray, k: int, iterations: int = 10) -> np.ndarray:
    """Deterministic in-memory Lloyd over a bounded training sample:
    seeds = first k rows, argmin ties to the lowest centroid, empty
    cells keep their centroid (same rules as pipelines/kmeans.py)."""
    c = X[: min(k, len(X))].copy()
    for _ in range(iterations):
        d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=len(c))
        c = np.where(counts[:, None] > 0,
                     sums / np.maximum(counts[:, None], 1), c)
    return c


class _IVFScorer:
    """Actor-pool stage: drop vectors in unprobed cells, score the rest,
    mask per-query cells outside that query's probe list."""

    def __init__(self, queries_ref, cent_ref, probe_ref, k: int,
                 id_col: str, vec_col: str):
        self.q = _normalize(ray.get(queries_ref))      # [Q, D]
        self.cent = ray.get(cent_ref)                  # [L, D]
        self.probe = ray.get(probe_ref)                # [Q, L] bool
        self.union = self.probe.any(axis=0)            # [L]
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(t, self.vec_col))
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        d2 = ((m[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
        cell = d2.argmin(axis=1)
        keep = self.union[cell]
        if not keep.any():
            e = np.empty(0, np.int64)
            return pa.table({"query_id": pa.array(e),
                             "vec_id": pa.array(e),
                             "score": pa.array(np.empty(0, np.float64))})
        m, ids, cell = m[keep], ids[keep], cell[keep]
        scores = self.q @ m.T                          # [Q, B']
        scores = np.where(self.probe[:, cell], scores, -np.inf)
        k = min(self.k, scores.shape[1])
        q_idx, v_idx, ids_s, scores_s = _topk_by_score_then_id(
            scores, ids, k)
        s = scores_s[q_idx, v_idx]
        ok = np.isfinite(s)
        return pa.table({
            "query_id": pa.array(q_idx[ok], type=pa.int64()),
            "vec_id": pa.array(ids_s[v_idx[ok]], type=pa.int64()),
            "score": pa.array(s[ok], type=pa.float64()),
        })


def ivf_topk(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    num_lists: int = 16,
    nprobe: int | None = None,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 8),
) -> pd.DataFrame:
    """IVF (inverted-file) approximate cosine top-k — the
    coarse-quantizer scale path next to lsh_topk: a spherical-kmeans
    quantizer (trained on a BOUNDED head sample, so training never
    scales with the corpus) partitions vectors into num_lists cells;
    each query scores only its nprobe nearest cells.  Assignment +
    masked scoring is one actor-pool map_batches over the corpus with
    broadcast centroids; nprobe == num_lists probes every cell and is
    exactly brute_force_topk (the oracle-checkable configuration).
    Returns (query_id, vec_id, score, rank), ties broken by higher
    score then smaller vec_id."""
    queries = np.asarray(queries, dtype=np.float64)
    if nprobe is None:
        nprobe = max(1, num_lists // 4)
    sample = embeddings.limit(train_sample).to_pandas()
    X = _normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in sample[vec_col]]))
    cent = _local_lloyd(X, num_lists)
    qn = _normalize(queries)
    qd2 = ((qn[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)  # [Q, L]
    nprobe = min(nprobe, cent.shape[0])
    # stable argsort (L is tiny): probe-cell choice deterministic at ties
    near = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]
    probe = np.zeros((len(qn), cent.shape[0]), dtype=bool)
    probe[np.repeat(np.arange(len(qn)), nprobe), near.ravel()] = True
    from ..stages.resources import stage_cpus
    partials = embeddings.map_batches(
        _IVFScorer, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(ray.put(queries), ray.put(cent),
                             ray.put(probe), k, id_col, vec_col),
        num_cpus=stage_cpus("ann"),
        concurrency=concurrency).to_pandas()
    if partials.empty:
        return pd.DataFrame({"query_id": [], "vec_id": [], "score": [],
                             "rank": []})
    out = (partials.sort_values(["query_id", "score", "vec_id"],
                                ascending=[True, False, True])
           .groupby("query_id", sort=False).head(k).reset_index(drop=True))
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out


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
    num_buckets: int = 32,
) -> rd.Dataset:
    """Near-duplicate pairs (a < b, cosine >= threshold) via LSH-bucketed
    all-pairs within equal-code groups — fully distributed: codes are a
    map_batches stage against broadcast hyperplanes; scoring runs in a
    code-bucketed ``map_groups`` kernel (per-group matmul, vectorized
    pair emission). Each vector lives in exactly one code group, so
    emitted pairs are already distinct. The embedding matrix never
    lands on the driver."""
    rng = np.random.default_rng(seed)
    first = embeddings.take(1)
    if not first:
        return rd.from_items([])
    dim = len(first[0][vec_col])
    planes = rng.standard_normal((num_bits, dim))
    planes_ref = ray.put(planes)

    def code_batch(t: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(t, vec_col))
        codes = _lsh_codes(m, ray.get(planes_ref))
        return pa.table({
            id_col: t[id_col],
            vec_col: t[vec_col],
            "code": pa.array(codes),
            "__bucket": pa.array((codes % num_buckets).astype(np.int64)),
        })

    def score_kernel(group: pd.DataFrame) -> pd.DataFrame:
        codes = group["code"].to_numpy()
        ids = group[id_col].to_numpy(np.int64)
        mat = _normalize(np.stack(
            [np.asarray(v, dtype=np.float64) for v in group[vec_col]]))
        # sort by (code, id) so pair expansion inside a run gives a < b
        order = np.lexsort((ids, codes))
        codes, ids, mat = codes[order], ids[order], mat[order]
        bounds = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1], True])
        out_a, out_b, out_s = [], [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            if hi - lo < 2:
                continue
            sub = mat[lo:hi]
            s = sub @ sub.T
            ii, jj = np.where(np.triu(s, 1) >= threshold)
            out_a.append(ids[lo + ii])
            out_b.append(ids[lo + jj])
            out_s.append(np.round(s[ii, jj], 6))
        if not out_a:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"a": e, "b": e,
                                 "cosine": np.empty(0, np.float64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_s)})

    return (embeddings.map_batches(code_batch, batch_format="pyarrow",
                                   zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(score_kernel, batch_format="pandas"))
