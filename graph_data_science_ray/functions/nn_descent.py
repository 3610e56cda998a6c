"""KNN via NN-Descent — parity with gds.knn
(similarity/knn/Knn.java:1-664; Dong et al., "Efficient K-Nearest
Neighbor Graph Construction for Generic Similarity Measures"): start
from random neighbor lists, then repeatedly let each node's neighbors
introduce themselves to each other, keeping the best K — converges to
the (approximate) exact KNN graph in O(log N) rounds without the
O(N²) all-pairs scan.

Ray-Data shape: the evolving neighbor-list table (node, nbr, sim,
is_new) is a Dataset; one iteration =
  1. neighbor join — forward ∪ reverse rows, bucketed by node; the
     per-group kernel expands candidate pairs new×(new ∪ old)
     (vectorized, sample-capped per node);
  2. scoring — map_batches cosine against the broadcast id-sorted
     embedding matrix (ray.put once, zero-copy per task);
  3. update — both directions of each scored pair union'd with the
     current lists, bucketed per-node top-K with is_new tracking.
Convergence: new-entry count ≤ delta · N · K (the reference's
updateThreshold). The embedding matrix broadcast is the same
O(N·d)-per-node assumption the reference's shared arrays make; the
candidate/update tables never land on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .ann import _batch_matrix, _normalize


def _hash_u01(x: np.ndarray, salt: int) -> np.ndarray:
    x = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(salt)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


@ray.remote(num_returns=2)
def _assemble_matrix(id_col: str, vec_col: str, *tables):
    """(sorted ids, L2-normalized matrix in id order), assembled in a
    WORKER from the dataset's arrow block refs — the driver only ever
    holds the two result refs. The O(N·d) single-process peak is the
    same shared-matrix assumption the reference makes; past one node's
    RAM, shard the matrix (the candidate scoring only needs the rows
    its bucket touches)."""
    ids = np.concatenate([t[id_col].to_numpy(zero_copy_only=False)
                          for t in tables])
    m = _normalize(np.vstack([_batch_matrix(t, vec_col) for t in tables]))
    order = np.argsort(ids, kind="stable")
    return ids[order], m[order]


def knn_descent(
    embeddings: rd.Dataset,
    k: int = 10,
    max_iterations: int = 8,
    delta: float = 0.001,
    sample_rate: float = 1.0,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """(node, neighbor, score, rank) approximate cosine KNN graph."""
    n = embeddings.count()
    if n <= 1:
        return pd.DataFrame({"node": [], "neighbor": [], "score": [],
                             "rank": []})
    # shared (ids, matrix) assembled worker-side from the block refs;
    # the driver never streams the embedding table
    block_refs = embeddings.to_arrow_refs()
    ids_ref, mat_ref = _assemble_matrix.remote(id_col, vec_col,
                                               *block_refs)
    k_eff = min(k, n - 1)
    cap = max(k_eff, int(np.ceil(sample_rate * 2 * k_eff)))

    # --- init: k random distinct neighbors per node (hash-seeded),
    # built + scored distributed over position ranges ----------------------
    def init_kernel(t: pa.Table) -> pd.DataFrame:
        pos = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sids = ray.get(ids_ref)
        M = ray.get(mat_ref)
        node_p, nbr_p = [], []
        for j in range(k_eff):
            off = (_hash_u01(pos, seed * 1000 + j)
                   * (n - 1)).astype(np.int64) + 1
            node_p.append(pos)
            nbr_p.append((pos + off) % n)
        node0 = np.concatenate(node_p)
        nbr0 = np.concatenate(nbr_p)
        sim0 = np.einsum("ij,ij->i", M[node0], M[nbr0])
        return pd.DataFrame({
            "node": sids[node0], "nbr": sids[nbr0],
            "sim": np.round(sim0, 12),
            "is_new": np.ones(len(node0), bool)})

    cur = rd.range(n, override_num_blocks=num_buckets).map_batches(
        init_kernel, batch_format="pyarrow")

    def bucket_node(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = df["node"].to_numpy() % num_buckets
        return df

    def candidate_kernel(group: pd.DataFrame, it: int) -> pd.DataFrame:
        """new×all pair expansion within each node's joined list, scored
        in place against the broadcast matrix and emitted as directed
        update rows (both directions) — fusing scoring here removes a
        whole pipeline stage per iteration."""
        node = group["node"].to_numpy(np.int64)
        nbr = group["nbr"].to_numpy(np.int64)
        new = group["is_new"].to_numpy(bool)
        order = np.lexsort((nbr, node))
        node, nbr, new = node[order], nbr[order], new[order]
        # dedup (node, nbr) — forward+reverse can repeat
        keep = np.r_[True, (node[1:] != node[:-1]) | (nbr[1:] != nbr[:-1])]
        node, nbr, new = node[keep], nbr[keep], new[keep]
        # sample-cap each node's list (hash-ordered, deterministic)
        if cap > 0:
            r = _hash_u01(nbr * np.int64(31) + node, seed + 7919 * it)
            order2 = np.lexsort((r, node))
            node, nbr, new = node[order2], nbr[order2], new[order2]
            start = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
            seq = np.arange(len(node)) - np.repeat(
                start, np.diff(np.r_[start, len(node)]))
            keep2 = seq < cap
            node, nbr, new = node[keep2], nbr[keep2], new[keep2]
            order = np.lexsort((nbr, node))
            node, nbr, new = node[order], nbr[order], new[order]
        if len(node) == 0:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"a": e, "b": e})
        from ..pipelines.triangles import _pairs_within_groups
        change = np.flatnonzero(np.r_[node[1:] != node[:-1], True]) + 1
        group_end = np.repeat(change, np.diff(np.r_[0, change]))
        li, ri = _pairs_within_groups(group_end)
        if len(li) == 0:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"node": e, "nbr": e,
                                 "sim": np.empty(0, np.float64),
                                 "was": np.empty(0, bool)})
        # at least one side new (Dong et al.: new×new ∪ new×old)
        m = new[li] | new[ri]
        a, b = nbr[li][m], nbr[ri][m]
        ne = a != b
        a, b = a[ne], b[ne]
        # dedup + score in place against the broadcast matrix
        if len(a):
            pk = np.unique(np.stack([a, b], axis=1), axis=0)
            a, b = pk[:, 0], pk[:, 1]
        sids = ray.get(ids_ref)
        M = ray.get(mat_ref)
        ra = np.searchsorted(sids, a)
        rb = np.searchsorted(sids, b)
        sim = np.round(np.einsum("ij,ij->i", M[ra], M[rb]), 12)
        return pd.DataFrame({
            "node": np.concatenate([a, b]),
            "nbr": np.concatenate([b, a]),
            "sim": np.concatenate([sim, sim]),
            "was": np.zeros(2 * len(a), bool),
        })

    def _seq_within(node: np.ndarray) -> np.ndarray:
        """0,1,2,… restarting at each run of equal (sorted) node values."""
        start = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        return np.arange(len(node)) - np.repeat(
            start, np.diff(np.r_[start, len(node)]))

    def update_kernel(group: pd.DataFrame) -> pd.DataFrame:
        """Per-node merge of current list + scored candidates → top-K,
        is_new = entry wasn't in the previous list."""
        node = group["node"].to_numpy(np.int64)
        nbr = group["nbr"].to_numpy(np.int64)
        sim = group["sim"].to_numpy(np.float64)
        old = group["was"].to_numpy(bool)
        # dedup (node, nbr): the old-flagged duplicate wins (same sim —
        # both sides score identically against the same matrix)
        order = np.lexsort((~old, nbr, node))
        node, nbr, sim, old = node[order], nbr[order], sim[order], old[order]
        keep = np.r_[True, (node[1:] != node[:-1]) | (nbr[1:] != nbr[:-1])]
        node, nbr, sim, old = node[keep], nbr[keep], sim[keep], old[keep]
        # per-node top-K by (sim desc, nbr asc)
        order = np.lexsort((nbr, -sim, node))
        node, nbr, sim, old = node[order], nbr[order], sim[order], old[order]
        keep2 = _seq_within(node) < k_eff
        return pd.DataFrame({"node": node[keep2], "nbr": nbr[keep2],
                             "sim": sim[keep2], "is_new": ~old[keep2]})

    threshold = max(1, int(delta * n * k_eff))
    for it in range(max_iterations):
        def fwd_rev(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "node": np.concatenate([df["node"].to_numpy(np.int64),
                                        df["nbr"].to_numpy(np.int64)]),
                "nbr": np.concatenate([df["nbr"].to_numpy(np.int64),
                                       df["node"].to_numpy(np.int64)]),
                "is_new": np.concatenate([df["is_new"].to_numpy(bool)] * 2),
            })
            out["__bucket"] = out["node"].to_numpy() % num_buckets
            return out

        updates = (cur.map_batches(fwd_rev, batch_format="pandas")
                   .groupby("__bucket")
                   .map_groups(lambda g, it=it: candidate_kernel(g, it),
                               batch_format="pandas"))

        def mark_old(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"], "nbr": df["nbr"],
                                 "sim": df["sim"],
                                 "was": np.ones(len(df), bool)})

        merged = (cur.map_batches(mark_old, batch_format="pandas")
                  .union(updates)
                  .map_batches(bucket_node, batch_format="pandas")
                  .groupby("__bucket")
                  .map_groups(update_kernel, batch_format="pandas"))
        cur = merged.materialize()
        changed = int(cur.map_batches(
            lambda df: pd.DataFrame({"c": [int(df["is_new"].sum())]}),
            batch_format="pandas").sum(on="c") or 0)
        if changed <= threshold:
            break

    out = cur.to_pandas()
    out = out.sort_values(["node", "sim", "nbr"],
                          ascending=[True, False, True]).reset_index(drop=True)
    out["rank"] = out.groupby("node", sort=False).cumcount() + 1
    return pd.DataFrame({"node": out["node"].astype(np.int64),
                         "neighbor": out["nbr"].astype(np.int64),
                         "score": out["sim"].astype(np.float64),
                         "rank": out["rank"].astype(np.int64)})
