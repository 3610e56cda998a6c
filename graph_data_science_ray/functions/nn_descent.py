"""KNN via NN-Descent — parity with gds.knn
(similarity/knn/Knn.java:1-664; Dong et al., "Efficient K-Nearest
Neighbor Graph Construction for Generic Similarity Measures"): start
from random neighbor lists, then repeatedly let each node's neighbors
introduce themselves to each other, keeping the best K — converges to
the (approximate) exact KNN graph in O(log N) rounds without the
O(N²) all-pairs scan.

Ray shape: the evolving neighbor-list table (node, nbr, sim, is_new)
lives in the object store as ``num_buckets`` per-bucket refs (bucket =
node % num_buckets); one iteration is a fixed 3-stage task exchange:
  1. scatter — each bucket emits its REVERSE rows routed to the
     neighbor's bucket (forward rows never move: the table is already
     node-bucketed);
  2. join+score — per bucket, forward ∪ gathered reverse rows expand
     candidate pairs new×(new ∪ old) (vectorized, sample-capped per
     node), scored in place against the shared id-sorted embedding
     matrix (one plasma object, zero-copy per task), routed back to
     each endpoint's bucket;
  3. update — per bucket, current list ∪ scored candidates → top-K
     with is_new tracking; returns the new bucket block + its
     new-entry count (the only thing the driver ever fetches).
Convergence: new-entry count ≤ delta · N · K (the reference's
updateThreshold).

Why raw tasks and not Dataset groupby: this loop ran first as
map_batches + groupby("__bucket").map_groups per stage. Two measured
failure modes: (a) ``union`` + groupby SUM the two sides' block lists,
so blocks double every iteration (17→1088 over 6 rounds at constant
~3k rows) unless a repartition — one more all-to-all — is added; (b)
each sort-based groupby carries ~2-4 s fixed cost per iteration at any
size. The manual exchange is 3·B tasks per iteration with the same
partitioning a multi-node hash shuffle would use, and the per-bucket
blocks never touch the driver. The embedding matrix broadcast is the
same O(N·d)-per-node assumption the reference's shared arrays make.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _route(df: pd.DataFrame, num_buckets: int):
    """Split rows by node % num_buckets (tuple of DataFrames)."""
    b = df["node"].to_numpy(np.int64) % num_buckets
    return tuple(df[b == i] for i in range(num_buckets))


def _seq_within(node: np.ndarray) -> np.ndarray:
    """0,1,2,… restarting at each run of equal (sorted) node values."""
    start = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
    return np.arange(len(node)) - np.repeat(
        start, np.diff(np.r_[start, len(node)]))


def _candidate_core(group: pd.DataFrame, it: int, cap: int, seed: int,
                    sids: np.ndarray, M: np.ndarray) -> pd.DataFrame:
    """new×all pair expansion within each node's joined list, scored in
    place against the shared matrix and emitted as directed update rows
    (both directions). Lexsorts up front, so shard arrival order is
    irrelevant."""
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
        keep2 = _seq_within(node) < cap
        node, nbr, new = node[keep2], nbr[keep2], new[keep2]
        order = np.lexsort((nbr, node))
        node, nbr, new = node[order], nbr[order], new[order]
    empty = pd.DataFrame({"node": np.empty(0, np.int64),
                          "nbr": np.empty(0, np.int64),
                          "sim": np.empty(0, np.float64),
                          "was": np.empty(0, bool)})
    if len(node) == 0:
        return empty
    from ..pipelines.triangles import _pairs_within_groups
    change = np.flatnonzero(np.r_[node[1:] != node[:-1], True]) + 1
    group_end = np.repeat(change, np.diff(np.r_[0, change]))
    li, ri = _pairs_within_groups(group_end)
    if len(li) == 0:
        return empty
    # at least one side new (Dong et al.: new×new ∪ new×old)
    m = new[li] | new[ri]
    a, b = nbr[li][m], nbr[ri][m]
    ne = a != b
    a, b = a[ne], b[ne]
    if len(a) == 0:
        return empty
    # dedup + score in place against the shared matrix
    pk = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = pk[:, 0], pk[:, 1]
    ra = np.searchsorted(sids, a)
    rb = np.searchsorted(sids, b)
    sim = np.round(np.einsum("ij,ij->i", M[ra], M[rb]), 12)
    return pd.DataFrame({
        "node": np.concatenate([a, b]),
        "nbr": np.concatenate([b, a]),
        "sim": np.concatenate([sim, sim]),
        "was": np.zeros(2 * len(a), bool),
    })


def _update_core(group: pd.DataFrame, k_eff: int) -> pd.DataFrame:
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


@ray.remote
def _init_scatter(lo: int, hi: int, n: int, k_eff: int, seed: int,
                  num_buckets: int, sids, M):
    """k hash-seeded random neighbors for positions [lo, hi), scored,
    routed to each node's bucket."""
    pos = np.arange(lo, hi, dtype=np.int64)
    node_p, nbr_p = [], []
    for j in range(k_eff):
        off = (_hash_u01(pos, seed * 1000 + j) * (n - 1)).astype(np.int64) + 1
        node_p.append(pos)
        nbr_p.append((pos + off) % n)
    node0 = np.concatenate(node_p)
    nbr0 = np.concatenate(nbr_p)
    sim0 = np.einsum("ij,ij->i", M[node0], M[nbr0])
    df = pd.DataFrame({"node": sids[node0], "nbr": sids[nbr0],
                       "sim": np.round(sim0, 12),
                       "is_new": np.ones(len(node0), bool)})
    return _route(df, num_buckets)


@ray.remote
def _concat_shards(*shards):
    return pd.concat(list(shards), ignore_index=True)


@ray.remote
def _rev_scatter(num_buckets: int, cur_df: pd.DataFrame):
    """Reverse rows of one bucket, routed by the reversed node."""
    rev = pd.DataFrame({"node": cur_df["nbr"].to_numpy(np.int64),
                        "nbr": cur_df["node"].to_numpy(np.int64),
                        "is_new": cur_df["is_new"].to_numpy(bool)})
    return _route(rev, num_buckets)


@ray.remote
def _join_score(it: int, cap: int, seed: int, num_buckets: int,
                sids, M, cur_df: pd.DataFrame, *rev_shards):
    joined = pd.concat(
        [cur_df[["node", "nbr", "is_new"]], *rev_shards],
        ignore_index=True)
    out = _candidate_core(joined, it, cap, seed, sids, M)
    return _route(out, num_buckets)


@ray.remote(num_returns=2)
def _merge_update(k_eff: int, cur_df: pd.DataFrame, *upd_shards):
    marked = pd.DataFrame({"node": cur_df["node"], "nbr": cur_df["nbr"],
                           "sim": cur_df["sim"],
                           "was": np.ones(len(cur_df), bool)})
    merged = pd.concat([marked, *upd_shards], ignore_index=True)
    new_df = _update_core(merged, k_eff)
    return new_df, int(new_df["is_new"].sum())


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

    # init: scored random lists built over position slices, scattered
    # to node buckets; cur = one DataFrame ref per bucket from here on
    bounds = np.linspace(0, n, num_buckets + 1).astype(int)
    init_shards = [
        _init_scatter.options(num_returns=num_buckets).remote(
            int(lo), int(hi), n, k_eff, seed, num_buckets,
            ids_ref, mat_ref)
        for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    cur = [_concat_shards.remote(*(s[b] for s in init_shards))
           for b in range(num_buckets)]

    threshold = max(1, int(delta * n * k_eff))
    for it in range(max_iterations):
        rev = [_rev_scatter.options(num_returns=num_buckets)
               .remote(num_buckets, cur[b]) for b in range(num_buckets)]
        upd = [_join_score.options(num_returns=num_buckets)
               .remote(it, cap, seed, num_buckets, ids_ref, mat_ref,
                       cur[b], *(r[b] for r in rev))
               for b in range(num_buckets)]
        nxt, counts = [], []
        for b in range(num_buckets):
            new_b, cnt_b = _merge_update.remote(
                k_eff, cur[b], *(u[b] for u in upd))
            nxt.append(new_b)
            counts.append(cnt_b)
        cur = nxt
        changed = sum(ray.get(counts))
        if changed <= threshold:
            break

    out = pd.concat(ray.get(cur), ignore_index=True)
    out = out.sort_values(["node", "sim", "nbr"],
                          ascending=[True, False, True]).reset_index(drop=True)
    out["rank"] = out.groupby("node", sort=False).cumcount() + 1
    return pd.DataFrame({"node": out["node"].astype(np.int64),
                         "neighbor": out["nbr"].astype(np.int64),
                         "score": out["sim"].astype(np.float64),
                         "rank": out["rank"].astype(np.int64)})
