"""Node Similarity — parity with gds.nodeSimilarity
(similarity/nodesim/NodeSimilarity.java:44-300): pairwise similarity of
out-neighbor sets for node pairs sharing at least one neighbor, with
degreeCutoff / similarityCutoff / per-node topK / global topN.

Distributed shape (works on arrays and parquet graphs alike):
  1. candidate pairs from the inverted index — sources co-occurring in
     some target's in-list, generated per dst-bucket with the vectorized
     pair expansion (never all-pairs), dedup'd by hash-bucket groupby;
  2. exact set scores in a bucketed ``map_groups`` kernel probing the
     broadcast CSR (``ray.put`` once, zero-copy per group) — the
     intersection of every pair in the bucket is computed in ONE
     duplicate-count pass over (pair, neighbor) keys, no per-pair loop;
  3. per-node topK as a node-bucketed truncation with the reference's
     (similarity desc, smaller id) ordering.

Scale note: the CSR broadcast is O(E) in the object store (fine to
~10⁹ edges/node); beyond that step 2 becomes a partitioned join of the
pair table against dst-keyed adjacency — same kernel, one more shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.superstep import PartitionedGraph
from ..state.blocks import ranges_to_indices
from .triangles import _pairs_within_groups


def _csr(n: int, src: np.ndarray, dst: np.ndarray):
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    # distinct neighbors (reference uses distinct-neighbor semantics)
    keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
    s, d = s[keep], d[keep]
    indptr = np.searchsorted(s, np.arange(n + 1))
    return indptr, d


def _stream_edges(graph: PartitionedGraph) -> tuple[np.ndarray, np.ndarray]:
    if graph.kind == "arrays":
        return graph.src, graph.dst
    parts_s, parts_d = [], []
    for batch in graph.edges_dataset(("src", "dst"), flow="out").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        parts_s.append(batch["src"].to_numpy(zero_copy_only=False))
        parts_d.append(batch["dst"].to_numpy(zero_copy_only=False))
    if not parts_s:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(parts_s), np.concatenate(parts_d)


def _candidate_pairs(graph: PartitionedGraph, eligible_ref, num_buckets: int):
    """Distinct source pairs sharing at least one out-target (a < b)."""
    from ..stages.shuffle import distinct_rows
    edges = graph.edges_dataset(("src", "dst"), flow="out")

    def add_bucket(t: pa.Table) -> pa.Table:
        d = t["dst"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array((d % num_buckets).astype(np.int64)))

    def pair_kernel(group: pd.DataFrame) -> pd.DataFrame:
        eligible = ray.get(eligible_ref)
        s = group["src"].to_numpy()
        d = group["dst"].to_numpy()
        ok = eligible[s]
        s, d = s[ok], d[ok]
        # distinct (dst, src), grouped by dst
        ps = np.unique(np.stack([d, s], axis=1), axis=0)
        if len(ps) == 0:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"a": e, "b": e})
        dd, ss = ps[:, 0], ps[:, 1]
        change = np.flatnonzero(np.r_[dd[1:] != dd[:-1], True]) + 1
        group_end = np.repeat(change, np.diff(np.r_[0, change]))
        li, ri = _pairs_within_groups(group_end)
        if len(li) == 0:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"a": e, "b": e})
        pairs = np.unique(np.stack([ss[li], ss[ri]], axis=1), axis=0)
        return pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]})

    pairs = (edges.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__bucket")
             .map_groups(pair_kernel, batch_format="pandas"))
    return distinct_rows(pairs, ["a", "b"])


def _score_kernel(group: pd.DataFrame, indptr_ref, indices_ref, n: int,
                  metric: str, cutoff: float) -> pd.DataFrame:
    """Exact set similarity for every pair in the bucket — one
    duplicate-count pass over (pair, neighbor) keys."""
    ip = ray.get(indptr_ref)
    ix = ray.get(indices_ref)
    a = group["a"].to_numpy()
    b = group["b"].to_numpy()
    m = len(a)
    da = (ip[a + 1] - ip[a]).astype(np.int64)
    db = (ip[b + 1] - ip[b]).astype(np.int64)
    pid = np.arange(m, dtype=np.int64)
    keys_a = np.repeat(pid, da) * n + ix[ranges_to_indices(ip[a], ip[a + 1])]
    keys_b = np.repeat(pid, db) * n + ix[ranges_to_indices(ip[b], ip[b + 1])]
    keys = np.concatenate([keys_a, keys_b])
    keys.sort(kind="stable")
    dup = keys[1:] == keys[:-1]
    inter = np.bincount(keys[1:][dup] // n, minlength=m)
    if metric == "jaccard":
        denom = da + db - inter
    else:  # overlap
        denom = np.minimum(da, db)
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.where(denom > 0, inter / denom, 0.0)
    keep = sims >= cutoff
    return pd.DataFrame({"a": a[keep], "b": b[keep],
                         "similarity": sims[keep]})


def node_similarity(
    graph: PartitionedGraph,
    metric: str = "jaccard",         # jaccard | overlap
    degree_cutoff: int = 1,
    similarity_cutoff: float = 1e-42,
    top_k: int | None = 10,
    top_n: int | None = None,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """(node1, node2, similarity) — both directions per pair like the
    reference's stream mode (a→b and b→a when both survive topK)."""
    n = graph.n
    src, dst = _stream_edges(graph)
    indptr, indices = _csr(n, src, dst)
    deg = np.diff(indptr)
    eligible = deg >= degree_cutoff
    eligible_ref = ray.put(eligible)
    indptr_ref = ray.put(indptr)
    indices_ref = ray.put(indices)

    pairs = _candidate_pairs(graph, eligible_ref, num_buckets)

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = df["a"].to_numpy() % num_buckets
        return df

    scored = (pairs.map_batches(rebucket, batch_format="pandas")
              .groupby("__bucket")
              .map_groups(_score_kernel, batch_format="pandas",
                          fn_args=(indptr_ref, indices_ref, n, metric,
                                   similarity_cutoff)))

    def both_directions(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node1": np.concatenate([df["a"].to_numpy(np.int64),
                                     df["b"].to_numpy(np.int64)]),
            "node2": np.concatenate([df["b"].to_numpy(np.int64),
                                     df["a"].to_numpy(np.int64)]),
            "similarity": np.concatenate([df["similarity"].to_numpy()] * 2),
        })

    streamed = scored.map_batches(both_directions, batch_format="pandas")

    if top_k is not None:
        def node_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__bucket"] = df["node1"].to_numpy() % num_buckets
            return df

        def topk_kernel(group: pd.DataFrame) -> pd.DataFrame:
            return (group.sort_values(["node1", "similarity", "node2"],
                                      ascending=[True, False, True])
                    .groupby("node1", sort=False).head(top_k)
                    [["node1", "node2", "similarity"]])

        streamed = (streamed.map_batches(node_bucket, batch_format="pandas")
                    .groupby("__bucket")
                    .map_groups(topk_kernel, batch_format="pandas"))

    df = streamed.to_pandas()
    if df.empty:
        df = pd.DataFrame({"node1": pd.Series(dtype=np.int64),
                           "node2": pd.Series(dtype=np.int64),
                           "similarity": pd.Series(dtype=np.float64)})
    if top_n is not None:
        df = df.sort_values(["similarity", "node1", "node2"],
                            ascending=[False, True, True]).head(top_n)
    return df.reset_index(drop=True)
