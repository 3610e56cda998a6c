"""Node Similarity — parity with gds.nodeSimilarity
(similarity/nodesim/NodeSimilarity.java:44-300): pairwise similarity of
out-neighbor sets for node pairs sharing at least one neighbor, with
degreeCutoff / similarityCutoff / per-node topK / global topN.

Shape: candidate pairs come from the inverted index (nodes co-occurring
in some neighbor's in-list — a bucketed self-join, never all-pairs);
exact set scores probe the broadcast CSR adjacency; topK is a per-node
truncation with the reference's (similarity desc, smaller id) ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..stages.superstep import PartitionedGraph
from .triangles import _pairs_within_groups


def _csr(n: int, src: np.ndarray, dst: np.ndarray):
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    # distinct neighbors (reference uses distinct-neighbor semantics)
    keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
    s, d = s[keep], d[keep]
    indptr = np.searchsorted(s, np.arange(n + 1))
    return indptr, d


def node_similarity(
    graph: PartitionedGraph,
    metric: str = "jaccard",         # jaccard | overlap
    degree_cutoff: int = 1,
    similarity_cutoff: float = 1e-42,
    top_k: int | None = 10,
    top_n: int | None = None,
) -> pd.DataFrame:
    """(node1, node2, similarity) — both directions per pair like the
    reference's stream mode (a→b and b→a when both survive topK)."""
    if graph.kind != "arrays":
        raise NotImplementedError("node_similarity currently reads the "
                                  "in-memory edge arrays")
    n, src, dst = graph.n, graph.src, graph.dst
    indptr, indices = _csr(n, src, dst)
    deg = np.diff(indptr)
    eligible = deg >= degree_cutoff

    # candidate pairs: sources sharing a target (inverted-index join)
    rev_order = np.lexsort((src, dst))
    rs, rd = src[rev_order], dst[rev_order]
    keep = np.r_[True, (rd[1:] != rd[:-1]) | (rs[1:] != rs[:-1])]
    rs, rd = rs[keep], rd[keep]
    # keep only eligible sources
    ok = eligible[rs]
    rs, rd = rs[ok], rd[ok]
    change = np.flatnonzero(np.r_[rd[1:] != rd[:-1], True]) + 1
    group_end = np.repeat(change, np.diff(np.r_[0, change]))
    li, ri = _pairs_within_groups(group_end)
    if len(li) == 0:
        return pd.DataFrame({"node1": [], "node2": [], "similarity": []})
    pairs = np.unique(np.stack([rs[li], rs[ri]], axis=1), axis=0)

    sims = np.empty(len(pairs))
    for i, (a, b) in enumerate(pairs):
        na = indices[indptr[a]:indptr[a + 1]]
        nb = indices[indptr[b]:indptr[b + 1]]
        inter = len(np.intersect1d(na, nb, assume_unique=True))
        if metric == "jaccard":
            denom = len(na) + len(nb) - inter
        else:  # overlap
            denom = min(len(na), len(nb))
        sims[i] = inter / denom if denom else 0.0
    keep = sims >= similarity_cutoff
    pairs, sims = pairs[keep], sims[keep]

    # stream both directions, then per-node topK
    node1 = np.concatenate([pairs[:, 0], pairs[:, 1]])
    node2 = np.concatenate([pairs[:, 1], pairs[:, 0]])
    sim = np.concatenate([sims, sims])
    df = pd.DataFrame({"node1": node1, "node2": node2, "similarity": sim})
    if top_k is not None:
        df = (df.sort_values(["node1", "similarity", "node2"],
                             ascending=[True, False, True])
              .groupby("node1", sort=False).head(top_k))
    if top_n is not None:
        df = df.sort_values(["similarity", "node1", "node2"],
                            ascending=[False, True, True]).head(top_n)
    return df.reset_index(drop=True)