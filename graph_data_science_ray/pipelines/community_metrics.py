"""Standalone community metrics — parity with gds.conductance
(alpha/.../impl/conductance/Conductance.java) and gds.modularity
(the modularity proc over a precomputed community property).

Both are one distributed pass over the edge table with a broadcast
label array: each batch emits COMPACT per-community partials
(internal-weight / volume / cut sums over the communities present in
the batch), combined by the hash-bucketed groupby-sum — never an
O(#communities) dense array per batch and no driver edge
materialization."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.shuffle import aggregate_rows
from ..stages.superstep import PartitionedGraph


def _community_edge_partials(graph: PartitionedGraph,
                             labels: np.ndarray) -> pd.DataFrame:
    """Σ per community over the one-direction edge table: vol (both
    endpoints' weight), internal weight, cut weight. Symmetric
    (undirected) interpretation: each edge counts once."""
    labels_ref = (labels if isinstance(labels, ray.ObjectRef)
                  else ray.put(np.asarray(labels, dtype=np.int64)))
    cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")
    edges = graph.edges_dataset(cols, flow="out")

    def partial(t: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = (t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
             if "weight" in t.column_names else np.ones(len(src)))
        ls, ld = lab[src], lab[dst]
        same = ls == ld
        key = np.concatenate([ls, ld])
        comm, inv = np.unique(key, return_inverse=True)
        m = len(comm)
        vol = np.bincount(inv, weights=np.concatenate([w, w]), minlength=m)
        # both halves of an internal edge add w → internal = 2w per edge
        internal = (np.bincount(inv[:len(ls)], weights=np.where(same, w, 0.0),
                                minlength=m)
                    + np.bincount(inv[len(ls):],
                                  weights=np.where(same, w, 0.0),
                                  minlength=m))
        cut = (np.bincount(inv[:len(ls)], weights=np.where(~same, w, 0.0),
                           minlength=m)
               + np.bincount(inv[len(ls):], weights=np.where(~same, w, 0.0),
                             minlength=m))
        return pa.table({"community": comm, "vol": vol,
                         "internal": internal, "cut": cut})

    partials = edges.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    out = aggregate_rows(partials, ["community"],
                         ["vol", "internal", "cut"]).to_pandas()
    if out.empty:
        out = pd.DataFrame({"community": pd.Series(dtype=np.int64),
                            "vol": pd.Series(dtype=np.float64),
                            "internal": pd.Series(dtype=np.float64),
                            "cut": pd.Series(dtype=np.float64)})
    return out.sort_values("community").reset_index(drop=True)


def conductance(graph: PartitionedGraph, labels: np.ndarray) -> pd.DataFrame:
    """(community, conductance) — cut / min(vol, totalVol - vol) per
    community over the undirected weighted graph (Conductance.java
    semantics; communities with zero denominator report 0)."""
    agg = _community_edge_partials(graph, labels)
    total_vol = float(agg["vol"].sum())
    vol = agg["vol"].to_numpy()
    cut = agg["cut"].to_numpy()
    denom = np.minimum(vol, total_vol - vol)
    with np.errstate(divide="ignore", invalid="ignore"):
        cond = np.where(denom > 0, cut / denom, 0.0)
    return pd.DataFrame({"community": agg["community"].to_numpy(np.int64),
                         "conductance": cond})


def modularity_by_community(graph: PartitionedGraph,
                            labels: np.ndarray) -> pd.DataFrame:
    """(community, modularity) per-community contributions
    Q_c = in_c/(2m) − (vol_c/(2m))²; ``.modularity.sum()`` is the graph
    modularity (gds.modularity stats/stream)."""
    agg = _community_edge_partials(graph, labels)
    two_m = float(agg["vol"].sum())
    if two_m == 0:
        return pd.DataFrame({"community": agg["community"].to_numpy(np.int64),
                             "modularity": np.zeros(len(agg))})
    q = (agg["internal"].to_numpy() / two_m
         - (agg["vol"].to_numpy() / two_m) ** 2)
    return pd.DataFrame({"community": agg["community"].to_numpy(np.int64),
                         "modularity": q})
