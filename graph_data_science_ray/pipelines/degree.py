"""Degree centrality — parity with gds.degree
(algo/src/main/java/org/neo4j/gds/degree/DegreeCentrality.java:40-110):
in/out/undirected degree, optionally Σ edge weights.

Distributed shape (parquet graphs): the flow's edge files are read as a
Ray Dataset; each batch emits a COMPACT (vid, score) partial (unique
keys in the batch — never an O(V) dense array per batch), which a
hash-bucketed groupby-sum combines (stages.shuffle.aggregate_rows).
The O(V) result lands on the driver only at collection time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.superstep import PartitionedGraph


def degrees_ds(
    edges: rd.Dataset,
    key_cols: tuple[str, ...] = ("src",),
    weight_col: str | None = None,
) -> rd.Dataset:
    """(vid, score) degree table from an edge dataset — per-batch compact
    partial counts, then a bucketed groupby-sum. Vertices with no edges
    don't appear (join/reindex with 0 downstream if needed)."""

    def partial(t: pa.Table) -> pa.Table:
        keys, wgts = [], []
        for c in key_cols:
            k = t[c].to_numpy(zero_copy_only=False)
            keys.append(k)
            if weight_col is not None:
                wgts.append(t[weight_col].to_numpy(zero_copy_only=False))
            else:
                wgts.append(np.ones(len(k)))
        k = np.concatenate(keys)
        w = np.concatenate(wgts)
        vid, inv = np.unique(k, return_inverse=True)
        score = np.bincount(inv, weights=w)
        return pa.table({"vid": vid.astype(np.int64),
                         "score": score.astype(np.float64)})

    from ..stages.shuffle import aggregate_rows
    partials = edges.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return aggregate_rows(partials, ["vid"], ["score"])


def degree_centrality(
    graph: PartitionedGraph,
    orientation: str = "natural",   # natural (out) | reverse (in) | undirected
    weighted: bool = False,
) -> pd.DataFrame:
    """(vid, score) for every vid (0 for isolated vertices)."""
    n = graph.n
    score = np.zeros(n, dtype=np.float64)
    if graph.kind == "arrays":
        pairs = []
        if orientation in ("natural", "undirected"):
            pairs.append((graph.src, graph.weight))
        if orientation in ("reverse", "undirected"):
            pairs.append((graph.dst, graph.weight))
        for keys, w in pairs:
            if weighted and w is not None:
                score += np.bincount(keys, weights=w, minlength=n)
            else:
                score += np.bincount(keys, minlength=n)
    else:
        # both orientations count the edge's OWNER endpoint of each flow
        # file set: out files keyed by src, in files keyed by dst
        flows = {"natural": [("out", ("src",))], "reverse": [("in", ("dst",))],
                 "undirected": [("out", ("src",)), ("in", ("dst",))]}[orientation]
        for flow, key_cols in flows:
            files = graph.flow_files(flow)
            if not files:
                continue
            cols = list(key_cols) + (
                ["weight"] if weighted and graph.weighted else [])
            ds = rd.read_parquet(files, columns=cols)
            deg = degrees_ds(
                ds, key_cols,
                "weight" if weighted and graph.weighted else None)
            for batch in deg.iter_batches(batch_size=1 << 20,
                                          batch_format="pyarrow"):
                vid = batch["vid"].to_numpy(zero_copy_only=False)
                score[vid] += batch["score"].to_numpy(zero_copy_only=False)
    return pd.DataFrame({"vid": np.arange(n, dtype=np.int64), "score": score})
