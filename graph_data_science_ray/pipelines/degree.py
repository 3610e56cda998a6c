"""Degree centrality — parity with gds.degree
(algo/src/main/java/org/neo4j/gds/degree/DegreeCentrality.java:40-110):
in/out/undirected degree, optionally Σ edge weights."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph


def degree_centrality(
    graph: PartitionedGraph,
    orientation: str = "natural",   # natural (out) | reverse (in) | undirected
    weighted: bool = False,
) -> pd.DataFrame:
    """(vid, score). For the in-memory kind this is a driver-side
    bincount; the parquet kind streams per-partition blocks."""
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
        import glob
        import os

        import pyarrow.parquet as pq
        flows = {"natural": [("out", "src")], "reverse": [("in", "dst")],
                 "undirected": [("out", "src"), ("in", "dst")]}[orientation]
        for flow, col in flows:
            for f in glob.glob(os.path.join(graph.path, flow, "part=*",
                                            "*.parquet")) + glob.glob(
                    os.path.join(graph.path, flow, "part=*.parquet")):
                cols = [col] + (["weight"] if weighted and graph.weighted else [])
                t = pq.read_table(f, columns=cols)
                k = t[col].to_numpy(zero_copy_only=False)
                if weighted and graph.weighted:
                    score += np.bincount(
                        k, weights=t["weight"].to_numpy(zero_copy_only=False),
                        minlength=n)
                else:
                    score += np.bincount(k, minlength=n)
    return pd.DataFrame({"vid": np.arange(n, dtype=np.int64), "score": score})
