"""Graph catalog — parity with the reference's GraphStoreCatalog
(core/src/main/java/org/neo4j/gds/core/loading/GraphStoreCatalog.java:40-147)
and the gds.graph.list / exists / drop procedures: named graphs are
manifest-backed directories under a catalog root."""

from __future__ import annotations

import json
import os
import shutil

from .stages.superstep import PartitionedGraph


class GraphCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), "manifest.json"))

    def list(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            mp = os.path.join(self.root, name, "manifest.json")
            if os.path.exists(mp):
                with open(mp) as f:
                    m = json.load(f)
                out.append({"graphName": name,
                            "nodeCount": m.get("num_vertices"),
                            "relationshipCount": m.get("num_edges"),
                            "weighted": m.get("weighted", False)})
        return out

    def get(self, name: str) -> PartitionedGraph:
        if not self.exists(name):
            raise KeyError(f"graph '{name}' not in catalog")
        return PartitionedGraph.from_manifest(self._dir(name))

    def drop(self, name: str) -> bool:
        if not self.exists(name):
            return False
        shutil.rmtree(self._dir(name))
        return True

    def path_for(self, name: str) -> str:
        """Target directory for building a new catalog entry."""
        return self._dir(name)


def graph_summary(graph: PartitionedGraph,
                  orientation: str = "natural") -> dict:
    """gds.graph.list-style summary with the degree distribution block
    (GraphListProc: min/mean/max + p50/p75/p90/p99 percentiles).

    Degrees come from the distributed partial-bincount pipeline; only
    the O(V) degree vector reaches the driver for the percentile pass
    (np.percentile linear interpolation == SQL PERCENTILE_CONT)."""
    import numpy as np

    from .pipelines.degree import degree_centrality
    deg = degree_centrality(graph, orientation=orientation)["score"]
    d = deg.to_numpy()
    pct = (np.percentile(d, [50, 75, 90, 99]) if len(d)
           else np.zeros(4))
    return {
        "nodeCount": graph.n,
        "relationshipCount": graph.num_edges,
        "weighted": graph.weighted,
        "degreeMin": float(d.min()) if len(d) else 0.0,
        "degreeMean": float(d.mean()) if len(d) else 0.0,
        "degreeMax": float(d.max()) if len(d) else 0.0,
        "degreeP50": float(pct[0]),
        "degreeP75": float(pct[1]),
        "degreeP90": float(pct[2]),
        "degreeP99": float(pct[3]),
    }