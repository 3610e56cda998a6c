"""Subgraph projection — parity with gds.beta.graph.project.subgraph
(subgraph-filtering/src/main/java/org/neo4j/gds/beta/filter/
GraphStoreFilter.java, NodesFilter.java, RelationshipsFilter.java):
filter an existing graph by vertex / edge predicates into a new graph.

Predicates are vectorized callables over numpy columns (the analogue of
the reference's parsed expression AST evaluated per element)."""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from ..stages.superstep import PartitionedGraph


def filter_graph(
    graph: PartitionedGraph,
    edge_predicate: Callable[[np.ndarray, np.ndarray, np.ndarray | None],
                             np.ndarray] | None = None,
    vertex_mask: np.ndarray | None = None,
) -> PartitionedGraph:
    """edge_predicate(src, dst, weight) -> bool mask; vertex_mask keeps
    edges whose BOTH endpoints are kept (reference semantics: filtered
    nodes drop their relationships). Vertex ids are preserved (no
    re-densification) so results stay comparable to the parent graph."""
    if graph.kind != "arrays":
        raise NotImplementedError("filter_graph operates on in-memory "
                                  "edge arrays; parquet graphs: rebuild "
                                  "via sources.graph_build on a filtered "
                                  "edge Dataset")
    src, dst, w = graph.src, graph.dst, graph.weight
    keep = np.ones(len(src), dtype=bool)
    if edge_predicate is not None:
        keep &= edge_predicate(src, dst, w)
    if vertex_mask is not None:
        keep &= vertex_mask[src] & vertex_mask[dst]
    return PartitionedGraph.from_arrays(
        graph.n, src[keep], dst[keep], None if w is None else w[keep])