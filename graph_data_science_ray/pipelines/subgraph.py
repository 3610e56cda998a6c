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
    out_dir: str | None = None,
) -> PartitionedGraph:
    """edge_predicate(src, dst, weight) -> bool mask; vertex_mask keeps
    edges whose BOTH endpoints are kept (reference semantics: filtered
    nodes drop their relationships). Vertex ids are preserved (no
    re-densification) so results stay comparable to the parent graph.

    Parquet graphs filter DISTRIBUTED: the predicate runs inside
    map_batches over the edge Dataset (vertex mask broadcast via
    ray.put) and the kept edges are re-laid-out into a new partitioned
    graph dir (`out_dir`, or a fresh temp dir)."""
    if graph.kind == "arrays":
        src, dst, w = graph.src, graph.dst, graph.weight
        keep = np.ones(len(src), dtype=bool)
        if edge_predicate is not None:
            keep &= edge_predicate(src, dst, w)
        if vertex_mask is not None:
            keep &= vertex_mask[src] & vertex_mask[dst]
        return PartitionedGraph.from_arrays(
            graph.n, src[keep], dst[keep], None if w is None else w[keep])

    import tempfile

    import pyarrow as pa
    import ray

    from ..sources.graph_build import build_int_graph
    mask_ref = ray.put(vertex_mask) if vertex_mask is not None else None
    cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")
    edges = graph.edges_dataset(cols, flow="out")

    def kernel(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = (t["weight"].to_numpy(zero_copy_only=False)
             if "weight" in t.column_names else None)
        keep = np.ones(len(src), dtype=bool)
        if edge_predicate is not None:
            keep &= edge_predicate(src, dst, w)
        if mask_ref is not None:
            vm = ray.get(mask_ref)
            keep &= vm[src] & vm[dst]
        return t.filter(pa.array(keep))

    filtered = edges.map_batches(kernel, batch_format="pyarrow",
                                 zero_copy_batch=True)
    out = out_dir or tempfile.mkdtemp(prefix="gds_filtered_graph_")
    g = build_int_graph(
        filtered, out, graph.n, graph.num_parts_layout,
        weight_col="weight" if graph.weighted else None, dedup=False,
        lineage={"source": graph.path, "derivation": "filter_graph"})
    # a fresh temp re-layout is owned by the handle: callers (or their
    # finally blocks) release it via g.cleanup() instead of leaking
    # O(E) parquet under /tmp per filtered run
    g.owns_dir = out_dir is None
    return g