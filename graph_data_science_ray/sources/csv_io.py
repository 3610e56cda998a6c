"""CSV graph export / import — parity with the reference's CSV
GraphStore round-trip (csv/src/main/java/org/neo4j/gds/core/utils/io/
file/csv/CsvRelationshipVisitor.java + CsvGraphStoreImporter.java:
nodes and relationships as header-described CSV file sets).

Ray-Data shape: export streams the graph's out-flow edge Dataset into
a directory of CSV part files (one per block — resumable, never one
giant file) plus a ``nodes`` file set and a tiny JSON header carrying
n / weightedness (the reference's schema sidecars). Import is
``read_csv`` → the shared distributed ``build_int_graph`` re-layout;
both directions stream block-by-block with no driver edge arrays.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import ray.data as rd

from ..stages.superstep import PartitionedGraph


def export_graph_csv(graph: PartitionedGraph, out_dir: str) -> dict:
    """Write ``out_dir/{relationships,nodes}/*.csv`` + ``header.json``;
    returns the header dict. Streams the edge Dataset — node ids are
    emitted distributedly from ``range(n)`` (no driver array)."""
    os.makedirs(out_dir, exist_ok=True)
    cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")
    edges = graph.edges_dataset(cols, flow="out")
    edges.write_csv(os.path.join(out_dir, "relationships"))

    def ids_batch(t: pa.Table) -> pa.Table:
        return pa.table({"vid": t["id"]})

    rd.range(graph.n).map_batches(
        ids_batch, batch_format="pyarrow", zero_copy_batch=True,
    ).write_csv(os.path.join(out_dir, "nodes"))
    header = {"n": int(graph.n), "weighted": bool(graph.weighted),
              "columns": list(cols)}
    with open(os.path.join(out_dir, "header.json"), "w") as f:
        json.dump(header, f)
    return header


def import_graph_csv(csv_dir: str, graph_dir: str,
                     num_parts: int = 8) -> PartitionedGraph:
    """Read an exported CSV graph back into a partitioned block layout
    (the shared distributed build path); round-trips edges, weights and
    the vertex-id space exactly."""
    from .graph_build import build_int_graph
    with open(os.path.join(csv_dir, "header.json")) as f:
        header = json.load(f)
    files = sorted(glob.glob(os.path.join(csv_dir, "relationships", "*")))
    edges = rd.read_csv(files)

    def norm(t: pa.Table) -> pa.Table:
        out = {"src": t["src"].cast(pa.int64()),
               "dst": t["dst"].cast(pa.int64())}
        if header["weighted"]:
            out["weight"] = t["weight"].cast(pa.float64())
        return pa.table(out)

    edges = edges.map_batches(norm, batch_format="pyarrow",
                              zero_copy_batch=True)
    return build_int_graph(
        edges, graph_dir, int(header["n"]), num_parts,
        aggregation="sum" if header["weighted"] else "single",
        weight_col="weight" if header["weighted"] else None,
        lineage={"source": csv_dir, "derivation": "csv_import"})


def _norm_edges(src_col: str, dst_col: str, weight_col: str | None):
    def norm(t: pa.Table) -> pa.Table:
        out = {"src": t[src_col].cast(pa.int64()),
               "dst": t[dst_col].cast(pa.int64())}
        if weight_col is not None:
            out["weight"] = t[weight_col].cast(pa.float64())
        return pa.table(out)
    return norm


def edge_list_from_csv(files: list[str] | str,
                       src_col: str = "src", dst_col: str = "dst",
                       weight_col: str | None = None) -> rd.Dataset:
    """Generic CSV edge-list reader for external data: any column
    naming → the engine's (src, dst[, weight]) schema, streaming."""
    return rd.read_csv(files).map_batches(
        _norm_edges(src_col, dst_col, weight_col),
        batch_format="pyarrow", zero_copy_batch=True)


def edge_list_from_json(files: list[str] | str,
                        src_col: str = "src", dst_col: str = "dst",
                        weight_col: str | None = None) -> rd.Dataset:
    """JSONL edge-list reader (one edge object per line) → the same
    normalized streaming schema."""
    return rd.read_json(files).map_batches(
        _norm_edges(src_col, dst_col, weight_col),
        batch_format="pyarrow", zero_copy_batch=True)
