"""Flagship end-to-end pipeline: repo table → derived graph → algorithms.

This is the north-rule composition: read the Parquet repo table →
zero-copy map_batches edge extraction (with per-row sha256) → groupby
dedup/aggregate → dense vid assignment → partitioned CSR block layout →
iterative algorithms on the superstep engine.
"""

from __future__ import annotations

import ray.data as rd

from ..sources.edge_derivation import derive_edges, file_digests
from ..sources.graph_build import build_graph, content_digest
from ..stages.superstep import PartitionedGraph


def build_graph_from_repos(
    repos_path: str,
    graph_dir: str,
    num_parts: int,
    aggregation: str = "single",
    include_isolated: bool = True,
    verify_digest: bool = True,
) -> PartitionedGraph:
    """Read the repo table, derive repo→repo edges, build the graph dir."""
    import ray
    nblocks = 4 * max(1, int(ray.cluster_resources().get("CPU", 4)))
    repos = rd.read_parquet(repos_path,
                            columns=["repo", "path", "commit", "content"],
                            override_num_blocks=nblocks)
    edges = derive_edges(repos)
    lineage = {"source": repos_path}
    if verify_digest:
        lineage["content_sha256_xor"] = content_digest(file_digests(repos))
    extra = repos.select_columns(["repo"]) if include_isolated else None
    return build_graph(edges, graph_dir, num_parts, aggregation=aggregation,
                       extra_names_ds=extra, lineage=lineage)
