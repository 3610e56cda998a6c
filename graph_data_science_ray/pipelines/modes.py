"""Result modes — parity with the reference's four procedure modes
(proc/src/main/java/org/neo4j/gds/: StatsProc, MutatePropertyProc,
stream procs, core/write exporters):

  stream  → per-vertex result rows (optionally joined to original keys)
  stats   → summary only: histogram percentiles + counts
            (algo-common/.../result/CommunityStatistics.java:43-84,
             CentralityStatistics.java)
  mutate  → persist the result as a new named property column under the
            graph dir (GraphStore.addNodeProperty analogue)
  write   → export to an external Parquet sink
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.superstep import PartitionedGraph, SuperstepResult

_PERCENTILES = [1, 5, 10, 25, 50, 75, 90, 95, 99]


def stream(result: SuperstepResult, graph: PartitionedGraph | None = None,
           key_col: str = "repo") -> pd.DataFrame:
    """(vid [, original key], value...) rows."""
    df = result.to_pandas()
    if graph is not None and graph.kind == "parquet":
        vertices = pq.read_table(
            os.path.join(graph.path, "vertices.parquet")).to_pandas()
        df = df.merge(vertices, on="vid", how="left")
    return df


def stats(result: SuperstepResult, value_col: str | None = None) -> dict:
    """Centrality-style distribution summary or community-style counts."""
    df = result.to_pandas()
    col = value_col or result.state_keys[0]
    v = df[col].to_numpy()
    out = {
        "count": int(len(v)),
        "min": float(np.min(v)) if len(v) else None,
        "max": float(np.max(v)) if len(v) else None,
        "mean": float(np.mean(v)) if len(v) else None,
    }
    for p in _PERCENTILES:
        out[f"p{p}"] = float(np.percentile(v, p)) if len(v) else None
    if np.issubdtype(v.dtype, np.integer):
        # community-style: component/label counts
        _, counts = np.unique(v, return_counts=True)
        out["communityCount"] = int(len(counts))
        for p in _PERCENTILES:
            out[f"communitySize_p{p}"] = float(np.percentile(counts, p))
    return out


def mutate(result: SuperstepResult, graph: PartitionedGraph,
           property_name: str) -> str:
    """Add the result as a named per-vertex property column set under the
    graph dir (vertex_state/<property>/part=*.parquet + manifest entry)."""
    if graph.kind != "parquet":
        raise ValueError("mutate requires a parquet-backed graph")
    out_dir = os.path.join(graph.path, "vertex_state", property_name)
    os.makedirs(out_dir, exist_ok=True)
    import ray
    tables = ray.get(result.state_refs)
    for p, t in enumerate(tables):
        path = os.path.join(out_dir, f"part={p}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    mpath = os.path.join(graph.path, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    props = manifest.setdefault("node_properties", {})
    props[property_name] = {"columns": list(result.state_keys),
                            "parts": len(tables)}
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, mpath)
    return out_dir


def read_property(graph: PartitionedGraph, property_name: str) -> pd.DataFrame:
    """Read back a mutated property column set as (vid, ...)."""
    out_dir = os.path.join(graph.path, "vertex_state", property_name)
    parts = sorted(os.listdir(out_dir))
    tables = [pq.read_table(os.path.join(out_dir, p)) for p in parts]
    return pa.concat_tables(tables).to_pandas().sort_values(
        "vid").reset_index(drop=True)


def write(result: SuperstepResult, out_dir: str) -> str:
    """Export the result Dataset as partitioned Parquet (external sink)."""
    result.to_dataset().write_parquet(out_dir)
    return out_dir