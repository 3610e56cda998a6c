"""Graph build: string edge table → vertices + int-encoded partitioned
CSR block layout on Parquet.

The Ray-Data-native analogue of the reference's IdMap + CSR assembly
(core/src/main/java/org/neo4j/gds/core/loading/ScanningRecordsImporter.java,
HugeIdMap dense-id assignment, AdjacencyBuffer paging):

  1. vertices: distinct repo names → dense vid by sorted order (the IdMap;
     deterministic across runs). The sorted name array is broadcast via
     ``ray.put`` and every encode batch does a vectorized
     ``pd.Index.get_indexer`` lookup — a broadcast join, no shuffle.
  2. edges: optional parallel-edge aggregation (the reference's
     Aggregation SINGLE / COUNT / SUM, graph-projection-api/.../
     Aggregation.java:31-86) via groupby.
  3. layout: each edge written twice — partitioned by src % P (OUT
     blocks) and by dst % P (IN blocks) — as
     ``<dir>/{out,in}/part=<p>/*.parquet`` so a PartitionWorker reads
     exactly its own files; plus ``vertices.parquet`` and a
     ``manifest.json`` with schema, counts, partitioning and lineage
     (source digest) — the GraphStore catalog entry.

Scale notes: the vertex name array is the only driver-resident piece
(~10⁸ names OK; beyond that swap step 1 for a distributed sort +
cumulative-offset vid assignment — same downstream contract).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.superstep import PartitionedGraph


def assign_vertex_ids(edges_ds: rd.Dataset, extra_names_ds: rd.Dataset | None = None,
                      ) -> np.ndarray:
    """Distinct names from src_repo/dst_repo (+ an optional extra name
    column dataset, e.g. all repos incl. isolated ones) → sorted array;
    vid = position."""
    names: set[str] = set()
    for batch in edges_ds.select_columns(["src_repo", "dst_repo"]).iter_batches(
            batch_size=1 << 18, batch_format="pyarrow"):
        names.update(batch["src_repo"].to_pylist())
        names.update(batch["dst_repo"].to_pylist())
    if extra_names_ds is not None:
        for batch in extra_names_ds.iter_batches(batch_size=1 << 18,
                                                 batch_format="pyarrow"):
            names.update(batch[batch.column_names[0]].to_pylist())
    return np.array(sorted(names), dtype=object)


def assign_vertex_ids_distributed(
    edges_ds: rd.Dataset,
    extra_names_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """(repo, vid) mapping Dataset with vid = rank by sorted name — the
    same IdMap contract as ``assign_vertex_ids`` but with NO driver name
    array: distinct names via the hash-bucketed dedup, a distributed
    sort, then per-block cumulative offsets (one small int per block on
    the driver) assigned inside map-over-blocks tasks. The scale path
    past ~10⁸ names (the driver-resident array's documented limit)."""
    from ..stages.shuffle import distinct_rows

    def names_only(t: pa.Table) -> pa.Table:
        return pa.table({"repo": pa.concat_arrays(
            [t["src_repo"].combine_chunks().cast(pa.string()),
             t["dst_repo"].combine_chunks().cast(pa.string())])})

    names = edges_ds.select_columns(["src_repo", "dst_repo"]).map_batches(
        names_only, batch_format="pyarrow", zero_copy_batch=True)
    if extra_names_ds is not None:
        col = extra_names_ds.schema().names[0]

        def rename(t: pa.Table, col=col) -> pa.Table:
            return pa.table({"repo": t[col].cast(pa.string())})

        names = names.union(extra_names_ds.map_batches(
            rename, batch_format="pyarrow"))
    distinct = distinct_rows(names, ["repo"])
    sorted_names = distinct.sort("repo").materialize()
    # per-block row counts from block METADATA (no data fetch); the
    # offsets vector is O(#blocks), not O(V)
    bundles = list(sorted_names.iter_internal_ref_bundles())
    counts = [int(b.num_rows()) for b in bundles]
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote
    def add_vids(block_ref, offset: int) -> pa.Table:
        t = block_ref if isinstance(block_ref, pa.Table) else block_ref
        return pa.table({
            "repo": t["repo"],
            "vid": np.arange(offset, offset + len(t), dtype=np.int64)})

    out_refs = []
    for bundle, off in zip(bundles, offsets):
        for block_ref in bundle.block_refs:
            out_refs.append(add_vids.remote(block_ref, int(off)))
    return rd.from_arrow_refs(out_refs)


def encode_edges_distributed(edges_ds: rd.Dataset, mapping: rd.Dataset,
                             num_buckets: int = 32) -> rd.Dataset:
    """Edge name→vid encoding WITHOUT a driver/broadcast name array: a
    hash-bucketed sort-merge join of each endpoint column against the
    (repo, vid) mapping Dataset. Two shuffle joins (one per endpoint) —
    the honest all-distributed form of the IdMap lookup."""

    def _join_side(ds: rd.Dataset, name_col: str, keep_col: str,
                   out_name: str) -> rd.Dataset:
        def tag_edges(t: pa.Table) -> pa.Table:
            import pandas as pd
            names = t[name_col].to_pylist()
            h = pd.util.hash_array(np.asarray(names, dtype=object),
                                   categorize=False)
            return pa.table({
                "name": pa.array(names, type=pa.string()),
                "other": t[keep_col].cast(pa.string()),
                "is_map": np.zeros(len(names), dtype=bool),
                "vid": np.full(len(names), -1, dtype=np.int64),
                "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
            })

        def tag_map(t: pa.Table) -> pa.Table:
            import pandas as pd
            names = t["repo"].to_pylist()
            h = pd.util.hash_array(np.asarray(names, dtype=object),
                                   categorize=False)
            return pa.table({
                "name": pa.array(names, type=pa.string()),
                "other": pa.array([""] * len(names), type=pa.string()),
                "is_map": np.ones(len(names), dtype=bool),
                "vid": t["vid"].cast(pa.int64()),
                "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
            })

        def join_kernel(group) -> "pa.Table":
            import pandas as pd
            m = group[group["is_map"]]
            e = group[~group["is_map"]]
            lut = pd.Series(m["vid"].to_numpy(),
                            index=m["name"]).to_dict()
            return pd.DataFrame({
                out_name: e["name"].map(lut).astype(np.int64),
                "other": e["other"],
            })

        both = (ds.map_batches(tag_edges, batch_format="pyarrow")
                .union(mapping.map_batches(tag_map,
                                           batch_format="pyarrow")))
        return (both.groupby("__bucket")
                .map_groups(join_kernel, batch_format="pandas"))

    src_done = _join_side(edges_ds, "src_repo", "dst_repo", "src")

    # second pass joins dst names, carrying the already-encoded src vid
    def tag_edges2(t: pa.Table) -> pa.Table:
        import pandas as pd
        names = t["other"].to_pylist()
        h = pd.util.hash_array(np.asarray(names, dtype=object),
                               categorize=False)
        return pa.table({
            "name": pa.array(names, type=pa.string()),
            "src": t["src"],
            "is_map": np.zeros(len(names), dtype=bool),
            "vid": np.full(len(names), -1, dtype=np.int64),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def tag_map2(t: pa.Table) -> pa.Table:
        import pandas as pd
        names = t["repo"].to_pylist()
        h = pd.util.hash_array(np.asarray(names, dtype=object),
                               categorize=False)
        return pa.table({
            "name": pa.array(names, type=pa.string()),
            "src": np.full(len(names), -1, dtype=np.int64),
            "is_map": np.ones(len(names), dtype=bool),
            "vid": t["vid"].cast(pa.int64()),
            "__bucket": (h % np.uint64(num_buckets)).astype(np.int64),
        })

    def join_kernel2(group) -> "pa.DataFrame":
        import pandas as pd
        m = group[group["is_map"]]
        e = group[~group["is_map"]]
        lut = pd.Series(m["vid"].to_numpy(), index=m["name"]).to_dict()
        return pd.DataFrame({
            "src": e["src"].astype(np.int64),
            "dst": e["name"].map(lut).astype(np.int64),
        })

    def src_table(df) -> "pa.Table":
        return pa.table({"other": pa.array(df["other"].tolist(),
                                           type=pa.string()),
                         "src": df["src"].to_numpy(np.int64)})

    src_ds = src_done.map_batches(src_table, batch_format="pandas")
    both2 = (src_ds.map_batches(tag_edges2, batch_format="pyarrow")
             .union(mapping.map_batches(tag_map2, batch_format="pyarrow")))
    return (both2.groupby("__bucket")
            .map_groups(join_kernel2, batch_format="pandas"))


def build_graph(
    edges_ds: rd.Dataset,
    graph_dir: str,
    num_parts: int,
    aggregation: str = "single",   # 'single' | 'count'
    extra_names_ds: rd.Dataset | None = None,
    lineage: dict | None = None,
    distributed_ids: bool = False,
) -> PartitionedGraph:
    """edges_ds columns: (src_repo, dst_repo, ...). Writes the graph dir
    layout and returns the PartitionedGraph handle.

    distributed_ids=True switches the IdMap step to the fully
    distributed form (no driver-resident name array; sort-ranked vids +
    hash-bucketed encode joins — see assign_vertex_ids_distributed) for
    vertex sets past the broadcast array's ~10⁸-name comfort zone.
    Both paths produce identical vids (rank by sorted name)."""
    os.makedirs(graph_dir, exist_ok=True)
    if distributed_ids:
        mapping = assign_vertex_ids_distributed(
            edges_ds, extra_names_ds).materialize()
        n = mapping.count()
        int_edges = encode_edges_distributed(edges_ds, mapping)
    else:
        names = assign_vertex_ids(edges_ds, extra_names_ds)
        n = len(names)
        names_ref = ray.put(names)

        def encode(batch: pa.Table) -> pa.Table:
            idx = pd.Index(ray.get(names_ref))
            src = idx.get_indexer(
                batch["src_repo"].to_pylist()).astype(np.int64)
            dst = idx.get_indexer(
                batch["dst_repo"].to_pylist()).astype(np.int64)
            return pa.table({"src": src, "dst": dst})

        int_edges = edges_ds.map_batches(encode, batch_format="pyarrow",
                                         zero_copy_batch=True)
    # parallel-edge aggregation (reference Aggregation at load time) via
    # bucketed distinct (stages.shuffle — Ray's native groupby is
    # per-group-cost-bound and unusable at edge cardinality)
    from ..stages.shuffle import distinct_rows
    if aggregation == "count":
        weighted = True
        grouped = distinct_rows(int_edges, ["src", "dst"], count_alias="mult")

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "src": t["src"], "dst": t["dst"],
                "weight": t["mult"].cast(pa.float64()),
            })
    else:
        weighted = False
        grouped = distinct_rows(int_edges, ["src", "dst"])

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["src"], "dst": t["dst"]})

    # pin the deduplicated edge set so the two layout writes + count don't
    # re-run the shuffle (small relative to the raw input; spills if large)
    dedup = grouped.map_batches(finish, batch_format="pyarrow").materialize()

    if distributed_ids:
        # stream the IdMap out (pq.read_table reads the directory form)
        mapping.write_parquet(os.path.join(graph_dir, "vertices.parquet"))
        vertices = None
    else:
        vertices = pa.table({
            "vid": np.arange(n, dtype=np.int64),
            "repo": pa.array(list(names), type=pa.string()),
        })
    return _finish_layout(dedup, graph_dir, n, num_parts, weighted,
                          aggregation, lineage, vertices=vertices)


def _finish_layout(
    dedup: rd.Dataset,
    graph_dir: str,
    n: int,
    num_parts: int,
    weighted: bool,
    aggregation: str,
    lineage: dict | None,
    vertices: pa.Table | None = None,
) -> PartitionedGraph:
    """Write the partitioned out/in flow layout + manifest for an already
    deduplicated int edge dataset (columns src, dst[, weight])."""
    os.makedirs(graph_dir, exist_ok=True)
    for flow, key in (("out", "src"), ("in", "dst")):
        def with_part(t: pa.Table, key=key) -> pa.Table:
            part = t[key].to_numpy(zero_copy_only=False) % num_parts
            return t.append_column("part", pa.array(part.astype(np.int64)))

        flow_dir = os.path.join(graph_dir, flow)
        dedup.map_batches(with_part, batch_format="pyarrow").write_parquet(
            flow_dir, partition_cols=["part"])

    num_edges = dedup.count()
    import pyarrow.parquet as pq
    if vertices is not None:
        pq.write_table(vertices, os.path.join(graph_dir, "vertices.parquet"))

    manifest = {
        "num_vertices": n,
        "num_edges": int(num_edges),
        "num_parts": num_parts,
        "weighted": weighted,
        "aggregation": aggregation,
        "partitioning": "vid % num_parts (dense vids by sorted repo name)",
        "lineage": lineage or {},
    }
    tmp = os.path.join(graph_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(graph_dir, "manifest.json"))
    return PartitionedGraph.from_manifest(graph_dir)


def build_int_graph(
    edges_ds: rd.Dataset,
    graph_dir: str,
    n: int,
    num_parts: int,
    symmetrize: bool = False,
    aggregation: str = "single",   # 'single' | 'count' | 'sum' | 'min' | 'max'
    weight_col: str | None = None,
    dedup: bool = True,
    lineage: dict | None = None,
) -> PartitionedGraph:
    """Partitioned layout for an edge dataset that already carries dense
    int64 vids (columns src, dst[, weight_col]) — skips the IdMap step of
    ``build_graph``. `symmetrize` emits each edge in both directions
    before dedup (undirected import). Parallel-edge `aggregation` ≙ the
    reference's load-time Aggregation (Aggregation.java: NONE/SINGLE/
    SUM/MIN/MAX/COUNT): 'sum'/'min'/'max' fold `weight_col` over
    parallel edges; 'count' counts multiplicity; 'single' dedups."""
    from ..stages.shuffle import aggregate_rows, distinct_rows

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])

    def prep(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {"src": src, "dst": dst}
        if weight_col:
            out["weight"] = t[weight_col].to_numpy(
                zero_copy_only=False).astype(np.float64)
        if symmetrize:
            out = {k: np.concatenate([v, v]) for k, v in out.items()}
            out["src"], out["dst"] = (
                np.concatenate([src, dst]), np.concatenate([dst, src]))
        return pa.table(out)

    prepped = edges_ds.select_columns(cols).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True)

    weighted = (aggregation in ("count", "sum", "min", "max")
                or weight_col is not None)
    if aggregation == "count":
        grouped = distinct_rows(prepped, ["src", "dst"], count_alias="mult")

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["src"], "dst": t["dst"],
                             "weight": t["mult"].cast(pa.float64())})
        final = grouped.map_batches(finish, batch_format="pyarrow")
    elif aggregation == "sum":
        final = aggregate_rows(prepped, ["src", "dst"], ["weight"])
    elif aggregation in ("min", "max"):
        final = aggregate_rows(prepped, ["src", "dst"], ["weight"],
                               how=aggregation)
    elif dedup:
        final = distinct_rows(prepped, ["src", "dst"] +
                              (["weight"] if weight_col else []))
    else:
        final = prepped
    final = final.materialize()
    return _finish_layout(final, graph_dir, n, num_parts, weighted,
                          aggregation, lineage)


class GraphBuilder:
    """Incremental graph construction ≙ the reference's Cypher
    aggregation `gds.alpha.graph.project` (cypher-aggregation/src/main/
    java/org/neo4j/gds/projection/CypherAggregation.java: nodes/edges
    accumulate one row at a time while a query runs; the graph
    materializes when the aggregation finishes).

    Ray-Data shape: `add_edges` / `add_edges_dataset` only APPEND a
    batch handle — array batches become small Arrow tables, Dataset
    batches stay lazy — and nothing shuffles until `build()`, which
    unions every part into one Dataset and runs the normal partitioned
    layout once. An arbitrarily long stream of add calls therefore costs
    a single dedup/aggregate/layout pass at the end, and large
    contributions should arrive as Datasets so they never sit on the
    driver."""

    def __init__(self, symmetrize: bool = False,
                 aggregation: str = "single",
                 weight_col: str | None = None):
        self.symmetrize = symmetrize
        self.aggregation = aggregation
        self.weight_col = weight_col
        self._parts: list[rd.Dataset] = []
        self._arrays: list[pa.Table] = []
        self._max_vid = -1

    def add_edges(self, src, dst, weight=None) -> "GraphBuilder":
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if len(src) == 0:
            return self
        cols = {"src": src, "dst": dst}
        if weight is not None:
            if not self.weight_col:
                self.weight_col = "weight"
            cols[self.weight_col] = np.asarray(weight, dtype=np.float64)
        elif self.weight_col:
            raise ValueError("builder is weighted; batch lacks weights")
        self._arrays.append(pa.table(cols))
        self._max_vid = max(self._max_vid, int(src.max()), int(dst.max()))
        return self

    def add_edges_dataset(self, ds: rd.Dataset) -> "GraphBuilder":
        self._parts.append(ds)
        return self

    def build(self, graph_dir: str, num_parts: int,
              n: int | None = None,
              lineage: dict | None = None) -> PartitionedGraph:
        parts = list(self._parts)
        if self._arrays:
            parts.append(rd.from_arrow(pa.concat_tables(self._arrays)))
        if not parts:
            raise ValueError("GraphBuilder has no edges")
        un = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
        if n is None:
            # one distributed max pass over the Dataset parts; array
            # parts were tracked incrementally
            if self._parts:
                def vmax(t: pa.Table) -> pa.Table:
                    s = t["src"].to_numpy(zero_copy_only=False)
                    d = t["dst"].to_numpy(zero_copy_only=False)
                    m = max(int(s.max()), int(d.max())) if len(s) else -1
                    return pa.table({"m": np.array([m], dtype=np.int64)})
                ds_max = int(un.map_batches(
                    vmax, batch_format="pyarrow",
                    zero_copy_batch=True).to_pandas()["m"].max())
            else:
                ds_max = self._max_vid
            n = max(ds_max, self._max_vid) + 1
        return build_int_graph(
            un, graph_dir, n, num_parts, symmetrize=self.symmetrize,
            aggregation=self.aggregation, weight_col=self.weight_col,
            lineage=lineage or {"source": "GraphBuilder",
                                "parts": len(parts)})


def content_digest(digests_ds: rd.Dataset) -> str:
    """Order-insensitive aggregate digest over per-file sha256 values —
    recorded in the manifest lineage, asserted against the source table."""
    acc = 0
    for batch in digests_ds.select_columns(["sha256"]).iter_batches(
            batch_size=1 << 18, batch_format="pyarrow"):
        for h in batch["sha256"].to_pylist():
            acc ^= int(h[:16], 16)
    return f"{acc:016x}"
