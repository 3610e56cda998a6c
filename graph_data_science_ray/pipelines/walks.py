"""Random walks — parity with gds.randomWalk / traversal/RandomWalk.java
(uniform case; node2vec return/in-out bias via the p,q parameters).

Shape: a walker table (walk_id, cur, step) advanced hop by hop as a
Dataset. Each hop ROUTES walkers to the adjacency shard that owns their
current vertex (``groupby(vid % P)``) — the graph's own out-flow
partitioning (src % P, sources/graph_build.py layout) — so no task ever
holds more than one shard's CSR and the driver never holds edges at
all. Shards are built once per graph by P parallel tasks reading their
own partition files and are cached in the object store.

The biased (node2vec p/q) hop needs the PREVIOUS vertex's adjacency for
the in-out membership probe, so it runs as two routed stages: stage A
(bucket by cur) expands each walker's candidate neighbors; stage B
(bucket by prev — every candidate of a walker shares its prev, so a
walker's candidates stay together) weights candidates 1/p / 1 / 1/q via
a shard-local membership probe and samples by segmented inverse
transform. Each hop's RNG is keyed by (seed, walk_id, step) so walks
are deterministic and independent of partitioning/batching.

The walker table STAYS a Dataset across hops (materialized per hop in
the object store — never collected to the driver mid-walk); per-step
slices are unioned and collected once at the end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.superstep import PartitionedGraph


def _csr(n: int, src: np.ndarray, dst: np.ndarray):
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    indptr = np.searchsorted(s, np.arange(n + 1))
    return indptr, d


def _graph_csr(graph: PartitionedGraph):
    """Driver-resident full CSR — ONLY for inherently sequential
    consumers (DFS preorder; reference is sequential too). Walks use
    the sharded path below."""
    if graph.kind == "arrays":
        return _csr(graph.n, graph.src, graph.dst)
    parts_s, parts_d = [], []
    for batch in graph.edges_dataset(("src", "dst"), flow="out").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        parts_s.append(batch["src"].to_numpy(zero_copy_only=False))
        parts_d.append(batch["dst"].to_numpy(zero_copy_only=False))
    if not parts_s:
        e = np.empty(0, dtype=np.int64)
        return _csr(graph.n, e, e)
    return _csr(graph.n, np.concatenate(parts_s), np.concatenate(parts_d))


@ray.remote
def _csr_build_task(graph_path: str, n: int):
    """Build the full CSR INSIDE a worker from the graph's out-flow
    parquet — the result lands in plasma via the task return, so
    broadcast-CSR consumers (influence cascades) never route O(E)
    arrays through the driver."""
    import glob as _glob

    import pyarrow.parquet as pq
    files = sorted(_glob.glob(f"{graph_path}/out/part=*/*.parquet"))
    if files:
        t = pa.concat_tables([pq.read_table(f, columns=["src", "dst"])
                              for f in files])
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        src = dst = np.empty(0, np.int64)
    return _csr(n, src, dst)


def graph_csr_ref(graph) -> "ray.ObjectRef":
    """ObjectRef to (indptr, indices) for broadcast-CSR consumers:
    worker-built for parquet graphs (no driver O(E) pass), ray.put for
    already-driver-resident array graphs."""
    if graph.kind == "arrays":
        return ray.put(_csr(graph.n, graph.src, graph.dst))
    return _csr_build_task.remote(graph.path, graph.n)


def _n_local(n: int, P: int, p: int) -> int:
    return max(0, (n + P - 1 - p) // P)


@ray.remote
def _shard_from_files(files: list, n: int, P: int, p: int):
    """CSR over one partition's srcs (all ≡ p mod P), rows indexed by
    src // P; neighbor lists ascend by dst (sampling-order contract)."""
    import pyarrow.parquet as pq
    if files:
        t = pa.concat_tables([pq.read_table(f, columns=["src", "dst"])
                              for f in files])
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        src = dst = np.empty(0, np.int64)
    loc = src // P
    order = np.lexsort((dst, loc))
    loc, d = loc[order], dst[order]
    indptr = np.searchsorted(loc, np.arange(_n_local(n, P, p) + 1))
    # sorted src*n+dst keys: one searchsorted answers every "is y a
    # neighbor of x" membership probe for the biased walk, vectorized
    keys = (loc * P + p) * n + d
    return indptr, d, keys


_SHARD_CACHE: dict = {}


def _adjacency_shards(graph: PartitionedGraph) -> tuple[int, list]:
    """(P, [ObjectRef per partition]) adjacency shards routed by
    vid % P; built in parallel from the graph's own partition files and
    cached per graph dir."""
    if graph.kind == "parquet":
        key = graph.path
        if key in _SHARD_CACHE:
            return _SHARD_CACHE[key]
        import glob
        import os
        P = graph.num_parts_layout
        refs = []
        for p in range(P):
            files = sorted(glob.glob(
                os.path.join(graph.path, "out", f"part={p}", "*.parquet")))
            refs.append(_shard_from_files.remote(files, graph.n, P, p))
        # resolve to plasma refs (shards stay in the object store)
        refs = [ray.put(ray.get(r)) for r in refs]
        _SHARD_CACHE[key] = (P, refs)
        return P, refs
    # arrays kind: shard the (small) driver arrays by the same rule
    P = max(4, min(16, int(ray.cluster_resources().get("CPU", 4))))
    n, src, dst = graph.n, graph.src, graph.dst
    refs = []
    for p in range(P):
        sel = src % P == p
        s, d = src[sel], dst[sel]
        loc = s // P
        order = np.lexsort((d, loc))
        loc, d = loc[order], d[order]
        indptr = np.searchsorted(loc, np.arange(_n_local(n, P, p) + 1))
        refs.append(ray.put((indptr, d, (loc * P + p) * n + d)))
    return P, refs


_MIX1 = 0x9E3779B97F4A7C15
_MIX2 = 0xBF58476D1CE4E5B9


def _hash_rand(seed: int, walk_id: np.ndarray, step: int) -> np.ndarray:
    """Deterministic uniform [0,1) per (walk_id, step)."""
    # fold the per-step constant in Python ints first — a np.uint64
    # scalar multiply goes through a warning-emitting scalar path
    step_mix = np.uint64((step * _MIX2 + seed) % (1 << 64))
    x = walk_id.astype(np.uint64) * np.uint64(_MIX1) + step_mix
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _identity_arrow(t: pa.Table) -> pa.Table:
    return t


def _bucket_by(col: str, P: int):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = df[col].to_numpy() % P
        return df
    return add


def random_walks_ds(
    graph: PartitionedGraph,
    walk_length: int = 10,
    walks_per_node: int = 1,
    seed: int = 42,
    source_vids: np.ndarray | None = None,
    return_factor: float = 1.0,    # node2vec p (return bias)
    in_out_factor: float = 1.0,    # node2vec q (in-out bias)
) -> rd.Dataset:
    """(walk_id, step, vid) rows as a DATASET; walks stop early at sink
    vertices. Consumers that need co-resident walks (window expansion)
    bucket by walk_id — never collect the table to the driver.

    p=q=1 is the uniform gds.randomWalk; other values apply the
    node2vec second-order bias (traversal/RandomWalk.java:44-76,
    Node2VecRandomWalk): unnormalized next-hop weight 1/p for returning
    to the previous vertex, 1 for a neighbor of the previous vertex,
    1/q otherwise, sampled by cumulative inverse transform."""
    P, shard_refs = _adjacency_shards(graph)
    biased = not (return_factor == 1.0 and in_out_factor == 1.0)

    if source_vids is None:
        # full-graph walks: generate step 0 distributedly (walk w starts
        # at vid w // walks_per_node) — no O(V·walks) driver start table
        def make_step0(t: pa.Table) -> pa.Table:
            wid = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "walk_id": wid,
                "step": np.zeros(len(wid), dtype=np.int64),
                "vid": wid // walks_per_node,
                "prev": np.full(len(wid), -1, dtype=np.int64)})

        # compact to P blocks: rd.range defaults to ~200 tiny blocks and
        # the first hop's sort-groupby keys its shuffle fan-out to the
        # input block count
        step0_ds = rd.range(graph.n * walks_per_node).repartition(P) \
            .map_batches(make_step0, batch_format="pyarrow",
                         zero_copy_batch=True)
    else:
        starts = np.repeat(np.asarray(source_vids, dtype=np.int64),
                           walks_per_node)
        step0_ds = rd.from_pandas(pd.DataFrame({
            "walk_id": np.arange(len(starts), dtype=np.int64),
            "step": np.zeros(len(starts), dtype=np.int64),
            "vid": starts,
            "prev": np.full(len(starts), -1, dtype=np.int64)}))
    frames: list[rd.Dataset] = [step0_ds]
    cur = frames[0]

    def uniform_hop(group: pd.DataFrame, step: int) -> pd.DataFrame:
        p = int(group["__bucket"].iloc[0])
        ip, ix, _keys = ray.get(shard_refs[p])
        wid = group["walk_id"].to_numpy()
        cur_v = group["vid"].to_numpy()
        loc = cur_v // P
        deg = ip[loc + 1] - ip[loc]
        alive = deg > 0
        wid, cur_v, loc, deg = wid[alive], cur_v[alive], loc[alive], deg[alive]
        if len(wid) == 0:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"walk_id": e, "step": e, "vid": e,
                                 "prev": e})
        r = _hash_rand(seed, wid, step)
        nxt = ix[ip[loc] + (r * deg).astype(np.int64)]
        return pd.DataFrame({"walk_id": wid,
                             "step": np.full(len(wid), step, np.int64),
                             "vid": nxt, "prev": cur_v})

    def expand_candidates(group: pd.DataFrame) -> pd.DataFrame:
        """Biased stage A: every oriented neighbor of each walker's
        current vertex, with its position in the (dst-ascending)
        adjacency for deterministic segmented sampling downstream."""
        from ..state.blocks import ranges_to_indices
        p = int(group["__bucket"].iloc[0])
        ip, ix, _keys = ray.get(shard_refs[p])
        wid = group["walk_id"].to_numpy()
        cur_v = group["vid"].to_numpy()
        prev = group["prev"].to_numpy()
        loc = cur_v // P
        deg = (ip[loc + 1] - ip[loc]).astype(np.int64)
        alive = deg > 0
        wid, cur_v, prev, loc, deg = (wid[alive], cur_v[alive], prev[alive],
                                      loc[alive], deg[alive])
        if len(wid) == 0:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"walk_id": e, "cur": e, "prev": e,
                                 "nbr": e, "pos": e})
        nbrs = ix[ranges_to_indices(ip[loc], ip[loc] + deg)]
        owner = np.repeat(np.arange(len(wid), dtype=np.int64), deg)
        pos = (np.arange(len(nbrs), dtype=np.int64)
               - np.repeat(np.cumsum(deg) - deg, deg))
        return pd.DataFrame({"walk_id": wid[owner], "cur": cur_v[owner],
                             "prev": prev[owner], "nbr": nbrs, "pos": pos})

    def sample_biased(group: pd.DataFrame, step: int) -> pd.DataFrame:
        """Biased stage B: weight + sample, shard-local membership probe
        against prev's adjacency (all candidates of a walker share prev,
        so the walker's whole candidate set is in this bucket)."""
        p = int(group["__bucket"].iloc[0])
        _ip, _ix, keys = ray.get(shard_refs[p])
        g = group.sort_values(["walk_id", "pos"], kind="stable")
        wid = g["walk_id"].to_numpy()
        cur_v = g["cur"].to_numpy()
        prev = g["prev"].to_numpy()
        nbrs = g["nbr"].to_numpy()
        has_prev = prev >= 0
        n = graph.n
        w = np.full(len(nbrs), 1.0 / in_out_factor)
        # membership probe against prev's adjacency: prev % P == p here,
        # so the shard's sorted src*n+dst keys answer it in one pass
        if has_prev.any() and len(keys):
            probe = np.where(has_prev, prev, 0) * n + nbrs
            pos_ = np.searchsorted(keys, probe)
            pos_ = np.minimum(pos_, len(keys) - 1)
            found = keys[pos_] == probe
            w[has_prev & found] = 1.0
            w[has_prev & (nbrs == prev)] = 1.0 / return_factor
        w[~has_prev] = 1.0
        # segmented inverse-transform sampling per walker
        change = np.flatnonzero(np.r_[True, wid[1:] != wid[:-1]])
        seg_len = np.diff(np.r_[change, len(wid)])
        cw = np.cumsum(w)
        ends = np.cumsum(seg_len)
        starts_ = ends - seg_len
        base = np.where(starts_ > 0, cw[starts_ - 1], 0.0)
        seg_tot = cw[ends - 1] - base
        r = _hash_rand(seed, wid[starts_], step)
        target = r * seg_tot + base
        pick = np.searchsorted(cw, target, side="right")
        pick = np.minimum(pick, ends - 1)
        pick = np.maximum(pick, starts_)
        return pd.DataFrame({
            "walk_id": wid[starts_],
            "step": np.full(len(starts_), step, np.int64),
            "vid": nbrs[pick], "prev": cur_v[starts_]})

    for step in range(1, walk_length):
        if not biased:
            cur = (cur.map_batches(_bucket_by("vid", P),
                                   batch_format="pandas")
                   .groupby("__bucket")
                   .map_groups(uniform_hop, batch_format="pandas",
                               fn_args=(step,))
                   .materialize())
        else:
            cands = (cur.map_batches(_bucket_by("vid", P),
                                     batch_format="pandas")
                     .groupby("__bucket")
                     .map_groups(expand_candidates, batch_format="pandas"))

            def prev_bucket(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                pv = df["prev"].to_numpy()
                df["__bucket"] = np.where(pv >= 0, pv % P, 0)
                return df

            cur = (cands.map_batches(prev_bucket, batch_format="pandas")
                   .groupby("__bucket")
                   .map_groups(sample_biased, batch_format="pandas",
                               fn_args=(step,))
                   .materialize())
        if cur.count() == 0:
            break
        frames.append(cur)

    out_ds = frames[0] if len(frames) == 1 else frames[0].union(*frames[1:])
    return out_ds.select_columns(["walk_id", "step", "vid"])


def random_walks(graph: PartitionedGraph, **kwargs) -> pd.DataFrame:
    """Driver-collected (walk_id, step, vid) — small walk sets / procs.
    See random_walks_ds for the streaming form."""
    out = random_walks_ds(graph, **kwargs).to_pandas()
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def walk_window_pairs(
    walks: rd.Dataset,
    window: int,
    walk_length: int,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Skip-gram (center, context, pair_id) expansion of a walk table,
    fully distributed: walks hash-bucket by walk_id (all steps of a
    walk co-resident), each group sorts locally and pairs rows ±window
    apart. pair_id is a deterministic function of (walk_id, step,
    offset, direction) so downstream hash-seeded negative sampling is
    reproducible regardless of partitioning."""

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["walk_id", "step"])
        wid = df["walk_id"].to_numpy(np.int64)
        vid = df["vid"].to_numpy(np.int64)
        step = df["step"].to_numpy(np.int64)
        centers, contexts, pids = [], [], []
        for off in range(1, window + 1):
            same = wid[off:] == wid[:-off]
            a, b = vid[:-off][same], vid[off:][same]
            base = ((wid[:-off][same] * walk_length + step[:-off][same])
                    * window + (off - 1)) * 2
            centers.append(np.concatenate([a, b]))
            contexts.append(np.concatenate([b, a]))
            pids.append(np.concatenate([base, base + 1]))
        if not centers:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"center": e, "context": e, "pair_id": e})
        return pd.DataFrame({"center": np.concatenate(centers),
                             "context": np.concatenate(contexts),
                             "pair_id": np.concatenate(pids)})

    # the walk table is a union of one materialized frame per step —
    # O(steps × parts) tiny blocks of MIXED type (arrow step0, pandas
    # hops; repartition asserts uniformity). Ray's sort-based groupby
    # keys its shuffle fan-out to the INPUT block count, so normalize
    # to arrow and compact to num_buckets blocks first (measured
    # 37.7 s → ~3 s on a 20k-row 300-block union at sf0.1)
    return (walks.map_batches(_identity_arrow, batch_format="pyarrow")
            .repartition(num_buckets)
            .map_batches(_bucket_by("walk_id", num_buckets),
                         batch_format="pandas")
            .groupby("__bucket")
            .map_groups(expand, batch_format="pandas"))
