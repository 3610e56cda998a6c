"""Random walks — parity with gds.randomWalk / traversal/RandomWalk.java
(uniform case; node2vec return/in-out bias via the p,q parameters).

Shape: a walker table (walk_id, cur, step) advanced hop by hop with a
vectorized map_batches kernel probing the broadcast CSR adjacency
(`ray.put` once). Each hop's RNG is keyed by (seed, walk_id, step) so
walks are deterministic and independent of partitioning/batching.

The walker table STAYS a Dataset across hops (materialized per hop in
the object store — never collected to the driver mid-walk); per-step
slices are unioned and collected once at the end. Scale note: the CSR
broadcast is O(E) in the object store (~10⁹ edges/node); beyond that
the hop becomes a superstep routing program over partitioned blocks.
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


def random_walks(
    graph: PartitionedGraph,
    walk_length: int = 10,
    walks_per_node: int = 1,
    seed: int = 42,
    source_vids: np.ndarray | None = None,
    return_factor: float = 1.0,    # node2vec p (return bias)
    in_out_factor: float = 1.0,    # node2vec q (in-out bias)
) -> pd.DataFrame:
    """(walk_id, step, vid) rows; walks stop early at sink vertices.

    p=q=1 is the uniform gds.randomWalk; other values apply the
    node2vec second-order bias (traversal/RandomWalk.java:44-76,
    Node2VecRandomWalk): unnormalized next-hop weight 1/p for returning
    to the previous vertex, 1 for a neighbor of the previous vertex,
    1/q otherwise, sampled by cumulative inverse transform."""
    n = graph.n
    indptr, indices = _graph_csr(graph)
    indptr_ref = ray.put(indptr)
    indices_ref = ray.put(indices)
    biased = not (return_factor == 1.0 and in_out_factor == 1.0)
    # for the biased membership probe: the CSR layout is (src, dst)
    # lexsorted, so src*n+dst is globally sorted — one searchsorted
    # answers "is y a neighbor of x" for the whole batch
    keys_ref = None
    if biased:
        keys = (np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr)) * n
                + indices)
        keys_ref = ray.put(keys)

    starts = (np.arange(n, dtype=np.int64) if source_vids is None
              else np.asarray(source_vids, dtype=np.int64))
    starts = np.repeat(starts, walks_per_node)
    walk_ids = np.arange(len(starts), dtype=np.int64)

    step0 = pa.table({"walk_id": walk_ids,
                      "step": np.zeros(len(starts), dtype=np.int64),
                      "vid": starts,
                      "prev": np.full(len(starts), -1, dtype=np.int64)})
    frames: list[rd.Dataset] = [rd.from_arrow(step0)]
    cur = frames[0]

    for step in range(1, walk_length):
        def hop(t: pa.Table, step=step) -> pa.Table:
            ip = ray.get(indptr_ref)
            ix = ray.get(indices_ref)
            wid = t["walk_id"].to_numpy(zero_copy_only=False)
            cur_v = t["vid"].to_numpy(zero_copy_only=False)
            prev = t["prev"].to_numpy(zero_copy_only=False)
            deg = ip[cur_v + 1] - ip[cur_v]
            alive = deg > 0
            wid, cur_v, prev, deg = (wid[alive], cur_v[alive], prev[alive],
                                     deg[alive])
            r = _hash_rand(seed, wid, step)
            if not biased and len(cur_v):
                nxt = ix[ip[cur_v] + (r * deg).astype(np.int64)]
            elif len(cur_v):
                nxt = _biased_next(ip, ix, ray.get(keys_ref), n, cur_v,
                                   prev, deg, r, return_factor,
                                   in_out_factor)
            else:
                nxt = cur_v
            return pa.table({"walk_id": pa.array(wid),
                             "step": pa.array(
                                 np.full(len(wid), step, dtype=np.int64)),
                             "vid": pa.array(nxt),
                             "prev": pa.array(cur_v)})

        cur = cur.map_batches(hop, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        if cur.count() == 0:
            break
        frames.append(cur)

    out_ds = frames[0] if len(frames) == 1 else frames[0].union(*frames[1:])
    out = out_ds.select_columns(["walk_id", "step", "vid"]).to_pandas()
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def _biased_next(ip, ix, edge_keys, n, cur_v, prev, deg, r, p, q):
    """node2vec second-order sampling, vectorized over the batch: build
    the (walker, neighbor) expansion, weight each neighbor 1/p (return),
    1 (neighbor of prev), 1/q (else), then inverse-transform sample per
    walker via segmented cumulative sums. edge_keys = sorted src*n+dst
    (one searchsorted answers every 'is nbr adjacent to prev' probe)."""
    from ..state.blocks import ranges_to_indices
    m = len(cur_v)
    nbr_idx = ranges_to_indices(ip[cur_v], ip[cur_v + 1])
    nbrs = ix[nbr_idx]
    owner = np.repeat(np.arange(m, dtype=np.int64), deg)
    has_prev = prev[owner] >= 0
    w = np.full(len(nbrs), 1.0 / q)
    probe = np.where(has_prev, prev[owner], 0) * n + nbrs
    pos = np.searchsorted(edge_keys, probe)
    pos = np.minimum(pos, max(len(edge_keys) - 1, 0))
    is_nbr_of_prev = has_prev & (len(edge_keys) > 0) & (
        edge_keys[pos] == probe if len(edge_keys) else False)
    w[is_nbr_of_prev] = 1.0
    is_return = has_prev & (nbrs == prev[owner])
    w[is_return] = 1.0 / p
    w[~has_prev] = 1.0  # first hop from a start: uniform
    # segmented inverse-transform sampling
    cw = np.cumsum(w)
    ends = np.cumsum(deg)
    starts_ = ends - deg
    base = np.where(starts_ > 0, cw[starts_ - 1], 0.0)
    seg_tot = cw[ends - 1] - base
    target = r * seg_tot + base
    pick = np.searchsorted(cw, target, side="right")
    pick = np.minimum(pick, ends - 1)
    pick = np.maximum(pick, starts_)
    return nbrs[pick]
