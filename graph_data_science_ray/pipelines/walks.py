"""Random walks — parity with gds.randomWalk / traversal/RandomWalk.java
(uniform case; node2vec return/in-out bias via the p,q parameters).

Shape: a walker table (walk_id, cur, step) advanced hop by hop with a
vectorized map_batches kernel probing the broadcast CSR adjacency
(`ray.put` once). Each hop's RNG is keyed by (seed, walk_id, step) so
walks are deterministic and independent of partitioning/batching."""

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


def _hash_rand(seed: int, walk_id: np.ndarray, step: int) -> np.ndarray:
    """Deterministic uniform [0,1) per (walk_id, step)."""
    x = (walk_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         + np.uint64(step) * np.uint64(0xBF58476D1CE4E5B9)
         + np.uint64(seed))
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
) -> pd.DataFrame:
    """(walk_id, step, vid) rows; walks stop early at sink vertices.

    Uniform next-hop choice (node2vec p=q=1); deterministic via hashed
    per-(walk, step) randomness."""
    if graph.kind != "arrays":
        raise NotImplementedError("random_walks currently reads in-memory "
                                  "edge arrays")
    n = graph.n
    indptr, indices = _csr(n, graph.src, graph.dst)
    indptr_ref = ray.put(indptr)
    indices_ref = ray.put(indices)

    starts = (np.arange(n, dtype=np.int64) if source_vids is None
              else np.asarray(source_vids, dtype=np.int64))
    starts = np.repeat(starts, walks_per_node)
    walk_ids = np.arange(len(starts), dtype=np.int64)

    frames = [pd.DataFrame({"walk_id": walk_ids, "step": 0, "vid": starts})]
    cur = rd.from_arrow(pa.table({"walk_id": walk_ids, "cur": starts}))

    for step in range(1, walk_length):
        def hop(t: pa.Table, step=step) -> pa.Table:
            ip = ray.get(indptr_ref)
            ix = ray.get(indices_ref)
            wid = t["walk_id"].to_numpy(zero_copy_only=False)
            cur = t["cur"].to_numpy(zero_copy_only=False)
            deg = ip[cur + 1] - ip[cur]
            alive = deg > 0
            wid, cur, deg = wid[alive], cur[alive], deg[alive]
            r = _hash_rand(seed, wid, step)
            nxt = ix[ip[cur] + (r * deg).astype(np.int64)]
            return pa.table({"walk_id": pa.array(wid),
                             "cur": pa.array(nxt)})

        cur = cur.map_batches(hop, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        df = cur.to_pandas()
        if df.empty:
            break
        frames.append(pd.DataFrame({"walk_id": df["walk_id"], "step": step,
                                    "vid": df["cur"]}))
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)