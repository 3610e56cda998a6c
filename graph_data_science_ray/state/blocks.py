"""Partitioned CSR edge blocks — the distributed analogue of the reference's
HugeGraph CSR (core/src/main/java/org/neo4j/gds/core/huge/HugeGraph.java).

Vertex ownership: dense vid ``v`` is owned by partition ``v % P`` with local
index ``v // P`` (modulo partitioning balances vertex counts and, for
hash-dense id assignment, edge counts). A partition holds up to two
*flow blocks*:

  - OUT block: edges whose src it owns — messages flow along the edge
    direction (gather src state, scatter to dst).
  - IN block: edges whose dst it owns — messages flow against the edge
    direction (gather dst state, scatter to src).

Block layout is vertex-major CSR (edges sorted by owned endpoint, with
per-vertex offsets) so a superstep with few active vertices touches only
their edge ranges. Each edge precomputes a *combined scatter key*
``tgt_part * n_max + tgt_local`` so the per-destination-partition partial
reduction — the distributed replacement for the reference's shared
ReducingMessenger CAS array (pregel/.../ReducingMessenger.java:34-96) —
is ONE `np.bincount` over the key range, then sliced per destination.

Delta-varlong compression (core/.../AdjacencyCompression.java:53-60) is
replaced by Parquet dictionary/zstd on disk and plain int64 arrays in RAM.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def num_local(n: int, part: int, num_parts: int) -> int:
    """Number of vertices owned by `part` out of n with modulo partitioning."""
    return max(0, (n - part + num_parts - 1) // num_parts)


def n_max_local(n: int, num_parts: int) -> int:
    """Upper bound of per-partition vertex count (the combined-key stride)."""
    return (n + num_parts - 1) // num_parts


def ranges_to_indices(start: np.ndarray, end: np.ndarray) -> np.ndarray:
    """Concatenate [start_i, end_i) ranges into one index array, vectorized."""
    lens = end - start
    nz = lens > 0
    start, lens = start[nz], lens[nz]
    if len(start) == 0:
        return np.empty(0, dtype=np.int64)
    total = int(lens.sum())
    steps = np.ones(total, dtype=np.int64)
    steps[0] = start[0]
    if len(start) > 1:
        pos = np.cumsum(lens[:-1])
        steps[pos] = start[1:] - (start[:-1] + lens[:-1]) + 1
    return np.cumsum(steps)


@dataclass
class FlowBlock:
    """Edges incident to one partition.

    Edge arrays are DESTINATION-MAJOR (sorted by combined_key): the hot
    scatter (`bincount` into the P·n_max accumulator) then writes
    sequentially while its random reads hit the small, cache-resident
    local state array — the vertex-major order measured ~2-5× slower
    under full-node concurrency (scattered writes saturate memory
    bandwidth). A permutation (`perm` + `vtx_offsets`) indexes the same
    edges vertex-major for cheap active-frontier selection in sparse
    supersteps."""

    num_parts: int
    n_max: int                 # combined-key stride = ceil(n_global / P)
    gather_local: np.ndarray   # int64 [E] local idx of owned endpoint
    combined_key: np.ndarray   # int64 [E] = tgt_part * n_max + tgt_local (sorted)
    perm: np.ndarray           # int64 [E] edge ids ordered vertex-major
    vtx_offsets: np.ndarray    # int64 [n_local+1] CSR offsets into perm
    tgt_global: np.ndarray | None = None  # int64 [E] global target vid
    weight: np.ndarray | None = None  # float64 [E]

    @property
    def num_edges(self) -> int:
        return len(self.gather_local)

    @staticmethod
    def build(
        own: np.ndarray,
        tgt: np.ndarray,
        weight: np.ndarray | None,
        num_parts: int,
        n_global: int,
        n_local: int,
    ) -> "FlowBlock":
        """own/tgt are GLOBAL vids; every `own` belongs to this partition."""
        own = np.asarray(own, dtype=np.int64)
        tgt = np.asarray(tgt, dtype=np.int64)
        n_max = n_max_local(n_global, num_parts)
        combined_key = (tgt % num_parts) * n_max + (tgt // num_parts)
        order = np.argsort(combined_key, kind="stable")
        combined_key = combined_key[order]
        gather_local = (own // num_parts)[order]
        tgt = tgt[order]
        perm = np.argsort(gather_local, kind="stable")
        counts = np.bincount(gather_local, minlength=n_local)
        vtx_offsets = np.zeros(n_local + 1, dtype=np.int64)
        np.cumsum(counts, out=vtx_offsets[1:])
        return FlowBlock(
            num_parts=num_parts,
            n_max=n_max,
            gather_local=gather_local,
            combined_key=combined_key,
            perm=perm,
            vtx_offsets=vtx_offsets,
            tgt_global=tgt,
            weight=None if weight is None else
                np.asarray(weight, dtype=np.float64)[order],
        )


def partition_edges(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None,
    num_parts: int,
    flows: tuple[str, ...] = ("out", "in"),
) -> dict[str, list[dict]]:
    """Split an edge list into per-partition raw edge dicts per flow.

    Driver-side helper for in-memory graphs (tests, fixtures); the Parquet
    path does the same split with Ray Data. Each entry is
    {"own": global vids, "tgt": global vids, "weight": optional}.
    """
    out: dict[str, list[dict]] = {}
    for flow in flows:
        own_all, tgt_all = (src, dst) if flow == "out" else (dst, src)
        part = own_all % num_parts
        parts = []
        for p in range(num_parts):
            sel = part == p
            parts.append({
                "own": own_all[sel], "tgt": tgt_all[sel],
                "weight": None if weight is None else weight[sel],
            })
        out[flow] = parts
    return out
