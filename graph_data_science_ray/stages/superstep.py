"""The superstep engine — Ray-native BSP over partitioned CSR blocks.

Distributed analogue of the reference's Pregel executor
(pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:154-195):

  - One ``PartitionWorker`` actor per partition holds its CSR flow blocks
    and per-vertex NumPy state columns for the whole run (topology is
    loaded once and never re-shuffled; only messages move).
  - One superstep = every worker (in parallel): merge incoming reduced
    message blocks → compute (vectorized program callback) → scatter
    outgoing messages with a per-destination-partition partial reduce
    (sender-side combiner) → return one payload object per destination.
    Payload refs are routed worker→worker through the object store; the
    driver only sees small per-partition stats (the convergence barrier,
    ≙ Pregel's masterCompute position).
  - Convergence (messages mode): no messages sent AND all vertices voted
    halt, checked after the iteration (PartitionedComputer.java:77-84);
    ``ran_iterations`` is the 0-based index of the converged iteration,
    matching PregelResult.ranIterations.
  - Every ``checkpoint_interval`` supersteps each worker writes its state
    (+ the send decision) to ``checkpoint_dir/iter=K/part=P.parquet`` and
    the driver commits a lineage manifest with per-partition metrics; a
    resumed run re-emits iteration K's messages from the checkpoint and
    continues at K+1 (the reference has no mid-algorithm checkpoint —
    this is new design required by the north rule).

Scale notes: per-superstep traffic is O(P · V) for dense all-active
phases (each sender emits at most one partially-reduced value per
destination vertex — never the O(E) edge-expanded message table) and
O(active frontier) once deltas sparsify (payloads switch to sparse
index/value pairs below 25% density). Skewed in-degree vertices
receive at most P partial values.

Hot-vertex (hub) splitting — the skew-aware analogue of the
reference's degree partitioning (core/.../partition/PartitionUtils.java
:40-131): modulo partitioning over hash-dense vids already balances
EDGES per partition (measured 1.07 max/median sent_edges on the
103.5M-edge pareto fixture — see tools/skew_probe.py), so the residual
skew risk is a single vertex whose degree rivals E/P: its whole
scatter lands on one owner. When a vertex's per-flow degree reaches
``hub_degree_threshold`` its edges are re-routed AT LOAD TIME to the
partitions owning their *targets* ("satellite" edges, CSR-by-hub on
each receiver); each superstep the owner ships ONE value per
(hub, destination-partition) — O(P) instead of O(degree) — and
receivers expand it over their local satellite edges inside the
normal merge reduce. The default threshold (max(65536, E // 8P))
never triggers on balanced graphs, keeping those runs byte-identical.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..state.blocks import (
    FlowBlock,
    n_max_local,
    num_local,
    partition_edges,
    ranges_to_indices,
)
from .vertex_program import (MIN, OR, SUM, VOTE, StepOutput, VertexProgram,
                             WorkerContext)

# dense segment (8B/slot) beats sparse (16B/entry) above half density
_SPARSE_DENSITY = 0.5


def groups_from_node_ids(nodes: list[str]) -> list[list[int]]:
    """Partition ids grouped by the node their worker landed on —
    the auto node-affinity routing table. One node → one group (the
    byte-identical single-bundle wire format); >1 node → one
    destination group per node, ordered by node id for determinism."""
    by_node: dict[str, list[int]] = {}
    for p, nid in enumerate(nodes):
        by_node.setdefault(nid, []).append(p)
    return [sorted(g) for _, g in sorted(by_node.items())]


# --------------------------------------------------------------------------
# Graph handle
# --------------------------------------------------------------------------

@dataclass
class PartitionedGraph:
    """Driver-side handle to a partitioned graph (edges by ownership)."""

    n: int
    num_edges: int
    weighted: bool
    kind: str                      # 'arrays' | 'parquet'
    src: np.ndarray | None = None  # arrays kind (driver-resident, small)
    dst: np.ndarray | None = None
    weight: np.ndarray | None = None
    path: str | None = None        # parquet kind: graph dir (see sources.graph_build)
    num_parts_layout: int | None = None  # parquet kind: partition count on disk
    owns_dir: bool = False         # True when `path` is a temp re-layout
                                   # this handle is responsible for

    def cleanup(self) -> None:
        """Remove an owned temp graph dir (filter_graph / train-graph
        re-layouts); no-op for catalog/cached graphs and arrays."""
        import shutil
        if self.owns_dir and self.path and os.path.isdir(self.path):
            shutil.rmtree(self.path, ignore_errors=True)

    @staticmethod
    def from_arrays(n, src, dst, weight=None) -> "PartitionedGraph":
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        return PartitionedGraph(
            n=int(n), num_edges=len(src), weighted=weight is not None,
            kind="arrays", src=src, dst=dst,
            weight=None if weight is None else np.asarray(weight, np.float64),
        )

    @staticmethod
    def from_manifest(path: str) -> "PartitionedGraph":
        with open(os.path.join(path, "manifest.json")) as f:
            m = json.load(f)
        return PartitionedGraph(
            n=m["num_vertices"], num_edges=m["num_edges"],
            weighted=m.get("weighted", False), kind="parquet", path=path,
            num_parts_layout=m["num_parts"],
        )

    def flow_files(self, flow: str = "out") -> list:
        """Parquet files of one flow's partitioned layout."""
        import glob
        return sorted(
            glob.glob(os.path.join(self.path, flow, "part=*", "*.parquet"))
            + glob.glob(os.path.join(self.path, flow, "part=*.parquet")))

    def edges_dataset(self, columns=("src", "dst"), flow: str = "out"):
        """The graph's edge table as a Ray Dataset — the uniform access
        path for non-superstep pipelines (triangles, louvain contraction,
        similarity candidates, …). Arrays kind wraps the driver arrays;
        parquet kind streams the flow's block files (each edge appears
        once per flow)."""
        import ray.data as rd
        columns = list(columns)
        if self.kind == "arrays":
            cols = {"src": self.src, "dst": self.dst}
            if "weight" in columns:
                cols["weight"] = (self.weight if self.weight is not None
                                  else np.ones(len(self.src)))
            return rd.from_arrow(pa.table({c: cols[c] for c in columns}))
        # Symmetric weight contract with the arrays kind: a requested
        # 'weight' column on an unweighted graph is synthesized as ones
        # (callers like spanning_tree pass ('src','dst','weight')
        # unconditionally).
        read_cols = [c for c in columns if c != "weight" or self.weighted]
        ds = rd.read_parquet(self.flow_files(flow), columns=read_cols)
        if "weight" in columns and not self.weighted:
            def _ones(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "weight", pa.array(np.ones(len(t)), type=pa.float64()))
            ds = ds.map_batches(_ones, batch_format="pyarrow",
                                zero_copy_batch=True)
        return ds


# --------------------------------------------------------------------------
# Message bundles
# --------------------------------------------------------------------------
# One plasma object per sender per superstep, packing all P destination
# segments into a handful of contiguous arrays (deserializing P² separate
# numpy arrays costs ~15µs each — packing cuts restores to O(P)):
#   kinds: int8[P]   0=none 1=dense 2=sparse 3=votes
#   voffs: int64[P+1] offsets into vals;  ioffs: offsets into idx
#   vals:  float64/int64 — dense segment or sparse/vote values
#   idx:   int64 — sparse/vote local indices
#   lbls:  int64 — vote labels (shares ioffs)
# plus an optional hub section (hot-vertex splitting; None when the
# sender owns no split hubs):
#   hoffs: int64[P+1] offsets into hids/hvals/hlbls
#   hids:  int64 — global hub vids whose satellite edges live on the
#          receiver; the receiver expands each value over its local
#          satellite CSR inside the merge reduce
#   hvals: message values per hub (vote reducer: the vote weight)
#   hlbls: int64 vote labels per hub (None for non-vote programs)
#   tr:    the sender's target_range (receivers filter satellite
#          expansion by global target vid — the sender no longer holds
#          those edges)

# the hub section rides as bundle[6]: None | (hoffs, hids, hvals, hlbls, tr)
_K_NONE, _K_DENSE, _K_SPARSE, _K_VOTES = 0, 1, 2, 3


def _np_to_pa(v: np.ndarray) -> pa.Array:
    """NumPy column → Arrow; 2-D [n, d] becomes FixedSizeList<d>."""
    if v.ndim == 2:
        return pa.FixedSizeListArray.from_arrays(
            pa.array(v.reshape(-1)), v.shape[1])
    return pa.array(v)


def _pa_to_np(col) -> np.ndarray:
    """Arrow column → NumPy; FixedSizeList<d> becomes 2-D [n, d]."""
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        flat = (col.combine_chunks() if hasattr(col, "combine_chunks")
                else col).flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(-1, d).copy()
    return col.to_numpy(zero_copy_only=False).copy()


def _combine_weight(vals: np.ndarray, w: np.ndarray, mode: str) -> None:
    if vals.ndim == 2:
        w = w[:, None]
    if mode == "mul":
        vals *= w
    else:  # 'add' — SSSP-style relaxation: message = value + edge weight
        vals += w


def _pack_bundle(payloads: list, hubs=None):
    P = len(payloads)
    kinds = np.zeros(P, dtype=np.int8)
    vparts, iparts, lparts = [], [], []
    voffs = np.zeros(P + 1, dtype=np.int64)
    ioffs = np.zeros(P + 1, dtype=np.int64)
    for q, p in enumerate(payloads):
        nv = ni = 0
        if p is not None:
            tag = p[0]
            if tag == "d":
                kinds[q] = _K_DENSE
                vparts.append(p[1])
                nv = len(p[1])
            elif tag == "s":
                kinds[q] = _K_SPARSE
                iparts.append(p[1])
                vparts.append(p[2])
                nv = len(p[2])
                ni = len(p[1])
            else:  # votes: ('v', idx, labels, weights)
                kinds[q] = _K_VOTES
                iparts.append(p[1])
                lparts.append(p[2])
                vparts.append(p[3])
                nv = len(p[3])
                ni = len(p[1])
        voffs[q + 1] = voffs[q] + nv
        ioffs[q + 1] = ioffs[q] + ni
    vals = np.concatenate(vparts) if vparts else np.empty(0, dtype=np.float64)
    idx = np.concatenate(iparts) if iparts else np.empty(0, dtype=np.int64)
    lbls = np.concatenate(lparts) if lparts else None
    return kinds, voffs, ioffs, vals, idx, lbls, hubs


def _unpack_segment(bundle, q: int):
    kinds, voffs, ioffs, vals, idx, lbls = bundle[:6]
    k = kinds[q]
    if k == _K_NONE:
        return None
    v = vals[voffs[q]: voffs[q + 1]]
    if k == _K_DENSE:
        return ("d", v)
    i = idx[ioffs[q]: ioffs[q + 1]]
    if k == _K_SPARSE:
        return ("s", i, v)
    return ("v", i, lbls[ioffs[q]: ioffs[q + 1]], v)


def _unpack_hubs(bundle, q: int):
    """Receiver-side view of one sender's hub section for destination q:
    (hids, hvals, hlbls, target_range) or None."""
    hubs = bundle[6] if len(bundle) > 6 else None
    if hubs is None:
        return None
    hoffs, hids, hvals, hlbls, tr = hubs
    lo, hi = hoffs[q], hoffs[q + 1]
    if lo == hi:
        return None
    return (hids[lo:hi], hvals[lo:hi],
            None if hlbls is None else hlbls[lo:hi], tr)


# --------------------------------------------------------------------------
# Worker actor
# --------------------------------------------------------------------------

@ray.remote
class PartitionWorker:
    """Holds one partition's CSR blocks + vertex state across supersteps."""

    def __init__(self, part: int, num_parts: int, n_global: int,
                 hub_threshold: int | None = None):
        self.part = part
        self.P = num_parts
        self.n = n_global
        self.n_local = num_local(n_global, part, num_parts)
        self.n_max = n_max_local(n_global, num_parts)
        self.blocks: dict[str, FlowBlock | None] = {}
        self.program: VertexProgram | None = None
        self.ctx: WorkerContext | None = None
        self.state: dict[str, np.ndarray] = {}
        self.halted: np.ndarray | None = None
        self.last_send: StepOutput | None = None
        # hot-vertex splitting (see module docstring)
        self.hub_threshold = hub_threshold
        # sender side, per flow: {"hub_local": [H], "dest_offs": [H+1],
        #                         "dest_parts": [ΣD]} — which partitions
        # hold satellite edges of each owned hub
        self.hub_route: dict[str, dict | None] = {}
        # degree removed into satellites, per flow: (int deg, weighted deg)
        self.hub_deg: dict[str, tuple[np.ndarray, np.ndarray] | None] = {}
        # receiver side, per flow: {"hub_ids": [H] sorted, "offs": [H+1],
        #   "dst_local": [E_sat], "weight": [E_sat] | None} CSR by hub
        self.sats: dict[str, dict | None] = {}
        self._pending_exports: dict[str, list] = {}
        # destination-group routing (node affinity): by default one
        # group holding every partition — the single-bundle wire format.
        # On a multi-node cluster the engine groups partitions by node
        # so each receiver node pulls ONE object per sender containing
        # only its partitions' segments (cross-node traffic per
        # superstep drops from senders × whole-bundle to
        # senders × node-slice).
        self.set_groups([list(range(num_parts))])

    def set_groups(self, groups: list[list[int]]) -> None:
        self.groups = [sorted(g) for g in groups]
        self.my_group = next(i for i, g in enumerate(self.groups)
                             if self.part in g)
        self.my_pos = self.groups[self.my_group].index(self.part)

    # -- loading ------------------------------------------------------------

    def _split_hubs(self, flow: str, own: np.ndarray, tgt: np.ndarray,
                    w: np.ndarray | None):
        """Extract edges of over-threshold-degree owned vertices into
        per-destination-partition export lists; record sender routing +
        removed degree. Returns the remaining (own, tgt, w)."""
        self.hub_route[flow] = None
        self.hub_deg[flow] = None
        self._pending_exports[flow] = [None] * self.P
        thr = self.hub_threshold
        if not thr or self.P == 1 or len(own) == 0:
            return own, tgt, w
        own_local = own // self.P
        deg = np.bincount(own_local, minlength=self.n_local)
        if int(deg.max()) < thr:
            return own, tgt, w
        hub_v = deg >= thr
        is_hub = hub_v[own_local]
        h_own, h_tgt = own[is_hub], tgt[is_hub]
        h_w = None if w is None else w[is_hub]
        # removed degree (int + weighted) so ctx.degree() stays correct
        hl = own_local[is_hub]
        deg_i = np.bincount(hl, minlength=self.n_local)
        deg_w = np.bincount(
            hl, weights=(np.ones(len(hl)) if h_w is None else h_w),
            minlength=self.n_local)
        self.hub_deg[flow] = (deg_i.astype(np.int64), deg_w)
        # exports grouped (dest_part, hub) — CSR-by-hub on the receiver
        t_part = h_tgt % self.P
        t_local = h_tgt // self.P
        order = np.lexsort((t_local, h_own, t_part))
        h_own, t_part, t_local = h_own[order], t_part[order], t_local[order]
        h_w = None if h_w is None else h_w[order]
        bounds = np.searchsorted(t_part, np.arange(self.P + 1))
        exports = [None] * self.P
        for q in range(self.P):
            lo, hi = bounds[q], bounds[q + 1]
            if lo == hi:
                continue
            exports[q] = {
                "hub": h_own[lo:hi],          # sorted within dest
                "dst_local": t_local[lo:hi],
                "weight": None if h_w is None else h_w[lo:hi],
            }
        self._pending_exports[flow] = exports
        # sender routing: unique (hub_local, dest_part) pairs
        hub_locals = np.flatnonzero(hub_v).astype(np.int64)
        pair = (h_own // self.P) * self.P + t_part
        upair = np.unique(pair)
        p_hub, p_dest = upair // self.P, upair % self.P
        order = np.argsort(p_hub, kind="stable")
        p_hub, p_dest = p_hub[order], p_dest[order]
        offs = np.searchsorted(p_hub, hub_locals)
        offs = np.append(offs, len(p_hub)).astype(np.int64)
        self.hub_route[flow] = {
            "hub_local": hub_locals,
            "dest_offs": offs,
            "dest_parts": p_dest,
        }
        return own[~is_hub], tgt[~is_hub], (None if w is None
                                            else w[~is_hub])

    def take_satellite_exports(self, flow: str) -> list:
        """One export entry per destination partition (num_returns=P,
        so each destination's entry travels as its own plasma ref)."""
        exports = self._pending_exports.get(flow) or [None] * self.P
        self._pending_exports[flow] = [None] * self.P
        return exports

    def has_hubs(self, flow: str) -> bool:
        rt = self.hub_route.get(flow)
        return rt is not None and len(rt["hub_local"]) > 0

    def node_id(self) -> str:
        return ray.get_runtime_context().get_node_id()

    def ingest_satellites(self, flow: str, *exports) -> int:
        """Merge satellite exports from all senders into this
        partition's per-flow CSR-by-hub store."""
        entries = [e for e in exports if e is not None]
        if not entries:
            self.sats[flow] = None
            return 0
        hub = np.concatenate([e["hub"] for e in entries])
        dst = np.concatenate([e["dst_local"] for e in entries])
        w = (np.concatenate([e["weight"] for e in entries])
             if entries[0]["weight"] is not None else None)
        order = np.lexsort((dst, hub))
        hub, dst = hub[order], dst[order]
        w = None if w is None else w[order]
        ids, counts = np.unique(hub, return_counts=True)
        offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        self.sats[flow] = {"hub_ids": ids, "offs": offs,
                           "dst_local": dst, "weight": w}
        return len(dst)

    def load_blocks_arrays(self, flow_specs: dict) -> dict:
        """flow_specs: {'out': {'own','tgt','weight'} or ref, 'in': ...}."""
        counts = {}
        for flow, spec in flow_specs.items():
            if spec is None:
                continue
            if isinstance(spec, ray.ObjectRef):
                spec = ray.get(spec)
            own, tgt, w = self._split_hubs(
                flow, np.asarray(spec["own"], dtype=np.int64),
                np.asarray(spec["tgt"], dtype=np.int64), spec.get("weight"))
            self.blocks[flow] = FlowBlock.build(
                own, tgt, w, self.P, self.n, self.n_local,
            )
            counts[flow] = self.blocks[flow].num_edges
        return counts

    def load_blocks_parquet(self, path: str, flows: tuple[str, ...],
                            weighted: bool) -> dict:
        """Read this partition's edge files from the graph dir layout
        (<path>/<flow>/part=<p>.parquet with columns src,dst[,weight])."""
        counts = {}
        for flow in flows:
            fp = os.path.join(path, flow, f"part={self.part}")
            if not os.path.isdir(fp):
                fp = fp + ".parquet"
            if not os.path.exists(fp):
                own = tgt = np.empty(0, dtype=np.int64)
                w = None
            else:
                cols = ["src", "dst"] + (["weight"] if weighted else [])
                t = pq.read_table(fp, columns=cols)
                src = t["src"].to_numpy(zero_copy_only=False)
                dst = t["dst"].to_numpy(zero_copy_only=False)
                w = t["weight"].to_numpy(zero_copy_only=False) if weighted else None
                own, tgt = (src, dst) if flow == "out" else (dst, src)
            own, tgt, w = self._split_hubs(flow, own, tgt, w)
            self.blocks[flow] = FlowBlock.build(own, tgt, w, self.P, self.n,
                                                self.n_local)
            counts[flow] = self.blocks[flow].num_edges
        return counts

    # -- program lifecycle ----------------------------------------------------

    def setup(self, program: VertexProgram, params: dict) -> None:
        self.program = program
        self.ctx = WorkerContext(self.part, self.P, self.n, self.n_local,
                                 params, self.blocks,
                                 hub_deg=self.hub_deg, sats=self.sats)
        self.state = program.init_state(self.ctx)
        self.halted = np.zeros(self.n_local, dtype=bool)
        self.last_send = None
        # preallocated merge accumulator (fresh allocations per superstep
        # cause page-fault stalls the BSP barrier amplifies)
        dim = getattr(program, "msg_dim", None)
        shape = self.n_local if dim is None else (self.n_local, dim)
        self._macc = np.empty(shape, dtype=np.dtype(program.msg_dtype))

    # -- pipelined BSP superstep ----------------------------------------------
    #
    # The driver submits superstep k+1 immediately after k, passing k's
    # RETURN REFS inside a list (so Ray does NOT resolve them at dispatch);
    # each worker's ray.get on those refs IS the barrier — it runs inside
    # the workers, in parallel, while the driver races ahead. The driver
    # only ray.gets stats with a two-iteration lag for convergence, so no
    # per-superstep driver round-trip exists (measured: the barriered
    # driver loop cost ~30 ms/superstep at P=32; a decentralized P²
    # deliver-RPC scheme cost ~500 ms). Message payloads travel as ONE
    # packed plasma bundle per sender per superstep (on a multi-node
    # cluster: the per-(sender → receiver-NODE) message block), read
    # zero-copy by receivers.

    def superstep(self, iteration: int, incoming, checkpoint_dir=None,
                  master_value=None):
        """incoming: None (first superstep) or the list of the previous
        superstep's RETURN refs — each resolves to (bundle, stats). The
        packed bundle rides in the return value itself: big returns land
        in plasma, so peers fetch them zero-copy without a round-trip to
        the driver (returning refs-to-bundles instead made every worker
        resolve P small driver-owned objects per superstep ≈ 100 ms at
        P=32)."""
        if incoming is None:
            segments = []
            t_fetch = 0.0
        else:
            # the ray.get on peer bundle refs IS the superstep barrier:
            # it waits for the slowest upstream sender AND pulls the
            # plasma bundles — timed separately so wall-vs-kernel gaps
            # are attributable (straggler skew / fetch vs compute).
            tf0 = time.perf_counter()
            segments = ray.get(incoming)
            t_fetch = time.perf_counter() - tf0
        master_converged = None
        if self.program.needs_master and master_value is not None:
            master_converged = bool(
                self.program.apply_master(self.ctx, self.state, master_value))
        bundles, stats = self._compute_one(iteration, segments)
        stats["t_fetch"] = t_fetch
        if master_converged is not None:
            stats["master_converged_local"] = master_converged
        if checkpoint_dir is not None:
            self.checkpoint(iteration, checkpoint_dir)
            stats["checkpointed"] = True
        return (*bundles, stats)

    def _compute_one(self, iteration: int, payload_segments):
        t0 = time.perf_counter()
        prog = self.program
        if iteration == 0:
            msgs, has_msg = None, np.zeros(self.n_local, dtype=bool)
        else:
            msgs, has_msg = self._merge(payload_segments)
        t1 = time.perf_counter()
        if iteration == 0:
            active = np.ones(self.n_local, dtype=bool)
        else:
            active = has_msg | ~self.halted
        self.halted &= ~active  # vote bits cleared for computed nodes
        out = prog.compute(self.ctx, self.state, msgs, has_msg, active,
                           iteration)
        if out.halt_mask is not None:
            self.halted |= out.halt_mask
        self.last_send = out
        t2 = time.perf_counter()
        payloads, hubs, sent_edges = self._emit_all(out)
        t3 = time.perf_counter()
        bundles = self._pack_groups(payloads, hubs)
        t4 = time.perf_counter()
        stats = {
            "part": self.part,
            "iteration": iteration,
            "active": int(active.sum()),
            "sent_edges": sent_edges,
            "changed": out.changed,
            "all_halted": bool(self.halted.all()),
            "wall_sec": t4 - t0,
            "t_merge": t1 - t0, "t_compute": t2 - t1,
            "t_emit": t3 - t2, "t_pack": t4 - t3,
        }
        if out.master_partial is not None:
            stats["master_partial"] = out.master_partial
        return bundles, stats

    def _pack_groups(self, payloads, hubs) -> list:
        """One packed bundle per destination group (None when the group
        gets nothing). With the default single group this is exactly
        the old one-bundle-per-sender wire format."""
        out = []
        for parts in self.groups:
            seg = [payloads[q] for q in parts]
            ghubs = None
            if hubs is not None:
                hoffs, hids, hvals, hlbls, tr = hubs
                pidx = np.asarray(parts, dtype=np.int64)
                lo, hi = hoffs[pidx], hoffs[pidx + 1]
                take = ranges_to_indices(lo, hi)
                if len(take):
                    g_hoffs = np.zeros(len(parts) + 1, dtype=np.int64)
                    np.cumsum(hi - lo, out=g_hoffs[1:])
                    ghubs = (g_hoffs, hids[take], hvals[take],
                             None if hlbls is None else hlbls[take], tr)
            if ghubs is not None or any(s is not None for s in seg):
                out.append(_pack_bundle(seg, ghubs))
            else:
                out.append(None)
        return out

    def reemit(self):
        """Resume path: re-scatter the checkpointed send decision; the
        return plays the role of the checkpointed iteration's superstep
        return so the next iteration consumes it unchanged."""
        payloads, hubs, sent_edges = self._emit_all(self.last_send)
        bundles = self._pack_groups(payloads, hubs)
        stats = {"part": self.part, "iteration": -1,
                 "sent_edges": sent_edges, "changed": self.n_local,
                 "active": 0, "all_halted": bool(self.halted.all()),
                 "wall_sec": 0.0}
        return (*bundles, stats)

    # -- messaging ------------------------------------------------------------

    def _emit_all(self, out: StepOutput):
        """Normal scatter + hub-value section; returns
        (payloads, hubs | None, sent_edges)."""
        payloads, sent_edges = self._emit(out)
        hubs, n_hub = self._emit_hub_section(out)
        return payloads, hubs, sent_edges + n_hub

    def _emit_hub_section(self, out: StepOutput):
        """Values of owned split hubs, one per (hub, dest-partition):
        ((hoffs, hids, hvals, hlbls, tr), n_messages) or (None, 0).
        (hub, dest) pairs are deduped across flows — send_value is
        flow-independent, and receivers expand each incoming hub id
        against every per-flow satellite store, so one value per pair
        suffices even under flow='both'."""
        prog = self.program
        names = ("out", "in") if prog.flow == "both" else (prog.flow,)
        pair_list = []
        for f in names:
            rt = self.hub_route.get(f)
            if rt is None or len(rt["hub_local"]) == 0:
                continue
            hl, offs, dests = (rt["hub_local"], rt["dest_offs"],
                               rt["dest_parts"])
            sel = np.flatnonzero(out.send_mask[hl])
            if len(sel) == 0:
                continue
            p_hub = np.repeat(hl[sel], offs[sel + 1] - offs[sel])
            p_dest = dests[ranges_to_indices(offs[sel], offs[sel + 1])]
            pair_list.append(p_hub * self.P + p_dest)
        if not pair_list:
            return None, 0
        pairs = np.unique(pair_list[0] if len(pair_list) == 1
                          else np.concatenate(pair_list))
        hub_local, dest = pairs // self.P, pairs % self.P
        order = np.argsort(dest, kind="stable")
        hub_local, dest = hub_local[order], dest[order]
        hids = hub_local * self.P + self.part
        if prog.reducer == VOTE:
            hlbls = out.send_value[hub_local].astype(np.int64)
            hvals = (out.vote_weight[hub_local].astype(np.float64)
                     if out.vote_weight is not None
                     else np.ones(len(hub_local)))
        else:
            hlbls = None
            hvals = out.send_value[hub_local].astype(
                np.dtype(prog.msg_dtype), copy=False)
        hoffs = np.searchsorted(dest, np.arange(self.P + 1)).astype(np.int64)
        return (hoffs, hids, hvals, hlbls, out.target_range), len(pairs)

    def _expand_satellites(self, hub_seg):
        """One sender's hub values → message entries over this
        partition's satellite edges (the receiver-side half of the hub
        scatter — O(local satellite edges), balanced by construction
        since satellites live with their targets)."""
        hids, hvals, hlbls, tr = hub_seg
        prog = self.program
        names = ("out", "in") if prog.flow == "both" else (prog.flow,)
        outs = []
        for f in names:
            st = self.sats.get(f)
            if st is None or len(st["hub_ids"]) == 0:
                continue
            ids = st["hub_ids"]
            pos = np.searchsorted(ids, hids)
            safe = np.minimum(pos, len(ids) - 1)
            ok = (pos < len(ids)) & (ids[safe] == hids)
            if not ok.any():
                continue
            p = pos[ok]
            counts = st["offs"][p + 1] - st["offs"][p]
            eidx = ranges_to_indices(st["offs"][p], st["offs"][p + 1])
            dsts = st["dst_local"][eidx]
            if prog.reducer == VOTE:
                lbl = np.repeat(hlbls[ok], counts)
                w = (st["weight"][eidx].astype(np.float64)
                     if st["weight"] is not None else np.ones(len(dsts)))
                w *= np.repeat(hvals[ok], counts)
                if tr is not None:
                    g = dsts * self.P + self.part
                    m = (g >= tr[0]) & (g < tr[1])
                    dsts, lbl, w = dsts[m], lbl[m], w[m]
                if len(dsts):
                    outs.append(("v", dsts, lbl, w))
            else:
                v = np.repeat(hvals[ok], counts, axis=0)
                if prog.use_edge_weights and st["weight"] is not None:
                    _combine_weight(v, st["weight"][eidx],
                                    prog.edge_combine)
                if tr is not None:
                    g = dsts * self.P + self.part
                    m = (g >= tr[0]) & (g < tr[1])
                    dsts, v = dsts[m], v[m]
                if len(dsts):
                    outs.append(("s", dsts, v))
        return outs

    def _merge(self, incoming):
        """incoming: per-sender packed bundles (materialized — Ray resolves
        the bundle ref when the deliver task runs, zero-copy on-node);
        this worker consumes segment index `self.part` of each."""
        prog = self.program
        bundles = [b for b in incoming if b is not None]
        # incoming bundles are MY GROUP's slices: my segment sits at my
        # position within the group (default single group → my part id)
        payloads = [p for p in
                    (_unpack_segment(b, self.my_pos) for b in bundles)
                    if p is not None]
        for b in bundles:
            hs = _unpack_hubs(b, self.my_pos)
            if hs is not None:
                payloads.extend(self._expand_satellites(hs))
        if prog.reducer == VOTE:
            return self._merge_votes(payloads)
        identity = prog.identity()
        acc = self._macc
        acc.fill(identity)
        sparse_idx, sparse_val = [], []
        if prog.reducer == SUM:
            for p in payloads:
                if p[0] == "d":
                    acc += p[1]
                else:
                    sparse_idx.append(p[1])
                    sparse_val.append(p[2])
            if sparse_idx:
                if acc.ndim == 2:
                    # vector messages: segmented sum (bincount is 1-D only)
                    idx = np.concatenate(sparse_idx)
                    val = np.concatenate(sparse_val)
                    order = np.argsort(idx, kind="stable")
                    idx, val = idx[order], val[order]
                    runs = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
                    acc[idx[runs]] += np.add.reduceat(val, runs, axis=0)
                else:
                    # one cache-resident bincount over all sparse entries
                    # (np.add.at measured ~10× slower at this volume)
                    acc += np.bincount(np.concatenate(sparse_idx),
                                       weights=np.concatenate(sparse_val),
                                       minlength=self.n_local)
            has = ((acc != identity).any(axis=1) if acc.ndim == 2
                   else acc != identity)
        else:  # MIN / OR
            combine = np.minimum if prog.reducer == MIN else np.bitwise_or
            for p in payloads:
                if p[0] == "d":
                    combine(acc, p[1], out=acc)
                else:
                    sparse_idx.append(p[1])
                    sparse_val.append(p[2])
            if sparse_idx:
                idx = np.concatenate(sparse_idx)
                val = np.concatenate(sparse_val)
                order = np.argsort(idx, kind="stable")
                idx, val = idx[order], val[order]
                runs = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
                uidx = idx[runs]
                red = combine.reduceat(val, runs)
                acc[uidx] = combine(acc[uidx], red)
            has = acc != identity
        return acc, has

    def _merge_votes(self, payloads):
        """Combine (idx, label, weight-sum) vote triples from all senders,
        then per-vertex argmax with smaller-label tie-break
        (≙ ComputeStepConsumer.tallyVotes, algo/.../labelpropagation)."""
        if not payloads:
            z = np.zeros(self.n_local, dtype=np.int64)
            return z, np.zeros(self.n_local, dtype=bool)
        idx = np.concatenate([p[1] for p in payloads])
        lbl = np.concatenate([p[2] for p in payloads])
        wgt = np.concatenate([p[3] for p in payloads])
        order = np.lexsort((lbl, idx))
        idx, lbl, wgt = idx[order], lbl[order], wgt[order]
        grp = np.flatnonzero(np.r_[True, (idx[1:] != idx[:-1]) | (lbl[1:] != lbl[:-1])])
        idx, lbl = idx[grp], lbl[grp]
        wgt = np.add.reduceat(wgt, grp)
        # program hook: rescore the per-(vertex, label) vote sums (e.g.
        # Louvain modularity gain) and/or add synthetic candidates
        if hasattr(self.program, "adjust_votes"):
            idx, lbl, wgt = self.program.adjust_votes(idx, lbl, wgt,
                                                      self.state)
            order = np.lexsort((lbl, idx))
            idx, lbl, wgt = idx[order], lbl[order], wgt[order]
        # winner per idx: max weight, tie -> smaller label (lbl already asc)
        order = np.lexsort((lbl, -wgt, idx))
        idx, lbl = idx[order], lbl[order]
        first = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
        winners_idx, winners_lbl = idx[first], lbl[first]
        msgs = np.zeros(self.n_local, dtype=np.int64)
        msgs[winners_idx] = winners_lbl
        has = np.zeros(self.n_local, dtype=bool)
        has[winners_idx] = True
        return msgs, has

    def _flow_blocks(self):
        flow = self.program.flow
        names = ("out", "in") if flow == "both" else (flow,)
        return [self.blocks[f] for f in names if self.blocks.get(f) is not None]

    def _select_edges(self, blk: FlowBlock, send_mask: np.ndarray):
        """Edge indices of the active senders (via the vertex-major
        permutation). Returns None for 'all edges, mask-filter inline'
        (cheaper when most vertices are active)."""
        frac = send_mask.mean() if self.n_local else 0.0
        if frac > 0.5:
            return None
        av = np.flatnonzero(send_mask)
        return blk.perm[
            ranges_to_indices(blk.vtx_offsets[av], blk.vtx_offsets[av + 1])]

    def _emit(self, out: StepOutput):
        prog = self.program
        P, n_max = self.P, self.n_max
        if prog.reducer == VOTE:
            return self._emit_votes(out)
        identity = prog.identity()
        dtype = np.dtype(prog.msg_dtype)
        per_block: list[tuple[np.ndarray, np.ndarray]] = []
        sent_edges = 0
        for blk in self._flow_blocks():
            if blk.num_edges == 0:
                continue
            eidx = self._select_edges(blk, out.send_mask)
            sorted_keys = True
            if eidx is None:
                if out.send_mask.all() and out.target_range is None:
                    keys = blk.combined_key
                    vals = out.send_value[blk.gather_local].astype(
                        dtype, copy=True)
                    if prog.use_edge_weights and blk.weight is not None:
                        _combine_weight(vals, blk.weight, prog.edge_combine)
                else:
                    mask_e = out.send_mask[blk.gather_local]
                    if out.target_range is not None:
                        lo, hi = out.target_range
                        mask_e &= (blk.tgt_global >= lo) & (blk.tgt_global < hi)
                    keys = blk.combined_key[mask_e]
                    vals = out.send_value[blk.gather_local[mask_e]].astype(
                        dtype, copy=True)
                    if prog.use_edge_weights and blk.weight is not None:
                        _combine_weight(vals, blk.weight[mask_e],
                                        prog.edge_combine)
            else:
                if out.target_range is not None and len(eidx):
                    lo, hi = out.target_range
                    tg = blk.tgt_global[eidx]
                    eidx = eidx[(tg >= lo) & (tg < hi)]
                if len(eidx) == 0:
                    continue
                keys = blk.combined_key[eidx]
                vals = out.send_value[blk.gather_local[eidx]].astype(
                    dtype, copy=True)
                if prog.use_edge_weights and blk.weight is not None:
                    _combine_weight(vals, blk.weight[eidx], prog.edge_combine)
                order = np.argsort(keys, kind="stable")
                keys, vals = keys[order], vals[order]
            sent_edges += len(keys)
            if len(keys) == 0:
                continue
            # keys are sorted: segmented reduce to (unique key, reduced
            # value) — O(E) sequential reads, O(unique) writes; no
            # vertex-space-sized accumulator or memset (measured: the
            # P·n_max dense accumulator made the whole engine
            # memory-bandwidth-bound)
            runs = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            if prog.reducer == SUM:
                red = np.add.reduceat(vals, runs)
            elif prog.reducer == MIN:
                red = np.minimum.reduceat(vals, runs)
            else:  # OR
                red = np.bitwise_or.reduceat(vals, runs)
            per_block.append((keys[runs], red))
        payloads = [None] * P
        if per_block:
            if len(per_block) == 1:
                ukeys, red = per_block[0]
            else:  # 'both' flow: merge the two sorted partial reductions
                ukeys = np.concatenate([b[0] for b in per_block])
                red = np.concatenate([b[1] for b in per_block])
                order = np.argsort(ukeys, kind="stable")
                ukeys, red = ukeys[order], red[order]
                runs = np.flatnonzero(np.r_[True, ukeys[1:] != ukeys[:-1]])
                op = {SUM: np.add, MIN: np.minimum,
                      OR: np.bitwise_or}[prog.reducer]
                red = op.reduceat(red, runs)
                ukeys = ukeys[runs]
            bounds = np.searchsorted(ukeys, np.arange(P + 1) * n_max)
            for q in range(P):
                lo, hi = bounds[q], bounds[q + 1]
                if lo == hi:
                    continue
                idx = ukeys[lo:hi] - q * n_max
                v = red[lo:hi]
                n_q = num_local(self.n, q, P)
                if len(idx) >= _SPARSE_DENSITY * n_q:
                    shape = n_q if v.ndim == 1 else (n_q, v.shape[1])
                    seg = np.full(shape, identity, dtype=dtype)
                    seg[idx] = v
                    payloads[q] = ("d", seg)
                else:
                    # local indices always fit int32 (n_max = n/P): half
                    # the index bytes on the wire / through the store
                    payloads[q] = ("s", idx.astype(np.int32, copy=False)
                                   if n_max < (1 << 31) else idx, v)
        return payloads, sent_edges

    def _emit_votes(self, out: StepOutput):
        P, n_max = self.P, self.n_max
        parts_k, parts_l, parts_w = [], [], []
        sent_edges = 0
        for blk in self._flow_blocks():
            if blk.num_edges == 0:
                continue
            eidx = self._select_edges(blk, out.send_mask)
            if eidx is None:
                mask_e = out.send_mask[blk.gather_local]
                if out.target_range is not None:
                    lo, hi = out.target_range
                    mask_e &= (blk.tgt_global >= lo) & (blk.tgt_global < hi)
                gat = blk.gather_local[mask_e]
                keys = blk.combined_key[mask_e]
                ew = blk.weight[mask_e] if blk.weight is not None else None
            else:
                if out.target_range is not None and len(eidx):
                    lo, hi = out.target_range
                    tg = blk.tgt_global[eidx]
                    eidx = eidx[(tg >= lo) & (tg < hi)]
                if len(eidx) == 0:
                    continue
                gat = blk.gather_local[eidx]
                keys = blk.combined_key[eidx]
                ew = blk.weight[eidx] if blk.weight is not None else None
            if len(keys) == 0:
                continue
            lbls = out.send_value[gat].astype(np.int64)
            w = np.ones(len(gat)) if ew is None else ew.astype(np.float64)
            if out.vote_weight is not None:
                w = w * out.vote_weight[gat]
            sent_edges += len(keys)
            # partial reduce by (key, label) — the sender-side combiner
            order = np.lexsort((lbls, keys))
            keys, lbls, w = keys[order], lbls[order], w[order]
            grp = np.flatnonzero(
                np.r_[True, (keys[1:] != keys[:-1]) | (lbls[1:] != lbls[:-1])])
            parts_k.append(keys[grp])
            parts_l.append(lbls[grp])
            parts_w.append(np.add.reduceat(w, grp))
        payloads = [None] * P
        if parts_k:
            keys = np.concatenate(parts_k)
            lbls = np.concatenate(parts_l)
            w = np.concatenate(parts_w)
            if len(parts_k) > 1:
                order = np.lexsort((lbls, keys))
                keys, lbls, w = keys[order], lbls[order], w[order]
            bounds = np.searchsorted(keys, np.arange(P + 1) * n_max)
            for q in range(P):
                lo, hi = bounds[q], bounds[q + 1]
                if lo == hi:
                    continue
                payloads[q] = ("v", keys[lo:hi] - q * n_max, lbls[lo:hi], w[lo:hi])
        return payloads, sent_edges

    # -- checkpoint / results --------------------------------------------------

    def checkpoint(self, iteration: int, ckpt_dir: str) -> dict:
        os.makedirs(os.path.join(ckpt_dir, f"iter={iteration}"), exist_ok=True)
        cols: dict[str, pa.Array] = {}
        for k, v in self.state.items():
            cols[k] = _np_to_pa(v)
        cols["__halted"] = pa.array(self.halted)
        out = self.last_send
        cols["__send_mask"] = pa.array(out.send_mask)
        cols["__send_value"] = _np_to_pa(out.send_value)
        if out.vote_weight is not None:
            cols["__vote_weight"] = pa.array(out.vote_weight)
        table = pa.table(cols)
        if out.target_range is not None:
            table = table.replace_schema_metadata(
                {"target_range": json.dumps(list(out.target_range))})
        path = os.path.join(ckpt_dir, f"iter={iteration}", f"part={self.part}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return {"part": self.part, "rows": self.n_local, "path": path}

    def load_checkpoint(self, iteration: int, ckpt_dir: str) -> bool:
        path = os.path.join(ckpt_dir, f"iter={iteration}", f"part={self.part}.parquet")
        t = pq.read_table(path)
        names = set(t.column_names)
        self.state = {
            k: _pa_to_np(t[k])
            for k in names if not k.startswith("__")
        }
        self.halted = t["__halted"].to_numpy(zero_copy_only=False).copy()
        meta = t.schema.metadata or {}
        tr = meta.get(b"target_range")
        self.last_send = StepOutput(
            send_mask=t["__send_mask"].to_numpy(zero_copy_only=False).copy(),
            send_value=_pa_to_np(t["__send_value"]),
            vote_weight=(t["__vote_weight"].to_numpy(zero_copy_only=False).copy()
                         if "__vote_weight" in names else None),
            target_range=tuple(json.loads(tr)) if tr else None,
        )
        return True

    def local_degrees(self, flows: tuple[str, ...],
                      weighted: bool) -> np.ndarray:
        """Per-owned-vertex degree over the loaded flow blocks (incl.
        degree split out into satellites) — one RPC round instead of a
        Dataset scan+shuffle for degree-style node properties."""
        deg = np.zeros(self.n_local, dtype=np.float64)
        for f in flows:
            blk = self.blocks.get(f)
            if blk is not None and blk.num_edges:
                if weighted and blk.weight is not None:
                    deg += np.bincount(blk.gather_local,
                                       weights=blk.weight,
                                       minlength=self.n_local)
                else:
                    deg += np.bincount(blk.gather_local,
                                       minlength=self.n_local)
            hd = self.hub_deg.get(f)
            if hd is not None:
                deg += hd[1] if weighted else hd[0]
        return deg

    def get_state_table(self, keys: tuple[str, ...]) -> pa.Table:
        cols = {"vid": pa.array(
            np.arange(self.n_local, dtype=np.int64) * self.P + self.part)}
        for k in keys:
            cols[k] = _np_to_pa(self.state[k])
        return pa.table(cols)


# --------------------------------------------------------------------------
# Engine
# --------------------------------------------------------------------------

class TerminationFlag:
    """Cooperative cancellation — the engine analogue of the
    reference's TerminationFlag (polled every 10k nodes inside Java
    kernels; here polled at every superstep barrier, the natural
    cancellation point of a BSP engine). ``stop()`` from any thread
    (or pass ``max_seconds`` for a wall-clock budget); the engine
    finishes the in-flight supersteps and returns a result flagged
    ``terminated=True`` with the state as of the last completed
    iteration."""

    def __init__(self, max_seconds: float | None = None):
        self._stop = False
        self._deadline = (time.monotonic() + max_seconds
                          if max_seconds is not None else None)

    def stop(self) -> None:
        self._stop = True

    def running(self) -> bool:
        if self._stop:
            return False
        if self._deadline is not None and time.monotonic() > self._deadline:
            return False
        return True


class ProgressTracker:
    """Hierarchical task progress (≙ core/.../progress/tasks/
    ProgressTracker.java): nested named tasks with optional volumes;
    the engine logs one progress tick per superstep, pipelines wrap
    phases in subtasks. ``log`` receives (depth, name, done, volume)
    snapshots; the default keeps them in ``events`` for inspection."""

    def __init__(self, name: str = "run", log=None):
        self.stack: list[dict] = [
            {"name": name, "done": 0, "volume": None}]
        self.events: list[tuple] = []
        self._log = log

    def begin_subtask(self, name: str, volume: int | None = None) -> None:
        self.stack.append({"name": name, "done": 0, "volume": volume})
        self._emit()

    def log_progress(self, amount: int = 1) -> None:
        self.stack[-1]["done"] += amount
        self._emit()

    def end_subtask(self) -> None:
        if len(self.stack) > 1:
            t = self.stack.pop()
            self.events.append(
                (len(self.stack), t["name"], t["done"], t["volume"],
                 "end"))

    def _emit(self) -> None:
        t = self.stack[-1]
        ev = (len(self.stack) - 1, t["name"], t["done"], t["volume"])
        self.events.append(ev)
        if self._log is not None:
            self._log(*ev)


@dataclass
class SuperstepResult:
    ran_iterations: int
    converged: bool
    metrics: list[dict]
    state_refs: list | None = None
    state_keys: tuple[str, ...] = ()
    total_wall_sec: float = 0.0
    terminated: bool = False   # stopped by a TerminationFlag, not
                               # convergence / max_iterations

    def to_dataset(self) -> "ray.data.Dataset":
        import ray.data as rd
        return rd.from_arrow_refs(self.state_refs)

    def to_pandas(self):
        import pandas as pd
        tables = ray.get(self.state_refs)
        return pa.concat_tables(tables).to_pandas().sort_values("vid").reset_index(drop=True)


class SuperstepEngine:
    """Creates and feeds a PartitionWorker pool for one graph.

    Reusable across programs (the expensive part — loading and CSR-building
    the blocks — happens once per flow)."""

    def __init__(self, graph: PartitionedGraph, num_parts: int | None = None,
                 hub_degree_threshold: int | str | None = "auto",
                 node_affinity: bool | str | list[list[int]] = "auto"):
        """node_affinity — destination-group bundle routing for
        multi-node clusters: "auto" (default, r5) detects where the
        worker actors landed and enables by-node grouping exactly when
        placement spans more than one node — single-node runs resolve
        to one group and stay byte-identical to the classic wire
        format (one packed object per sender per superstep; every
        receiver reads its segment zero-copy — optimal on one node).
        True forces the by-node grouping query; False disables it.
        With >1 node each sender emits one object PER NODE holding
        only that node's partitions' segments: cross-node traffic per
        superstep drops from senders × whole-bundle to senders ×
        node-slice, and intra-node receivers still share one object.
        A list of partition-id groups pins the routing table
        explicitly (tests / custom placement)."""
        self.graph = graph
        if graph.kind == "parquet":
            self.P = graph.num_parts_layout
        else:
            self.P = num_parts or self._default_parts()
        if hub_degree_threshold == "auto":
            # split only vertices whose single-flow degree rivals a
            # partition's whole edge share — the 65536 floor keeps every
            # balanced (and every oracle-fixture) graph byte-identical
            # to the unsplit layout
            hub_degree_threshold = max(
                65536, graph.num_edges // (8 * max(1, self.P)))
        self.hub_threshold = hub_degree_threshold
        cpus = ray.cluster_resources().get("CPU", self.P)
        num_cpus = max(0.01, min(1.0, cpus / max(1, self.P)))
        self.workers = [
            PartitionWorker.options(num_cpus=num_cpus).remote(
                p, self.P, graph.n, self.hub_threshold)
            for p in range(self.P)
        ]
        try:
            self.groups = self._resolve_groups(node_affinity)
        except Exception:
            self.shutdown()   # leaked actors hold CPU reservations
            raise
        self.group_of = np.empty(self.P, dtype=np.int64)
        for gi, g in enumerate(self.groups):
            for q in g:
                self.group_of[q] = gi
        if len(self.groups) > 1 or self.groups[0] != list(range(self.P)):
            ray.get([w.set_groups.remote(self.groups)
                     for w in self.workers])
        self._loaded_flows: set[str] = set()

    def _resolve_groups(self, node_affinity) -> list[list[int]]:
        if node_affinity is False or node_affinity is None:
            return [list(range(self.P))]
        if node_affinity is True or node_affinity == "auto":
            nodes = ray.get([w.node_id.remote() for w in self.workers])
            return groups_from_node_ids(nodes)
        groups = [sorted(g) for g in node_affinity]
        flat = sorted(q for g in groups for q in g)
        if flat != list(range(self.P)):
            raise ValueError(
                "node_affinity groups must partition range(num_parts)")
        return groups

    @staticmethod
    def _default_parts() -> int:
        return max(2, int(ray.cluster_resources().get("CPU", 4)))

    def _ensure_blocks(self, flow: str) -> None:
        flows = ("out", "in") if flow == "both" else (flow,)
        missing = [f for f in flows if f not in self._loaded_flows]
        if not missing:
            return
        g = self.graph
        if g.kind == "arrays":
            split = partition_edges(g.src, g.dst, g.weight, self.P,
                                    flows=tuple(missing))
            tasks = []
            for p, w in enumerate(self.workers):
                spec = {f: ray.put(split[f][p]) for f in missing}
                tasks.append(w.load_blocks_arrays.remote(spec))
            ray.get(tasks)
        else:
            ray.get([
                w.load_blocks_parquet.remote(g.path, tuple(missing), g.weighted)
                for w in self.workers
            ])
        if self.hub_threshold and self.P > 1:
            self._exchange_satellites(missing)
        self._loaded_flows.update(missing)

    def _exchange_satellites(self, flows) -> None:
        """One-time routing of split-hub edges to their target-owning
        partitions. The exchange is skipped entirely when no worker
        extracted hubs (the common, balanced-graph case)."""
        has = ray.get([w.has_hubs.remote(f)
                       for f in flows for w in self.workers])
        if not any(has):
            return
        for f in flows:
            exports = [
                w.take_satellite_exports.options(num_returns=self.P)
                .remote(f) for w in self.workers]
            # exports[p][q]: worker p's satellite edges owned by q —
            # passed as varargs so Ray resolves each ref on q's node
            ray.get([
                self.workers[q].ingest_satellites.remote(
                    f, *[exports[p][q] for p in range(self.P)])
                for q in range(self.P)])

    def run(
        self,
        program: VertexProgram,
        max_iterations: int,
        params: dict | None = None,
        convergence: str = "messages",   # 'messages' (Pregel) | 'changed' (LP)
        convergence_window: int = 1,     # 'changed': zero changes over this many consecutive iterations
        checkpoint_dir: str | None = None,
        checkpoint_interval: int = 0,
        resume: bool = False,
        collect: tuple[str, ...] | None = None,
        termination: TerminationFlag | None = None,
        tracker: ProgressTracker | None = None,
    ) -> SuperstepResult:
        params = params or {}
        if getattr(program, "msg_dim", None) and program.reducer != SUM:
            raise ValueError("vector messages (msg_dim) require SUM")
        self._ensure_blocks(program.flow)
        ray.get([w.setup.remote(program, params) for w in self.workers])

        start_iter = 0
        prev = None   # per-receiver incoming bundle-ref lists
        G = len(self.groups)
        if resume and checkpoint_dir and program.needs_master:
            # program-level master state (e.g. Louvain volumes) is not in
            # the per-partition checkpoint; resuming would run the first
            # superstep with master_value=None and corrupt the run
            raise ValueError(
                "checkpoint resume is not supported for needs_master "
                "programs: master state is not checkpointed")
        if resume and checkpoint_dir:
            last = latest_complete_iteration(checkpoint_dir, self.P)
            if last is not None:
                ray.get([w.load_checkpoint.remote(last, checkpoint_dir)
                         for w in self.workers])
                start_iter = last + 1
                rets = [w.reemit.options(num_returns=G + 1).remote()
                        for w in self.workers]
                prev = self._prev_lists([list(r[:-1]) for r in rets])

        if program.needs_master:
            return self._run_master(program, max_iterations, start_iter, prev,
                                    checkpoint_dir, checkpoint_interval,
                                    collect, termination, tracker)

        LAG = 2  # pipeline depth: convergence checked this many iterations behind
        t0 = time.perf_counter()
        pending: list[tuple[int, list]] = []
        metrics: list[dict] = []
        checkpoint_iters: list[int] = []
        converged = False
        terminated = False
        ran = max_iterations
        if tracker is not None:
            tracker.begin_subtask(type(program).__name__,
                                  volume=max_iterations)

        def record(done_it: int, stats_refs: list) -> bool:
            """Collect one iteration's stats; True if converged there."""
            stats = ray.get(stats_refs)
            total_sent = sum(s["sent_edges"] for s in stats)
            total_changed = sum(s["changed"] for s in stats)
            metrics.append({
                "iteration": done_it,
                # driver-observed completion time (relative to run start,
                # LAG iterations behind the submit frontier): successive
                # deltas expose inter-iteration latency the per-worker
                # phase timers cannot see (task dispatch, plasma put of
                # the returned bundle, straggler skew)
                "driver_ts": time.perf_counter() - t0,
                "wall_sec": max(s["wall_sec"] for s in stats),
                "sent_edges": total_sent,
                "changed": total_changed,
                "active": sum(s["active"] for s in stats),
                "phase_max": {k: max(s.get(k, 0.0) for s in stats)
                              for k in ("t_merge", "t_compute", "t_emit",
                                        "t_pack", "t_fetch")},
                # per-partition breakdown (part-ordered) so skew /
                # hot-vertex imbalance is attributable per stage
                "phase_parts": {k: [round(s.get(k, 0.0), 6)
                                    for s in sorted(stats,
                                                    key=lambda s: s["part"])]
                                for k in ("t_merge", "t_emit")},
                "sent_parts": [s["sent_edges"]
                               for s in sorted(stats,
                                               key=lambda s: s["part"])],
            })
            if any(s.get("checkpointed") for s in stats):
                checkpoint_iters.append(done_it)
            if convergence == "messages":
                return total_sent == 0 and all(s["all_halted"] for s in stats)
            if done_it >= convergence_window and done_it >= start_iter + 1:
                recent = metrics[-convergence_window:]
                return (len(recent) == convergence_window
                        and sum(m["changed"] for m in recent) == 0)
            return False

        for it in range(start_iter, max_iterations):
            if termination is not None and not termination.running():
                terminated = True
                break
            ck = (checkpoint_dir
                  if checkpoint_interval and checkpoint_dir and
                  (it % checkpoint_interval == 0 or it == max_iterations - 1)
                  else None)
            pairs = [w.superstep.options(num_returns=G + 1).remote(
                it, None if prev is None else prev[p], ck)
                for p, w in enumerate(self.workers)]
            pending.append((it, [p[-1] for p in pairs]))
            prev = self._prev_lists([list(p[:-1]) for p in pairs])
            if len(pending) > LAG:
                done_it, done_rets = pending.pop(0)
                if record(done_it, done_rets):
                    converged, ran = True, done_it
                    break
                if tracker is not None:
                    tracker.log_progress()
        # drain in-flight iterations (harmless no-op supersteps when
        # convergence was just detected — no messages remain in flight)
        for done_it, done_rets in pending:
            if not converged and record(done_it, done_rets):
                converged, ran = True, done_it
            elif converged:
                ray.get(done_rets)
        if terminated:
            ran = metrics[-1]["iteration"] if metrics else start_iter
        if converged:
            metrics = [m for m in metrics if m["iteration"] <= ran]
        total_wall = time.perf_counter() - t0
        for m in metrics:
            m["edges_per_sec"] = (m["sent_edges"] / m["wall_sec"]
                                  if m["wall_sec"] > 0 else 0.0)
        by_iter = {m["iteration"]: m for m in metrics}

        if checkpoint_dir:
            for it in checkpoint_iters:
                self._write_manifest(it, checkpoint_dir, by_iter.get(it, {}))

        if tracker is not None:
            tracker.end_subtask()
        keys = collect if collect is not None else program.state_keys
        state_refs = [w.get_state_table.remote(keys) for w in self.workers]
        # Ensure the tables exist before the engine (and its actors) can be
        # shut down — the driver owns the refs, they outlive the actors.
        ray.wait(state_refs, num_returns=len(state_refs))
        return SuperstepResult(
            ran_iterations=ran, converged=converged, metrics=metrics,
            state_refs=state_refs, state_keys=keys, total_wall_sec=total_wall,
            terminated=terminated,
        )

    def _prev_lists(self, bundle_refs: list) -> list:
        """Per-receiver incoming-ref lists from per-sender per-group
        bundle refs; the default single group shares one list."""
        if len(self.groups) == 1:
            shared = [b[0] for b in bundle_refs]
            return [shared] * self.P
        return [[b[self.group_of[q]] for b in bundle_refs]
                for q in range(self.P)]

    def _run_master(self, program, max_iterations, start_iter, prev,
                    checkpoint_dir, checkpoint_interval, collect,
                    termination=None, tracker=None):
        """Barriered loop for programs with a masterCompute step: every
        superstep's partials are combined on the driver and applied on
        all partitions before the next compute (≙ Pregel.masterCompute —
        the barrier is inherent, so no pipelining here)."""
        metrics: list[dict] = []
        master_value = None
        converged = False
        terminated = False
        ran = max_iterations
        checkpoint_iters: list[int] = []
        G = len(self.groups)
        if tracker is not None:
            tracker.begin_subtask(type(program).__name__,
                                  volume=max_iterations)
        t0 = time.perf_counter()
        for it in range(start_iter, max_iterations):
            if termination is not None and not termination.running():
                terminated = True
                ran = it - 1 if it > start_iter else start_iter
                break
            ck = (checkpoint_dir
                  if checkpoint_interval and checkpoint_dir and
                  (it % checkpoint_interval == 0 or it == max_iterations - 1)
                  else None)
            pairs = [w.superstep.options(num_returns=G + 1).remote(
                it, None if prev is None else prev[p], ck, master_value)
                for p, w in enumerate(self.workers)]
            stats = ray.get([p[-1] for p in pairs])
            prev = self._prev_lists([list(p[:-1]) for p in pairs])
            metrics.append({
                "iteration": it,
                "wall_sec": max(s["wall_sec"] for s in stats),
                "sent_edges": sum(s["sent_edges"] for s in stats),
                "changed": sum(s["changed"] for s in stats),
                "active": sum(s["active"] for s in stats),
            })
            if any(s.get("checkpointed") for s in stats):
                checkpoint_iters.append(it)
            if tracker is not None:
                tracker.log_progress()
            if it > start_iter and all(
                    s.get("master_converged_local", False) for s in stats):
                converged, ran = True, it
                break
            master_value = program.master_combine(
                [s.get("master_partial") for s in stats])
        total_wall = time.perf_counter() - t0
        for m in metrics:
            m["edges_per_sec"] = (m["sent_edges"] / m["wall_sec"]
                                  if m["wall_sec"] > 0 else 0.0)
        if checkpoint_dir:
            by_iter = {m["iteration"]: m for m in metrics}
            for it in checkpoint_iters:
                self._write_manifest(it, checkpoint_dir, by_iter.get(it, {}))
        if tracker is not None:
            tracker.end_subtask()
        keys = collect if collect is not None else program.state_keys
        state_refs = [w.get_state_table.remote(keys) for w in self.workers]
        ray.wait(state_refs, num_returns=len(state_refs))
        return SuperstepResult(
            ran_iterations=ran, converged=converged, metrics=metrics,
            state_refs=state_refs, state_keys=keys, total_wall_sec=total_wall,
            terminated=terminated)

    def _write_manifest(self, it: int, ckpt_dir: str, metric: dict) -> None:
        manifest = {
            "iteration": it,
            "num_parts": self.P,
            "num_vertices": self.graph.n,
            "metrics": metric,
            "complete": True,
        }
        path = os.path.join(ckpt_dir, f"iter={it}", "manifest.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)

    def degrees(self, flow: str = "both",
                weighted: bool = False) -> np.ndarray:
        """Global [n] degree array via one worker RPC round (reusing the
        loaded CSR blocks — no Dataset scan/shuffle). flow: 'out' |
        'in' | 'both' (undirected)."""
        self._ensure_blocks(flow)
        flows = ("out", "in") if flow == "both" else (flow,)
        parts = ray.get([w.local_degrees.remote(flows, weighted)
                         for w in self.workers])
        out = np.zeros(self.graph.n, dtype=np.float64)
        for p, arr in enumerate(parts):
            out[p::self.P] = arr
        return out

    def shutdown(self) -> None:
        for w in self.workers:
            try:
                ray.kill(w)
            except Exception:
                pass
        self.workers = []

    def __del__(self):
        # Actors hold (fractional) CPU reservations; leaking them deadlocks
        # later actor pools. Best-effort cleanup when the handle is dropped.
        try:
            self.shutdown()
        except Exception:
            pass


def latest_complete_iteration(ckpt_dir: str,
                              num_parts: int | None = None) -> int | None:
    """Largest iteration K that is resumable: has a committed manifest, or
    (crash before the post-run manifest write) all `num_parts` part files
    present — each part file is written atomically."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if not name.startswith("iter="):
            continue
        d = os.path.join(ckpt_dir, name)
        ok = False
        mp = os.path.join(d, "manifest.json")
        if os.path.exists(mp):
            try:
                with open(mp) as f:
                    ok = bool(json.load(f).get("complete"))
            except (ValueError, json.JSONDecodeError):
                ok = False
        elif num_parts is not None:
            parts = [f for f in os.listdir(d)
                     if f.startswith("part=") and f.endswith(".parquet")]
            ok = len(parts) == num_parts
        if ok:
            it = int(name.split("=", 1)[1])
            best = it if best is None or it > best else best
    return best
