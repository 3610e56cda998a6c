"""VertexProgram protocol — the user contract of the superstep engine.

The Ray-native analogue of the reference's PregelComputation
(pregel/src/main/java/org/neo4j/gds/beta/pregel/PregelComputation.java:38-117),
re-expressed over whole per-partition NumPy state columns instead of
per-vertex callbacks:

  - ``init_state``  ≙ PregelComputation.init (runs once per partition)
  - ``compute``     ≙ one batch of PregelComputation.compute calls for every
                      active owned vertex (vectorized)
  - ``reducer``     ≙ Reducer.Sum / Reducer.Min (+ the 'vote' extension used
                      by label propagation)
  - vote-to-halt    ≙ the returned halt mask; a vertex is reactivated when a
                      non-identity message arrives (ReducingMessenger
                      semantics: reduced value == identity ⇒ "no message")

Message flow direction:
  'out'  — gather owned src state, scatter along edges to dst (PageRank push)
  'in'   — gather owned dst state, scatter against edges to src (LP pull dual)
  'both' — scatter along both (WCC: edges treated undirected)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

SUM = "sum"
MIN = "min"
OR = "or"      # bitwise OR over int64 bitmasks (multi-source BFS)
VOTE = "vote"

REDUCER_IDENTITY = {
    (SUM, "float64"): 0.0,
    (MIN, "float64"): np.inf,
    (MIN, "int64"): np.iinfo(np.int64).max,
    (MIN, "int32"): np.iinfo(np.int32).max,
    (OR, "int64"): 0,
}


@dataclass
class StepOutput:
    """What a program's compute() hands back to the engine for one superstep."""

    send_mask: np.ndarray            # bool [n_local] — which owned vertices emit
    send_value: np.ndarray           # [n_local] scalar (or [n_local, msg_dim] vector) message per emitting vertex
    halt_mask: np.ndarray | None = None   # bool [n_local] — voteToHalt (subset of active)
    changed: int = 0                 # program-specific change count (LP convergence)
    vote_weight: np.ndarray | None = None  # [n_local] per-sender vote weight (vote reducer)
    target_range: tuple[int, int] | None = None  # only scatter to global vids in [lo, hi)
    master_partial: object = None    # per-partition contribution to masterCompute


class WorkerContext:
    """Per-partition view handed to VertexProgram methods inside the worker."""

    def __init__(self, part: int, num_parts: int, n_global: int, n_local: int,
                 params: dict, blocks: dict, hub_deg: dict | None = None,
                 sats: dict | None = None):
        self.part = part
        self.num_parts = num_parts
        self.n_global = n_global
        self.n_local = n_local
        self.params = params
        self._blocks = blocks
        # hot-vertex splitting compensation (stages/superstep.py):
        # hub_deg[flow] = (int degree, weighted degree) removed from the
        # flow block into remote satellites; sats[flow] = this
        # partition's satellite CSR of REMOTE hubs' edges
        self._hub_deg = hub_deg or {}
        self._sats = sats or {}
        self._deg_cache: dict = {}

    def global_ids(self) -> np.ndarray:
        """Dense vids owned by this partition, in local-index order."""
        return np.arange(self.n_local, dtype=np.int64) * self.num_parts + self.part

    def degree(self, flow: str = "out", weighted: bool = False) -> np.ndarray:
        """Per-owned-vertex degree from the loaded flow block.

        flow='out' → out-degree (requires the OUT block), flow='in' →
        in-degree, flow='both' → sum over both blocks (undirected degree of
        the symmetrized multigraph).
        """
        key = (flow, weighted)
        if key in self._deg_cache:
            return self._deg_cache[key]
        flows = ["out", "in"] if flow == "both" else [flow]
        deg = np.zeros(self.n_local, dtype=np.float64 if weighted else np.int64)
        for f in flows:
            blk = self._blocks.get(f)
            if blk is None:
                raise ValueError(f"degree({flow}) needs the {f} block loaded")
            if weighted:
                w = blk.weight if blk.weight is not None else np.ones(blk.num_edges)
                deg += np.bincount(blk.gather_local, weights=w, minlength=self.n_local)
            else:
                deg += np.bincount(blk.gather_local, minlength=self.n_local)
            hd = self._hub_deg.get(f)
            if hd is not None:
                # degree split out into remote satellite edges
                deg += (hd[1] if weighted else hd[0]).astype(deg.dtype)
        self._deg_cache[key] = deg
        return deg

    def local_edges_global(self) -> tuple[np.ndarray, np.ndarray]:
        """All edges visible to this partition as (owned_global, remote_global).

        Union over loaded blocks; used e.g. by WCC's local pre-union pass.
        """
        owns, tgts = [], []
        for f, blk in self._blocks.items():
            if blk is None or blk.num_edges == 0:
                continue
            owns.append(blk.gather_local * self.num_parts + self.part)
            tgt_part, tgt_local = np.divmod(blk.combined_key, blk.n_max)
            tgts.append(tgt_local * self.num_parts + tgt_part)
        for f, st in self._sats.items():
            # satellite edges of remote hubs: this partition owns the
            # TARGET end (dst_local); the hub is the remote end
            if st is None or len(st["dst_local"]) == 0:
                continue
            owns.append(st["dst_local"] * self.num_parts + self.part)
            counts = np.diff(st["offs"])
            tgts.append(np.repeat(st["hub_ids"], counts))
        if not owns:
            e = np.empty(0, dtype=np.int64)
            return e, e
        return np.concatenate(owns), np.concatenate(tgts)


class VertexProgram:
    """Subclass and override. All arrays are per-local-vertex unless noted."""

    reducer: str = SUM
    flow: str = "out"
    msg_dtype: str = "float64"
    msg_dim: int | None = None       # None → scalar messages; d → [n, d] vector messages (SUM only)
    use_edge_weights: bool = False   # combine each scalar message with the edge weight
    edge_combine: str = "mul"        # 'mul' (PageRank weighting) | 'add' (SSSP relaxation)
    state_keys: tuple[str, ...] = ()  # columns persisted in checkpoints/results
    needs_master: bool = False       # barriered masterCompute between supersteps

    def identity(self):
        return REDUCER_IDENTITY.get((self.reducer, self.msg_dtype))

    # masterCompute hooks (≙ PregelComputation.masterCompute): combine the
    # per-partition StepOutput.master_partial values on the driver, then
    # apply the combined value on every partition BEFORE the next compute.
    def master_combine(self, partials: list):
        raise NotImplementedError

    def apply_master(self, ctx: "WorkerContext", state: dict,
                     master_value) -> bool:
        """Returns this partition's local convergence flag."""
        raise NotImplementedError

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        raise NotImplementedError

    def compute(
        self,
        ctx: WorkerContext,
        state: dict[str, np.ndarray],
        msgs: np.ndarray | None,
        has_msg: np.ndarray,
        active: np.ndarray,
        iteration: int,
    ) -> StepOutput:
        raise NotImplementedError
