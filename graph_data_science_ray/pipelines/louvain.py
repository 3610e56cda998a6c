"""Louvain community detection + modularity — parity with gds.louvain
(louvain/Louvain.java:52-176: ModularityOptimization per level →
community contraction into a supergraph, ≤ maxLevels, dendrogram).

Round-1 shape: the per-level LOCAL-MOVING phase runs the classic
sequential Gauss-Seidel sweep (deterministic ascending order — the same
semantics the reference's concurrency=1 path optimizes; its distributed
form is the wave-scheduled vote-superstep used by label propagation,
with community volumes broadcast via the master hook — phase-2 work).
CONTRACTION re-keys the edge list by community and aggregates parallel
edges — the distributed groupby step. Modularity is a vectorized
edge-table computation.

Undirected interpretation: input directed edges are symmetrized; each
undirected edge counted once in m.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.superstep import PartitionedGraph


def modularity(n: int, src: np.ndarray, dst: np.ndarray,
               weight: np.ndarray | None, labels: np.ndarray) -> float:
    """Q = Σ_c [ in_c/(2m) − (vol_c/(2m))² ] over the symmetrized graph.

    Vectorized over the edge table (the distributed form is two
    groupby-sums keyed by community)."""
    w = np.ones(len(src)) if weight is None else weight.astype(np.float64)
    # symmetrize: each directed edge contributes w to both endpoints' vol
    two_m = 2.0 * w.sum()
    if two_m == 0:
        return 0.0
    vol = np.bincount(src, weights=w, minlength=n) + \
        np.bincount(dst, weights=w, minlength=n)
    same = labels[src] == labels[dst]
    in_w = np.bincount(labels[src[same]], weights=2.0 * w[same],
                       minlength=labels.max() + 1)
    vol_c = np.bincount(labels, weights=vol, minlength=labels.max() + 1)
    return float((in_w / two_m).sum() - ((vol_c / two_m) ** 2).sum())


def _local_moving(n: int, src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                  max_sweeps: int = 10) -> np.ndarray:
    """Gauss-Seidel modularity-gain sweeps over the symmetric adjacency."""
    # symmetric CSR with weights (self-loops kept: contracted internals)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    order = np.lexsort((d, s))
    s, d, ww = s[order], d[order], ww[order]
    indptr = np.searchsorted(s, np.arange(n + 1))

    deg = np.bincount(s, weights=ww, minlength=n)  # 2w self-loops intended
    two_m = float(w.sum() * 2.0)
    if two_m == 0:
        return np.arange(n, dtype=np.int64)
    labels = np.arange(n, dtype=np.int64)
    vol = deg.copy()  # per-community volume

    for _ in range(max_sweeps):
        moved = 0
        for v in range(n):
            lo, hi = indptr[v], indptr[v + 1]
            if lo == hi:
                continue
            nbr = d[lo:hi]
            wv = ww[lo:hi]
            own = labels[v]
            # k_v,in per neighbor community (self-loops excluded)
            ext = nbr != v
            cl = labels[nbr[ext]]
            k_in: dict[int, float] = {}
            for c, x in zip(cl.tolist(), wv[ext].tolist()):
                k_in[c] = k_in.get(c, 0.0) + x
            k_in.setdefault(own, 0.0)
            kv = deg[v]
            best_c, best_gain = own, -np.inf
            for c in sorted(k_in):
                volc = vol[c] - (kv if c == own else 0.0)
                gain = k_in[c] - kv * volc / two_m
                if gain > best_gain + 1e-15:
                    best_gain, best_c = gain, c
            if best_c != own:
                vol[own] -= kv
                vol[best_c] += kv
                labels[v] = best_c
                moved += 1
        if moved == 0:
            break
    return labels


class LouvainLocalMoveProgram:
    """Distributed local-moving phase as wave-scheduled vote supersteps.

    Votes carry (community label, edge weight); the adjust_votes hook
    rescores each candidate community c of vertex v with the modularity
    gain  k_v,in(c) − k_v · (vol(c) − [c = own] · k_v) / 2m  and appends
    the own community as a synthetic candidate (k_in = 0 if no neighbor
    shares it) so "stay" competes fairly. Community volumes are
    recomputed per superstep from per-partition partials and broadcast
    through the masterCompute hook. With waves == n this reproduces the
    sequential Gauss-Seidel sweep exactly."""

    reducer = "vote"
    flow = "both"
    msg_dtype = "int64"
    use_edge_weights = True
    edge_combine = "mul"
    state_keys = ("label",)
    needs_master = True

    def __init__(self, n: int, two_m: float, waves: int,
                 self_w: np.ndarray | None = None,
                 max_sweeps: int = 10):
        self.n = n
        self.two_m = two_m
        self.waves = max(1, min(waves, n)) if n else 1
        self.bounds = np.linspace(0, n, self.waves + 1).astype(np.int64)
        self.self_w = self_w
        self.max_sweeps = max_sweeps
        self.vol = None
        self._changed_history: list[int] = []

    def identity(self):
        return None

    def init_state(self, ctx) -> dict[str, np.ndarray]:
        gids = ctx.global_ids()
        deg = ctx.degree("both", weighted=True).astype(np.float64)
        if self.self_w is not None:
            deg = deg + 2.0 * np.asarray(self.self_w, dtype=np.float64)[gids]
        return {"label": gids.copy(), "deg": deg}

    def _wave_range(self, w: int) -> tuple[int, int]:
        return int(self.bounds[w]), int(self.bounds[w + 1])

    def adjust_votes(self, idx, lbl, wgt, state):
        # synthetic own-community candidate (k_in contribution 0)
        uidx = np.unique(idx)
        idx = np.concatenate([idx, uidx])
        lbl = np.concatenate([lbl, state["label"][uidx]])
        wgt = np.concatenate([wgt, np.zeros(len(uidx))])
        order = np.lexsort((lbl, idx))
        idx, lbl, wgt = idx[order], lbl[order], wgt[order]
        grp = np.flatnonzero(
            np.r_[True, (idx[1:] != idx[:-1]) | (lbl[1:] != lbl[:-1])])
        idx, lbl = idx[grp], lbl[grp]
        wgt = np.add.reduceat(wgt, grp)
        kv = state["deg"][idx]
        own = state["label"][idx]
        volc = self.vol[lbl] - np.where(lbl == own, kv, 0.0)
        gain = wgt - kv * volc / self.two_m
        return idx, lbl, gain

    def compute(self, ctx, state, msgs, has_msg, active, iteration):
        from ..stages.vertex_program import StepOutput
        label = state["label"]
        changed = 0
        if iteration > 0 and msgs is not None:
            lo, hi = self._wave_range((iteration - 1) % self.waves)
            gids = ctx.global_ids()
            upd = has_msg & (gids >= lo) & (gids < hi)
            new_label = np.where(upd, msgs, label)
            changed = int((new_label != label).sum())
            state["label"] = new_label
            label = new_label
        # per-partition volume partial for the master
        ulbl, inv = np.unique(label, return_inverse=True)
        vols = np.bincount(inv, weights=state["deg"])
        return StepOutput(
            send_mask=np.ones(ctx.n_local, dtype=bool),
            send_value=label,
            changed=changed,
            target_range=self._wave_range(iteration % self.waves),
            master_partial=(ulbl, vols, changed),
        )

    def master_combine(self, partials):
        vol = np.zeros(self.n)
        changed = 0
        for p in partials:
            if p is None:
                continue
            ulbl, vols, ch = p
            vol[ulbl] += vols
            changed += ch
        return (vol, changed)

    def apply_master(self, ctx, state, master_value) -> bool:
        vol, changed = master_value
        self.vol = vol
        self._changed_history.append(changed)
        h = self._changed_history
        # converged when a full sweep (waves supersteps) moved nothing,
        # excluding the seeding superstep; cap total sweeps
        if len(h) >= self.waves + 1 and sum(h[-self.waves:]) == 0:
            return True
        return len(h) > self.max_sweeps * self.waves


class ModularityOptimizationProgram(LouvainLocalMoveProgram):
    """Standalone color-constrained modularity optimization ≙
    beta/modularity/ModularityOptimization.java (gds.beta.
    modularityOptimization): a K1 coloring schedules the parallel
    moves — all vertices of one color class apply their best-gain
    community move simultaneously (no two adjacent vertices move in
    the same phase, so the classic parallel-move oscillation cannot
    occur); one sweep = one pass over every color class. Identical
    gain formula and volume bookkeeping as the Louvain local-moving
    program; only the wave schedule differs (color classes instead of
    vid windows). Supports seed communities (the reference's
    seedProperty). Converges when a full color sweep moves nothing
    (the reference's tolerance=0 behavior) or after max_sweeps."""

    def __init__(self, n: int, two_m: float, colors: np.ndarray | None,
                 num_colors: int, seeds: np.ndarray | None = None,
                 max_sweeps: int = 10, color_refs: list | None = None):
        super().__init__(n, two_m, waves=1, max_sweeps=max_sweeps)
        self.waves = max(1, int(num_colors))
        self.colors = colors
        self.color_refs = color_refs
        self.seeds = seeds

    def init_state(self, ctx) -> dict[str, np.ndarray]:
        st = super().init_state(ctx)
        gids = ctx.global_ids()
        if self.seeds is not None:
            st["label"] = np.asarray(self.seeds,
                                     dtype=np.int64)[gids].copy()
        if self.color_refs is not None:
            # K1 colors arrive as the coloring engine's per-partition
            # state tables (local vertex order, same deterministic
            # vid→partition layout) — never an O(V) driver array
            t = ray.get(self.color_refs[ctx.part])
            color = t["color"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(color) != ctx.n_local:
                raise ValueError(
                    f"color refs misaligned: partition {ctx.part} has "
                    f"{len(color)} colors for {ctx.n_local} local "
                    "vertices (coloring must run at the same partition "
                    "count)")
            st["color"] = color
        else:
            st["color"] = np.asarray(self.colors, dtype=np.int64)[gids]
        return st

    def compute(self, ctx, state, msgs, has_msg, active, iteration):
        from ..stages.vertex_program import StepOutput
        label = state["label"]
        changed = 0
        if iteration > 0 and msgs is not None:
            wave_color = (iteration - 1) % self.waves
            upd = has_msg & (state["color"] == wave_color)
            new_label = np.where(upd, msgs, label)
            changed = int((new_label != label).sum())
            state["label"] = new_label
            label = new_label
        ulbl, inv = np.unique(label, return_inverse=True)
        vols = np.bincount(inv, weights=state["deg"])
        return StepOutput(
            send_mask=np.ones(ctx.n_local, dtype=bool),
            send_value=label,
            changed=changed,
            master_partial=(ulbl, vols, changed),
        )


def modularity_optimization(
    graph: PartitionedGraph,
    max_sweeps: int = 10,
    seeds: np.ndarray | None = None,
    num_parts: int | None = None,
    colors: np.ndarray | None = None,
) -> tuple[pd.DataFrame, dict]:
    """gds.beta.modularityOptimization: one color-constrained
    local-moving phase (no contraction — that is Louvain's addition).
    Returns ((vid, community) with min-vid representative ids, stats
    {"modularity", "ran_sweeps", "num_colors"}). colors overrides the
    K1 schedule (tests / precomputed colorings)."""
    from ..stages.superstep import SuperstepEngine
    from .coloring import _max_color, k1_coloring
    from .community_metrics import modularity_by_community
    n = graph.n
    color_refs = None
    if colors is None:
        # colors stay worker-side: per-partition state refs from the
        # coloring engine, shipped into the program by ref (r5 — the
        # K1 array previously transited the driver and the program
        # constructor, O(V) twice)
        k1res = k1_coloring(graph, num_parts=num_parts)
        color_refs = k1res.state_refs
        num_colors = max(ray.get([_max_color.remote(r)
                                  for r in color_refs]), default=-1) + 1
        num_colors = max(num_colors, 1)
    else:
        num_colors = int(colors.max()) + 1 if n else 1
    # seed values are arbitrary int64 (the reference's seedProperty);
    # the volume bookkeeping indexes a length-n array by label, so run
    # on dense codes and translate back afterwards
    seed_values = None
    if seeds is not None:
        seed_values, seed_codes = np.unique(
            np.asarray(seeds, dtype=np.int64), return_inverse=True)
        seeds = seed_codes.astype(np.int64)
    if graph.kind == "arrays":
        w_sum = (float(len(graph.src)) if graph.weight is None
                 else float(graph.weight.sum()))
    elif graph.weighted:
        w_sum = float(graph.edges_dataset(("weight",), flow="out")
                      .sum(on="weight") or 0.0)
    else:
        w_sum = float(graph.num_edges)
    two_m = 2.0 * w_sum
    if two_m == 0:
        labels_ref = ray.put(np.arange(n, dtype=np.int64))
        ran = 0
    else:
        prog = ModularityOptimizationProgram(
            n, two_m, colors, num_colors, seeds=seeds,
            max_sweeps=max_sweeps, color_refs=color_refs)
        eng = SuperstepEngine(graph, num_parts=num_parts)
        try:
            res = eng.run(prog, max_iterations=max_sweeps * num_colors + 2,
                          collect=("label",))
            labels_ref = _assemble_labels.remote(n, *res.state_refs)
            # materialize before the engine's state tables go away
            ray.wait([labels_ref])
        finally:
            eng.shutdown()
        ran = -(-res.ran_iterations // num_colors)
    # representative-id densification (and the seed-id translation)
    # happen worker-side; the driver receives the final community
    # array exactly once — for the O(V) query output itself
    community_ref = _finalize_communities.remote(labels_ref, seed_values)
    q = float(modularity_by_community(graph, community_ref)[
        "modularity"].sum())
    out = pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                        "community": ray.get(community_ref)})
    return out, {"modularity": q, "ran_sweeps": int(ran),
                 "num_colors": num_colors}


@ray.remote(num_cpus=0)
def _finalize_communities(labels: np.ndarray,
                          seed_values: np.ndarray | None) -> np.ndarray:
    """Seeded runs report the user's original seed community ids;
    unseeded runs densify to the min-original-vid representative
    (first occurrence index of each label IS its min vid). Runs as a
    num_cpus=0 task so the O(V) label array never transits the driver
    before the final output composition."""
    if seed_values is not None:
        return seed_values[labels]
    _, first_idx, inv = np.unique(labels, return_index=True,
                                  return_inverse=True)
    return first_idx[inv].astype(np.int64)


@ray.remote(num_cpus=0)
def _assemble_labels(n: int, *tables) -> np.ndarray:
    """Full per-vid label array assembled from the engine's
    per-partition state tables INSIDE a worker task — the array lands
    in plasma and the driver handles only its ref (r4: previously the
    driver downloaded the O(V) array and re-uploaded it for the
    contraction broadcast)."""
    labels = np.arange(n, dtype=np.int64)
    for t in tables:
        labels[t["vid"].to_numpy(zero_copy_only=False)] = \
            t["label"].to_numpy(zero_copy_only=False)
    return labels


def louvain_distributed_level(
    graph: PartitionedGraph,
    waves: int | None = None,
    max_sweeps: int = 10,
    self_w: np.ndarray | None = None,
    num_parts: int | None = None,
) -> "ray.ObjectRef":
    """One level of distributed local-moving; returns an ObjectRef to
    the per-vid label array (assembled worker-side — callers that need
    the array driver-side ray.get it once, for output composition)."""
    from ..stages.superstep import SuperstepEngine
    n = graph.n
    if graph.kind == "arrays":
        w_sum = (float(len(graph.src)) if graph.weight is None
                 else float(graph.weight.sum()))
    elif graph.weighted:
        w_sum = float(graph.edges_dataset(("weight",), flow="out")
                      .sum(on="weight") or 0.0)
    else:
        w_sum = float(graph.num_edges)
    two_m = 2.0 * (w_sum + (self_w.sum() if self_w is not None else 0.0))
    if two_m == 0:
        return ray.put(np.arange(n, dtype=np.int64))
    if waves is None:
        waves = n if n <= 2048 else 16
    prog = LouvainLocalMoveProgram(n, two_m, waves, self_w=self_w,
                                   max_sweeps=max_sweeps)
    eng = SuperstepEngine(graph, num_parts=num_parts)
    try:
        res = eng.run(prog, max_iterations=max_sweeps * prog.waves + 2,
                      collect=("label",))
        labels_ref = _assemble_labels.remote(n, *res.state_refs)
        # materialize before the engine (and its state tables) go away
        ray.wait([labels_ref])
    finally:
        eng.shutdown()
    return labels_ref


def _contract_edges_distributed(
    graph: PartitionedGraph, labels_ref,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Re-key the graph's edge table by community and sum parallel edges
    — map_batches relabel with the broadcast label-array REF (assembled
    worker-side, never relayed through the driver), then the
    hash-bucketed groupby-sum (stages.shuffle.aggregate_rows). The
    contracted edge set (communities², usually ≪ E) lands on the driver
    for the remaining small levels."""
    from ..stages.shuffle import aggregate_rows
    cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")
    edges = graph.edges_dataset(cols, flow="out")

    def relabel(t: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        s = lab[t["src"].to_numpy(zero_copy_only=False)]
        d = lab[t["dst"].to_numpy(zero_copy_only=False)]
        w = (t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
             if "weight" in t.column_names else np.ones(len(s)))
        return pa.table({"s": s.astype(np.int64), "d": d.astype(np.int64),
                         "w": w})

    agg = aggregate_rows(
        edges.map_batches(relabel, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["s", "d"], ["w"]).to_pandas()
    return (agg["s"].to_numpy(np.int64), agg["d"].to_numpy(np.int64),
            agg["w"].to_numpy(np.float64))


def louvain(
    graph: PartitionedGraph,
    max_levels: int = 10,
    max_sweeps: int = 10,
    distributed: bool = False,
) -> tuple[pd.DataFrame, list[float]]:
    """Returns ((vid, community), modularity per level). Community ids
    are representative original vids (stable across runs).

    Parquet graphs run level 0 fully distributed (engine local-moving on
    the partitioned blocks + map_batches contraction); the contracted
    levels — orders of magnitude smaller — continue on driver arrays.
    Level-0 parquet input is assumed self-loop-free (graph builds dedup
    u≠v edges); contracted self-loops are handled at every later level.
    """
    n = graph.n
    mapping = np.arange(n, dtype=np.int64)  # original vid -> current node
    mods: list[float] = []
    start_level = 0

    if graph.kind == "parquet":
        labels_ref = louvain_distributed_level(graph,
                                               max_sweeps=max_sweeps)
        src, dst, w = _contract_edges_distributed(graph, labels_ref)
        # the ONLY driver download of the O(V) level-0 array — output
        # (mapping) composition; the contraction above used the ref
        labels = ray.get(labels_ref)
        cur_n = (int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
                 if len(src) else 0)
        # Q of the original labels == Q of the contracted graph under
        # identity labels (self-loops carry the in-community weight)
        q = (modularity(cur_n, src, dst, w, np.arange(cur_n, dtype=np.int64))
             if cur_n else 0.0)
        mods.append(q)
        mapping = labels
        distributed = True
        start_level = 1
    else:
        src = graph.src.copy()
        dst = graph.dst.copy()
        w = (np.ones(len(src)) if graph.weight is None
             else graph.weight.astype(np.float64))

    for _level in range(start_level, max_levels):
        m = len(np.unique(np.concatenate([src, dst]))) if len(src) else 0
        cur_n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 0
        if cur_n == 0:
            break
        if distributed:
            sl = src == dst
            self_w = np.bincount(src[sl], weights=w[sl], minlength=cur_n)
            level_graph = PartitionedGraph.from_arrays(
                cur_n, src[~sl], dst[~sl], w[~sl])
            labels = ray.get(louvain_distributed_level(
                level_graph, max_sweeps=max_sweeps, self_w=self_w))
        else:
            labels = _local_moving(cur_n, src, dst, w, max_sweeps=max_sweeps)
        q = modularity(cur_n, src, dst, w, labels)
        if mods and q <= mods[-1] + 1e-12:
            break
        mods.append(q)
        mapping = labels[mapping]
        # contraction: re-key edges by community, aggregate parallel edges
        # (the distributed groupby step — stages.shuffle.distinct_rows with
        # a sum aggregate at scale)
        csrc, cdst = labels[src], labels[dst]
        df = pd.DataFrame({"s": csrc, "d": cdst, "w": w})
        agg = df.groupby(["s", "d"], sort=False)["w"].sum().reset_index()
        src = agg["s"].to_numpy(np.int64)
        dst = agg["d"].to_numpy(np.int64)
        w = agg["w"].to_numpy(np.float64)
        if len(np.unique(labels)) == m:
            break

    # densify community ids to representative min original vid: the
    # first occurrence index of each community IS its min vid (one
    # O(V log V) unique pass — the per-community flatnonzero scan was
    # O(C·V))
    final = mapping
    _, first_idx, inv = np.unique(final, return_index=True,
                                  return_inverse=True)
    community = first_idx[inv].astype(np.int64)
    out = pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                        "community": community})
    return out, mods