"""Traversal algorithms on the superstep engine: BFS, SSSP, and
multi-source-BFS closeness / harmonic centrality.

  - BFS ≙ paths/traverse/BFS.java: frontier rounds with a min reducer
    (first arrival = hop distance), optional maxDepth cutoff.
  - SSSP ≙ paths/delta/DeltaStepping.java semantics at convergence:
    Bellman-Ford-style relaxation rounds — message = dist + edge weight
    (edge_combine='add'), min reducer; exact shortest distances at
    fixpoint (matches Dijkstra output).
  - MS-BFS ≙ msbfs/MultiSourceBFS.java: 62 sources per wave as an int64
    bitmask column with a bitwise-OR reducer; per-superstep newly-visited
    bits accumulate farness (Σ d) and reciprocal (Σ 1/d) sums.
    Closeness = reached/farness (beta/closeness/DefaultCentralityComputer
    .java:25-31), Wasserman-Faust = that × reached/(n-1); harmonic =
    Σ(1/d) / (n-1) (alpha/.../harmonic/HarmonicCentrality.java).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.superstep import PartitionedGraph, SuperstepEngine, SuperstepResult
from ..stages.vertex_program import MIN, OR, StepOutput, VertexProgram, WorkerContext

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount(x: np.ndarray) -> np.ndarray:
    return _POP[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


class BFSProgram(VertexProgram):
    reducer = MIN
    msg_dtype = "int64"
    state_keys = ("dist",)

    def __init__(self, source_vid: int, max_depth: int | None = None,
                 flow: str = "out"):
        self.source_vid = source_vid
        self.max_depth = max_depth
        self.flow = flow

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        dist = np.full(ctx.n_local, -1, dtype=np.int64)
        dist[ctx.global_ids() == self.source_vid] = 0
        return {"dist": dist}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        dist = state["dist"]
        if iteration == 0:
            send_mask = dist == 0
        else:
            upd = has_msg & (dist < 0)
            dist[upd] = msgs[upd]
            state["dist"] = dist
            send_mask = upd
        if self.max_depth is not None and iteration >= self.max_depth:
            send_mask = np.zeros_like(send_mask)
        return StepOutput(send_mask=send_mask, send_value=dist + 1,
                          halt_mask=active.copy())


def bfs(graph: PartitionedGraph, source_vid: int,
        max_depth: int | None = None, flow: str = "out",
        num_parts: int | None = None,
        engine: SuperstepEngine | None = None) -> SuperstepResult:
    """(vid, dist) hop distances; -1 = unreachable."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    try:
        return eng.run(BFSProgram(source_vid, max_depth, flow),
                       max_iterations=graph.n + 1, collect=("dist",))
    finally:
        if engine is None:
            eng.shutdown()


class SSSPProgram(VertexProgram):
    reducer = MIN
    msg_dtype = "float64"
    use_edge_weights = True
    edge_combine = "add"
    state_keys = ("dist",)

    def __init__(self, source_vid: int, flow: str = "out"):
        self.source_vid = source_vid
        self.flow = flow

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        dist = np.full(ctx.n_local, np.inf)
        dist[ctx.global_ids() == self.source_vid] = 0.0
        return {"dist": dist}

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        dist = state["dist"]
        if iteration == 0:
            send_mask = dist == 0.0
        else:
            cand = np.where(has_msg, msgs, np.inf)
            upd = cand < dist
            dist = np.where(upd, cand, dist)
            state["dist"] = dist
            send_mask = upd
        return StepOutput(send_mask=send_mask, send_value=dist,
                          halt_mask=active.copy())


class DeltaSteppingProgram(VertexProgram):
    """Bucketed SSSP relaxation ≙ paths/delta/DeltaStepping.java.

    The reference processes vertices in distance buckets
    [i·Δ, (i+1)·Δ): a vertex relaxes its edges only while its bucket is
    the globally smallest non-empty one, so far vertices never scatter
    provisional (soon-improved) distances the way plain Bellman-Ford
    rounds do. Here each bucket phase is one-or-more supersteps with a
    masterCompute barrier choosing the active window:

      - per-partition master_partial = min distance among *pending*
        vertices (improved since they last scattered),
      - master_combine floors the global min onto the Δ grid → the
        active window [lo, lo+Δ); (inf, inf) once nothing is pending,
      - compute() scatters dist only for pending vertices inside the
        window (light-edge re-improvements that land back inside the
        current window re-pend and re-scatter next superstep, matching
        the reference's inner light-edge loop).

    Exact at convergence (non-negative weights); total sent_edges is
    the measured win over SSSPProgram's unbucketed relaxation, which
    re-scatters every improvement cascade immediately.
    """

    reducer = MIN
    msg_dtype = "float64"
    use_edge_weights = True
    edge_combine = "add"
    state_keys = ("dist",)
    needs_master = True

    def __init__(self, source_vid: int, delta: float = 2.0,
                 flow: str = "out"):
        self.source_vid = source_vid
        self.delta = float(delta)
        self.flow = flow

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        dist = np.full(ctx.n_local, np.inf)
        dist[ctx.global_ids() == self.source_vid] = 0.0
        return {"dist": dist, "pending": dist == 0.0}

    def master_combine(self, partials: list):
        lo = min((p for p in partials if p is not None), default=np.inf)
        if not np.isfinite(lo):
            return (np.inf, np.inf)
        b = np.floor(lo / self.delta)
        return (b * self.delta, (b + 1.0) * self.delta)

    def apply_master(self, ctx: WorkerContext, state: dict,
                     master_value) -> bool:
        # Converge only on TWO consecutive empty windows: apply_master
        # runs BEFORE compute, so on the first (inf, inf) window the
        # previous superstep's in-flight messages may still improve
        # distances in this very superstep (re-pending vertices). Those
        # produce a finite master_partial and the schedule resumes; if
        # nothing improves, nothing was scattered either, so the second
        # empty window is genuinely quiescent.
        prev_empty = state.get("_win_empty", False)
        empty = not np.isfinite(master_value[0])
        state["window"] = master_value
        state["_win_empty"] = empty
        return empty and prev_empty

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        dist = state["dist"]
        pending = state["pending"]
        if iteration > 0 and msgs is not None:
            cand = np.where(has_msg, msgs, np.inf)
            upd = cand < dist
            dist = np.where(upd, cand, dist)
            state["dist"] = dist
            pending |= upd
        if iteration == 0:
            send = pending.copy()          # the source seeds bucket 0
        else:
            lo, hi = state.get("window", (0.0, self.delta))
            send = pending & (dist >= lo) & (dist < hi)
        pending &= ~send
        state["pending"] = pending
        partial = float(dist[pending].min()) if pending.any() else None
        return StepOutput(send_mask=send, send_value=dist,
                          master_partial=partial)


def sssp(graph: PartitionedGraph, source_vid: int, flow: str = "out",
         num_parts: int | None = None,
         engine: SuperstepEngine | None = None,
         delta: float | None = None) -> SuperstepResult:
    """(vid, dist) weighted shortest distances; inf = unreachable.
    Requires non-negative weights (like the reference's Dijkstra).

    delta=None → unbucketed Bellman-Ford rounds (exact, round count =
    weighted-hop diameter); delta=Δ → the reference's delta-stepping
    bucket schedule (exact, far vertices scatter only once their
    bucket is reached — fewer total edge relaxations on weighted
    graphs at the cost of a master barrier per superstep)."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    prog = (SSSPProgram(source_vid, flow) if delta is None
            else DeltaSteppingProgram(source_vid, delta, flow))
    try:
        return eng.run(prog, max_iterations=4 * graph.n + 4,
                       collect=("dist",))
    finally:
        if engine is None:
            eng.shutdown()


def dfs(graph: PartitionedGraph, source_vid: int,
        max_depth: int | None = None) -> pd.DataFrame:
    """(vid, order, depth) DFS preorder from source, neighbors visited
    in ascending vid order — parity with paths/traverse/DFS.java.

    DFS is inherently sequential (P-complete); like the reference, the
    traversal itself runs single-threaded over the CSR (streamed from
    the parquet blocks once). Use bfs/sssp for the distributed
    frontier algorithms."""
    from .walks import _graph_csr
    indptr, indices = _graph_csr(graph)
    visited = np.zeros(graph.n, dtype=bool)
    order_out, depth_out = [], []
    stack = [(int(source_vid), 0)]
    while stack:
        v, d = stack.pop()
        if visited[v]:
            continue
        visited[v] = True
        order_out.append(v)
        depth_out.append(d)
        if max_depth is not None and d >= max_depth:
            continue
        nbrs = indices[indptr[v]:indptr[v + 1]]
        # push descending so the smallest vid pops first
        for w in nbrs[::-1]:
            if not visited[w]:
                stack.append((int(w), d + 1))
    return pd.DataFrame({
        "vid": np.array(order_out, dtype=np.int64),
        "order": np.arange(len(order_out), dtype=np.int64),
        "depth": np.array(depth_out, dtype=np.int64),
    })


def shortest_path_predecessors(
    graph: PartitionedGraph,
    source_vid: int,
    flow: str = "out",
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
    delta: float | None = None,
) -> pd.DataFrame:
    """(vid, dist, pred) — Dijkstra-with-path-tracking output
    (paths/dijkstra/Dijkstra.java:1-329 predecessor array). Distances
    come from the SSSP fixpoint; predecessors from ONE distributed pass
    over the edge table against the broadcast distance array:
    pred(v) = min u with dist(u) + w(u,v) == dist(v). Unreachable and
    source vertices get pred = -1. Reconstruct a concrete path with
    ``reconstruct_path``."""
    import pyarrow as pa
    import ray

    from ..stages.shuffle import aggregate_rows
    res = sssp(graph, source_vid, flow=flow, num_parts=num_parts,
               engine=engine, delta=delta)
    df = res.to_pandas()
    n = graph.n
    dist = np.full(n, np.inf)
    dist[df["vid"].to_numpy()] = df["dist"].to_numpy()
    dist_ref = ray.put(dist)
    cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")
    edges = graph.edges_dataset(cols, flow="out")

    def pred_partial(t: pa.Table) -> pa.Table:
        d = ray.get(dist_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = (t["weight"].to_numpy(zero_copy_only=False)
             if "weight" in t.column_names else np.ones(len(src)))
        if flow == "in":
            src, dst = dst, src
        cand = d[src] + w
        ok = np.isfinite(cand) & np.isclose(cand, d[dst], rtol=1e-12,
                                            atol=1e-12)
        # per-batch partial min-pred (compact)
        dsts, srcs = dst[ok], src[ok]
        if len(dsts) == 0:
            return pa.table({"vid": np.empty(0, np.int64),
                             "score": np.empty(0, np.float64)})
        order = np.lexsort((srcs, dsts))
        dsts, srcs = dsts[order], srcs[order]
        first = np.r_[True, dsts[1:] != dsts[:-1]]
        return pa.table({"vid": dsts[first], "score": srcs[first].astype(
            np.float64)})

    # min per vid: reuse the bucketed sum helper shape with a min kernel
    partials = edges.map_batches(pred_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def add_bucket(dfb: pd.DataFrame) -> pd.DataFrame:
        dfb = dfb.copy()
        dfb["__bucket"] = dfb["vid"].to_numpy() % 32
        return dfb

    def min_kernel(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("vid", sort=False)["score"].min().reset_index()

    pred_df = (partials.map_batches(add_bucket, batch_format="pandas")
               .groupby("__bucket")
               .map_groups(min_kernel, batch_format="pandas")
               .to_pandas())
    pred = np.full(n, -1, dtype=np.int64)
    if len(pred_df):
        pred[pred_df["vid"].to_numpy(np.int64)] = \
            pred_df["score"].to_numpy().astype(np.int64)
    pred[source_vid] = -1
    pred[~np.isfinite(dist)] = -1
    return pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                         "dist": dist, "pred": pred})


def reconstruct_path(preds: pd.DataFrame, target_vid: int) -> list[int]:
    """Walk the predecessor chain back to the source; [] if unreachable."""
    pred = preds.set_index("vid")["pred"]
    dist = preds.set_index("vid")["dist"]
    if not np.isfinite(dist.loc[target_vid]):
        return []
    path = [int(target_vid)]
    v = int(target_vid)
    while pred.loc[v] >= 0:
        v = int(pred.loc[v])
        path.append(v)
    return path[::-1]


class MSBFSProgram(VertexProgram):
    reducer = OR
    msg_dtype = "int64"
    state_keys = ("farness", "recip", "reached")

    def __init__(self, wave_sources: np.ndarray, flow: str = "both"):
        assert len(wave_sources) <= 62
        self.wave_sources = np.asarray(wave_sources, dtype=np.int64)
        self.flow = flow

    def init_state(self, ctx: WorkerContext) -> dict[str, np.ndarray]:
        visited = np.zeros(ctx.n_local, dtype=np.int64)
        gids = ctx.global_ids()
        for bit, src in enumerate(self.wave_sources):
            visited[gids == src] |= np.int64(1) << np.int64(bit)
        return {
            "visited": visited,
            "farness": np.zeros(ctx.n_local),
            "recip": np.zeros(ctx.n_local),
            "reached": np.zeros(ctx.n_local, dtype=np.int64),
        }

    def compute(self, ctx, state, msgs, has_msg, active, iteration) -> StepOutput:
        visited = state["visited"]
        if iteration == 0:
            new = visited.copy()
        else:
            incoming = np.where(has_msg, msgs, 0)
            new = incoming & ~visited
            cnt = _popcount(new)
            state["farness"] += iteration * cnt
            state["recip"] += np.where(cnt > 0, cnt / iteration, 0.0)
            state["reached"] += cnt
            visited |= new
            state["visited"] = visited
        send_mask = new != 0
        return StepOutput(send_mask=send_mask, send_value=new,
                          halt_mask=active.copy())


class MSBFSDistProgram(MSBFSProgram):
    """MS-BFS that RECORDS per-(vertex, source-bit) hop distances — the
    streamed all-pairs form (alpha/.../msbfs/MSBFSAllShortestPaths.java).
    State adds a [n_local, wave_width] int64 distance matrix (-1 =
    unreached), filled vectorized from each superstep's newly-set bits."""

    state_keys = ("dist2d",)

    def init_state(self, ctx):
        state = super().init_state(ctx)
        w = len(self.wave_sources)
        dist = np.full((ctx.n_local, w), -1, dtype=np.int64)
        rows = np.flatnonzero(state["visited"])
        if len(rows):
            bits = ((state["visited"][rows, None]
                     >> np.arange(w, dtype=np.int64)) & 1).astype(bool)
            r, b = np.nonzero(bits)
            dist[rows[r], b] = 0
        state["dist2d"] = dist
        return state

    def compute(self, ctx, state, msgs, has_msg, active, iteration):
        before = state["visited"].copy()
        out = super().compute(ctx, state, msgs, has_msg, active, iteration)
        if iteration > 0:
            new = state["visited"] & ~before
            rows = np.flatnonzero(new)
            if len(rows):
                w = len(self.wave_sources)
                bits = ((new[rows, None]
                         >> np.arange(w, dtype=np.int64)) & 1).astype(bool)
                r, b = np.nonzero(bits)
                state["dist2d"][rows[r], b] = iteration
        return out


def all_pairs_distances(
    graph: PartitionedGraph,
    sources: np.ndarray | None = None,
    flow: str = "both",
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> pd.DataFrame:
    """(source, target, dist) rows for every reached pair (self included
    at dist 0) — MS-BFS in 62-source waves, distances collected from the
    per-bit matrix state."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    n = graph.n
    if sources is None:
        sources = np.arange(n, dtype=np.int64)
    sources = np.asarray(sources, dtype=np.int64)
    frames = []
    try:
        for lo in range(0, len(sources), 62):
            wave = sources[lo: lo + 62]
            res = eng.run(MSBFSDistProgram(wave, flow=flow),
                          max_iterations=n + 1, collect=("dist2d",))
            df = res.to_pandas()
            vids = df["vid"].to_numpy()
            dist = np.stack(df["dist2d"].to_numpy())  # [n, w]
            r, b = np.nonzero(dist >= 0)
            frames.append(pd.DataFrame({
                "source": wave[b],
                "target": vids[r],
                "dist": dist[r, b],
            }))
    finally:
        if engine is None:
            eng.shutdown()
    out = (pd.concat(frames, ignore_index=True) if frames
           else pd.DataFrame({"source": [], "target": [], "dist": []}))
    return out.sort_values(["source", "target"]).reset_index(drop=True)


def closeness_harmonic(
    graph: PartitionedGraph,
    flow: str = "both",
    wasserman_faust: bool = False,
    num_parts: int | None = None,
    engine: SuperstepEngine | None = None,
) -> pd.DataFrame:
    """All-sources MS-BFS in 62-source waves → per-vertex
    (closeness, harmonic). Distances measured INTO each vertex from the
    wave sources (symmetric for flow='both')."""
    eng = engine or SuperstepEngine(graph, num_parts=num_parts)
    n = graph.n
    farness = np.zeros(n)
    recip = np.zeros(n)
    reached = np.zeros(n, dtype=np.int64)
    try:
        for lo in range(0, n, 62):
            wave = np.arange(lo, min(lo + 62, n), dtype=np.int64)
            res = eng.run(MSBFSProgram(wave, flow=flow),
                          max_iterations=n + 1,
                          collect=("farness", "recip", "reached"))
            df = res.to_pandas()
            vids = df["vid"].to_numpy()
            farness[vids] += df["farness"].to_numpy()
            recip[vids] += df["recip"].to_numpy()
            reached[vids] += df["reached"].to_numpy()
    finally:
        if engine is None:
            eng.shutdown()
    with np.errstate(divide="ignore", invalid="ignore"):
        closeness = np.where(farness > 0, reached / farness, 0.0)
        if wasserman_faust and n > 1:
            closeness = closeness * (reached / (n - 1.0))
        harmonic = recip / max(n - 1, 1)
    return pd.DataFrame({
        "vid": np.arange(n, dtype=np.int64),
        "closeness": closeness,
        "harmonic": harmonic,
    })