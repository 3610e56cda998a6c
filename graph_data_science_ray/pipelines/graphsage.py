"""GraphSage train + embeddings — parity with gds.beta.graphSage
(algo/src/main/java/org/neo4j/gds/embeddings/graphsage/
GraphSageModelTrainer.java, MeanAggregator.java, GraphSageLoss.java,
GraphSageEmbeddingsGenerator.java; defaults from algo/GraphSageTrainConfig.java:
embeddingDimension 64, sampleSizes [25,10], SIGMOID activation,
tolerance 1e-4, learningRate 0.1, epochs 1, maxIterations 10,
searchDepth 5, negativeSampleWeight 20).

Semantics matched:
  - mean aggregator WITH self:  h_v ← σ(W_k · mean({h_v} ∪ {h_u}))
    (MultiMean.java:56-78 divides by sampled-degree + 1)
  - max-pooling aggregator (MaxPoolingAggregator.java): h_v ←
    σ(W_self·h_v + W_neigh·max_u σ(W_pool·h_u + b_pool)) — elementwise
    max over the sampled neighborhood, empty neighborhoods pool to 0
  - final L2 row normalization (GraphSageHelper.java:80)
  - unsupervised loss per batch node v with positive u (endpoint of a
    1..searchDepth uniform random walk) and negative g (degree^0.75-
    weighted sample): −log σ(z_v·z_u) − Q·log σ(−z_v·z_g)
    (GraphSageLoss.java:apply, negativeBatch degree^0.75 weighting)
  - training loop: per-batch tasks with FIXED sampled subgraphs,
    mean-of-batch-gradients → Adam, iteration convergence when every
    batch's loss is tolerance-stable, epoch convergence on relative
    loss change (GraphSageModelTrainer.trainEpoch)

Ray-Data-first shape: the graph is touched ONLY through the
per-partition adjacency shards of pipelines.walks (vid % P routing, no
driver CSR, no O(E) broadcast); node features are sharded the same way
(features[p::P] per shard). Batch subgraph construction + per-iteration
forward/backward run as parallel Ray tasks (the reference's BatchTask
pool); only the weight matrices (dim², tiny) and per-batch scalar
losses cross the driver. Embedding generation is a Dataset
``map_batches`` over the node table — streaming, resumable, never
materializing the full [n, dim] matrix on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..stages.superstep import PartitionedGraph
from .walks import _adjacency_shards

_MIX1 = 0x9E3779B97F4A7C15
_MIX2 = 0xC2B2AE3D27D4EB4F


def _hash_u64(*cols) -> np.ndarray:
    x = np.zeros_like(np.broadcast_arrays(*cols)[0], dtype=np.uint64)
    for c in cols:
        x = (x + np.asarray(c, dtype=np.uint64)) * np.uint64(_MIX1)
        x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x


def _hash_rand(*cols) -> np.ndarray:
    return (_hash_u64(*cols) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def feature_shards(features: np.ndarray, P: int) -> list:
    """Shard a [n, f] feature matrix by vid % P (row v//P of shard
    v % P) — mirrors the adjacency shard layout so tasks fetch only the
    partitions they touch."""
    return [ray.put(np.ascontiguousarray(features[p::P])) for p in range(P)]


def _gather_features(feat_refs: list, P: int, vids: np.ndarray) -> np.ndarray:
    """features[vids] via per-shard gathers (zero-copy plasma reads)."""
    parts = vids % P
    out = None
    for p in np.unique(parts):
        sel = parts == p
        shard = ray.get(feat_refs[p])
        rows = shard[vids[sel] // P]
        if out is None:
            out = np.empty((len(vids), rows.shape[1]), dtype=np.float64)
        out[sel] = rows
    if out is None:
        out = np.empty((0, 1), dtype=np.float64)
    return out


def _sample_adjacency(shard_refs: list, P: int, nodes: np.ndarray,
                      k: int, seed: int, level: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Up to k uniformly sampled distinct out-neighbors per node
    (NeighborhoodSampler semantics: all neighbors when degree ≤ k);
    hash-seeded per (seed, level, node, slot) so the sample is
    deterministic and partition-independent. Returns (flat, counts)
    aligned with `nodes`."""
    m = len(nodes)
    counts = np.zeros(m, dtype=np.int64)
    flats: list[np.ndarray] = []
    owners: list[np.ndarray] = []
    parts = nodes % P
    for p in np.unique(parts):
        sel = np.flatnonzero(parts == p)
        ip, ix, _keys = ray.get(shard_refs[p])
        loc = nodes[sel] // P
        deg = (ip[loc + 1] - ip[loc]).astype(np.int64)
        from ..state.blocks import ranges_to_indices
        cand = ix[ranges_to_indices(ip[loc], ip[loc] + deg)]
        own = np.repeat(sel, deg)
        slot = (np.arange(len(cand), dtype=np.int64)
                - np.repeat(np.cumsum(deg) - deg, deg))
        need_sample = np.repeat(deg > k, deg)
        # keep-all for low-degree; random-permutation top-k otherwise
        r = np.where(need_sample,
                     _hash_rand(np.full(len(cand), seed, np.int64),
                                np.full(len(cand), level, np.int64),
                                np.repeat(nodes[sel], deg), cand),
                     0.0)
        order = np.lexsort((r, own))
        own_s, cand_s = own[order], cand[order]
        run_start = np.r_[0, 1 + np.flatnonzero(own_s[1:] != own_s[:-1])]
        pos_in_run = (np.arange(len(own_s))
                      - np.repeat(run_start, np.diff(np.r_[run_start,
                                                           len(own_s)])))
        keep = pos_in_run < k
        flats.append(cand_s[keep])
        owners.append(own_s[keep])
        del slot
    if flats:
        flat = np.concatenate(flats)
        own = np.concatenate(owners)
        order = np.argsort(own, kind="stable")
        flat, own = flat[order], own[order]
        np.add.at(counts, own, 1)
    else:
        flat = np.empty(0, np.int64)
    return flat, counts


def _index_into(universe_sorted: np.ndarray, vals: np.ndarray) -> np.ndarray:
    return np.searchsorted(universe_sorted, vals)


@ray.remote
def _build_batch(shard_refs: list, feat_refs: list, P: int, n: int,
                 batch_nodes: np.ndarray, sample_sizes: list,
                 search_depth: int, cdf: np.ndarray, seed: int,
                 batch_idx: int) -> dict:
    """One training batch's FIXED sampled computation structure
    (reference createBatchTask): batch ∪ positives ∪ negatives, per-layer
    sampled adjacency index arrays, and the gathered feature matrix."""
    b = len(batch_nodes)
    # positive: endpoint of a uniform random walk, depth U{1..searchDepth}
    depth = (_hash_rand(np.full(b, seed), np.full(b, batch_idx),
                        batch_nodes) * search_depth).astype(np.int64) + 1
    cur = batch_nodes.copy()
    for step in range(1, int(depth.max()) + 1):
        act = depth >= step
        if not act.any():
            break
        nxt = cur.copy()
        parts = cur % P
        for p in np.unique(parts[act]):
            sel = act & (parts == p)
            ip, ix, _ = ray.get(shard_refs[p])
            loc = cur[sel] // P
            deg = ip[loc + 1] - ip[loc]
            alive = deg > 0
            r = _hash_rand(np.full(sel.sum(), seed + 1),
                           np.full(sel.sum(), step), cur[sel])
            pick = ip[loc] + (r * np.maximum(deg, 1)).astype(np.int64)
            chosen = np.where(alive, ix[np.minimum(pick, len(ix) - 1)]
                              if len(ix) else 0, cur[sel])
            nxt[sel] = chosen
        cur = nxt
    pos = cur
    # negative: degree^0.75-weighted over all nodes, excluding the
    # positive set (GraphSageModelTrainer.negativeBatch); rejection
    # rounds, falling back to accept after 4 rounds. `cdf` arrives as a
    # top-level ObjectRef arg (Ray resolves it before the task runs).
    exclude = np.unique(pos)
    neg = np.full(b, -1, np.int64)
    for rnd in range(4):
        todo = np.flatnonzero(neg < 0)
        if len(todo) == 0:
            break
        r = _hash_rand(np.full(len(todo), seed + 2),
                       np.full(len(todo), rnd), batch_nodes[todo])
        cand = np.searchsorted(cdf, r * cdf[-1], side="right")
        cand = np.minimum(cand, n - 1)
        ok = ~np.isin(cand, exclude)
        neg[todo[ok]] = cand[ok]
    todo = np.flatnonzero(neg < 0)
    if len(todo):
        r = _hash_rand(np.full(len(todo), seed + 3), np.zeros(len(todo)),
                       batch_nodes[todo])
        neg[todo] = np.minimum(
            np.searchsorted(cdf, r * cdf[-1], side="right"), n - 1)

    sets = [np.concatenate([batch_nodes, pos, neg])]   # level 0, len 3b
    adj = []   # per level: (self_idx, nbr_idx_flat, counts) into next set
    # layer j of K aggregates level (K-j) into level (K-j-1) with
    # sampleSizes[j]; build outward: level ℓ sampled with
    # sampleSizes[K-ℓ] (subGraphsPerLayer reverses the layer order)
    K = len(sample_sizes)
    for lvl in range(1, K + 1):
        cur_set = sets[-1]
        k = int(sample_sizes[K - lvl])
        flat, counts = _sample_adjacency(shard_refs, P, cur_set, k,
                                         seed + 4, lvl)
        nxt_set = np.unique(np.concatenate([cur_set, flat]))
        adj.append((
            _index_into(nxt_set, cur_set),
            _index_into(nxt_set, flat),
            counts,
        ))
        sets.append(nxt_set)
    X = _gather_features(feat_refs, P, sets[-1])
    return {"b": b, "X": X, "adj": adj}


def _act(z: np.ndarray, kind: str) -> np.ndarray:
    if kind == "relu":
        return np.maximum(z, 0.0)
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


def _act_grad(z: np.ndarray, h: np.ndarray, kind: str) -> np.ndarray:
    if kind == "relu":
        return (z > 0).astype(np.float64)
    return h * (1.0 - h)


def _forward(batch: dict, Ws: list, activation: str,
             aggregator: str = "mean"):
    """Forward pass; returns (E, caches) where E = normalized batch
    embeddings [3b, dim]. aggregator='mean': one W per layer
    (MeanAggregator.java). aggregator='pool': 4 params per layer
    [W_pool, b_pool, W_self, W_neigh] (MaxPoolingAggregator.java:
    elementwise max over act(W_pool·h_u + b_pool), combined
    act(W_self·h_v + W_neigh·maxpooled))."""
    H = batch["X"]
    caches = []
    K = len(batch["adj"])
    # widest aggregation first: layer j uses adj[K-1-j]
    for j in range(K):
        self_idx, nbr_idx, counts = batch["adj"][K - 1 - j]
        if aggregator == "mean":
            denom = (counts + 1).astype(np.float64)[:, None]
            M = H[self_idx].copy()
            if len(nbr_idx):
                owner = np.repeat(np.arange(len(counts)), counts)
                np.add.at(M, owner, H[nbr_idx])
            M /= denom
            Z = M @ Ws[j].T
            Hn = _act(Z, activation)
            caches.append((H, M, Z, Hn))
        else:
            Wp, bp, Wself, Wneigh = Ws[4 * j:4 * j + 4]
            owner = np.repeat(np.arange(len(counts)), counts)
            Hnb = H[nbr_idx]
            B = Hnb @ Wp.T + bp
            A = _act(B, activation)
            Pm = np.full((len(counts), A.shape[1]), -np.inf)
            if len(nbr_idx):
                np.maximum.at(Pm, owner, A)
            Pm[~np.isfinite(Pm[:, 0])] = 0.0   # empty neighborhoods
            Hs = H[self_idx]
            Z = Hs @ Wself.T + Pm @ Wneigh.T
            Hn = _act(Z, activation)
            caches.append((H, (Hnb, B, A, Pm, owner, Hs), Z, Hn))
        H = Hn
    norms = np.linalg.norm(H, axis=1, keepdims=True)
    norms = np.where(norms == 0, 1.0, norms)
    E = H / norms
    return E, norms, caches


def _loss_and_grad(batch: dict, Ws: list, activation: str,
                   neg_weight: float,
                   aggregator: str = "mean") -> tuple[float, list]:
    b = batch["b"]
    E, norms, caches = _forward(batch, Ws, activation, aggregator)
    v, u, g = E[:b], E[b:2 * b], E[2 * b:3 * b]
    sig = lambda x: 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))
    a_pos = sig((v * u).sum(axis=1))
    a_neg = sig((v * g).sum(axis=1))
    loss = float((-np.log(np.maximum(a_pos, 1e-15))
                  - neg_weight * np.log(np.maximum(1 - a_neg, 1e-15))).sum())
    dE = np.zeros_like(E)
    dE[:b] += -(1 - a_pos)[:, None] * u + neg_weight * a_neg[:, None] * g
    dE[b:2 * b] += -(1 - a_pos)[:, None] * v
    dE[2 * b:3 * b] += neg_weight * a_neg[:, None] * v
    # through row normalization E = H/||H||
    dH = (dE - (dE * E).sum(axis=1, keepdims=True) * E) / norms
    grads = [None] * len(Ws)
    K = len(batch["adj"])
    for j in reversed(range(K)):
        Hprev, cache_mid, Z, Hn = caches[j]
        dZ = dH * _act_grad(Z, Hn, activation)
        self_idx, nbr_idx, counts = batch["adj"][K - 1 - j]
        if aggregator == "mean":
            M = cache_mid
            grads[j] = dZ.T @ M
            dM = dZ @ Ws[j]
            denom = (counts + 1).astype(np.float64)[:, None]
            dM = dM / denom
            dHprev = np.zeros_like(Hprev)
            np.add.at(dHprev, self_idx, dM)
            if len(nbr_idx):
                owner = np.repeat(np.arange(len(counts)), counts)
                np.add.at(dHprev, nbr_idx, dM[owner])
        else:
            Wp, bp, Wself, Wneigh = Ws[4 * j:4 * j + 4]
            Hnb, B, A, Pm, owner, Hs = cache_mid
            gWself = dZ.T @ Hs
            gWneigh = dZ.T @ Pm
            dPm = dZ @ Wneigh
            dHprev = np.zeros_like(Hprev)
            np.add.at(dHprev, self_idx, dZ @ Wself)
            if len(nbr_idx):
                # max gradient: split dPm over argmax ties — exact for
                # duplicate sampled neighbors (k copies × 1/k = 1×)
                is_max = A == Pm[owner]
                tie_cnt = np.zeros_like(Pm)
                np.add.at(tie_cnt, owner, is_max.astype(np.float64))
                dA = np.where(
                    is_max,
                    dPm[owner] / np.maximum(tie_cnt[owner], 1.0), 0.0)
                dB = dA * _act_grad(B, A, activation)
                gWp = dB.T @ Hnb
                gbp = dB.sum(axis=0)
                np.add.at(dHprev, nbr_idx, dB @ Wp)
            else:
                gWp = np.zeros_like(Wp)
                gbp = np.zeros_like(bp)
            grads[4 * j:4 * j + 4] = [gWp, gbp, gWself, gWneigh]
        dH = dHprev
    return loss, grads


@ray.remote
def _batch_grad_task(batch: dict, Ws: list, activation: str,
                     neg_weight: float, aggregator: str = "mean"):
    return _loss_and_grad(batch, Ws, activation, neg_weight, aggregator)


def _degree_cdf(graph: PartitionedGraph) -> np.ndarray:
    """Cumulative degree^0.75 weights for negative sampling — degrees
    from compact streamed partials (no driver edges)."""
    n = graph.n
    deg = np.zeros(n, dtype=np.int64)
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        vids, cnts = np.unique(t["src"].to_numpy(zero_copy_only=False),
                               return_counts=True)
        return pa.table({"vid": vids, "cnt": cnts})

    compact = graph.edges_dataset(("src", "dst"), flow="out").map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    for batch in compact.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
        np.add.at(deg, batch["vid"].to_numpy(zero_copy_only=False),
                  batch["cnt"].to_numpy(zero_copy_only=False))
    return np.cumsum(np.power(deg.astype(np.float64), 0.75))


def default_features(graph: PartitionedGraph) -> np.ndarray:
    """[log1p(degree), 1] per node — the degree+bias feature set used
    when no node properties are configured."""
    cdf = _degree_cdf(graph)   # reuse the degree pass
    deg = np.diff(np.r_[0.0, cdf]) ** (1 / 0.75)
    return np.stack([np.log1p(deg), np.ones(graph.n)], axis=1)


def graphsage_train(
    graph: PartitionedGraph,
    features: np.ndarray,
    embedding_dim: int = 64,
    sample_sizes: tuple = (25, 10),
    activation: str = "sigmoid",
    epochs: int = 1,
    max_iterations: int = 10,
    tolerance: float = 1e-4,
    learning_rate: float = 0.1,
    search_depth: int = 5,
    negative_sample_weight: int = 20,
    batch_size: int = 100,
    seed: int = 42,
    aggregator: str = "mean",      # 'mean' | 'pool'
) -> dict:
    """Train GraphSage (mean or max-pooling aggregator); returns a
    catalog-storable model {weights (stacked), shapes, dims, metrics}."""
    if aggregator not in ("mean", "pool"):
        raise ValueError(f"unknown aggregator {aggregator!r}")
    n = graph.n
    features = np.asarray(features, dtype=np.float64)
    P, shard_refs = _adjacency_shards(graph)
    feat_refs = feature_shards(features, P)
    neg_cdf_ref = ray.put(_degree_cdf(graph))

    rng = np.random.default_rng(seed)
    K = len(sample_sizes)
    Ws = []
    for j in range(K):
        cols = features.shape[1] if j == 0 else embedding_dim
        bound = np.sqrt(6.0 / (embedding_dim + cols))
        if aggregator == "mean":
            Ws.append(rng.uniform(-bound, bound,
                                  size=(embedding_dim, cols)))
        else:   # [W_pool, b_pool, W_self, W_neigh]
            Ws.append(rng.uniform(-bound, bound,
                                  size=(embedding_dim, cols)))
            Ws.append(np.zeros(embedding_dim))
            Ws.append(rng.uniform(-bound, bound,
                                  size=(embedding_dim, cols)))
            bd = np.sqrt(6.0 / (2 * embedding_dim))
            Ws.append(rng.uniform(-bd, bd,
                                  size=(embedding_dim, embedding_dim)))

    # fixed batch structures, built in parallel (reference batchTasks)
    node_perm = rng.permutation(n)
    starts = np.arange(0, n, batch_size)
    batch_refs = [
        _build_batch.remote(shard_refs, feat_refs, P, n,
                            node_perm[s:s + batch_size],
                            list(sample_sizes), search_depth,
                            neg_cdf_ref, seed, i)
        for i, s in enumerate(starts)
    ]

    # Adam (ml-core AdamOptimizer: β1=.9, β2=.999, ε=1e-8, clip ±5)
    m = [np.zeros_like(W) for W in Ws]
    v = [np.zeros_like(W) for W in Ws]
    t = 0
    epoch_losses = []
    converged = False
    prev_epoch_loss = np.inf
    prev_task_loss = np.full(len(batch_refs), np.inf)
    for _epoch in range(epochs):
        total_loss = np.nan
        for _it in range(max_iterations):
            results = ray.get([
                _batch_grad_task.remote(bref, Ws, activation,
                                        float(negative_sample_weight),
                                        aggregator)
                for bref in batch_refs])
            losses = np.array([r[0] for r in results])
            total_loss = float(losses.mean())
            task_conv = np.abs(prev_task_loss - losses) < tolerance
            prev_task_loss = losses
            mean_grads = [
                np.mean([r[1][j] for r in results], axis=0)
                for j in range(len(Ws))]
            t += 1
            for j in range(len(Ws)):
                m[j] = 0.9 * m[j] + 0.1 * mean_grads[j]
                v[j] = 0.999 * v[j] + 0.001 * mean_grads[j] ** 2
                mh = m[j] / (1 - 0.9 ** t)
                vh = v[j] / (1 - 0.999 ** t)
                Ws[j] = Ws[j] - np.clip(
                    learning_rate * mh / (np.sqrt(vh) + 1e-8), -5.0, 5.0)
            if task_conv.all():
                break
        epoch_losses.append(total_loss)
        if (np.isfinite(prev_epoch_loss)
                and abs((total_loss - prev_epoch_loss)
                        / prev_epoch_loss) < tolerance):
            converged = True
            break
        prev_epoch_loss = total_loss
    return {
        "weights": np.concatenate([W.reshape(-1) for W in Ws]),
        "shapes": [list(W.shape) for W in Ws],
        "embedding_dim": embedding_dim,
        "sample_sizes": list(sample_sizes),
        "activation": activation,
        "aggregator": aggregator,
        "feature_dim": features.shape[1],
        "epoch_losses": epoch_losses,
        "did_converge": bool(converged),
        "seed": seed,
    }


def _unpack_weights(model: dict) -> list:
    Ws, off = [], 0
    w = np.asarray(model["weights"], dtype=np.float64)
    for shape in model["shapes"]:
        size = int(np.prod(shape))
        Ws.append(w[off:off + size].reshape(shape))
        off += size
    return Ws


def graphsage_embeddings(
    graph: PartitionedGraph,
    features: np.ndarray,
    model: dict,
    seed: int | None = None,
) -> pd.DataFrame:
    """(vid, emb) for every node — streaming Dataset map over node
    batches (GraphSageEmbeddingsGenerator): each batch samples its own
    neighborhoods from the adjacency shards and runs the trained
    forward pass."""
    n = graph.n
    P, shard_refs = _adjacency_shards(graph)
    feat_refs = feature_shards(np.asarray(features, np.float64), P)
    Ws = _unpack_weights(model)
    ws_ref = ray.put(Ws)
    sizes = list(model["sample_sizes"])
    activation = model["activation"]
    aggregator = model.get("aggregator", "mean")
    seed = model.get("seed", 42) if seed is None else seed
    K = len(sizes)

    def embed(df: pd.DataFrame) -> pd.DataFrame:
        Wl = ray.get(ws_ref)
        vids = df["vid"].to_numpy()
        sets = [vids]
        adj = []
        for lvl in range(1, K + 1):
            k = int(sizes[K - lvl])
            flat, counts = _sample_adjacency(shard_refs, P, sets[-1], k,
                                             seed + 4, lvl)
            nxt = np.unique(np.concatenate([sets[-1], flat]))
            adj.append((_index_into(nxt, sets[-1]),
                        _index_into(nxt, flat), counts))
            sets.append(nxt)
        X = _gather_features(feat_refs, P, sets[-1])
        E, _norms, _caches = _forward({"X": X, "adj": adj, "b": len(vids)},
                                      Wl, activation, aggregator)
        return pd.DataFrame({"vid": vids, "emb": list(E)})

    nodes = rd.from_pandas(
        pd.DataFrame({"vid": np.arange(n, dtype=np.int64)}))
    # ~cpus-sized batches keep the sampled subgraphs small
    out = nodes.repartition(max(4, int(
        ray.cluster_resources().get("CPU", 4)))).map_batches(
        embed, batch_format="pandas", batch_size=1024)
    df = out.to_pandas()
    return df.sort_values("vid").reset_index(drop=True)
