"""SplitRelationships — parity with gds.alpha.ml.splitRelationships
(ml/ml-algo/.../EdgeSplitter.java / UndirectedEdgeSplitter): hold out a
fraction of edges as TEST positives, sample an equal-sized set of
non-adjacent node pairs as TEST negatives, and keep the remaining
edges as the TRAIN graph — the entry point of link-prediction
pipelines.

Ray-Data shape: the positive split is a deterministic per-edge hash
test inside map_batches (no shuffle, reproducible across runs and
partitionings); negative sampling draws hash-seeded candidate pairs
per batch and rejects real edges via a broadcast sorted edge-key probe
(one searchsorted per batch — the same membership trick the walks /
triangles kernels use)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.superstep import PartitionedGraph


def _edge_hash_u01(src: np.ndarray, dst: np.ndarray,
                   seed: int) -> np.ndarray:
    x = (src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         ^ dst.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)) \
        + np.uint64(seed)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def split_relationships(
    graph: PartitionedGraph,
    holdout_fraction: float = 0.2,
    negative_sampling_ratio: float = 1.0,
    seed: int = 42,
) -> tuple[rd.Dataset, rd.Dataset]:
    """(train_edges, test_pairs) datasets.

    train_edges: (src, dst[, weight]) — the kept edges.
    test_pairs:  (src, dst, label) — held-out positives (label 1) and
    sampled non-edges (label 0), canonical src < dst.
    """
    cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")
    edges = graph.edges_dataset(cols, flow="out")

    def tag(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        u = _edge_hash_u01(np.minimum(src, dst), np.maximum(src, dst), seed)
        return t.append_column("__test", pa.array(u < holdout_fraction))

    tagged = edges.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def keep_train(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.invert(t["__test"])).drop_columns(["__test"])

    train = tagged.map_batches(keep_train, batch_format="pyarrow")

    def keep_test(t: pa.Table) -> pa.Table:
        kept = t.filter(t["__test"])
        src = kept["src"].to_numpy(zero_copy_only=False)
        dst = kept["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.minimum(src, dst),
                         "dst": np.maximum(src, dst),
                         "label": np.ones(len(src), dtype=np.int64)})

    positives = tagged.map_batches(keep_test, batch_format="pyarrow")
    n_pos = positives.count()
    n_neg = int(round(n_pos * negative_sampling_ratio))

    # broadcast sorted canonical edge keys for the rejection probe
    keys_parts = []
    for batch in edges.iter_batches(batch_size=1 << 20,
                                    batch_format="pyarrow"):
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        keys_parts.append(np.minimum(src, dst) * graph.n
                          + np.maximum(src, dst))
    keys = (np.unique(np.concatenate(keys_parts)) if keys_parts
            else np.empty(0, np.int64))
    keys_ref = ray.put(keys)
    n = graph.n

    def gen_negatives(t: pa.Table) -> pa.Table:
        """Each input row is a sampling slot index; draw a candidate
        pair, reject self-loops and real edges."""
        ks = ray.get(keys_ref)
        idx = t["slot"].to_numpy(zero_copy_only=False)
        a = (_edge_hash_u01(idx, idx + 7, seed + 1) * n).astype(np.int64)
        b = (_edge_hash_u01(idx + 13, idx, seed + 2) * n).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        ok = lo != hi
        probe = lo * n + hi
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, probe), len(ks) - 1)
            ok &= ks[pos] != probe
        return pa.table({"src": lo[ok], "dst": hi[ok],
                         "slot": idx[ok]})

    # oversample slots (rejection loses ~E/(n²/2) + duplicates), dedup
    # keeping each pair's SMALLEST slot, then take the n_neg smallest
    # slots — a deterministic selection (a bare .limit() after the
    # shuffle picks whatever blocks finish first)
    slots = rd.range(int(n_neg * 1.5) + 64).map_batches(
        lambda t: pa.table({"slot": t["id"]}), batch_format="pyarrow")
    raw = slots.map_batches(gen_negatives, batch_format="pyarrow")

    from ..stages.shuffle import _bucket_hash

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _bucket_hash(df, ["src", "dst"], 32)
        return df

    def min_slot(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby(["src", "dst"], sort=False)["slot"]
                .min().reset_index())

    def to_labeled(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"], "dst": t["dst"],
                         "label": np.zeros(len(t), dtype=np.int64)})

    negatives = (raw.map_batches(add_bucket, batch_format="pandas")
                 .groupby("__bucket")
                 .map_groups(min_slot, batch_format="pandas")
                 .sort("slot").limit(n_neg)
                 .map_batches(to_labeled, batch_format="pyarrow"))
    return train, positives.union(negatives)
