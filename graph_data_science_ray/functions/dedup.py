"""Deduplication operators for training-data pipelines.

Five families, each expressed Ray-Data-first:

  exact          sha256(text) → bucketed distinct (hash-partition + first)
  minhash-LSH    shingle → minhash signature → banded buckets → candidate
                 pairs → exact-Jaccard verify → connected components
  simhash        64-bit simhash → 4-band blocking → Hamming-distance verify
  ngram-jaccard  exact n-gram Jaccard for a candidate pair set
  embedding      cosine near-dup over an embedding column (see ann.py)

Candidate generation is fully distributed (map_batches + low-cardinality
bucket groupbys — see stages/shuffle.py for why native high-cardinality
groupby is avoided). Candidate VERIFICATION re-reads only candidate docs;
the final clustering runs min-label propagation on the candidate-pair
graph, which is orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.shuffle import distinct_rows

_M61 = np.uint64((1 << 61) - 1)


def exact_dedup(docs: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """(doc_id=min id per identical text, dup_count). Hash first so the
    shuffle key is fixed-width."""

    def hash_kernel(t: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(s.encode()).hexdigest()
                for s in t[text_col].to_pylist()]
        return pa.table({id_col: t[id_col],
                         "h": pa.array(shas, type=pa.string())})

    hashed = docs.map_batches(hash_kernel, batch_format="pyarrow",
                              zero_copy_batch=True)

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby("h", sort=False)[id_col].agg(["min", "size"])
        out = out.reset_index(drop=True)
        out.columns = [id_col, "dup_count"]
        return out

    from ..stages.shuffle import _bucket_hash

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _bucket_hash(df, ["h"], 32)
        return df

    return (hashed.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(keep_first, batch_format="pandas"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-character-shingle hashes (uint64)."""
    norm = " ".join(text.lower().split())
    if len(norm) < k:
        norm = norm.ljust(k)
    data = np.frombuffer(norm.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    win = np.lib.stride_tricks.sliding_window_view(data, k)
    B = np.uint64(1099511628211)
    h = np.zeros(len(win), dtype=np.uint64)
    for i in range(k):
        h = h * B + win[:, i].astype(np.uint64)
    return np.unique(h)


class MinHasher:
    """Actor-pool stage: doc → (band_id, band_hash, doc_id) LSH rows.

    num_perm universal-hash minhashes, grouped into `bands` bands of
    r = num_perm/bands rows; docs sharing any band bucket are candidates
    (standard MinHash-LSH: collision prob = 1-(1-s^r)^bands).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16,
                 shingle_k: int = 5, seed: int = 42):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_M61), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_M61), num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.r = num_perm // bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod M61, min over shingles, per permutation
        sig = np.empty(self.num_perm, dtype=np.uint64)
        for i in range(self.num_perm):
            sig[i] = ((self.a[i] * sh + self.b[i]) % _M61).min()
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            sig = self.signature(text)
            for band in range(self.bands):
                chunk = sig[band * self.r:(band + 1) * self.r]
                bh = hashlib.blake2b(chunk.tobytes(),
                                     digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(bh)
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "band_id": pa.array(band_ids, type=pa.int64()),
            "band_hash": pa.array(band_hashes, type=pa.string()),
        })


def _pairs_from_buckets(group: pd.DataFrame) -> pd.DataFrame:
    """Within one LSH bucket-hash bucket: emit candidate doc pairs."""
    out_a, out_b = [], []
    for (_, _), sub in group.groupby(["band_id", "band_hash"], sort=False):
        ids = np.sort(sub["doc_id"].to_numpy())
        if len(ids) > 1:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
    return pd.DataFrame({"a": np.array(out_a, dtype=np.int64),
                         "b": np.array(out_b, dtype=np.int64)})


def minhash_candidates(docs: rd.Dataset, num_perm: int = 64, bands: int = 16,
                       shingle_k: int = 5, concurrency=(1, 8)) -> rd.Dataset:
    """Distinct candidate near-duplicate pairs (a < b) via MinHash-LSH."""
    lsh_rows = docs.map_batches(
        MinHasher, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle_k": shingle_k},
        concurrency=concurrency)

    from ..stages.shuffle import _bucket_hash

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _bucket_hash(df, ["band_hash"], 32)
        return df

    pairs = (lsh_rows.map_batches(add_bucket, batch_format="pandas")
             .groupby("__bucket")
             .map_groups(_pairs_from_buckets, batch_format="pandas"))
    return distinct_rows(pairs, ["a", "b"])


def verify_jaccard(pairs: pd.DataFrame, texts: dict[int, str],
                   shingle_k: int = 5, threshold: float = 0.8) -> pd.DataFrame:
    """Exact shingle-Jaccard for candidate pairs; keeps rows >= threshold.

    `texts` maps candidate doc_id → text (only candidates need texts; at
    scale this is a broadcast of the candidate subset, not the corpus).
    """
    cache: dict[int, np.ndarray] = {}

    def sh(doc_id: int) -> np.ndarray:
        if doc_id not in cache:
            cache[doc_id] = _shingle_hashes(texts[doc_id], shingle_k)
        return cache[doc_id]

    keep_a, keep_b, sims = [], [], []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = sh(int(a)), sh(int(b))
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
            sims.append(round(j, 6))
    return pd.DataFrame({"a": keep_a, "b": keep_b, "jaccard": sims})


def cluster_pairs(n_ids: np.ndarray, a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """Connected components over the (small) verified-duplicate pair
    graph → (doc_id, cluster_id=min doc in cluster). Union-find; the
    pair set is tiny relative to the corpus by construction."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    ids = n_ids.astype(np.int64)
    cluster = np.array([find(int(i)) for i in ids], dtype=np.int64)
    return pd.DataFrame({"doc_id": ids, "cluster_id": cluster})


def minhash_dedup(docs: rd.Dataset, threshold: float = 0.8,
                  num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 5) -> pd.DataFrame:
    """End-to-end MinHash-LSH near-dedup → (doc_id, cluster_id, keep)."""
    cand = minhash_candidates(docs, num_perm, bands, shingle_k).to_pandas()
    ids_needed = np.unique(np.concatenate([
        cand["a"].to_numpy(np.int64), cand["b"].to_numpy(np.int64)])) \
        if len(cand) else np.empty(0, np.int64)
    texts: dict[int, str] = {}
    if len(ids_needed):
        id_set = set(ids_needed.tolist())
        for batch in docs.iter_batches(batch_size=8192, batch_format="pyarrow"):
            for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                    batch["text"].to_pylist()):
                if doc_id in id_set:
                    texts[doc_id] = text
    verified = verify_jaccard(cand, texts, shingle_k, threshold) if len(cand) \
        else pd.DataFrame({"a": [], "b": [], "jaccard": []})
    all_ids = np.concatenate([
        b["doc_id"].to_numpy(zero_copy_only=False)
        for b in docs.select_columns(["doc_id"]).iter_batches(
            batch_size=1 << 18, batch_format="pyarrow")])
    clustered = cluster_pairs(all_ids,
                              verified["a"].to_numpy(np.int64),
                              verified["b"].to_numpy(np.int64))
    clustered["keep"] = clustered["doc_id"] == clustered["cluster_id"]
    return clustered


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor-pool stage: doc → 64-bit simhash + 4 16-bit blocking keys.

    Near-duplicates (Hamming distance ≤ 3) must agree on at least one of
    the 4 blocks (pigeonhole), so block-equality buckets are a complete
    candidate generator for distance ≤ 3.
    """

    def __init__(self, seed: int = 42):
        import re
        self.word = re.compile(r"[\w']+")

    def simhash(self, text: str) -> int:
        toks = self.word.findall(text.lower())
        if not toks:
            return 0
        hashes = np.array(
            [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                            .digest(), "little") for t in toks],
            dtype=np.uint64)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) &
                np.uint64(1)).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        return int((vote > 0).astype(np.uint64)
                   @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            ids.append(doc_id)
            hashes.append(self.simhash(text))
        h = np.array(hashes, dtype=np.uint64)
        out = {"doc_id": pa.array(ids, type=pa.int64()),
               "simhash": pa.array(h, type=pa.uint64())}
        for blk in range(4):
            out[f"block{blk}"] = pa.array(
                ((h >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(
                    np.int64))
        return pa.table(out)


def simhash_signatures(docs: rd.Dataset, concurrency=(1, 8)) -> rd.Dataset:
    return docs.map_batches(SimHasher, batch_format="pyarrow",
                            zero_copy_batch=True, concurrency=concurrency)


def simhash_dedup(docs: rd.Dataset, max_distance: int = 3) -> pd.DataFrame:
    """(doc_id, cluster_id, keep) for Hamming-distance ≤ max_distance."""
    sigs = simhash_signatures(docs).to_pandas()
    h = sigs["simhash"].to_numpy(dtype=np.uint64)
    ids = sigs["doc_id"].to_numpy(dtype=np.int64)
    pairs_a, pairs_b = [], []
    for blk in range(4):
        groups = sigs.groupby(f"block{blk}", sort=False).indices
        for _, idx in groups.items():
            if len(idx) < 2:
                continue
            for i in range(len(idx)):
                for j in range(i + 1, len(idx)):
                    x, y = idx[i], idx[j]
                    if bin(int(h[x]) ^ int(h[y])).count("1") <= max_distance:
                        a, b = sorted((int(ids[x]), int(ids[y])))
                        pairs_a.append(a)
                        pairs_b.append(b)
    clustered = cluster_pairs(ids, np.array(pairs_a, dtype=np.int64),
                              np.array(pairs_b, dtype=np.int64))
    clustered["keep"] = clustered["doc_id"] == clustered["cluster_id"]
    return clustered


def ngram_jaccard(texts_a: list[str], texts_b: list[str],
                  n: int = 3) -> np.ndarray:
    """Exact character-n-gram Jaccard for aligned text pairs."""
    out = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        sa, sb = _shingle_hashes(ta, n), _shingle_hashes(tb, n)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        out[i] = inter / union if union else 1.0
    return out
