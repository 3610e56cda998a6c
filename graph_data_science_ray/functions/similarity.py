"""Similarity functions — parity with gds.similarity.* scalar functions
(algo/src/main/java/org/neo4j/gds/similarity/SimilaritiesFunc.java) and
the node-similarity neighbor-set metrics (similarity/nodesim/).

Vectorized numpy kernels usable inside map_batches.
"""

from __future__ import annotations

import numpy as np


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard over id sets (sorted unique arrays)."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def overlap(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    denom = min(len(a), len(b))
    return inter / denom if denom else 1.0


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))


def pearson(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) < 2:
        return 0.0
    sa, sb = a.std(), b.std()
    if sa == 0 or sb == 0:
        return 0.0
    return float(np.corrcoef(a, b)[0, 1])


def euclidean_distance(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b))


def euclidean_similarity(a: np.ndarray, b: np.ndarray) -> float:
    return 1.0 / (1.0 + euclidean_distance(a, b))


def cosine_matrix(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-wise cosine of q (queries) against m (corpus): [Q, N]."""
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
    return qn @ mn.T
