"""Random graph generator — parity with gds.beta.graph.generate
(core/src/main/java/org/neo4j/gds/beta/generator/RandomGraphGenerator.java:58-200,
RelationshipDistribution.java:35-54): seedable synthesis with UNIFORM /
RANDOM (gaussian) / POWER_LAW out-degree distributions and uniform
target selection."""

from __future__ import annotations

import numpy as np


def generate_random_graph(
    node_count: int,
    average_degree: float,
    distribution: str = "uniform",   # uniform | random | power_law
    seed: int = 42,
    with_weights: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Returns (src, dst, weight?) directed edge arrays over dense vids.

    Degree semantics mirror the reference: UNIFORM → every node exactly
    avg; RANDOM → gaussian around avg (σ = avg/2, clipped ≥ 0);
    POWER_LAW → pareto-ish with mean ≈ avg, min 1. Targets uniform."""
    rng = np.random.default_rng(seed)
    if distribution == "uniform":
        degrees = np.full(node_count, int(average_degree), dtype=np.int64)
    elif distribution == "random":
        degrees = np.maximum(
            rng.normal(average_degree, average_degree / 2.0,
                       node_count).astype(np.int64), 0)
    elif distribution == "power_law":
        a = 2.5
        raw = (rng.pareto(a - 1.0, node_count) + 1.0)
        degrees = np.maximum(
            (raw * (average_degree * (a - 2.0) / (a - 1.0))).astype(np.int64),
            1)
    else:
        raise ValueError(f"unknown distribution {distribution}")
    total = int(degrees.sum())
    src = np.repeat(np.arange(node_count, dtype=np.int64), degrees)
    dst = rng.integers(0, node_count, total, dtype=np.int64)
    weight = rng.random(total) if with_weights else None
    return src, dst, weight