"""Reference test fixtures (FIXTURES.md) as in-memory graphs.

Ported from the reference's own unit/doc fixtures:
  - PageRank wiki graph: algo/src/test/java/org/neo4j/gds/pagerank/PageRankTest.java:64-110
  - PageRank doc graph:  doc/asciidoc/algorithms/page-rank/page-rank.adoc:247-357
  - WCC doc graph:       doc/asciidoc/algorithms/wcc/wcc.adoc:213-227
  - Label Propagation:   doc/asciidoc/algorithms/label-propagation/label-propagation.adoc:252-273
  - Triangle Count:      doc/asciidoc/algorithms/triangle-count/triangle-count.adoc:237-256

Node names map to dense vids in listed order (0-based).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class FixtureGraph:
    """A tiny named graph: directed edge list over dense vids [0, n)."""

    name: str
    n: int
    node_names: list[str]
    src: np.ndarray
    dst: np.ndarray
    weight: np.ndarray | None = None
    expected: dict[str, object] = field(default_factory=dict)
    seeds: np.ndarray | None = None

    def vid(self, name: str) -> int:
        return self.node_names.index(name)


def _edges(names: list[str], pairs: list[tuple[str, str]] | list[tuple[str, str, float]]):
    idx = {nm: i for i, nm in enumerate(names)}
    src = np.array([idx[p[0]] for p in pairs], dtype=np.int64)
    dst = np.array([idx[p[1]] for p in pairs], dtype=np.int64)
    weight = None
    if pairs and len(pairs[0]) == 3:
        weight = np.array([p[2] for p in pairs], dtype=np.float64)
    return src, dst, weight


def pagerank_wiki() -> FixtureGraph:
    """PageRankTest.java wiki graph: 11 nodes / 17 directed edges."""
    names = list("abcdefghijk")
    src, dst, _ = _edges(names, [
        ("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"), ("e", "b"), ("e", "d"),
        ("e", "f"), ("f", "b"), ("f", "e"), ("g", "b"), ("g", "e"), ("h", "b"),
        ("h", "e"), ("i", "b"), ("i", "e"), ("j", "e"), ("k", "e"),
    ])
    expected_rank = np.array([
        0.3040965, 3.5604297, 3.1757906, 0.3625935, 0.7503465, 0.3625935,
        0.15, 0.15, 0.15, 0.15, 0.15,
    ])
    expected_personalized_1 = np.array([  # sourceNodes {a, e}
        0.17053529152163158, 0.3216114449911402, 0.27329311398643763,
        0.048318333106500536, 0.17053529152163158, 0.048318333106500536,
        0.0, 0.0, 0.0, 0.0, 0.0,
    ])
    expected_personalized_2 = np.array([  # sourceNodes {k, b}
        0.017454997930076894, 0.813246950528992, 0.690991752640184,
        0.041070583050331164, 0.1449550029964717, 0.041070583050331164,
        0.0, 0.0, 0.0, 0.0, 0.15000000000000002,
    ])
    return FixtureGraph(
        name="pagerank_wiki", n=11, node_names=names, src=src, dst=dst,
        expected={
            "rank": expected_rank,
            "personalized_ae": expected_personalized_1,
            "personalized_kb": expected_personalized_2,
            "tolerance_iterations": {0.5: 2, 0.1: 13},
        },
    )


def pagerank_doc() -> FixtureGraph:
    """page-rank.adoc doc graph: 8 nodes / 14 weighted directed edges."""
    names = ["Home", "About", "Product", "Links", "SiteA", "SiteB", "SiteC", "SiteD"]
    src, dst, weight = _edges(names, [
        ("Home", "About", 0.2), ("Home", "Links", 0.2), ("Home", "Product", 0.6),
        ("About", "Home", 1.0), ("Product", "Home", 1.0), ("SiteA", "Home", 1.0),
        ("SiteB", "Home", 1.0), ("SiteC", "Home", 1.0), ("SiteD", "Home", 1.0),
        ("Links", "Home", 0.8), ("Links", "SiteA", 0.05), ("Links", "SiteB", 0.05),
        ("Links", "SiteC", 0.05), ("Links", "SiteD", 0.05),
    ])
    unweighted = np.array([
        3.215681999884452, 1.0542700552146722, 1.0542700552146722,
        1.0542700552146722, 0.3278578964488539, 0.3278578964488539,
        0.3278578964488539, 0.3278578964488539,
    ])
    weighted = np.array([
        3.53751028396339, 0.7452612763883698, 1.9357838291651097,
        0.7452612763883698, 0.18152677135466103, 0.18152677135466103,
        0.18152677135466103, 0.18152677135466103,
    ])
    return FixtureGraph(
        name="pagerank_doc", n=8, node_names=names, src=src, dst=dst, weight=weight,
        expected={"rank_unweighted": unweighted, "rank_weighted": weighted},
    )


def wcc_doc() -> FixtureGraph:
    """wcc.adoc doc graph: 6 nodes / 4 weighted directed edges."""
    names = ["Alice", "Bridget", "Charles", "Doug", "Mark", "Michael"]
    src, dst, weight = _edges(names, [
        ("Alice", "Bridget", 0.5), ("Alice", "Charles", 4.0),
        ("Mark", "Doug", 1.1), ("Mark", "Michael", 2.0),
    ])
    return FixtureGraph(
        name="wcc_doc", n=6, node_names=names, src=src, dst=dst, weight=weight,
        expected={
            "components": np.array([0, 0, 0, 3, 3, 3], dtype=np.int64),
            # weighted threshold=1.0: only edges with weight > 1.0 merge
            "components_threshold_1": np.array([0, 1, 0, 3, 3, 3], dtype=np.int64),
        },
    )


def wcc_chains(num_chains: int = 16, chain_len: int = 10) -> FixtureGraph:
    """WccTest.java unit fixture: 16 chains of 10 nodes → 16 components."""
    n = num_chains * chain_len
    src, dst = [], []
    for c in range(num_chains):
        base = c * chain_len
        for i in range(chain_len - 1):
            src.append(base + i)
            dst.append(base + i + 1)
    comp = np.repeat(np.arange(num_chains) * chain_len, chain_len).astype(np.int64)
    return FixtureGraph(
        name="wcc_chains", n=n, node_names=[f"n{i}" for i in range(n)],
        src=np.array(src, dtype=np.int64), dst=np.array(dst, dtype=np.int64),
        expected={"components": comp},
    )


def labelprop_doc() -> FixtureGraph:
    """label-propagation.adoc doc graph: 6 nodes / 10 weighted directed edges."""
    names = ["Alice", "Bridget", "Charles", "Doug", "Mark", "Michael"]
    src, dst, weight = _edges(names, [
        ("Alice", "Bridget", 1.0), ("Alice", "Charles", 10.0), ("Mark", "Doug", 1.0),
        ("Bridget", "Michael", 1.0), ("Doug", "Mark", 1.0), ("Michael", "Alice", 1.0),
        ("Alice", "Michael", 1.0), ("Bridget", "Alice", 1.0), ("Michael", "Bridget", 1.0),
        ("Charles", "Doug", 10.0),
    ])
    seeds = np.array([52, 21, 43, 21, 19, 52], dtype=np.int64)
    return FixtureGraph(
        name="labelprop_doc", n=6, node_names=names, src=src, dst=dst,
        weight=weight, seeds=seeds,
        expected={
            # partitions as frozensets of vid-sets (order-free comparison)
            "partition_unweighted": [{0, 1, 5}, {2, 3, 4}],
            "partition_weighted": [{1, 5}, {0, 2, 3, 4}],
            # seeded: exact labels
            "labels_seeded": np.array([21, 21, 19, 19, 19, 21], dtype=np.int64),
        },
    )


def triangles_doc() -> FixtureGraph:
    """triangle-count.adoc doc graph: 6 nodes / 8 undirected edges (stored one direction)."""
    names = ["Alice", "Michael", "Karin", "Chris", "Will", "Mark"]
    src, dst, _ = _edges(names, [
        ("Michael", "Karin"), ("Michael", "Chris"), ("Will", "Michael"),
        ("Mark", "Michael"), ("Mark", "Will"), ("Alice", "Michael"),
        ("Will", "Chris"), ("Chris", "Karin"),
    ])
    return FixtureGraph(
        name="triangles_doc", n=6, node_names=names, src=src, dst=dst,
        expected={
            "triangles": np.array([0, 3, 1, 2, 2, 1], dtype=np.int64),
            "global_triangles": 3,
            # maxDegree=4: Michael (deg 5) excluded → -1, others 0
            "triangles_maxdeg4": np.array([0, -1, 0, 0, 0, 0], dtype=np.int64),
            "global_triangles_maxdeg4": 0,
            "lcc": np.array([0.0, 0.3, 1.0, 2.0 / 3.0, 2.0 / 3.0, 1.0]),
        },
    )


ALL_FIXTURES = {
    f.name: f
    for f in [pagerank_wiki(), pagerank_doc(), wcc_doc(), wcc_chains(),
              labelprop_doc(), triangles_doc()]
}
