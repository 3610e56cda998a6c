"""Oracle vs the reference's own golden fixture values (no Ray needed)."""

import numpy as np

from graph_data_science_ray import oracle as orc
from graph_data_science_ray.sources import fixtures as fx


def partition_sets(labels):
    out = {}
    for i, l in enumerate(labels):
        out.setdefault(l, set()).add(i)
    return sorted(out.values(), key=min)


def test_pagerank_wiki_golden():
    g = fx.pagerank_wiki()
    r, it, conv = orc.pagerank(g.n, g.src, g.dst, tolerance=0, max_iterations=41)
    assert np.allclose(r, g.expected["rank"], atol=1e-5)


def test_pagerank_tolerance_iterations():
    g = fx.pagerank_wiki()
    for tol, expected_iters in g.expected["tolerance_iterations"].items():
        _, it, conv = orc.pagerank(g.n, g.src, g.dst, tolerance=tol,
                                   max_iterations=40)
        assert it == expected_iters and conv


def test_pagerank_personalized():
    g = fx.pagerank_wiki()
    r, _, _ = orc.pagerank(g.n, g.src, g.dst, tolerance=0, max_iterations=41,
                           source_nodes=[g.vid("a"), g.vid("e")])
    assert np.allclose(r, g.expected["personalized_ae"], atol=1e-5)


def test_pagerank_doc_weighted_unweighted():
    d = fx.pagerank_doc()
    ru, _, _ = orc.pagerank(d.n, d.src, d.dst, max_iterations=20)
    assert np.allclose(ru, d.expected["rank_unweighted"], atol=1e-6)
    rw, _, _ = orc.pagerank(d.n, d.src, d.dst, weight=d.weight, max_iterations=20)
    assert np.allclose(rw, d.expected["rank_weighted"], atol=1e-6)


def test_wcc_doc_and_threshold():
    w = fx.wcc_doc()
    assert np.array_equal(orc.wcc(w.n, w.src, w.dst), w.expected["components"])
    assert np.array_equal(
        orc.wcc(w.n, w.src, w.dst, weight=w.weight, threshold=1.0),
        w.expected["components_threshold_1"])


def test_wcc_chains():
    ch = fx.wcc_chains()
    assert np.array_equal(orc.wcc(ch.n, ch.src, ch.dst), ch.expected["components"])


def test_labelprop_goldens():
    lp = fx.labelprop_doc()
    lu = orc.label_propagation(lp.n, lp.src, lp.dst)
    assert partition_sets(lu) == sorted(
        lp.expected["partition_unweighted"], key=min)
    lw = orc.label_propagation(lp.n, lp.src, lp.dst, weight=lp.weight)
    assert partition_sets(lw) == sorted(lp.expected["partition_weighted"], key=min)
    ls = orc.label_propagation(lp.n, lp.src, lp.dst, seeds=lp.seeds)
    assert np.array_equal(ls, lp.expected["labels_seeded"])


def test_triangles_golden():
    t = fx.triangles_doc()
    counts, total = orc.triangle_count(t.n, t.src, t.dst)
    assert np.array_equal(counts, t.expected["triangles"])
    assert total == t.expected["global_triangles"]
    c4, t4 = orc.triangle_count(t.n, t.src, t.dst, max_degree=4)
    assert np.array_equal(c4, t.expected["triangles_maxdeg4"])
    assert t4 == t.expected["global_triangles_maxdeg4"]
    deg = np.bincount(np.concatenate([t.src, t.dst]), minlength=t.n)
    lcc = orc.local_clustering_coefficient(counts, deg)
    assert np.allclose(lcc, t.expected["lcc"])
