"""Incremental graph construction (GraphBuilder ≙ the reference's
Cypher aggregation gds.alpha.graph.project — CypherAggregation.java:
rows accumulate while a query runs, the graph materializes at the end).

Closes the one untested SURVEY §2 cell (#3): incremental adds must be
byte-identical to the one-shot build, across array batches, Dataset
parts, and every parallel-edge aggregation mode."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.pipelines.wcc import wcc
from graph_data_science_ray.sources.graph_build import (GraphBuilder,
                                                        build_int_graph)

pytestmark = pytest.mark.usefixtures("ray_session")


def _edges_df(graph):
    cols = ("src", "dst", "weight") if graph.weighted else ("src", "dst")
    df = graph.edges_dataset(cols, flow="out").to_pandas()
    return df.sort_values(list(cols)).reset_index(drop=True)


def test_incremental_equals_one_shot(tmp_path):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 300, 2000).astype(np.int64)
    dst = rng.integers(0, 300, 2000).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]

    one = build_int_graph(
        rd.from_arrow(pa.table({"src": src, "dst": dst})),
        str(tmp_path / "one_shot"), 300, 4)

    b = GraphBuilder()
    for lo in range(0, len(src), 500):  # stream in 4 uneven batches
        b.add_edges(src[lo:lo + 500], dst[lo:lo + 500])
    inc = b.build(str(tmp_path / "incremental"), 4, n=300)

    pd.testing.assert_frame_equal(_edges_df(one), _edges_df(inc))
    r1 = wcc(one).to_pandas().sort_values("vid").reset_index(drop=True)
    r2 = wcc(inc).to_pandas().sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(r1, r2)


def test_mixed_dataset_and_array_parts_with_n_inference(tmp_path):
    b = GraphBuilder()
    b.add_edges_dataset(rd.from_arrow(pa.table({
        "src": np.array([0, 1, 2], dtype=np.int64),
        "dst": np.array([1, 2, 3], dtype=np.int64)})))
    b.add_edges([10], [4])  # raises max vid to 10 via the array path
    g = b.build(str(tmp_path / "mixed"), 2)
    assert g.n == 11
    df = _edges_df(g)
    assert set(zip(df["src"], df["dst"])) == {(0, 1), (1, 2), (2, 3),
                                              (10, 4)}


def test_count_aggregation_multiplicity(tmp_path):
    b = GraphBuilder(aggregation="count")
    b.add_edges([0, 0, 0, 1], [1, 1, 1, 2])
    b.add_edges([0, 1], [1, 2])  # duplicates across add calls too
    g = b.build(str(tmp_path / "count"), 2, n=3)
    assert g.weighted
    df = _edges_df(g)
    mult = {(s, d): w for s, d, w in zip(df["src"], df["dst"],
                                         df["weight"])}
    assert mult == {(0, 1): 4.0, (1, 2): 2.0}


def test_sum_aggregation_and_weight_contract(tmp_path):
    b = GraphBuilder(aggregation="sum")
    b.add_edges([0, 0], [1, 1], weight=[1.5, 2.0])
    b.add_edges([1], [2], weight=[4.0])
    with pytest.raises(ValueError):
        b.add_edges([2], [0])  # weighted builder rejects weightless rows
    g = b.build(str(tmp_path / "sum"), 2, n=3)
    df = _edges_df(g)
    agg = {(s, d): w for s, d, w in zip(df["src"], df["dst"],
                                        df["weight"])}
    assert agg == {(0, 1): 3.5, (1, 2): 4.0}


def test_symmetrize_and_empty_guard(tmp_path):
    with pytest.raises(ValueError):
        GraphBuilder().build(str(tmp_path / "none"), 2)
    b = GraphBuilder(symmetrize=True)
    b.add_edges([0], [1])
    g = b.build(str(tmp_path / "sym"), 2, n=2)
    df = _edges_df(g)
    assert set(zip(df["src"], df["dst"])) == {(0, 1), (1, 0)}
