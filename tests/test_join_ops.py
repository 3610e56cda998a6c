"""functions/join.py: broadcast and bucket equi-joins vs a pandas
reference, including keys split across blocks, unmatched keys, and
left-join null semantics."""

import numpy as np
import pandas as pd
import ray.data as rd

from graph_data_science_ray.functions.join import (anti_join,
                                                   broadcast_join,
                                                   bucket_join,
                                                   semi_join)


def _ds(df: pd.DataFrame, blocks: int = 6) -> rd.Dataset:
    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % blocks)])


def _facts(n=300, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "x": rng.integers(0, 1000, n).astype(np.int64),
    })


def _dim():
    return pd.DataFrame({"k": np.arange(0, 35, dtype=np.int64),
                         "name": [f"d{i}" for i in range(35)]})


def test_broadcast_join_inner_matches_pandas():
    facts = _facts()
    out = (broadcast_join(_ds(facts), _dim(), on="k")
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    ref = (facts.merge(_dim(), on="k", how="inner")
           .sort_values(["k", "x"]).reset_index(drop=True))
    assert out["x"].tolist() == ref["x"].tolist()
    assert out["name"].tolist() == ref["name"].tolist()
    # keys 35..39 have no dimension row and must be dropped
    assert out["k"].max() < 35


def test_broadcast_join_left_keeps_unmatched():
    facts = _facts()
    out = (broadcast_join(_ds(facts), _dim(), on="k", how="left")
           .to_pandas())
    assert len(out) == len(facts)
    assert out.loc[out["k"] >= 35, "name"].isna().all()


def test_bucket_join_inner_matches_pandas():
    facts = _facts()
    dim = _dim()
    out = (bucket_join(_ds(facts), _ds(dim, 3), on="k",
                       left_cols=["x"], right_cols=["name"])
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    ref = (facts.merge(dim, on="k", how="inner")
           .sort_values(["k", "x"]).reset_index(drop=True))
    assert out["k"].tolist() == ref["k"].tolist()
    assert out["x"].tolist() == ref["x"].tolist()
    assert out["name"].tolist() == ref["name"].tolist()


def test_semi_join_matches_pandas():
    facts = _facts()
    # right side with duplicate keys and keys absent from the left
    rng = np.random.default_rng(7)
    right = pd.DataFrame({"k": rng.integers(20, 60, 200).astype(np.int64),
                          "junk": np.arange(200)})
    out = (semi_join(_ds(facts), _ds(right, 4), on="k",
                     left_cols=["x"])
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    keys = set(right["k"])
    ref = (facts[facts["k"].isin(keys)]
           .sort_values(["k", "x"]).reset_index(drop=True))
    assert out["k"].astype(np.int64).tolist() == ref["k"].tolist()
    assert out["x"].astype(np.int64).tolist() == ref["x"].tolist()
    # semi join must not duplicate left rows on multi-match
    assert len(out) == len(ref)


def test_anti_join_matches_pandas():
    facts = _facts()
    right = pd.DataFrame({"k": np.arange(0, 25, dtype=np.int64)})
    out = (anti_join(_ds(facts), _ds(right, 3), on="k",
                     left_cols=["x"])
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    ref = (facts[~facts["k"].isin(set(right["k"]))]
           .sort_values(["k", "x"]).reset_index(drop=True))
    assert out["k"].astype(np.int64).tolist() == ref["k"].tolist()
    assert out["x"].astype(np.int64).tolist() == ref["x"].tolist()


def test_anti_join_empty_right_keeps_all():
    facts = _facts(50)
    right = pd.DataFrame({"k": np.array([], dtype=np.int64)})
    out = anti_join(_ds(facts, 2), _ds(right, 1), on="k",
                    left_cols=["x"]).to_pandas()
    assert len(out) == len(facts)


def test_bucket_join_many_to_many():
    left = pd.DataFrame({"k": [1, 1, 2], "x": [10, 11, 20]})
    right = pd.DataFrame({"k": [1, 1, 3], "y": [5, 6, 7]})
    out = (bucket_join(_ds(left, 2), _ds(right, 2), on="k",
                       left_cols=["x"], right_cols=["y"])
           .to_pandas().sort_values(["k", "x", "y"])
           .reset_index(drop=True))
    # 2 left x 2 right rows for k=1; k=2 and k=3 unmatched
    assert len(out) == 4
    assert out["k"].tolist() == [1, 1, 1, 1]
    assert sorted(zip(out["x"], out["y"])) == [(10, 5), (10, 6),
                                               (11, 5), (11, 6)]


def test_bucket_join_outer_keeps_both_sides():
    left = pd.DataFrame({"k": [1, 2], "x": [10, 20]})
    right = pd.DataFrame({"k": [2, 3], "y": [5, 7]})
    out = (bucket_join(_ds(left, 2), _ds(right, 2), on="k",
                       left_cols=["x"], right_cols=["y"], how="outer")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].astype(np.int64).tolist() == [1, 2, 3]
    assert out.loc[0, "x"] == 10 and np.isnan(out.loc[0, "y"])
    assert out.loc[1, "x"] == 20 and out.loc[1, "y"] == 5
    assert np.isnan(out.loc[2, "x"]) and out.loc[2, "y"] == 7


def test_semi_join_preserves_63bit_ints():
    # values above 2^53: NaN-padding promotion to float64 would
    # corrupt these (the review finding) — they must come back exact
    big = np.array([2**62 + 1, 2**62 + 3, 2**53 + 1],
                   dtype=np.int64)
    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                         "fp": big})
    right = pd.DataFrame({"k": np.array([1, 3, 9], dtype=np.int64)})
    out = (semi_join(_ds(left, 2), _ds(right, 2), on="k",
                     left_cols=["fp"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["fp"].astype(np.int64).tolist() == [big[0], big[2]]


def test_broadcast_semi_join_matches_isin():
    from graph_data_science_ray.functions.join import broadcast_semi_join
    facts = _facts()
    keys = {0, 3, 7, 11, 38, 99}
    semi = (broadcast_semi_join(_ds(facts), keys, on="k")
            .to_pandas())
    anti = (broadcast_semi_join(_ds(facts), keys, on="k", anti=True)
            .to_pandas())
    assert sorted(semi["x"]) == sorted(facts[facts["k"].isin(keys)]["x"])
    assert sorted(anti["x"]) == \
        sorted(facts[~facts["k"].isin(keys)]["x"])
    assert len(semi) + len(anti) == len(facts)
