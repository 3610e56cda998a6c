"""functions/olap.py: pivot / rollup / set ops / running windows /
grouped moments vs pandas references, including multi-block inputs,
missing pivot cells, and group partitions split across blocks."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graph_data_science_ray.functions.olap import (except_distinct,
                                                   grouped_corr,
                                                   grouped_running_sum,
                                                   intersect_distinct,
                                                   pivot_table,
                                                   rollup_sums)


def _ds(df: pd.DataFrame, blocks: int = 5) -> rd.Dataset:
    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % blocks)])


def _sales(n=400, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "region": rng.choice(["east", "west", "north"], n),
        "status": rng.choice(["open", "closed"], n),
        "amount": rng.integers(1, 1000, n).astype(np.int64),
        "t": rng.permutation(n).astype(np.int64),
    })


def test_pivot_matches_pandas():
    df = _sales()
    out = (pivot_table(_ds(df), index="region", pivot_col="status",
                       value_col="amount", pivot_values=["open", "closed"])
           .to_pandas().sort_values("region").reset_index(drop=True))
    ref = (df.pivot_table(index="region", columns="status",
                          values="amount", aggfunc="sum", fill_value=0)
           .sort_index())
    assert out["region"].tolist() == list(ref.index)
    assert out["status_open"].tolist() == ref["open"].tolist()
    assert out["status_closed"].tolist() == ref["closed"].tolist()


def test_pivot_missing_cell_is_zero():
    df = pd.DataFrame({"g": ["a", "a", "b"], "p": ["x", "x", "y"],
                       "v": np.array([1, 2, 3], dtype=np.int64)})
    out = (pivot_table(_ds(df, 2), index="g", pivot_col="p",
                       value_col="v", pivot_values=["x", "y"])
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert out["p_x"].tolist() == [3, 0]
    assert out["p_y"].tolist() == [0, 3]


def test_pivot_undeclared_value_raises():
    df = pd.DataFrame({"g": ["a"], "p": ["z"],
                       "v": np.array([1], dtype=np.int64)})
    with pytest.raises(Exception):
        pivot_table(_ds(df, 1), index="g", pivot_col="p",
                    value_col="v", pivot_values=["x"]).to_pandas()


def test_rollup_matches_pandas():
    df = _sales()
    out = (rollup_sums(_ds(df), ["region", "status"], "amount")
           .to_pandas().sort_values(["lvl", "region", "status"])
           .reset_index(drop=True))
    # grand total
    top = out[out["lvl"] == 0]
    assert len(top) == 1
    assert top["amount"].iloc[0] == df["amount"].sum()
    assert top["n"].iloc[0] == len(df)
    assert top["region"].iloc[0] == "ALL"
    # level 1: per-region
    lvl1 = out[out["lvl"] == 1].set_index("region")
    ref1 = df.groupby("region")["amount"].sum()
    for r, v in ref1.items():
        assert lvl1.loc[r, "amount"] == v
        assert lvl1.loc[r, "status"] == "ALL"
    # level 2: finest
    lvl2 = out[out["lvl"] == 2].set_index(["region", "status"])
    ref2 = df.groupby(["region", "status"])["amount"].sum()
    assert len(lvl2) == len(ref2)
    for k, v in ref2.items():
        assert lvl2.loc[k, "amount"] == v


def test_set_ops_match_python_sets():
    rng = np.random.default_rng(5)
    l = pd.DataFrame({"k": rng.integers(0, 50, 120).astype(np.int64)})
    r = pd.DataFrame({"k": rng.integers(25, 75, 120).astype(np.int64)})
    inter = sorted(intersect_distinct(_ds(l, 3), _ds(r, 3), ["k"])
                   .to_pandas()["k"].astype(np.int64))
    exc = sorted(except_distinct(_ds(l, 3), _ds(r, 3), ["k"])
                 .to_pandas()["k"].astype(np.int64))
    ls, rs = set(l["k"]), set(r["k"])
    assert inter == sorted(ls & rs)
    assert exc == sorted(ls - rs)


def test_running_sum_matches_pandas():
    df = _sales()
    out = (grouped_running_sum(_ds(df), group_col="region",
                               order_cols=["t"], value_col="amount",
                               out_col="run")
           .to_pandas().sort_values(["region", "t"])
           .reset_index(drop=True))
    ref = df.sort_values(["region", "t"]).reset_index(drop=True)
    ref["run"] = ref.groupby("region")["amount"].cumsum()
    assert out["run"].astype(np.int64).tolist() == ref["run"].tolist()
    assert len(out) == len(df)


def test_grouped_corr_matches_numpy():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 500),
        "x": rng.integers(0, 100, 500).astype(np.int64),
    })
    df["y"] = (df["x"] * 2 + rng.integers(0, 40, 500)).astype(np.int64)
    out = grouped_corr(_ds(df), "g", "x", "y")
    for _, row in out.iterrows():
        sub = df[df["g"] == row["g"]]
        ref = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(row["corr"] - ref) < 1e-12
        assert row["n"] == len(sub)


def test_table_diff_matches_pandas():
    from graph_data_science_ray.functions.olap import table_diff
    rng = np.random.default_rng(9)
    old = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                        "v": rng.integers(0, 5, 100).astype(np.int64)})
    new = old[old["k"] % 4 != 0].copy()          # removed: k%4==0
    new.loc[new["k"] % 3 == 0, "v"] += 10        # changed: k%3==0
    extra = pd.DataFrame({"k": np.arange(100, 110, dtype=np.int64),
                          "v": np.ones(10, dtype=np.int64)})
    new = pd.concat([new, extra], ignore_index=True)
    out = (table_diff(_ds(old), _ds(new, 3), key="k", cmp_cols=["v"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = {}
    for k in range(100):
        if k % 4 == 0:
            want[k] = "removed"
        elif k % 3 == 0:
            want[k] = "changed"
    for k in range(100, 110):
        want[k] = "added"
    got = dict(zip(out["k"].astype(int), out["change"]))
    assert got == want


def test_cube_matches_pandas():
    from graph_data_science_ray.functions.olap import cube_sums
    df = _sales()
    out = (cube_sums(_ds(df), ["region", "status"], "amount")
           .to_pandas())
    assert len(out[out["lvl"] == 0]) == 1
    assert out[out["lvl"] == 0]["amount"].iloc[0] == df["amount"].sum()
    # lvl=2 (bit1): status grouped only
    l2 = out[out["lvl"] == 2].set_index("status")
    ref = df.groupby("status")["amount"].sum()
    for k, v in ref.items():
        assert l2.loc[k, "amount"] == v
        assert l2.loc[k, "region"] == "ALL"
    # lvl=1 (bit0): region grouped only
    l1 = out[out["lvl"] == 1].set_index("region")
    for k, v in df.groupby("region")["amount"].sum().items():
        assert l1.loc[k, "amount"] == v
    # lvl=3: finest
    l3 = out[out["lvl"] == 3].set_index(["region", "status"])
    for k, v in df.groupby(["region", "status"])["amount"].sum().items():
        assert l3.loc[k, "amount"] == v


def test_moving_sum_matches_pandas_rolling():
    from graph_data_science_ray.functions.olap import grouped_moving_sum
    df = _sales()
    out = (grouped_moving_sum(_ds(df), group_col="region",
                              order_cols=["t"], value_col="amount",
                              window_rows=5, out_col="mov")
           .to_pandas().sort_values(["region", "t"])
           .reset_index(drop=True))
    ref = df.sort_values(["region", "t"]).reset_index(drop=True)
    ref["mov"] = (ref.groupby("region")["amount"]
                  .rolling(5, min_periods=1).sum()
                  .reset_index(level=0, drop=True).astype(np.int64))
    assert out["mov"].astype(np.int64).tolist() == ref["mov"].tolist()


def test_moving_sum_window_one_is_identity():
    from graph_data_science_ray.functions.olap import grouped_moving_sum
    df = _sales(50)
    out = (grouped_moving_sum(_ds(df, 3), group_col="region",
                              order_cols=["t"], value_col="amount",
                              window_rows=1, out_col="mov")
           .to_pandas().sort_values(["region", "t"]))
    assert out["mov"].astype(np.int64).tolist() == \
        out["amount"].astype(np.int64).tolist()
