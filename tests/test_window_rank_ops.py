"""lag_delta / ntile / global_rank_int vs DuckDB window-function
replays, including NTILE's uneven-tile distribution and the
bounded-domain global ranking's tie handling."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from graph_data_science_ray.functions.relational import (global_rank_int,
                                                         ntile)
from graph_data_science_ray.functions.temporal import lag_delta


def _ds(df: pd.DataFrame, blocks: int = 5) -> rd.Dataset:
    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % blocks)])


def test_lag_delta_matches_duckdb():
    rng = np.random.default_rng(4)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10_000, n), unit="s"),
        "value": np.round(rng.uniform(0, 50, n), 2),
    })
    out = (lag_delta(_ds(df)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ref = duckdb.sql("""
        WITH ev AS (SELECT event_id, user_id, ts,
                    CAST(ROUND(value*100) AS BIGINT) AS cents FROM df)
        SELECT event_id,
               COALESCE(LAG(event_id) OVER w, -1) AS prev_event_id,
               COALESCE(cents - LAG(cents) OVER w, 0) AS delta_cents
        FROM ev WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id)
        ORDER BY event_id""").df()
    assert out["prev_event_id"].tolist() == ref["prev_event_id"].tolist()
    assert out["delta_cents"].tolist() == ref["delta_cents"].tolist()


def test_ntile_matches_duckdb_uneven_groups():
    # group sizes 10 (even /4), 7, 3, 1 — exercise every remainder
    rows = []
    k = 0
    for g, size in enumerate((10, 7, 3, 1)):
        for _ in range(size):
            rows.append({"grp": g, "id": k, "v": float((k * 37) % 19)})
            k += 1
    df = pd.DataFrame(rows)
    out = (ntile(_ds(df, 4), ["grp"], "v", 4, tie_cols=["id"])
           .to_pandas().sort_values(["grp", "id"]).reset_index(drop=True))
    ref = duckdb.sql("""
        SELECT grp, id, v,
               CAST(NTILE(4) OVER (PARTITION BY grp ORDER BY v, id)
                    AS BIGINT) AS tile
        FROM df ORDER BY grp, id""").df()
    assert out["tile"].tolist() == ref["tile"].tolist()


def test_global_rank_matches_row_number_with_ties():
    rng = np.random.default_rng(6)
    n = 500
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        # coarse values force many exact ties across blocks
        "val": np.round(rng.uniform(-3, 3, n), 1),
    })
    out = (global_rank_int(_ds(df, 7), "val", "id", descending=True)
           .to_pandas().sort_values("rn").reset_index(drop=True))
    ref = duckdb.sql("""
        WITH c AS (SELECT id, CAST(ROUND(val*100) AS BIGINT) AS v
                   FROM df)
        SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY v DESC, id)
                        AS BIGINT) AS rn
        FROM c ORDER BY rn""").df()
    assert out["id"].tolist() == ref["id"].tolist()
    assert out["rn"].tolist() == list(range(1, n + 1))


def test_global_rank_ascending():
    df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "val": [2.0, 1.0, 2.0, 0.5, 1.0, 9.0]})
    out = (global_rank_int(_ds(df, 3), "val", "id", descending=False)
           .to_pandas().sort_values("rn").reset_index(drop=True))
    # ascending by (val, id): 0.5,1.0(id1),1.0(id4),2.0(id0),2.0(id2),9.0
    assert out["id"].tolist() == [3, 1, 4, 0, 2, 5]
