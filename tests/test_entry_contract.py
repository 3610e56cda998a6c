"""Driver contract: entry() smoke + Ray-vs-DuckDB oracle parity for a
representative query subset at sf0.001 (the full sweep lives in
tools/check_oracles.py and runs at sf0.01)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_match(ray_result, sql_df):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(ray_result, rd.Dataset):
        ray_df = ray_result.to_pandas()
    elif isinstance(ray_result, pa.Table):
        ray_df = ray_result.to_pandas()
    else:
        ray_df = ray_result
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    a, b = _normalize(ray_df), _normalize(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float), atol=1e-9)
        else:
            assert (av == bv).all(), col


def test_entry_smoke(ray_session):
    import __ray_entry__ as e
    t = e.entry()
    assert t.num_rows > 0
    assert set(t.schema.names) == {"s_suppkey", "rank", "component"}


@pytest.mark.parametrize("name", ["pagerank", "wcc", "triangle_count",
                                  "pricing_summary", "exact_dedup",
                                  "events_hourly", "kmeans",
                                  "spanning_tree", "k_spanning_tree",
                                  "label_propagation_waves"])
def test_query_matches_oracle(ray_session, duck, name):
    import __ray_entry__ as e
    ray_result = e.queries()[name](SF)
    sql_df = duck.execute(e.oracle_sql()[name]).fetchdf()
    _assert_match(ray_result, sql_df)


def test_all_queries_have_oracle_or_are_marked(ray_session):
    import __ray_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles).issubset(set(qs))
