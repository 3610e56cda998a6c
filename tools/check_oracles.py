"""Local harness mimicking the driver's correctness gate: run every
queries() entry and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    a, b = normalize(ray_df), normalize(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float),
                               atol=1e-9, equal_nan=True):
                bad = np.flatnonzero(~np.isclose(av.astype(float),
                                                 bv.astype(float), atol=1e-9))[:3]
                return f"VALUE MISMATCH col={col} rows={bad.tolist()} ray={av[bad]} sql={bv[bad]}"
        else:
            if not (av == bv).all():
                bad = np.flatnonzero(av != bv)[:3]
                return f"VALUE MISMATCH col={col} rows={bad.tolist()} ray={av[bad]} sql={bv[bad]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:24s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(ray_df)} rows ({t_ray:.1f}s)")
            continue
        t0 = time.time()
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:24s} SQL ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        status = "" if verdict == "OK" else " <<<<"
        if verdict != "OK":
            failures += 1
        print(f"{name:24s} {verdict} rows={len(ray_df)} "
              f"(ray {t_ray:.1f}s, sql {time.time() - t0:.1f}s){status}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
