"""Shuffle helpers: high-cardinality distinct / dedup on Ray Data.

Ray's sort-based ``groupby(cols).aggregate()`` costs ~25µs PER GROUP
(measured: 3.5M rows / 1M groups ≈ 25s on 16 cpus) — unusable for edge
dedup where the group count ≈ the row count. The scalable shape is:

  hash-bucket the key columns into a SMALL number of groups (≈ cpus),
  then dedup each bucket with a vectorized pandas kernel (C-speed
  drop_duplicates / groupby-size) — every distinct key lands in exactly
  one bucket, so bucket-local dedup is globally correct.

This is the distributed analogue of the reference's per-adjacency-list
parallel-edge aggregation during CSR compression
(core/src/main/java/org/neo4j/gds/core/loading/AdjacencyCompression.java:114-127).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _bucket_hash(df: pd.DataFrame, cols: list[str], num_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for c in cols:
        h = h * np.uint64(1000003) + pd.util.hash_array(
            df[c].to_numpy(), categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def distinct_rows(
    ds: rd.Dataset,
    cols: list[str],
    num_buckets: int = 32,
    count_alias: str | None = None,
) -> rd.Dataset:
    """Distinct rows over `cols`; with ``count_alias`` also returns the
    multiplicity of each distinct row under that column name."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df["__bucket"] = _bucket_hash(df, cols, num_buckets)
        return df

    if count_alias is None:
        def kernel(group: pd.DataFrame) -> pd.DataFrame:
            return group[cols].drop_duplicates()
    else:
        def kernel(group: pd.DataFrame) -> pd.DataFrame:
            out = group.groupby(cols, sort=False).size().reset_index(
                name=count_alias)
            return out

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def aggregate_rows(
    ds: rd.Dataset,
    key_cols: list[str],
    sum_cols: list[str],
    num_buckets: int = 32,
    how: str = "sum",              # 'sum' | 'min' | 'max'
) -> rd.Dataset:
    """Groupby-aggregate over high-cardinality keys: hash-bucket the keys
    into ~`num_buckets` groups, then one vectorized pandas groupby per
    bucket (same rationale as ``distinct_rows`` — Ray's native sort-based
    groupby costs ~25µs/group). Every distinct key lands in exactly one
    bucket, so bucket-local aggregates are globally correct for any
    associative `how` (sum/min/max)."""
    cols = key_cols + sum_cols

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df["__bucket"] = _bucket_hash(df, key_cols, num_buckets)
        return df

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby(key_cols, sort=False)[sum_cols]
                .agg(how).reset_index())

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))
