"""Distributed equi-joins, the two shapes that matter at 100 TB:

- ``broadcast_join``: the small side is put in the object store ONCE
  (``ray.put``) and every map task reads it zero-copy — no shuffle at
  all, the big side streams through ``map_batches``. This is the
  correct plan whenever one side fits in a worker heap (dimension
  tables, lookup maps) and is the pattern the repo already uses for
  query-vector and id-map broadcasts.

- ``bucket_join``: both sides are hash-bucketed on the key into a
  SMALL controlled number of groups (ONE shuffle per side, expressed
  as union + groupby so Ray executes a single exchange), then a
  C-speed ``pd.merge`` per bucket. Every key lands in exactly one
  bucket, so bucket-local joins are globally correct. Group count is
  ``num_buckets`` (~cluster cores), never key cardinality — the same
  rationale as stages/shuffle.distinct_rows.

Ray 2.49 ships an experimental ``Dataset.join``; these exist because
(a) the broadcast plan is strictly cheaper for small sides and the
native join always shuffles both sides, and (b) the bucket join's
group count is explicit and bounded, which the repo's scale invariants
require (see CLAUDE.md on sort-based groupby cost).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.shuffle import _bucket_hash


def broadcast_join(
    ds: rd.Dataset,
    small: pd.DataFrame,
    on: str,
    columns: list[str] | None = None,
    how: str = "inner",
) -> rd.Dataset:
    """Join a streaming Dataset against a small in-memory side: the
    small frame is shipped to the object store once and indexed inside
    each task; per-batch work is one vectorized ``pd.merge``. No
    shuffle — the output keeps the big side's partitioning."""
    if columns is not None:
        small = small[list(dict.fromkeys([on] + columns))]
    small_ref = ray.put(small)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(small_ref)
        return df.merge(rhs, on=on, how=how)

    return ds.map_batches(merge, batch_format="pandas")


def bucket_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Hash-partitioned equi-join of two Datasets: tag each side, one
    union + bucket groupby (a single exchange), ``pd.merge`` per
    bucket. `how` supports 'inner', 'left' and 'outer'. Column sets
    should be disjoint apart from the key (pruned via
    left_cols/right_cols)."""
    lcols = list(dict.fromkeys([on] + (left_cols or [])))
    rcols = list(dict.fromkeys([on] + (right_cols or [])))
    all_cols = lcols + [c for c in rcols if c != on]

    # every block carries the FULL union schema (the other side's
    # columns NaN-padded): block schemas must be identical or the
    # shuffle's block concatenation silently drops the minority side's
    # columns from mixed/empty blocks
    def tag(side: int, cols):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            for c in all_cols:
                if c not in cols:
                    df[c] = np.nan
            df = df[all_cols].copy()
            df["__side"] = np.int8(side)
            df["__bucket"] = _bucket_hash(df, [on], num_buckets)
            return df
        return add

    # compact EACH side before the union: Ray's sort-based groupby keys
    # its shuffle fan-out to the INPUT block count, and a union of two
    # many-block reads is the worst case (same measured gotcha as
    # pipelines/walks.py:392 — 37.7 s -> ~3 s on a 300-block union).
    # The compaction block count is CAPPED independently of
    # num_buckets — repartition is its own exchange, and at 20M rows a
    # repartition(512) per side cost 46-200 s while repartition(32)
    # with the same bucket count ran in ~5 s (r5 probe measurement).
    # Meanwhile num_buckets should be SEVERAL × the target parallelism
    # so each sort-reduce task carries ~one bucket (64 dense buckets
    # gave a 1.25M-row straggler reduce task; 256+ spread evenly).
    half = min(max(num_buckets // 2, 1), 64)
    both = (left.map_batches(tag(0, lcols), batch_format="pandas")
            .repartition(half)
            .union(right.map_batches(tag(1, rcols),
                                     batch_format="pandas")
                   .repartition(half)))

    out_cols = all_cols

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0][lcols]
        r = group[group["__side"] == 1][rcols]
        if len(l) == 0 and how != "outer":
            return pd.DataFrame({c: [] for c in out_cols})
        return l.merge(r, on=on, how=how)[out_cols]

    return both.groupby("__bucket").map_groups(kernel,
                                               batch_format="pandas")


def semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    left_cols: list[str] | None = None,
    anti: bool = False,
    num_buckets: int = 32,
) -> rd.Dataset:
    """EXISTS / NOT EXISTS filter: keep the left rows whose key appears
    (semi) or does not appear (anti) in the right side. The right side
    contributes only its KEY column, deduplicated per batch before the
    exchange — the shuffle ships at most (#batches × #distinct keys)
    ints no matter how wide or tall the right side is. Same
    bucket-shuffle shape as bucket_join (one exchange, per-bucket
    ``isin`` kernel); left rows pass through once.

    Non-key left columns transit the exchange as OBJECT dtype and are
    restored by ``infer_objects`` in the kernel: NaN-padding the right
    side's missing columns (the bucket_join scheme) promotes int64 to
    float64 in the shuffle concat, which silently corrupts values
    ≥ 2^53 — the repo's 63-bit hashes/fingerprints would come back
    off-by-a-few (found by review). Exactness over exchange width;
    prune ``left_cols`` to what you need."""
    lcols = list(dict.fromkeys([on] + (left_cols or [])))

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df[lcols].copy()
        for c in lcols:
            if c != on:
                df[c] = df[c].astype(object)
        df["__side"] = np.int8(0)
        df["__bucket"] = _bucket_hash(df, [on], num_buckets)
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({on: pd.unique(df[on])})
        for c in lcols:
            if c != on:
                out[c] = pd.Series([None] * len(out), dtype=object)
        out = out[lcols].copy()
        out["__side"] = np.int8(1)
        out["__bucket"] = _bucket_hash(out, [on], num_buckets)
        return out

    half = min(max(num_buckets // 2, 1), 64)  # see bucket_join note
    both = (left.map_batches(tag_left, batch_format="pandas")
            .repartition(half)
            .union(right.map_batches(tag_right, batch_format="pandas")
                   .repartition(half)))

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0][lcols]
        keys = group.loc[group["__side"] == 1, on]
        hit = l[on].isin(set(keys))
        out = l[~hit if anti else hit]
        # object -> int64/float64 exactly (Python objects lose nothing)
        return out.infer_objects()

    return both.groupby("__bucket").map_groups(kernel,
                                               batch_format="pandas")


def anti_join(left: rd.Dataset, right: rd.Dataset, on: str,
              left_cols: list[str] | None = None,
              num_buckets: int = 32) -> rd.Dataset:
    """NOT EXISTS: left rows with no matching key on the right."""
    return semi_join(left, right, on, left_cols=left_cols, anti=True,
                     num_buckets=num_buckets)


def to_arrow_sorted(ds: rd.Dataset, sort_cols: list[str]) -> pa.Table:
    """Small-result helper: collect and canonically order (tests)."""
    return pa.Table.from_pandas(
        ds.to_pandas().sort_values(sort_cols).reset_index(drop=True),
        preserve_index=False)


def broadcast_semi_join(
    ds: rd.Dataset,
    keys,
    on: str,
    anti: bool = False,
) -> rd.Dataset:
    """EXISTS / NOT EXISTS against a SMALL key collection: the keys go
    to the object store once and every batch runs one vectorized
    ``isin`` — zero shuffle, the streaming analogue of broadcast_join.
    Use when the key set fits in a worker heap (dimension keys, the
    bounded candidate sets of the dedup verify gate); otherwise
    semi_join/anti_join."""
    arr = np.asarray(sorted(set(keys)))
    keys_ref = ray.put(arr)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        hit = df[on].isin(ks)
        return df[~hit if anti else hit]

    return ds.map_batches(keep, batch_format="pandas")
