"""OLAP-shape relational operators: pivot, grouping sets (ROLLUP),
set operations, grouped running windows, and exact grouped moments.

Shared scale discipline (same as stages/shuffle.py): every operator
pre-aggregates INSIDE ``map_batches`` so the one exchange ships
O(groups × blocks) partial rows, never the input; group/bucket counts
are explicit and bounded; money stays int64 cents until a single final
division so the SQL oracles can be bit-exact.

Reference scope note: the reference (Neo4j GDS) has no tabular OLAP
layer — these are the brief's "large-scale training-data pipeline"
extras, expressed Ray-Data-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.shuffle import _bucket_hash, aggregate_rows


def pivot_table(
    ds: rd.Dataset,
    index: str,
    pivot_col: str,
    value_col: str,
    pivot_values: list,
    num_buckets: int = 8,
) -> rd.Dataset:
    """Cross-tab: one output row per ``index`` value, one column per
    entry of ``pivot_values`` holding the SUM of ``value_col``.

    ``pivot_values`` is explicit because the output schema must be
    static across blocks (and at 100 TB a pivot is only sane when the
    pivoted domain is known and bounded). Per-batch conditional
    partial sums → one bounded exchange; unseen pivot values raise
    rather than silently dropping data."""
    vset = list(dict.fromkeys(pivot_values))
    out_cols = [f"{pivot_col}_{v}" for v in vset]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        unknown = set(df[pivot_col].unique()) - set(vset)
        if unknown:
            raise ValueError(f"pivot values not declared: {unknown}")
        g = df.groupby([index, pivot_col], sort=False)[value_col].sum()
        wide = g.unstack(pivot_col, fill_value=0)
        for v in vset:
            if v not in wide.columns:
                wide[v] = 0
        out = pd.DataFrame({index: wide.index})
        for v, c in zip(vset, out_cols):
            out[c] = wide[v].to_numpy(np.int64)
        return out

    return aggregate_rows(
        ds.map_batches(partial, batch_format="pandas"),
        [index], out_cols, num_buckets=num_buckets)


def rollup_sums(
    ds: rd.Dataset,
    group_cols: list[str],
    sum_col: str,
    total_label: str = "ALL",
    num_buckets: int = 8,
) -> rd.Dataset:
    """GROUP BY ROLLUP(g1, g2, ...): every prefix of ``group_cols``
    plus the grand total, in ONE pass — each batch emits its partial
    sums for all len(group_cols)+1 grouping sets (coarser sets roll up
    the finest partial, so the extra rows are O(groups), not O(rows)),
    tagged with a ``lvl`` column (= number of grouped columns; rolled-up
    string columns carry ``total_label``). One bounded exchange."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        finest = (df.groupby(group_cols, sort=False)[sum_col]
                  .agg(["sum", "size"]).reset_index())
        finest = finest.rename(columns={"sum": sum_col, "size": "n"})
        frames = []
        for lvl in range(len(group_cols), -1, -1):
            keep = group_cols[:lvl]
            if lvl == len(group_cols):
                f = finest.copy()
            elif keep:
                f = (finest.groupby(keep, sort=False)[[sum_col, "n"]]
                     .sum().reset_index())
            else:
                f = pd.DataFrame({sum_col: [finest[sum_col].sum()],
                                  "n": [finest["n"].sum()]})
            for c in group_cols[lvl:]:
                f[c] = total_label
            f["lvl"] = np.int64(lvl)
            frames.append(f[group_cols + ["lvl", sum_col, "n"]])
        return pd.concat(frames, ignore_index=True)

    return aggregate_rows(
        ds.map_batches(partial, batch_format="pandas"),
        group_cols + ["lvl"], [sum_col, "n"], num_buckets=num_buckets)


def intersect_distinct(
    left: rd.Dataset,
    right: rd.Dataset,
    cols: list[str],
    num_buckets: int = 32,
) -> rd.Dataset:
    """SQL INTERSECT: distinct rows over ``cols`` present on BOTH
    sides. Each side is deduplicated per batch before the single
    exchange (the shuffle ships at most blocks × distinct rows)."""
    return _set_op(left, right, cols, "intersect", num_buckets)


def except_distinct(
    left: rd.Dataset,
    right: rd.Dataset,
    cols: list[str],
    num_buckets: int = 32,
) -> rd.Dataset:
    """SQL EXCEPT: distinct rows over ``cols`` on the left side and
    not on the right."""
    return _set_op(left, right, cols, "except", num_buckets)


def _set_op(left, right, cols, op, num_buckets):
    def tag(side: int):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].drop_duplicates().copy()
            df["__side"] = np.int8(side)
            df["__bucket"] = _bucket_hash(df, cols, num_buckets)
            return df
        return add

    # compaction capped independently of num_buckets — repartition is
    # its own exchange (see functions/join.py bucket_join measurement)
    half = min(max(num_buckets // 2, 1), 64)
    both = (left.map_batches(tag(0), batch_format="pandas")
            .repartition(half)
            .union(right.map_batches(tag(1), batch_format="pandas")
                   .repartition(half)))

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        sides = group.groupby(cols, sort=False)["__side"]
        lo, hi = sides.min(), sides.max()
        if op == "intersect":
            keep = (lo == 0) & (hi == 1)
        else:
            keep = (lo == 0) & (hi == 0)
        return keep[keep].reset_index()[cols]

    return both.groupby("__bucket").map_groups(kernel,
                                               batch_format="pandas")


def grouped_running_sum(
    ds: rd.Dataset,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    num_buckets: int = 8,
) -> rd.Dataset:
    """SUM(value) OVER (PARTITION BY group ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING): hash-bucket by group (every partition lands
    whole in one bucket), then one vectorized sort + cumsum per
    bucket. ``order_cols`` must be a total order within each group or
    the frame is ambiguous — include a unique tie-break column.
    Output rows = input rows; use int64 values (cents) for exactness."""
    cols = [group_col] + order_cols + [value_col]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df["__bucket"] = _bucket_hash(df, [group_col], num_buckets)
        return df

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([group_col] + order_cols, kind="stable")
        out = g[cols].reset_index(drop=True)
        out[out_col] = (g.groupby(group_col, sort=False)[value_col]
                        .cumsum().to_numpy(np.int64))
        return out

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def grouped_corr(
    ds: rd.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    num_buckets: int = 4,
) -> pd.DataFrame:
    """Pearson correlation of two INTEGER columns per group, exact:
    each batch emits int64 partial moments (n, Σx, Σy, Σxy, Σx², Σy²),
    one bounded exchange sums them, and the driver finalizes the
    handful of group rows with Python-int arithmetic (no intermediate
    overflow) and ONE float expression —

        corr = (nΣxy − ΣxΣy) / (sqrt(nΣx²−Σx²) · sqrt(nΣy²−Σy²))

    with each sqrt taken on its own double so a SQL oracle can replay
    it bit-for-bit (HUGEINT moments, same final expression). Caller
    guarantees |moments| < 2⁶³ per batch (ints scaled to cents are
    fine up to ~1e7 × 1e7 × rows-per-batch)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        f = pd.DataFrame({group_col: df[group_col], "n": np.int64(1),
                          "sx": x, "sy": y, "sxy": x * y,
                          "sxx": x * x, "syy": y * y})
        return (f.groupby(group_col, sort=False)
                .sum().reset_index())

    mom = aggregate_rows(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col], ["n", "sx", "sy", "sxy", "sxx", "syy"],
        num_buckets=num_buckets).to_pandas()

    corr = []
    for _, r in mom.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * int(r["sxy"]) - sx * sy
        dxx = n * int(r["sxx"]) - sx * sx
        dyy = n * int(r["syy"]) - sy * sy
        corr.append(float(num) / (np.sqrt(float(dxx)) * np.sqrt(float(dyy)))
                    if dxx > 0 and dyy > 0 else float("nan"))
    out = mom[[group_col, "n"]].copy()
    out["corr"] = np.array(corr, dtype=np.float64)
    return out.sort_values(group_col).reset_index(drop=True)


def table_diff(
    old: rd.Dataset,
    new: rd.Dataset,
    key: str,
    cmp_cols: list[str],
    num_buckets: int = 32,
) -> rd.Dataset:
    """Snapshot diff by key: one row per key that was added, removed,
    or changed (any of ``cmp_cols`` differs), tagged in a ``change``
    column. The FULL OUTER JOIN shape, as a single bucket exchange —
    both sides tag + hash-bucket on the key, the per-bucket kernel
    compares aligned rows vectorized. Unchanged keys are dropped IN
    the kernel, so the output is bounded by the churn, not the table."""
    cols = [key] + list(cmp_cols)

    def tag(side: int):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            df["__side"] = np.int8(side)
            df["__bucket"] = _bucket_hash(df, [key], num_buckets)
            return df
        return add

    half = min(max(num_buckets // 2, 1), 64)  # see _set_op note
    both = (old.map_batches(tag(0), batch_format="pandas")
            .repartition(half)
            .union(new.map_batches(tag(1), batch_format="pandas")
                   .repartition(half)))

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        o = group[group["__side"] == 0][cols]
        n = group[group["__side"] == 1][cols]
        m = o.merge(n, on=key, how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        removed = m["_merge"] == "left_only"
        added = m["_merge"] == "right_only"
        changed = np.zeros(len(m), dtype=bool)
        both_sides = (m["_merge"] == "both").to_numpy()
        for c in cmp_cols:
            a, b = m[f"{c}_o"], m[f"{c}_n"]
            changed |= both_sides & (a != b).to_numpy() \
                & ~(a.isna() & b.isna()).to_numpy()
        out = pd.DataFrame({key: m[key]})
        out["change"] = np.select(
            [added.to_numpy(), removed.to_numpy(), changed],
            ["added", "removed", "changed"], default="")
        return out[out["change"] != ""]

    return both.groupby("__bucket").map_groups(kernel,
                                               batch_format="pandas")


def cube_sums(
    ds: rd.Dataset,
    group_cols: list[str],
    sum_col: str,
    total_label: str = "ALL",
    num_buckets: int = 8,
) -> rd.Dataset:
    """GROUP BY CUBE(g1, g2, ...): all 2^k grouping sets in ONE pass —
    the rollup_sums trick generalized: each batch rolls its finest
    partial up into every column subset, so the exchange ships
    O(2^k × groups) partial rows. ``lvl`` is a bitmask (bit i set =
    column i grouped); rolled-up string columns carry ``total_label``.
    k is bounded by the caller (2^k grouping sets is only sane for a
    handful of columns — raise past 6)."""
    if len(group_cols) > 6:
        raise ValueError("cube over >6 columns is 64+ grouping sets")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        finest = (df.groupby(group_cols, sort=False)[sum_col]
                  .agg(["sum", "size"]).reset_index())
        finest = finest.rename(columns={"sum": sum_col, "size": "n"})
        frames = []
        for mask in range(2 ** len(group_cols)):
            keep = [c for i, c in enumerate(group_cols)
                    if mask & (1 << i)]
            if len(keep) == len(group_cols):
                f = finest.copy()
            elif keep:
                f = (finest.groupby(keep, sort=False)[[sum_col, "n"]]
                     .sum().reset_index())
            else:
                f = pd.DataFrame({sum_col: [finest[sum_col].sum()],
                                  "n": [finest["n"].sum()]})
            for c in group_cols:
                if c not in keep:
                    f[c] = total_label
            f["lvl"] = np.int64(mask)
            frames.append(f[group_cols + ["lvl", sum_col, "n"]])
        return pd.concat(frames, ignore_index=True)

    return aggregate_rows(
        ds.map_batches(partial, batch_format="pandas"),
        group_cols + ["lvl"], [sum_col, "n"], num_buckets=num_buckets)


def grouped_moving_sum(
    ds: rd.Dataset,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    window_rows: int,
    out_col: str = "moving",
    num_buckets: int = 64,
) -> rd.Dataset:
    """SUM(value) OVER (PARTITION BY group ORDER BY order_cols ROWS
    BETWEEN window_rows-1 PRECEDING AND CURRENT ROW) — the bounded-ROWS
    member of the window family (grouped_running_sum = unbounded;
    temporal.sliding_window_sum = RANGE over event time). Same shape:
    partition-bucket shuffle, then one vectorized sort + cumsum-diff
    per bucket (window sum = cumsum[i] − cumsum[i−k], never a per-row
    loop). ``order_cols`` must total-order each group; int64 values."""
    cols = [group_col] + order_cols + [value_col]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df["__bucket"] = _bucket_hash(df, [group_col], num_buckets)
        return df

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([group_col] + order_cols, kind="stable")
        out = g[cols].reset_index(drop=True)
        v = out[value_col].to_numpy(np.int64)
        keys = out[group_col].to_numpy()
        cum = np.cumsum(v)
        mov = cum.copy()
        k = window_rows
        if len(v) > k:
            mov[k:] = cum[k:] - cum[:-k]
        # re-baseline at each group boundary: position within group
        first = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(first)
        pos = np.arange(len(v)) - np.repeat(starts, np.diff(
            np.r_[starts, len(v)]))
        # rows whose k-window would reach before the group start:
        # subtract only back to the group's first row
        grp_base = np.repeat(np.r_[0, cum[starts[1:] - 1]]
                             if len(starts) > 1 else [0],
                             np.diff(np.r_[starts, len(v)]))
        short = pos < k
        mov[short] = cum[short] - grp_base[short]
        out[out_col] = mov.astype(np.int64)
        return out

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))
