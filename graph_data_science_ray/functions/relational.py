"""Distributed relational operators a training-data pipeline needs that
Ray Data has no scale-safe native verb for: grouped top-k, exact
distributed quantiles, deterministic hash sampling, KMV distinct-count
sketches, value band joins (non-equi), and text normalization.

Each follows the repo's custom-operator recipe: vectorized partial
results inside ``map_batches`` (the combiner), then ONE hash-bucket
shuffle whose group count is small and controlled (see
stages/shuffle.py for why Ray's sort-based groupby must never see a
high-cardinality key), then a C-speed pandas/NumPy kernel per bucket.
Partitioning assumptions are documented per operator.

Determinism contracts (what the SQL oracles replay):
- ``grouped_topk``: rank = position in (order_col DESC, *tie_cols ASC)
  order, rows with rank <= k — exactly ROW_NUMBER() semantics.
- ``group_quantiles``: DuckDB/Postgres percentile_disc — the element
  at sorted index max(ceil(q*n) - 1, 0); values are exact cents so no
  float interpolation exists anywhere.
- ``hash_sample``: keep rows with u01(mix64(a, b, seed)) < fraction,
  the same murmur mix as pipelines.split._edge_hash_u01 (bit-exact in
  SQL via entry_queries._edge_u01_sql).
- ``kmv_distinct``: K-minimum-values sketch on the 63-bit murmur hash
  of the value; the k-th smallest DISTINCT hash is an exact integer on
  both sides, the estimate is one float division.
- ``band_join_count``: per row, the number of OTHER rows whose integer
  value lies within +-band — exact counts (a BETWEEN self-join in SQL).
- ``normalize_text``: lower -> collapse \\s+ to one space -> trim; both
  Arrow and DuckDB compile the pattern with RE2, so the character
  class is identical.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.shuffle import _bucket_hash

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_M = np.uint64(0xFF51AFD7ED558CCD)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Murmur3 64-bit finalizer (the repo's shared RNG primitive)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _MIX_M
    x ^= x >> np.uint64(33)
    return x


def _value_hash63(v: np.ndarray, seed: int) -> np.ndarray:
    """63-bit hash of an int64 value column: golden-ratio spread + seed
    then the murmur finalizer, top bit dropped so the result fits a
    signed int64 on both the NumPy and the SQL side."""
    x = v.astype(np.uint64) * _MIX_A + np.uint64(seed)
    return (_mix64(x) >> np.uint64(1)).astype(np.int64)


def grouped_topk(
    ds: rd.Dataset,
    group_cols: list[str],
    order_col: str,
    k: int,
    tie_cols: list[str],
    keep_cols: list[str] | None = None,
    ascending: bool = False,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Top-k rows per group with a total deterministic order:
    (order_col ASC|DESC, *tie_cols ASC). Emits the kept rows plus
    ``rk`` (1-based rank within the group).

    Scale shape: every block is first reduced to <= k rows per group
    it contains (the combiner — a block never ships more than
    k x groups_in_block rows), then ONE bucket shuffle co-locates each
    group and the same kernel finalizes. Driver never sees the data;
    the shuffle volume is O(k x groups), not O(rows)."""
    keep = list(dict.fromkeys(
        (keep_cols or []) + group_cols + [order_col] + tie_cols))
    sort_cols = [order_col] + tie_cols
    sort_asc = [ascending] + [True] * len(tie_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keep].sort_values(sort_cols, ascending=sort_asc,
                                  kind="stable")
        df = df.groupby(group_cols, sort=False).head(k).copy()
        df["__bucket"] = _bucket_hash(df, group_cols, num_buckets)
        return df

    def final(group: pd.DataFrame) -> pd.DataFrame:
        df = group[keep].sort_values(sort_cols, ascending=sort_asc,
                                     kind="stable")
        df = df.groupby(group_cols, sort=False).head(k).copy()
        df["rk"] = df.groupby(group_cols, sort=False).cumcount() + 1
        return df

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("__bucket").map_groups(final, batch_format="pandas"))


def group_quantiles(
    ds: rd.Dataset,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    num_buckets: int = 32,
    cents: bool = True,
) -> rd.Dataset:
    """Exact per-group quantiles with percentile_disc semantics: the
    element at sorted index max(ceil(q*n) - 1, 0). One output row per
    group, one column ``q<percent>`` per requested quantile.

    Scale shape: blocks are compacted to (group, value) -> count
    partials first (the combiner — shuffle volume is O(distinct
    values), not O(rows); money columns have a bounded value space),
    then ONE bucket shuffle by group and a sorted-cumsum selection
    kernel. Values are handled as exact int64 cents when ``cents`` so
    no float ever enters the order."""
    qcols = [f"q{int(round(q * 100)):02d}" for q in qs]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy()
        out = pd.DataFrame({c: df[c].to_numpy() for c in group_cols})
        out["__v"] = (np.round(v * 100.0).astype(np.int64) if cents
                      else v.astype(np.int64))
        out = (out.groupby(group_cols + ["__v"], sort=False)
               .size().reset_index(name="__cnt"))
        out["__bucket"] = _bucket_hash(out, group_cols, num_buckets)
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        merged = (group.groupby(group_cols + ["__v"], sort=True)["__cnt"]
                  .sum().reset_index())
        rows = []
        for key, g in merged.groupby(group_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            vals = g["__v"].to_numpy()          # sorted (groupby sort=True)
            cum = np.cumsum(g["__cnt"].to_numpy())
            n = int(cum[-1])
            row = dict(zip(group_cols, key))
            for q, qc in zip(qs, qcols):
                idx = max(math.ceil(q * n) - 1, 0)
                pos = int(np.searchsorted(cum, idx + 1, side="left"))
                cv = int(vals[pos])
                # cents/100.0 is ONE double division of exact integer
                # operands — bit-identical to the SQL side, no rounding
                row[qc] = cv / 100.0 if cents else cv
            rows.append(row)
        if not rows:
            return pd.DataFrame({c: [] for c in group_cols + qcols})
        return pd.DataFrame(rows)

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("__bucket").map_groups(final, batch_format="pandas"))


def ntile(
    ds: rd.Dataset,
    group_cols: list[str],
    order_col: str,
    n: int,
    tie_cols: list[str],
    ascending: bool = True,
    num_buckets: int = 32,
) -> rd.Dataset:
    """SQL NTILE(n) per group: rows in (order, tie) order distributed
    into n tiles as evenly as possible, the first count%n tiles one
    row larger. Output: every input row's group/tie columns plus
    ``tile`` (1-based). ONE bucket shuffle (all rows of a group must
    meet to know the group's count — the documented partitioning
    assumption: one group fits its bucket's worker heap)."""
    keep = list(dict.fromkeys(group_cols + [order_col] + tie_cols))
    sort_cols = [order_col] + tie_cols
    sort_asc = [ascending] + [True] * len(tie_cols)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keep].copy()
        df["__bucket"] = _bucket_hash(df, group_cols, num_buckets)
        return df

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        df = group[keep].sort_values(sort_cols, ascending=sort_asc,
                                     kind="stable").reset_index(drop=True)
        rn = df.groupby(group_cols, sort=False).cumcount().to_numpy()
        cnt = df.groupby(group_cols, sort=False)[order_col] \
            .transform("size").to_numpy()
        size, big = cnt // n, cnt % n
        cut = big * (size + 1)
        in_big = rn < cut
        tile = np.where(
            in_big,
            rn // np.maximum(size + 1, 1),
            big + np.where(size > 0, (rn - cut) // np.maximum(size, 1),
                           0)) + 1
        df["tile"] = tile.astype(np.int64)
        return df

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket").map_groups(kernel,
                                            batch_format="pandas"))


def global_rank_int(
    ds: rd.Dataset,
    value_col: str,
    tie_col: str,
    descending: bool = True,
    num_buckets: int = 32,
    cents: bool = True,
) -> rd.Dataset:
    """Exact GLOBAL row number over (value DESC|ASC, tie ASC) without a
    global sort: ROW_NUMBER() OVER (ORDER BY v, tie) semantics.

    Two small exchanges instead of an all-to-all sort:
      1. (value -> count) partials per block, bucket-summed — the
         table is bounded by the VALUE DOMAIN (e.g. money cents), not
         the row count; the driver turns it into an exclusive running
         offset per distinct value (O(domain) once, broadcast via
         ray.put).
      2. rows bucket-shuffled BY VALUE so equal values co-locate; the
         kernel ranks ties locally and adds the broadcast offset.
    The partitioning assumption — distinct-value table fits the driver
    — holds for fixed-point/money/enum domains; for unbounded domains
    use a sort-based rank instead."""
    import ray

    def to_iv(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy()
        return pd.DataFrame({
            "__v": (np.round(v * 100.0).astype(np.int64) if cents
                    else v.astype(np.int64)),
            "tie": df[tie_col].to_numpy().astype(np.int64),
        })

    rows = ds.map_batches(to_iv, batch_format="pandas")

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("__v", sort=False).size().reset_index(
            name="cnt")
        out["__bucket"] = _bucket_hash(out, ["__v"], num_buckets)
        return out

    def merge_counts(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby("__v", sort=False)["cnt"].sum()
                .reset_index())

    counts = (rows.map_batches(partial_counts, batch_format="pandas")
              .groupby("__bucket")
              .map_groups(merge_counts, batch_format="pandas")
              .to_pandas())
    counts = counts.sort_values("__v", ascending=not descending) \
        .reset_index(drop=True)
    offsets = np.r_[np.int64(0),
                    np.cumsum(counts["cnt"].to_numpy())[:-1]]
    off_ref = ray.put(pd.Series(offsets,
                                index=counts["__v"].to_numpy()))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _bucket_hash(df, ["__v"], num_buckets)
        return df

    def rank_kernel(group: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = group.sort_values(["__v", "tie"], kind="stable")
        local = df.groupby("__v", sort=False).cumcount().to_numpy()
        base = off.loc[df["__v"].to_numpy()].to_numpy()
        out = pd.DataFrame({
            tie_col: df["tie"].to_numpy(np.int64),
            "rn": (base + local + 1).astype(np.int64),
        })
        if cents:
            out[value_col] = df["__v"].to_numpy() / 100.0
        else:
            out[value_col] = df["__v"].to_numpy(np.int64)
        return out

    return (rows.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket").map_groups(rank_kernel,
                                            batch_format="pandas"))


def hash_sample(
    ds: rd.Dataset,
    key_cols: tuple[str, str],
    fraction: float,
    seed: int = 42,
) -> rd.Dataset:
    """Deterministic Bernoulli sample: keep rows whose murmur u01 of the
    two int key columns falls under ``fraction``. A pure map — no
    shuffle, no RNG state, trivially resumable and identical on any
    partitioning. Same hash as pipelines.split._edge_hash_u01."""
    from ..pipelines.split import _edge_hash_u01
    a, b = key_cols

    def keep(t: pa.Table) -> pa.Table:
        u = _edge_hash_u01(t[a].to_numpy().astype(np.int64),
                           t[b].to_numpy().astype(np.int64), seed)
        return t.filter(pa.array(u < fraction))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def kmv_distinct(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    k: int = 256,
    seed: int = 7,
    num_buckets: int = 32,
) -> rd.Dataset:
    """K-minimum-values distinct-count sketch per group. Output per
    group: ``n_hashes`` (min(k, observed distinct hashes)),
    ``kth_hash`` (the k-th smallest distinct 63-bit hash; -1 when the
    group has fewer than k distinct values — then the count is exact)
    and ``distinct_est`` = (k-1) * 2^63 / kth_hash (a single float
    division of exact operands — bit-identical on both sides).

    Scale shape: each block contributes at most k (group, hash) rows
    (partial k-smallest over the block's distinct hashes — the sketch
    is a mergeable combiner), then ONE bucket shuffle by group merges
    partials. Hash collisions affect both the engine and the SQL
    replay identically (the oracle replays the same hash)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = pd.DataFrame({
            "g": df[group_col].to_numpy(),
            "h": _value_hash63(
                df[value_col].to_numpy().astype(np.int64), seed),
        }).drop_duplicates()
        sub = sub.sort_values(["g", "h"], kind="stable")
        sub = sub.groupby("g", sort=False).head(k).copy()
        sub["__bucket"] = _bucket_hash(sub, ["g"], num_buckets)
        return sub

    def final(group: pd.DataFrame) -> pd.DataFrame:
        merged = group[["g", "h"]].drop_duplicates().sort_values(
            ["g", "h"], kind="stable")
        rows = []
        for key, gdf in merged.groupby("g", sort=False):
            h = gdf["h"].to_numpy()[:k]
            n = len(h)
            if n >= k:
                kth = int(h[k - 1])
                # (k-1)*2^63 is an exact double; ONE division of the
                # same operands both sides -> bit-identical, no rounding
                est = (k - 1) * float(1 << 63) / float(kth)
            else:
                kth, est = -1, float(n)
            rows.append({group_col: key, "n_hashes": n,
                         "kth_hash": kth, "distinct_est": est})
        if not rows:
            return pd.DataFrame({group_col: [], "n_hashes": [],
                                 "kth_hash": [], "distinct_est": []})
        out = pd.DataFrame(rows)
        out["n_hashes"] = out["n_hashes"].astype(np.int64)
        out["kth_hash"] = out["kth_hash"].astype(np.int64)
        return out

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("__bucket").map_groups(final, batch_format="pandas"))


def band_join_count(
    ds: rd.Dataset,
    id_col: str,
    value_col: str,
    band_cents: int = 100,
    cents: bool = True,
) -> rd.Dataset:
    """Non-equi band self-join, counted: for every row, how many OTHER
    rows have |value - value'| <= band. The classic interval/band join
    Ray Data cannot express as an equi-shuffle.

    Scale shape: rows are bucketed by ``floor(v / band)``; every row is
    ALSO replicated to the two adjacent windows (a partner within
    +-band can only live there), and each window group counts partners
    for its HOME rows with two sorted searchsorteds. Replication factor
    is a constant 3; group count is value_range / band (independent of
    row count), so the shuffle stays bounded at any scale."""

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy()
        iv = np.round(v * 100.0).astype(np.int64) if cents \
            else v.astype(np.int64)
        ids = df[id_col].to_numpy().astype(np.int64)
        w = np.floor_divide(iv, band_cents)
        parts = []
        for d, home in ((0, 1), (-1, 0), (1, 0)):
            parts.append(pd.DataFrame({
                "__w": w + d, "__home": np.int8(home),
                "id": ids, "v": iv}))
        return pd.concat(parts, ignore_index=True)

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(group["v"].to_numpy())
        home = group[group["__home"] == 1]
        hv = home["v"].to_numpy()
        lo = np.searchsorted(v, hv - band_cents, side="left")
        hi = np.searchsorted(v, hv + band_cents, side="right")
        return pd.DataFrame({
            id_col: home["id"].to_numpy(),
            "n_within": (hi - lo - 1).astype(np.int64),
        })

    return (ds.map_batches(expand, batch_format="pandas")
            .groupby("__w").map_groups(kernel, batch_format="pandas"))


def normalize_text(ds: rd.Dataset, id_col: str = "doc_id",
                   text_col: str = "text") -> rd.Dataset:
    """Canonical text normalization: unicode lower -> collapse every
    \\s+ run to one space -> strip leading/trailing spaces, plus the
    normalized length. All three steps are Arrow RE2/utf8 kernels —
    zero-copy in, vectorized, no Python per row."""

    def norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t[text_col])
        s = pc.replace_substring_regex(s, pattern=r"\s+",
                                       replacement=" ")
        s = pc.utf8_trim(s, characters=" ")
        return pa.table({
            id_col: t[id_col],
            "norm_text": s,
            "n_chars_norm": pc.utf8_length(s).cast(pa.int64()),
        })

    return ds.map_batches(norm, batch_format="pyarrow",
                          zero_copy_batch=True)


def profile_columns(ds: rd.Dataset, cols: list[str]) -> pd.DataFrame:
    """One-pass numeric table profile: per column, row count (nulls
    included), null count, min and max — the SUMMARIZE shape. A single
    ``map_batches`` pass emits len(cols) partial rows per block (Arrow
    kernels, no second scan per column); the driver folds a
    blocks × cols frame. Min/max are passed through untouched (no
    arithmetic), so results compare exactly against SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pd.DataFrame:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            col = t[c]
            mm = pc.min_max(col)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
            # all-null block: count it, leave min/max to other blocks
            # (pandas groupby min/max skip NaN)
            mins.append(float(mn) if mn is not None else np.nan)
            maxs.append(float(mx) if mx is not None else np.nan)
        return pd.DataFrame({
            "column": names,
            "n": np.asarray(ns, dtype=np.int64),
            "n_null": np.asarray(nulls, dtype=np.int64),
            "min_v": np.asarray(mins, dtype=np.float64),
            "max_v": np.asarray(maxs, dtype=np.float64),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = (parts.groupby("column", as_index=False)
           .agg(n=("n", "sum"), n_null=("n_null", "sum"),
                min_v=("min_v", "min"), max_v=("max_v", "max"))
           .sort_values("column").reset_index(drop=True))
    out["n"] = out["n"].astype(np.int64)
    out["n_null"] = out["n_null"].astype(np.int64)
    return out


def weighted_sample(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    den: int,
    seed: int = 7,
) -> rd.Dataset:
    """Deterministic WEIGHTED Bernoulli sample: row kept with
    probability min(1, w/den) at 31-bit resolution — keep iff

        (h63(key) >> 32) * den  <  w << 31

    where h63 is the shared 63-bit murmur value hash. All-integer
    comparison (int64-safe for w, den < 2^31), so a SQL oracle replays
    the EXACT sample; a pure map — no shuffle, no RNG state, identical
    on any partitioning, trivially resumable. Weights are int64
    (cents-scale for money)."""
    if not (0 < den < 2**31):
        raise ValueError("den must be a positive int < 2^31")

    def keep(t: pa.Table) -> pa.Table:
        h = _value_hash63(t[key_col].to_numpy().astype(np.int64), seed)
        w = t[weight_col].to_numpy().astype(np.int64)
        mask = (h >> np.int64(32)) * np.int64(den) < (w << np.int64(31))
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def integer_islands(
    ds: rd.Dataset,
    col: str,
    num_buckets: int = 32,
    lo: int | None = None,
    hi: int | None = None,
) -> pd.DataFrame:
    """Gaps-and-islands over the DISTINCT values of an integer column:
    maximal runs of consecutive integers, as (island_start, island_end,
    n) rows. The distributed trick is RANGE bucketing (value // width)
    instead of hash bucketing — each bucket owns a contiguous key
    range, so islands are bucket-local except where they touch a
    bucket edge, and the driver only merges the O(num_buckets)
    boundary islands. Output size = number of islands (the answer),
    never the input."""
    if lo is None or hi is None:
        import pyarrow.compute as pc

        def mm(t) -> pd.DataFrame:
            s = pc.min_max(t[col])
            return pd.DataFrame({"lo": [s["min"].as_py()],
                                 "hi": [s["max"].as_py()]})

        b = ds.map_batches(mm, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
        if len(b) == 0 or b["lo"].isna().all():
            return pd.DataFrame({"island_start": [], "island_end": [],
                                 "n": []}).astype(np.int64)
        lo, hi = int(b["lo"].min()), int(b["hi"].max())
    width = max(1, (hi - lo) // num_buckets + 1)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({col: df[col].astype(np.int64)})
        out["__bucket"] = (out[col].to_numpy() - lo) // width
        return out

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        v = np.unique(group[col].to_numpy(np.int64))
        if len(v) == 0:
            return pd.DataFrame({"island_start": [], "island_end": []}) \
                .astype(np.int64)
        starts = np.r_[True, np.diff(v) > 1]
        s = v[starts]
        e = v[np.r_[starts[1:], True]]
        return pd.DataFrame({"island_start": s, "island_end": e})

    parts = (ds.map_batches(add_bucket, batch_format="pandas")
             .groupby("__bucket")
             .map_groups(kernel, batch_format="pandas")
             .to_pandas().sort_values("island_start")
             .reset_index(drop=True))
    # merge islands that meet exactly at bucket boundaries
    s = parts["island_start"].to_numpy(np.int64)
    e = parts["island_end"].to_numpy(np.int64)
    if len(s):
        new_run = np.r_[True, s[1:] > e[:-1] + 1]
        grp = np.cumsum(new_run) - 1
        out = pd.DataFrame({"island_start": s, "island_end": e,
                            "grp": grp})
        out = out.groupby("grp", as_index=False).agg(
            island_start=("island_start", "min"),
            island_end=("island_end", "max"))[["island_start",
                                               "island_end"]]
    else:
        out = parts
    out = out.reset_index(drop=True)
    out["n"] = (out["island_end"] - out["island_start"] + 1) \
        .astype(np.int64)
    return out
