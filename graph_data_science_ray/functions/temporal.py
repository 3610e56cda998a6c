"""Temporal joins and windows — the two ordered-log operators a
large-scale training-data pipeline needs that Ray Data has no native
verb for: as-of joins (event attribution, feature look-back) and
event-time sliding-window aggregates.

Both compose from the toolkit the brief prescribes for custom
operators: hash-bucket by the `by` key (ONE shuffle), then a
vectorized pandas kernel inside ``groupby(bucket).map_groups`` —
per-key data never has to fit anywhere except its bucket group, and
buckets scale with ``num_buckets``. The partitioning assumption is
therefore: all rows of one `by` key land in one group (guaranteed by
the bucket hash), and one bucket's rows fit in a worker's heap (choose
num_buckets ≈ input_bytes / target_group_bytes at scale).

Determinism contract (what the SQL oracles replay):
- ``asof_join``: for each left row, the matching right row is the last
  one in (on, right_id) order with right.on <= left.on and equal `by`
  key — ties on the timestamp resolve to the largest right id, exact
  timestamp matches are included.
- ``sliding_window_sum``: RANGE-window semantics — every row of the
  same key with on in [t - window, t] counts, INCLUDING equal-t peers
  (SQL ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW``); sums run
  on exact int64 (cents) so association order cannot wobble a float.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_US = 1  # timestamps are normalized to int64 microseconds internally


def _to_us(s: pd.Series) -> np.ndarray:
    return s.astype("datetime64[us]").astype(np.int64).to_numpy()


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str = "ts",
    by: str = "user_id",
    right_id: str = "event_id",
    left_keep: tuple[str, ...] = ("event_id",),
    num_buckets: int = 16,
    direction: str = "backward",
) -> rd.Dataset:
    """As-of join: each left row matched to the most recent right row
    (``backward``: right.on <= left.on) or the next upcoming one
    (``forward``: right.on >= left.on), same `by` key. Output columns:
    *left_keep, ``right_<right_id>`` (−1 when no match) and ``gap_us``
    (−1 likewise; always >= 0 when matched) — integer sentinels keep
    the schema null-free for exact hashing.

    Tie contract (what the SQL oracles replay): exact-timestamp
    matches are included in both directions; equal-timestamp peers
    resolve to the LARGEST right id backward (merge_asof takes the
    last row in (on, rid) frame order) and the SMALLEST right id
    forward (first row in frame order).

    One shuffle (bucket by `by`), then pd.merge_asof per group — the
    sort and binary search are C-vectorized."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    lcols = list(dict.fromkeys(list(left_keep) + [by, on]))

    def tag(side: int, cols):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            df["__side"] = side
            df["__bucket"] = df[by].to_numpy() % num_buckets
            return df
        return add

    both = (left.map_batches(tag(0, lcols), batch_format="pandas")
            .union(right.map_batches(tag(1, [by, on, right_id]),
                                     batch_format="pandas")))

    out_cols = list(left_keep) + [f"right_{right_id}", "gap_us"]

    # the right timestamp is carried through the merge (as __ron) for
    # the gap computation; (on, rid) sort order makes equal-timestamp
    # ties resolve to the largest right id (merge_asof takes the last
    # matching row in frame order)
    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0]
        r = group[group["__side"] == 1]
        if len(l) == 0:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in out_cols})
        lf = pd.DataFrame({c: l[c].to_numpy() for c in left_keep})
        lf["__on"] = _to_us(l[on])
        lf["__by"] = l[by].to_numpy()
        lf = lf.sort_values(["__on"], kind="stable").reset_index(drop=True)
        if len(r):
            rf = pd.DataFrame({"__by": r[by].to_numpy(),
                               "__rid": r[right_id].to_numpy()})
            rf["__on"] = _to_us(r[on])
            rf["__ron"] = rf["__on"]
            rf = rf.sort_values(["__on", "__rid"],
                                kind="stable").reset_index(drop=True)
            m = pd.merge_asof(lf, rf, on="__on", by="__by",
                              direction=direction)
            rid = m["__rid"].to_numpy(dtype=np.float64, na_value=-1)
            ron = m["__ron"].to_numpy(dtype=np.float64, na_value=-1)
        else:
            m = lf
            rid = np.full(len(lf), -1.0)
            ron = np.full(len(lf), -1.0)
        matched = rid >= 0
        out = {c: m[c].to_numpy() for c in left_keep}
        out[f"right_{right_id}"] = rid.astype(np.int64)
        lon = m["__on"].to_numpy()
        gap = (lon - ron.astype(np.int64) if direction == "backward"
               else ron.astype(np.int64) - lon)
        out["gap_us"] = np.where(matched, gap,
                                 np.int64(-1)).astype(np.int64)
        return pd.DataFrame(out)

    return both.groupby("__bucket").map_groups(kernel,
                                               batch_format="pandas")


def lag_delta(
    events: rd.Dataset,
    on: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    num_buckets: int = 16,
) -> rd.Dataset:
    """Per-row LAG over each `by` key's (on, id) order: the previous
    row's id and the value delta in exact int64 cents. First row of a
    key gets prev id −1 and delta 0 (null-free sentinels, same
    contract as asof_join). Same scale shape as the other window
    operators here: ONE bucket shuffle, vectorized shift per group."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, by, on, value_col]].copy()
        df["__bucket"] = df[by].to_numpy() % num_buckets
        return df

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                f"prev_{id_col}": pd.Series(dtype=np.int64),
                "delta_cents": pd.Series(dtype=np.int64)})
        ts = _to_us(group[on])
        ids = group[id_col].to_numpy()
        keys = group[by].to_numpy()
        cents = np.round(group[value_col].to_numpy()
                         * 100.0).astype(np.int64)
        order = np.lexsort((ids, ts, keys))
        ts, ids, keys, cents = ts[order], ids[order], keys[order], \
            cents[order]
        first = np.r_[True, keys[1:] != keys[:-1]]
        prev_id = np.r_[np.int64(-1), ids[:-1]]
        delta = np.r_[np.int64(0), cents[1:] - cents[:-1]]
        prev_id[first] = -1
        delta[first] = 0
        return pd.DataFrame({id_col: ids.astype(np.int64),
                             f"prev_{id_col}": prev_id.astype(np.int64),
                             "delta_cents": delta.astype(np.int64)})

    return (events.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket").map_groups(kernel,
                                            batch_format="pandas"))


def sliding_window_sum(
    events: rd.Dataset,
    on: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    window: str | int = "10min",
    num_buckets: int = 16,
) -> rd.Dataset:
    """Per-row event-time sliding window over each `by` key:
    (id_col, w_count, w_sum) where the window is every row of the key
    with on ∈ [t − window, t] — RANGE semantics, equal-t peers
    included. w_sum runs on exact int64 cents (values are 2-decimal)
    and reports cents/100 — bit-stable regardless of association
    order. `window` is a pandas offset string or int microseconds."""
    win_us = (int(window) if isinstance(window, int)
              else int(pd.Timedelta(window).value // 1000))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, by, on, value_col]].copy()
        df["__bucket"] = df[by].to_numpy() % num_buckets
        return df

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                 "w_count": pd.Series(dtype=np.int64),
                                 "w_sum": pd.Series(dtype=np.float64)})
        ts = _to_us(group[on])
        ids = group[id_col].to_numpy()
        keys = group[by].to_numpy()
        cents = np.round(group[value_col].to_numpy()
                         * 100.0).astype(np.int64)
        order = np.lexsort((ts, keys))
        ts, ids, keys, cents = ts[order], ids[order], keys[order], \
            cents[order]
        counts = np.empty(len(ts), dtype=np.int64)
        sums = np.empty(len(ts), dtype=np.int64)
        # per-key slices: searchsorted window bounds + cumsum diffs
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        bounds = np.r_[starts, len(keys)]
        for i in range(len(starts)):
            a, b = bounds[i], bounds[i + 1]
            t = ts[a:b]
            c = np.concatenate([[0], np.cumsum(cents[a:b])])
            lo = np.searchsorted(t, t - win_us, side="left")
            hi = np.searchsorted(t, t, side="right")
            counts[a:b] = hi - lo
            sums[a:b] = c[hi] - c[lo]
        return pd.DataFrame({
            id_col: ids.astype(np.int64),
            "w_count": counts,
            "w_sum": np.round(sums / 100.0, 2),
        })

    return (events.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket").map_groups(kernel,
                                            batch_format="pandas"))


def funnel_counts(
    events: rd.Dataset,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Ordered-funnel conversion counts: stage k counts the users whose
    first qualifying stage-k event is at/after their first qualifying
    stage-(k-1) event (t_k = min ts of stage-k events with ts >= t_{k-1};
    equal timestamps qualify). The classic event-analytics funnel, with
    fully deterministic tie semantics a SQL oracle can replay.

    One shuffle (hash-bucket by user — each user's history lands whole
    in one group), then a vectorized per-bucket kernel: one groupby-min
    plus one merge per stage, no Python loop over rows. Each bucket
    emits len(stages) partial counts; the driver sums a
    num_buckets x stages frame — O(1) in the input."""
    cols = [user_col, ts_col, type_col]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        out["__us"] = _to_us(out.pop(ts_col))
        out["__bucket"] = out[user_col].to_numpy() % num_buckets
        return out

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        cur = None  # frame: user, __prev = first qualifying prev-stage ts
        counts = []
        for stage in stages:
            ev = (group.loc[group[type_col] == stage,
                            [user_col, "__us"]].reset_index(drop=True))
            if cur is not None:
                ev = ev.merge(cur, on=user_col)
                ev = ev[ev["__us"] >= ev["__prev"]]
            t = (ev.groupby(user_col, as_index=False)["__us"].min()
                 .rename(columns={"__us": "__prev"}))
            counts.append(len(t))
            cur = t
        return pd.DataFrame({
            "stage_idx": np.arange(len(stages), dtype=np.int64),
            "n_users": np.array(counts, dtype=np.int64),
        })

    parts = (events.map_batches(add_bucket, batch_format="pandas")
             .groupby("__bucket")
             .map_groups(kernel, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("stage_idx", as_index=False)["n_users"].sum()
           .sort_values("stage_idx").reset_index(drop=True))
    out["stage"] = [stages[i] for i in out["stage_idx"]]
    return out[["stage_idx", "stage", "n_users"]]


def transition_counts(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    num_buckets: int = 16,
) -> rd.Dataset:
    """First-order transition (Markov bigram) counts: for each user's
    event stream in (ts, id) order — the id tie-break makes the
    sequence a total order — count every consecutive
    (prev_type, next_type) pair. One user-bucket shuffle, vectorized
    sort+shift per bucket, per-bucket partial counts; the final
    exchange ships O(types² × buckets) rows."""
    cols = [user_col, ts_col, type_col, id_col]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        out["__us"] = _to_us(out.pop(ts_col))
        out["__bucket"] = out[user_col].to_numpy() % num_buckets
        return out

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([user_col, "__us", id_col],
                              kind="stable")
        users = g[user_col].to_numpy()
        types = g[type_col].to_numpy()
        same = users[1:] == users[:-1]
        f = pd.DataFrame({"prev_type": types[:-1][same],
                          "next_type": types[1:][same]})
        out = (f.groupby(["prev_type", "next_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return out

    from ..stages.shuffle import aggregate_rows
    parts = (events.map_batches(add_bucket, batch_format="pandas")
             .groupby("__bucket")
             .map_groups(kernel, batch_format="pandas"))
    return aggregate_rows(parts, ["prev_type", "next_type"], ["n"],
                          num_buckets=4)
