"""Round-5 operator batch: as-of join + sliding-window aggregate
(functions/temporal.py) and TF-IDF + vocabulary (functions/text.py) —
determinism contracts vs brute-force references, including the tie
cases the SQL oracles encode (equal timestamps, exact matches,
count-tie token ordering)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graph_data_science_ray.functions.temporal import (asof_join,
                                                       sliding_window_sum)

pytestmark = pytest.mark.usefixtures("ray_session")

BASE = np.datetime64("2024-01-01T00:00:00", "us")


def _ds(ids, ts_s, users, **extra):
    df = pd.DataFrame({"event_id": np.asarray(ids, dtype=np.int64),
                       "ts": BASE + np.asarray(ts_s, dtype="timedelta64[s]"),
                       "user_id": np.asarray(users, dtype=np.int64)})
    for k, v in extra.items():
        df[k] = v
    return rd.from_pandas(df)


def test_asof_join_backward_with_ties():
    # user 1: views at t=0 (id 10), t=100 (ids 11 and 12 — equal ts,
    # larger id must win), clicks at t=50, t=100 (exact match), t=200
    # user 2: click with NO prior view → sentinel −1
    left = _ds([1, 2, 3, 4], [50, 100, 200, 10], [1, 1, 1, 2])
    right = _ds([10, 11, 12, 13], [0, 100, 100, 500], [1, 1, 1, 2])
    out = (asof_join(left, right).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["event_id"].tolist() == [1, 2, 3, 4]
    assert out["right_event_id"].tolist() == [10, 12, 12, -1]
    assert out["gap_us"].tolist() == [50_000_000, 0, 100_000_000, -1]


def test_asof_join_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    nl, nr = 400, 300
    left = _ds(np.arange(nl), rng.integers(0, 5000, nl),
               rng.integers(0, 12, nl))
    rids = np.arange(1000, 1000 + nr)
    rts = rng.integers(0, 5000, nr)
    rus = rng.integers(0, 12, nr)
    right = _ds(rids, rts, rus)
    out = (asof_join(left, right, num_buckets=5).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ldf = left.to_pandas()
    assert len(out) == nl
    for _, row in out.iterrows():
        lrow = ldf[ldf["event_id"] == row["event_id"]].iloc[0]
        lt = lrow["ts"].to_datetime64()
        mask = (rus == lrow["user_id"]) & \
            ((BASE + rts.astype("timedelta64[s]")) <= lt)
        if not mask.any():
            assert row["right_event_id"] == -1 and row["gap_us"] == -1
            continue
        cand_ts = rts[mask]
        best_ts = cand_ts.max()
        best_id = rids[mask][cand_ts == best_ts].max()  # largest-id tie
        assert row["right_event_id"] == best_id
        assert row["gap_us"] == (
            lt - (BASE + np.timedelta64(int(best_ts), "s"))
        ) // np.timedelta64(1, "us")


def test_sliding_window_range_semantics():
    # user 1 at t = 0, 300, 600, 600, 1200 s with 10-min window:
    # equal-t peers both count (RANGE, not ROWS); 1200 only sees itself
    # plus the two 600s (600 >= 1200-600 inclusive)
    ds = _ds([1, 2, 3, 4, 5], [0, 300, 600, 600, 1200], [1] * 5,
             value=[1.0, 2.0, 4.0, 8.0, 16.0])
    out = (sliding_window_sum(ds).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["w_count"].tolist() == [1, 2, 4, 4, 3]
    assert out["w_sum"].tolist() == [1.0, 3.0, 15.0, 15.0, 28.0]


def test_tfidf_matches_bruteforce():
    import re
    from graph_data_science_ray.functions.text import tfidf
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["the cat sat on the mat",
                 "the dog sat",
                 "a cat and a dog",
                 "punctuation, splits; tokens don't break"],
    })
    out = (tfidf(rd.from_pandas(docs), num_buckets=3).to_pandas()
           .sort_values(["doc_id", "token"]).reset_index(drop=True))
    tok_re = re.compile(r"[a-z0-9_']+")
    ref_tf = {}
    ref_df = {}
    for _, row in docs.iterrows():
        toks = tok_re.findall(row["text"].lower())
        for t in set(toks):
            ref_df[t] = ref_df.get(t, 0) + 1
        for t in toks:
            ref_tf[(row["doc_id"], t)] = ref_tf.get(
                (row["doc_id"], t), 0) + 1
    assert len(out) == len(ref_tf)
    n = float(len(docs))
    for _, r in out.iterrows():
        key = (r["doc_id"], r["token"])
        assert r["tf"] == ref_tf[key]
        assert r["df"] == ref_df[r["token"]]
        assert abs(r["tfidf"]
                   - round(r["tf"] * np.log(n / r["df"]), 6)) < 1e-9
    # the apostrophe stays inside the token (ASCII contract)
    assert "don't" in set(out["token"])


def test_vocabulary_topk_deterministic():
    from graph_data_science_ray.functions.text import vocabulary
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["b b b a a c", "a b zz zz", "c a"],
    })
    out = vocabulary(rd.from_pandas(docs), top_k=3, num_buckets=2)
    # counts: a=4, b=4, zz=2, c=2 → ties break token-ascending
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["count"].tolist() == [4, 4, 2]
    assert out["rank"].tolist() == [1, 2, 3]


def test_sliding_window_matches_bruteforce_random():
    rng = np.random.default_rng(5)
    n = 500
    ts_s = rng.integers(0, 4000, n)
    users = rng.integers(0, 9, n)
    vals = np.round(rng.uniform(0, 50, n), 2)
    ds = _ds(np.arange(n), ts_s, users, value=vals)
    out = (sliding_window_sum(ds, num_buckets=4).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    cents = np.round(vals * 100).astype(np.int64)
    for i in range(n):
        mask = (users == users[i]) & (ts_s >= ts_s[i] - 600) & \
            (ts_s <= ts_s[i])
        assert out.loc[i, "w_count"] == mask.sum()
        assert out.loc[i, "w_sum"] == round(cents[mask].sum() / 100.0, 2)


def test_funnel_counts_ordered_semantics():
    from graph_data_science_ray.functions.temporal import funnel_counts
    # user 1: view@0 -> click@10 -> purchase@20  (full conversion)
    # user 2: click@0 -> view@10 (click BEFORE first view: stage 2 no)
    # user 3: view@5, purchase@6 but no click    (stops at stage 1)
    # user 4: view@0, click@0 equal ts qualifies, purchase@0 too
    # user 5: purchase only                      (never enters)
    ids = np.arange(11)
    ts = [0, 10, 20, 0, 10, 5, 6, 0, 0, 0, 0]
    users = [1, 1, 1, 2, 2, 3, 3, 4, 4, 4, 5]
    types = ["view", "click", "purchase",
             "click", "view",
             "view", "purchase",
             "view", "click", "purchase",
             "purchase"]
    ds = _ds(ids, ts, users, event_type=types)
    out = funnel_counts(ds, ["view", "click", "purchase"],
                        num_buckets=3)
    assert out["stage"].tolist() == ["view", "click", "purchase"]
    # stage 0: users 1,2,3,4 have a view; stage 1: 1 and 4 (user 2's
    # click precedes its first view); stage 2: 1 and 4
    assert out["n_users"].tolist() == [4, 2, 2]


def test_funnel_counts_vs_bruteforce_random():
    from graph_data_science_ray.functions.temporal import funnel_counts
    rng = np.random.default_rng(17)
    n = 600
    users = rng.integers(0, 40, n)
    ts = rng.integers(0, 1000, n)
    stages = ["view", "click", "purchase"]
    types = rng.choice(stages, n)
    ds = _ds(np.arange(n), ts, users, event_type=list(types))
    out = funnel_counts(ds, stages, num_buckets=5)
    df = pd.DataFrame({"u": users, "t": ts, "s": types})
    expect = []
    prev = {u: 0 for u in set(users)}
    alive = set(users)
    for s in stages:
        nxt = {}
        for u in sorted(alive):
            q = df[(df["u"] == u) & (df["s"] == s)
                   & (df["t"] >= prev[u])]
            if len(q):
                nxt[u] = q["t"].min()
        expect.append(len(nxt))
        prev, alive = nxt, set(nxt)
    assert out["n_users"].tolist() == expect


def test_asof_join_forward_with_ties():
    # user 1: clicks at t=50,100,200; views at 0, 100 (ids 11,12 —
    # equal ts: SMALLEST id wins forward), 300
    # user 2: click at t=600 with no later view -> sentinel -1
    left = _ds([1, 2, 3, 4], [50, 100, 200, 600], [1, 1, 1, 2])
    right = _ds([10, 11, 12, 13], [0, 100, 100, 300], [1, 1, 1, 1])
    out = (asof_join(left, right, direction="forward").to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["right_event_id"].tolist() == [11, 11, 13, -1]
    assert out["gap_us"].tolist() == [50_000_000, 0, 100_000_000, -1]


def test_transition_counts_matches_pandas():
    from graph_data_science_ray.functions.temporal import \
        transition_counts
    rng = np.random.default_rng(23)
    n = 400
    users = rng.integers(0, 12, n)
    ts = rng.integers(0, 200, n)     # deliberate ts ties -> id order
    types = rng.choice(["a", "b", "c"], n)
    ds = _ds(np.arange(n), ts, users, event_type=list(types))
    out = (transition_counts(ds, num_buckets=5).to_pandas()
           .sort_values(["prev_type", "next_type"])
           .reset_index(drop=True))
    df = pd.DataFrame({"u": users, "t": ts, "i": np.arange(n),
                       "s": types}).sort_values(["u", "t", "i"])
    prev, nxt = [], []
    for _, g in df.groupby("u"):
        s = g["s"].tolist()
        prev += s[:-1]
        nxt += s[1:]
    ref = (pd.DataFrame({"p": prev, "n_": nxt})
           .groupby(["p", "n_"]).size().reset_index(name="n")
           .sort_values(["p", "n_"]).reset_index(drop=True))
    assert out["prev_type"].tolist() == ref["p"].tolist()
    assert out["next_type"].tolist() == ref["n_"].tolist()
    assert out["n"].astype(np.int64).tolist() == ref["n"].tolist()
