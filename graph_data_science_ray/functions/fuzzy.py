"""Fuzzy string matching: all pairs at Levenshtein distance <= 1 via
symmetric-delete candidate generation (the public SymSpell scheme).

Why this shape at 100 TB: a naive fuzzy join is O(N^2) string
comparisons. Symmetric delete makes it output-bounded — every string
emits itself plus its single-deletion variants (len+1 rows), and two
strings within distance 1 are GUARANTEED to share a variant
(substitution: both delete the differing position; insert/delete: the
longer one's deletion equals the shorter string). Variants hash-bucket
into one exchange; only strings sharing a variant ever meet. The
candidate set has false positives (e.g. "ab"/"ba" share variant "a"
twice-removed shapes), so an exact vectorized verify pass follows —
prefix+suffix match-length arithmetic, no per-row Python edit-distance.

Contract: byte-level distance over UTF-8 (exact for ASCII, the same
corpus contract as functions/text.py tokens). Pairs are distinct
strings, emitted once with a < b.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.shuffle import _bucket_hash, distinct_rows


def _byte_matrix(vals: list[bytes], length: int) -> np.ndarray:
    return np.frombuffer(b"".join(vals), dtype="S1").reshape(
        len(vals), length)


def _emit_variants(df: pd.DataFrame, col: str) -> pd.DataFrame:
    """(variant, s) rows: the string itself + every single-byte
    deletion, vectorized per (length, position) slice. Variants stay
    BYTES end-to-end — deleting one byte inside a multi-byte UTF-8
    char yields invalid UTF-8, and a str round-trip (surrogateescape)
    poisons both the bucket hash and Arrow block conversion (found by
    review: any non-ASCII row crashed the job)."""
    if len(df) == 0:
        return pd.DataFrame({"v": pd.Series(dtype=object),
                             "s": pd.Series(dtype=object)})
    s = df[col].astype(str)
    raw = [v.encode("utf-8") for v in s]
    lens = np.fromiter((len(v) for v in raw), dtype=np.int64,
                       count=len(raw))
    out_v: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    sarr = s.to_numpy()
    for L in np.unique(lens):
        idx = np.nonzero(lens == L)[0]
        group = [raw[i] for i in idx]
        names = sarr[idx]
        out_v.append(np.array(group, dtype=object))
        out_s.append(names)
        if L == 0:
            continue
        mat = _byte_matrix(group, int(L))
        for p in range(int(L)):
            cut = np.ascontiguousarray(
                np.concatenate([mat[:, :p], mat[:, p + 1:]], axis=1))
            var = cut.view(f"S{max(int(L) - 1, 1)}")[:, 0].tolist() \
                if L > 1 else [b""] * len(group)
            out_v.append(np.array(var, dtype=object))
            out_s.append(names)
    res = pd.DataFrame({"v": np.concatenate(out_v),
                        "s": np.concatenate(out_s)})
    # a run of equal bytes yields the same variant for every deletion
    # position inside the run — dedup before the exchange
    return res.drop_duplicates()


def _verify_leq1(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Exact byte-Levenshtein <= 1 for candidate pairs whose lengths
    differ by at most 1 (guaranteed by construction): equal lengths →
    hamming <= 1; off-by-one → prefix+suffix match covers the shorter
    string. Vectorized per length-pair group."""
    ab = [x.encode("utf-8") for x in a]
    bb = [x.encode("utf-8") for x in b]
    la = np.fromiter((len(x) for x in ab), np.int64, count=len(ab))
    lb = np.fromiter((len(x) for x in bb), np.int64, count=len(bb))
    # orient so first is the shorter (or equal) side
    swap = la > lb
    short = [bb[i] if swap[i] else ab[i] for i in range(len(ab))]
    lng = [ab[i] if swap[i] else bb[i] for i in range(len(ab))]
    ls, ll = np.where(swap, lb, la), np.where(swap, la, lb)
    ok = np.zeros(len(ab), dtype=bool)
    for L_s, L_l in set(zip(ls.tolist(), ll.tolist())):
        idx = np.nonzero((ls == L_s) & (ll == L_l))[0]
        if L_l - L_s > 1:
            continue
        if L_s == 0:
            ok[idx] = L_l <= 1
            continue
        S = _byte_matrix([short[i] for i in idx], L_s)
        G = _byte_matrix([lng[i] for i in idx], L_l)
        if L_s == L_l:
            ok[idx] = (S != G).sum(axis=1) <= 1
        else:
            eqf = (S == G[:, :L_s]).cumprod(axis=1).sum(axis=1)
            eqb = (S[:, ::-1] == G[:, ::-1][:, :L_s]) \
                .cumprod(axis=1).sum(axis=1)
            ok[idx] = (eqf + eqb) >= L_s
    return ok


def fuzzy_pairs(
    ds: rd.Dataset,
    col: str,
    num_buckets: int = 32,
) -> rd.Dataset:
    """All distinct string pairs (a < b) with byte-Levenshtein
    distance exactly 1 (identical strings collapse in the distinct
    pass). Three bounded exchanges: distinct strings → variant-bucket
    candidate join → global pair dedup; then a stateless vectorized
    verify map."""
    uniq = distinct_rows(ds, [col], num_buckets=num_buckets)

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        out = _emit_variants(df, col)
        out["__bucket"] = _bucket_hash(out, ["v"], num_buckets)
        return out

    def pair_kernel(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["v", "s"]]
        m = g.merge(g, on="v")
        m = m[m["s_x"] < m["s_y"]]
        return (m[["s_x", "s_y"]].drop_duplicates()
                .rename(columns={"s_x": "a", "s_y": "b"}))

    cand = (uniq.map_batches(variants, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(pair_kernel, batch_format="pandas"))
    cand = distinct_rows(cand, ["a", "b"], num_buckets=num_buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df[["a", "b"]]
        return df[_verify_leq1(df["a"], df["b"])][["a", "b"]]

    return cand.map_batches(verify, batch_format="pandas")
