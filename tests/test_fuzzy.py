"""functions/fuzzy.py: symmetric-delete fuzzy join vs brute-force
Levenshtein, including the false-positive shapes the verify pass must
reject (swaps, double-substitutions, shared-variant-but-distance-2)."""

import itertools

import numpy as np
import pandas as pd
import ray.data as rd

from graph_data_science_ray.functions.fuzzy import (_verify_leq1,
                                                    fuzzy_pairs)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


VOCAB = ["cat", "car", "cart", "at", "ca", "ab", "ba", "abc", "acb",
         "hello", "hallo", "hell", "helloo", "x", "", "xy", "yx",
         "aab", "aba", "baa", "spark", "spork", "sparks", "park"]


def _ds(words, blocks=4):
    df = pd.DataFrame({"s": words})
    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % blocks)])


def test_fuzzy_pairs_vs_bruteforce():
    out = (fuzzy_pairs(_ds(VOCAB + VOCAB), "s", num_buckets=4)
           .to_pandas())
    got = sorted(zip(out["a"], out["b"]))
    uniq = sorted(set(VOCAB))
    want = sorted((a, b) for a, b in itertools.combinations(uniq, 2)
                  if _lev(a, b) == 1)
    assert got == want
    # the classic SymSpell false positives must be gone
    assert ("ab", "ba") not in got
    assert ("abc", "acb") not in got or _lev("abc", "acb") == 1


def test_verify_rejects_swaps_and_double_subs():
    a = pd.Series(["ab", "abc", "aab", "cat", "cat", "cat", ""])
    b = pd.Series(["ba", "acb", "aba", "car", "cart", "at", "x"])
    got = _verify_leq1(a, b).tolist()
    want = [_lev(x, y) <= 1 for x, y in zip(a, b)]
    assert got == want


def test_fuzzy_pairs_no_matches():
    out = fuzzy_pairs(_ds(["alpha", "gamma", "epsilon"]), "s",
                      num_buckets=2).to_pandas()
    assert len(out) == 0


def test_fuzzy_pairs_non_ascii_and_empty_blocks():
    # multi-byte UTF-8: byte-level distance contract — 'café'/'cafe'
    # differ by the two-byte 'é' vs one-byte 'e' (distance 2), while
    # 'café'/'cafés' differ by one byte
    words = ["café", "cafés", "cafe", "caf", "naïve", "naive"]
    out = (fuzzy_pairs(_ds(words + [""], 5), "s", num_buckets=3)
           .to_pandas())
    got = sorted(zip(out["a"], out["b"]))
    uniq = sorted(set(words + [""]))
    want = sorted(
        (a, b) for a, b in itertools.combinations(uniq, 2)
        if _blev(a, b) == 1)
    assert got == want


def _blev(a: str, b: str) -> int:
    return _lev(a.encode("utf-8").decode("latin-1"),
                b.encode("utf-8").decode("latin-1"))
