"""Text analysis stages for large-scale training-data pipelines.

All operators are deterministic, vectorized map_batches kernels over the
``documents``-shaped table (doc_id, text, ...). Stateful pieces (compiled
regexes, stopword tables) live in callable-class actor pools.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "por", "que"},
    "it": {"il", "la", "di", "e", "che", "un", "una", "per", "non", "sono"},
}

_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_WS = re.compile(r"\s+")
_WORD = re.compile(r"[\w']+")


class LanguageId:
    """Actor-pool stage: stopword-vote language identification.

    Predicts the language with the most stopword-profile token hits;
    ties resolve to the lexicographically first language (all-zero
    rows therefore get the first language — the behavior the SQL
    oracle's ``ORDER BY h DESC, lang`` pins). Fully vectorized (r4):
    Arrow lower + regex split tokenizes the whole batch, one
    ``pc.is_in`` per language marks profile hits, and a single
    bincount per language folds them per document — no per-document
    Python loop. Tokenization is the ASCII class ``[a-z0-9_']+`` —
    exactly what the lang_id SQL oracle uses (the previous Python
    ``[\\w']+`` loop only coincided with it on ASCII corpora).
    """

    def __init__(self):
        self.langs = sorted(_LANG_PROFILES)
        self.sets = [pa.array(sorted(_LANG_PROFILES[lang]))
                     for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), pattern="[^a-z0-9_']+")
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(toks)
        counts = np.zeros((len(batch), len(self.langs)), dtype=np.int64)
        for i, vocab in enumerate(self.sets):
            m = pc.is_in(flat, value_set=vocab).to_numpy(
                zero_copy_only=False)
            counts[:, i] = np.bincount(parent[m], minlength=len(batch))
        # argmax over lang-sorted columns == the scan-with-strict-
        # improvement tie-break (first max wins)
        preds = np.array(self.langs)[counts.argmax(axis=1)]
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(preds)})


_LANG_ID_STATE: "LanguageId | None" = None


def _lang_id_call(batch: pa.Table) -> pa.Table:
    # lazily-built module state, reused across tasks by Ray's
    # long-lived worker processes
    global _LANG_ID_STATE
    if _LANG_ID_STATE is None:
        _LANG_ID_STATE = LanguageId()
    return _LANG_ID_STATE(batch)


def language_id(docs: rd.Dataset, concurrency=None) -> rd.Dataset:
    """Stateless-task variant of the LanguageId stage: the state here
    (sorted stopword arrays) is microseconds to build, so an actor
    pool only adds process spin-up (~2 s per execution, measured in
    bench) — the actor-pool shape is for EXPENSIVE state (models,
    codecs: see functions/multimodal.py). ``concurrency`` caps task
    parallelism when given; default elastic."""
    from ..stages.resources import stage_cpus
    kw = {} if concurrency is None else {"concurrency": concurrency}
    return docs.map_batches(_lang_id_call, batch_format="pyarrow",
                            zero_copy_batch=True,
                            num_cpus=stage_cpus("text"), **kw)


def token_counts(docs: rd.Dataset) -> rd.Dataset:
    """Whitespace tokens + BPE-ish subword-regex tokens per document."""

    def kernel(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ws = [len(_WS.split(s.strip())) if s.strip() else 0 for s in texts]
        bpe = [len(_BPE_ISH.findall(s)) for s in texts]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens_ws": pa.array(ws, type=pa.int64()),
            "n_tokens_bpe": pa.array(bpe, type=pa.int64()),
        })

    return docs.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(docs: rd.Dataset) -> rd.Dataset:
    """Heuristic quality metrics: length, punctuation/digit/uppercase
    ratios, stopword ratio, mean word length, and a composite [0,1]
    score — the usual web-corpus filtering signals, vectorized."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"]
        n_chars = s.str.len().clip(lower=1)
        words = s.str.findall(_WORD)
        n_words = words.str.len().clip(lower=1)
        stop = words.map(
            lambda ws: sum(1 for w in ws if w.lower() in _LANG_PROFILES["en"]))
        punct_ratio = s.str.count(r"[^\w\s]") / n_chars
        digit_ratio = s.str.count(r"[0-9]") / n_chars
        upper_ratio = s.str.count(r"[A-Z]") / n_chars
        mean_word_len = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        stop_ratio = stop / n_words
        score = (
            (punct_ratio < 0.2).astype(float) * 0.25
            + (stop_ratio > 0.05).astype(float) * 0.25
            + mean_word_len.between(2.5, 9.0).astype(float) * 0.25
            + (n_chars >= 50).astype(float) * 0.25
        )
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": s.str.len().astype(np.int64),
            "n_words": words.str.len().astype(np.int64),
            "punct_ratio": punct_ratio.round(6),
            "digit_ratio": digit_ratio.round(6),
            "upper_ratio": upper_ratio.round(6),
            "stop_ratio": stop_ratio.round(6),
            "mean_word_len": mean_word_len.round(6),
            "quality_score": score,
        })

    return docs.map_batches(kernel, batch_format="pandas")


def fingerprints(docs: rd.Dataset, window: int = 8) -> rd.Dataset:
    """64-bit document fingerprint: min of a rolling polynomial hash over
    the normalized character stream (winnowing-style; deterministic)."""
    B = np.uint64(1000003)
    MASK = np.uint64((1 << 64) - 1)

    def kernel(t: pa.Table) -> pa.Table:
        out = []
        for text in t["text"].to_pylist():
            norm = _WS.sub(" ", text.strip().lower())
            data = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
            if len(data) < window:
                h = np.uint64(0)
                for b in data:
                    h = (h * B + np.uint64(b)) & MASK
                out.append(int(h))
                continue
            # rolling hash over all windows, vectorized
            powers = np.array([int(B) ** i % (1 << 64)
                               for i in range(window)][::-1], dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(data, window)
            hashes = (win.astype(np.uint64) * powers).sum(
                axis=1, dtype=np.uint64)
            out.append(int(hashes.min()))
        return pa.table({
            "doc_id": t["doc_id"],
            "fingerprint": pa.array(out, type=pa.uint64()),
        })

    return docs.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def _token_pairs(docs: rd.Dataset) -> rd.Dataset:
    """Per-batch (doc_id, token, cnt) partial counts under the ASCII
    token contract [a-z0-9_']+ (the same contract lang_id / simhash and
    their SQL oracles use). Partial counting INSIDE the batch is the
    pre-aggregation step — the shuffle ships one row per distinct
    (doc, token) per batch, not one per occurrence."""
    import pyarrow.compute as pc

    def kernel(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern="[^a-z0-9_']+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)[parent[keep]]
        tok = flat.to_pandas().to_numpy()[keep]
        g = (pd.DataFrame({"doc_id": doc, "token": tok})
             .groupby(["doc_id", "token"], sort=False).size()
             .reset_index(name="cnt"))
        return pa.table({"doc_id": g["doc_id"].to_numpy(np.int64),
                         "token": pa.array(g["token"].tolist(),
                                           type=pa.string()),
                         "cnt": g["cnt"].to_numpy(np.int64)})

    return docs.map_batches(kernel, batch_format="pyarrow",
                            zero_copy_batch=True)


def tfidf(docs: rd.Dataset, num_buckets: int = 32,
          round_to: int = 6) -> rd.Dataset:
    """(doc_id, token, tf, df, tfidf) — tf·ln(N/df) with raw counts.

    ONE shuffle: partial (doc, token) counts bucket by token, so the
    bucket kernel finalizes tf (summing cross-batch partials) AND df
    (distinct docs per token) together — no second pass, no join. N is
    the corpus row count (a metadata-only count)."""
    from ..stages.shuffle import _bucket_hash
    n_docs = float(docs.count())
    pairs = _token_pairs(docs)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _bucket_hash(df, ["token"], num_buckets)
        return df

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        tf = (group.groupby(["token", "doc_id"], sort=False)["cnt"]
              .sum().reset_index(name="tf"))
        tf["df"] = tf.groupby("token", sort=False)["token"].transform("size")
        tfidf_v = tf["tf"].to_numpy() * np.log(
            n_docs / tf["df"].to_numpy(np.float64))
        return pd.DataFrame({
            "doc_id": tf["doc_id"].to_numpy(np.int64),
            "token": tf["token"],
            "tf": tf["tf"].to_numpy(np.int64),
            "df": tf["df"].to_numpy(np.int64),
            "tfidf": np.round(tfidf_v, round_to),
        })

    return (pairs.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket").map_groups(kernel, batch_format="pandas"))


def inverted_index(docs: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """(token, df, postings) — the classic retrieval structure: per
    token its document frequency and the comma-joined ASCENDING list
    of distinct doc ids containing it.

    Same shape as tfidf: per-batch (doc, token) partials, ONE
    token-bucket shuffle, then a per-bucket groupby builds each
    posting list exactly once (a token lives in exactly one bucket).
    At 100 TB the posting strings for stop-word-grade tokens get
    large — the output is a Dataset, written partitioned, never
    driver-resident."""
    from ..stages.shuffle import _bucket_hash
    pairs = _token_pairs(docs)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "token"]].drop_duplicates()
        df["__bucket"] = _bucket_hash(df, ["token"], num_buckets)
        return df

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        d = (group[["token", "doc_id"]].drop_duplicates()
             .sort_values(["token", "doc_id"], kind="stable"))
        g = d.groupby("token", sort=False)
        sz = g.size()                      # index: tokens, appearance =
        posts = g["doc_id"].agg(           # ascending (d pre-sorted);
            lambda s: ",".join(map(str, s.tolist())))  # shared index
        return pd.DataFrame({
            "token": sz.index.to_numpy(dtype=object),
            "df": sz.to_numpy(np.int64),
            "postings": posts.to_numpy(),
        })

    return (pairs.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket").map_groups(kernel,
                                            batch_format="pandas"))


def vocabulary(docs: rd.Dataset, top_k: int = 100,
               num_buckets: int = 32) -> pd.DataFrame:
    """Global top-k tokens by total occurrence count (vocabulary
    building): (token, count, rank), ties broken token-ascending.

    Partial counts per batch → hash-bucketed global sums (each token
    final in exactly one row) → per-block top-k → tiny driver merge."""
    from ..stages.shuffle import aggregate_rows
    pairs = _token_pairs(docs)
    totals = aggregate_rows(pairs, ["token"], ["cnt"],
                            num_buckets=num_buckets)

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "token"],
                              ascending=[False, True]).head(top_k)

    small = totals.map_batches(block_topk, batch_format="pandas") \
        .to_pandas()
    out = (small.sort_values(["cnt", "token"], ascending=[False, True])
           .head(top_k).reset_index(drop=True))
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return pd.DataFrame({"token": out["token"],
                         "count": out["cnt"].to_numpy(np.int64),
                         "rank": out["rank"]})


def int_field(ds: "rd.Dataset", col: str, pattern: str,
              out_col: str = "k") -> "rd.Dataset":
    """Vectorized integer-field extraction from a semi-structured
    string column (JSON-ish props, log lines): ONE Arrow RE2
    ``extract_regex`` pass per batch — no Python loop, no per-row json
    parse. ``pattern`` must contain a named group ``(?P<v>\\d+)``;
    non-matching rows become −1 (null-free sentinel, same contract as
    the temporal operators). Output keeps all other columns."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t[col], pattern)
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        v = pc.fill_null(v, -1)
        out = t.drop_columns([col])
        return out.append_column(out_col, v)

    return ds.map_batches(extract, batch_format="pyarrow",
                          zero_copy_batch=True)
