"""End-to-end training-data preparation: the composition the brief's
"large-scale training-data pipeline" operators exist FOR, as one
resumable pipeline —

    documents
      → exact dedup          (keeper = min doc_id per identical text)
      → quality filter       (composite heuristic score >= threshold)
      → language filter      (stopword-vote prediction == target)
      → deterministic sample (optional murmur-threshold Bernoulli)
      → hive-partitioned parquet, resume-safe (sources/sinks.py)

Scale shape: each filter produces an ID-ONLY dataset; the id sets are
intersected with id-level semi joins (exchanges ship ids, never
text), and the full document rows are fetched once at the end with a
single doc ⋉ ids semi join. Every stage is deterministic, so the
whole funnel is SQL-replayable (the prep_funnel driver query) and a
crashed write resumes per partition.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _ids(ds: rd.Dataset, col: str = "doc_id") -> rd.Dataset:
    return ds.select_columns([col]).materialize()


def training_data_prep(
    docs: rd.Dataset,
    out_dir: str | None = None,
    quality_threshold: float = 0.9,
    lang: str = "en",
    sample_fraction: float | None = None,
    seed: int = 5,
    resume: bool = True,
) -> dict:
    """Run the funnel over a documents Dataset with columns
    (doc_id, text, lang). Returns per-stage counts (and the sink
    summary when ``out_dir`` is given)."""
    import pyarrow.compute as pc

    from ..functions.dedup import exact_dedup
    from ..functions.join import semi_join
    from ..functions.relational import hash_sample
    from ..functions.text import language_id, quality_scores

    keep_dedup = _ids(exact_dedup(docs))

    keep_quality = _ids(
        quality_scores(docs).map_batches(
            lambda df: df[df["quality_score"] >= quality_threshold],
            batch_format="pandas"))

    def l_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["lang_pred"], lang))

    keep_lang = _ids(language_id(docs).map_batches(
        l_filter, batch_format="pyarrow", zero_copy_batch=True))

    # id-level intersections: exchanges ship ids only
    ids_q = semi_join(keep_dedup, keep_quality,
                      on="doc_id").materialize()
    ids_l = semi_join(ids_q, keep_lang, on="doc_id").materialize()

    counts = {"input": docs.count(), "dedup": keep_dedup.count(),
              "quality": ids_q.count(), "lang": ids_l.count()}

    final_ids = ids_l
    if sample_fraction is not None:
        with_pair = final_ids.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "k2": t["doc_id"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        final_ids = hash_sample(with_pair, ("doc_id", "k2"),
                                sample_fraction, seed=seed) \
            .select_columns(["doc_id"]).materialize()
        counts["sample"] = final_ids.count()

    result = {"counts": counts}
    if out_dir is not None:
        from ..sources.sinks import write_partitioned
        kept_docs = semi_join(docs, final_ids, on="doc_id",
                              left_cols=["text", "lang"])
        result["sink"] = write_partitioned(kept_docs, out_dir, "lang",
                                           resume=resume)
    return result
