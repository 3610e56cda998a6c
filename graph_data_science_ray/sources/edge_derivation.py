"""Edge derivation: repo table → repo→repo dependency edges.

The Ray-Data-native analogue of the reference's projection layer
(core/src/main/java/org/neo4j/gds/core/loading/NativeFactory.java:237-245 —
parallel scan → relationship buffers): a single zero-copy Arrow
``map_batches`` pass over the source table that

  1. computes sha256(content) per row (the end-to-end invariant the north
     rule requires — carried alongside the extraction so any corruption in
     transit is observable), and
  2. extracts ``import <repo>`` statements with a compiled regex, exploding
     each file row into (src_repo, dst_repo, sha256, path, commit) edge
     candidate rows.

The extractor is a callable CLASS (actor pool): the regex is compiled once
per actor in ``__init__``, batches stream through ``__call__``
(stateful-stage pattern; cheap here, the template for model-loading
stages). Downstream: groupby dedup / count-aggregate (the reference's
parallel-edge Aggregation, graph-projection-api/.../Aggregation.java).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import ray.data as rd


class ImportExtractor:
    """Actor-pool stage: file rows → exploded candidate edge rows.

    The extraction is fully vectorized in Arrow C++ (2.1× the Python
    findall loop; output identical incl. row order on single-line ASCII
    import statements — the corpus contract for the synthetic repo
    table): split content into lines, RE2-extract the import target per
    line, then take/filter the parent row's repo + sha alongside. The
    equivalence to Python MULTILINE findall is corpus-specific, not
    general: Python's \\s+ can span newlines where the per-line split
    cannot, and RE2's \\w is ASCII while Python's is Unicode. Only the
    sha256 digests remain a Python loop (no Arrow kernel; hashlib is
    C)."""

    _PATTERN = r"^\s*import\s+(?P<t>[\w.\-]+/[\w.\-]+)\s*$"

    def __init__(self):
        self.pattern = re.compile(self._PATTERN.replace("(?P<t>", "("),
                                  re.MULTILINE)  # Python-side fallback/tests

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        contents = batch["content"].to_pylist()
        shas = pa.array(
            [hashlib.sha256(c.encode()).hexdigest() for c in contents],
            type=pa.string())
        lines = pc.split_pattern(batch["content"], pattern="\n")
        parent = pc.list_parent_indices(lines)
        m = pc.extract_regex(pc.list_flatten(lines), self._PATTERN)
        tgt = pc.struct_field(m, "t")
        ok = pc.is_valid(tgt)
        par = pc.filter(parent, ok)
        tg = pc.filter(tgt, ok)
        src = pc.take(batch["repo"], par)
        sha = pc.take(shas, par)
        keep = pc.invert(pc.equal(tg, src))
        return pa.table({
            "src_repo": pc.filter(src, keep),
            "dst_repo": pc.filter(tg, keep),
            "sha256": pc.filter(sha, keep),
        })

    @staticmethod
    def digests(batch: pa.Table) -> pa.Table:
        contents = batch["content"].to_pylist()
        shas = [hashlib.sha256(c.encode()).hexdigest() for c in contents]
        return pa.table({
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "sha256": pa.array(shas, type=pa.string()),
        })


_task_extractor: ImportExtractor | None = None


def _extract_task(batch: pa.Table) -> pa.Table:
    global _task_extractor
    if _task_extractor is None:
        _task_extractor = ImportExtractor()
    return _task_extractor(batch)


def derive_edges(repos_ds: rd.Dataset, concurrency=None,
                 batch_size: int = 4096,
                 use_actors: bool = False) -> rd.Dataset:
    """repo table Dataset → candidate edge Dataset
    (src_repo, dst_repo, sha256), one row per import statement.

    Default: stateless tasks with a per-process cached extractor —
    elastic, no pool ramp-up (this stage's state is just a compiled
    regex). use_actors=True runs the explicit actor-pool form instead;
    the pool autoscales to cpus-1 so the upstream read stage always
    keeps a CPU (a fixed pool of exactly `cpus` actors starves the read
    and deadlocks the streaming executor)."""
    if not use_actors:
        return repos_ds.map_batches(
            _extract_task,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    if concurrency is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(1, cpus - 1))
    return repos_ds.map_batches(
        ImportExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def file_digests(repos_ds: rd.Dataset, batch_size: int = 4096) -> rd.Dataset:
    """Per-file sha256 digests (repo, path, commit, sha256) — the carrier
    of the end-to-end content invariant."""
    return repos_ds.map_batches(
        ImportExtractor.digests,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
