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
    """Actor-pool stage: file rows → exploded candidate edge rows."""

    def __init__(self):
        self.pattern = re.compile(r"^\s*import\s+([\w.\-]+/[\w.\-]+)\s*$",
                                  re.MULTILINE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch["content"].to_pylist()
        repos = batch["repo"].to_pylist()
        src_out, dst_out, sha_out = [], [], []
        shas = [hashlib.sha256(c.encode()).hexdigest() for c in contents]
        for i, (repo, content) in enumerate(zip(repos, contents)):
            for target in self.pattern.findall(content):
                if target != repo:
                    src_out.append(repo)
                    dst_out.append(target)
                    sha_out.append(shas[i])
        return pa.table({
            "src_repo": pa.array(src_out, type=pa.string()),
            "dst_repo": pa.array(dst_out, type=pa.string()),
            "sha256": pa.array(sha_out, type=pa.string()),
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
