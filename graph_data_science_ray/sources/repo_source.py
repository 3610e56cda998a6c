"""Deterministic synthetic source-code repository table (the north-rule
input_hint schema) with a closed-form derived edge set.

Schema: (repo:string, path:string, commit:string, lang:string,
content:string). Each file's content embeds ``import <repo>`` lines whose
targets are drawn from a seeded power-law popularity distribution — so the
repo→repo dependency edge set is known exactly at generation time and the
whole derivation pipeline (extract → dedup → encode → partition) can be
verified in closed form. Plays the role of the reference's seedable
RandomGraphGenerator (core/src/main/java/org/neo4j/gds/beta/generator/
RandomGraphGenerator.java:58-200, POWER_LAW distribution) but emits the
repo-table form required by the north rule.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_LANGS = ["python", "java", "go", "rust", "javascript"]

_FILLERS = [
    "def handler(request):",
    "    return process(request)",
    "class Service:",
    "    pass",
    "# generated module",
    "VERSION = '1.0.%d'",
]


def repo_name(i: int) -> str:
    return f"org{i % 97}/repo{i}"


def generate_repo_table(
    n_repos: int,
    files_per_repo: int = 3,
    avg_imports_per_file: int = 4,
    seed: int = 42,
    power: float = 1.5,
) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Returns (table, true_src_idx, true_dst_idx).

    True edges are the DISTINCT (src_repo_idx, dst_repo_idx) pairs embedded
    across all files of each repo (self-imports excluded); idx == repo
    index i (the graph build assigns vids by SORTED repo name — tests map
    through repo_name). Fully vectorized so bench-scale tables (10⁶ files,
    10⁷ import lines) generate in seconds.
    """
    import pandas as pd

    rng = np.random.default_rng(seed)
    names = np.array([repo_name(i) for i in range(n_repos)], dtype=object)

    n_files = rng.integers(1, 2 * files_per_repo + 1, size=n_repos)
    total_files = int(n_files.sum())
    file_repo = np.repeat(np.arange(n_repos, dtype=np.int64), n_files)
    # per-repo file ordinal
    starts = np.cumsum(n_files) - n_files
    file_ord = np.arange(total_files, dtype=np.int64) - np.repeat(starts, n_files)

    # power-law target popularity: probability ∝ (rank+1)^-power
    weights = 1.0 / np.power(np.arange(1, n_repos + 1, dtype=np.float64), power)
    cumw = np.cumsum(weights / weights.sum())
    k_imports = rng.integers(0, 2 * avg_imports_per_file + 1, size=total_files)
    total_imports = int(k_imports.sum())
    import_file = np.repeat(np.arange(total_files, dtype=np.int64), k_imports)
    targets = np.searchsorted(cumw, rng.random(total_imports)).astype(np.int64)
    src_repo_of_line = file_repo[import_file]
    keep = targets != src_repo_of_line
    import_file, targets, src_repo_of_line = (
        import_file[keep], targets[keep], src_repo_of_line[keep])

    # content = joined import lines + one filler line
    lines = pd.Series(names[targets], index=import_file, dtype=object).radd("import ")
    joined = lines.groupby(level=0).agg("\n".join)
    filler = pd.Series(_FILLERS[0] + "\n" + _FILLERS[1],
                       index=np.arange(total_files), dtype=object)
    content = joined.reindex(np.arange(total_files), fill_value="")
    content = content.where(content == "", content + "\n") + filler

    langs = np.array(_LANGS, dtype=object)[
        rng.integers(0, len(_LANGS), size=total_files)]
    commits = np.array([f"{c:012x}" for c in
                        rng.integers(0, 2**48, size=total_files)], dtype=object)
    paths = pd.Series(file_ord).astype(str).radd("src/module_").add(".py")

    table = pa.table({
        "repo": pa.array(names[file_repo], type=pa.string()),
        "path": pa.array(paths.tolist(), type=pa.string()),
        "commit": pa.array(commits, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "content": pa.array(content.tolist(), type=pa.string()),
    })
    if len(targets):
        pairs = np.unique(
            np.stack([src_repo_of_line, targets], axis=1), axis=0)
        src, dst = pairs[:, 0], pairs[:, 1]
    else:
        src = dst = np.empty(0, dtype=np.int64)
    return table, src, dst


def write_repo_table(path: str, n_repos: int, num_files: int = 1,
                     **kwargs) -> tuple[str, np.ndarray, np.ndarray]:
    """Generate and persist the repo table; returns (path, true edges).

    num_files == 1 → a single parquet file at `path`; num_files > 1 →
    `path` becomes a DIRECTORY of that many shard files. A single file
    caps read parallelism at its row-group layout (measured: derivation
    throughput flat from 8→32 cpus on the one-file bench table); many
    files let read_parquet schedule one task per file — the layout the
    100 TB deployment would have anyway.
    """
    table, src, dst = generate_repo_table(n_repos, **kwargs)
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    # small row groups so read_parquet can split each file into enough
    # blocks to feed a whole actor pool (one giant row group = one read
    # task = serial extraction)
    if num_files <= 1:
        tmp = path + ".tmp"
        pq.write_table(table, tmp, row_group_size=32768)
        os.replace(tmp, path)
        return path, src, dst
    tmp_dir = path + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    n = table.num_rows
    bounds = np.linspace(0, n, num_files + 1).astype(np.int64)
    for i in range(num_files):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi > lo:
            pq.write_table(table.slice(lo, hi - lo),
                           os.path.join(tmp_dir, f"part-{i:05d}.parquet"),
                           row_group_size=32768)
    os.replace(tmp_dir, path)
    return path, src, dst
