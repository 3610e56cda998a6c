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
    """Returns (table, true_src_vids, true_dst_vids).

    true edges are the DISTINCT (src_repo_idx, dst_repo_idx) pairs embedded
    across all files of each repo; vid == repo index i (repo_name(i) sorts
    are NOT vid order — the graph build assigns vids by sorted repo name,
    tests map through that).
    """
    rng = np.random.default_rng(seed)
    rows_repo, rows_path, rows_commit, rows_lang, rows_content = [], [], [], [], []
    true_edges: set[tuple[int, int]] = set()

    # power-law target popularity: probability ∝ (rank+1)^-power
    weights = 1.0 / np.power(np.arange(1, n_repos + 1, dtype=np.float64), power)
    weights /= weights.sum()

    n_files = rng.integers(1, 2 * files_per_repo + 1, size=n_repos)
    for i in range(n_repos):
        name = repo_name(i)
        for f in range(n_files[i]):
            k = int(rng.integers(0, 2 * avg_imports_per_file + 1))
            targets = rng.choice(n_repos, size=k, p=weights) if k else np.empty(0, int)
            lines = []
            for t in targets:
                t = int(t)
                if t != i:
                    lines.append(f"import {repo_name(t)}")
                    true_edges.add((i, t))
            body = [_FILLERS[j % len(_FILLERS)] % (j,) if "%d" in _FILLERS[j % len(_FILLERS)]
                    else _FILLERS[j % len(_FILLERS)]
                    for j in range(int(rng.integers(1, 5)))]
            content = "\n".join(lines + body)
            lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
            commit = hashlib.sha1(f"{name}/{f}/{seed}".encode()).hexdigest()[:12]
            rows_repo.append(name)
            rows_path.append(f"src/module_{f}.{lang[:2]}")
            rows_commit.append(commit)
            rows_lang.append(lang)
            rows_content.append(content)

    table = pa.table({
        "repo": pa.array(rows_repo, type=pa.string()),
        "path": pa.array(rows_path, type=pa.string()),
        "commit": pa.array(rows_commit, type=pa.string()),
        "lang": pa.array(rows_lang, type=pa.string()),
        "content": pa.array(rows_content, type=pa.string()),
    })
    if true_edges:
        e = np.array(sorted(true_edges), dtype=np.int64)
        src, dst = e[:, 0], e[:, 1]
    else:
        src = dst = np.empty(0, dtype=np.int64)
    return table, src, dst


def write_repo_table(path: str, n_repos: int, **kwargs) -> tuple[str, np.ndarray, np.ndarray]:
    """Generate and persist the repo table; returns (file path, true edges)."""
    table, src, dst = generate_repo_table(n_repos, **kwargs)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path, src, dst
