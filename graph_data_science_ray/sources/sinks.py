"""Resumable partitioned Parquet sink.

The brief's output contract for 100-TB runs: "write partitioned
Parquet (one directory per input shard / key range) so a failed run
can skip finished partitions; never one giant file." This module makes
that a first-class verb with crash-safe resume semantics:

- Output is hive-partitioned (``col=value/`` directories, Ray's native
  ``write_parquet(partition_cols=...)`` — ONE distributed pass for all
  missing partitions, not a driver loop of per-partition jobs).
- A partition counts as finished only once its ``_DONE`` marker
  exists; markers are written AFTER the distributed write returns.
- On resume, partition directories WITHOUT a marker are deleted before
  writing (a crashed run's partial output would otherwise be appended
  to, duplicating rows), then the input is filtered to the missing
  partition values and only those are rewritten.

The partition column must be low-cardinality (dates, shards, key
ranges) — the done-set is a driver-side set of scalar values, and a
hive layout with millions of directories is wrong regardless.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_DONE = "_DONE"


def _part_dirs(path: str, col: str) -> dict[str, str]:
    """Map raw partition-value string -> absolute directory. Hive dir
    names are URI-quoted by the writer (a space becomes ``%20``), so
    the name is UNQUOTED here — the done-set must live in raw value
    space or the resume filter misses encoded partitions and silently
    appends duplicate rows into finished directories (found by
    review: 3-row input became 5 rows after a 'no-op' resume)."""
    from urllib.parse import unquote

    prefix = f"{col}="
    out = {}
    if os.path.isdir(path):
        for name in os.listdir(path):
            full = os.path.join(path, name)
            if name.startswith(prefix) and os.path.isdir(full):
                out[unquote(name[len(prefix):])] = full
    return out


def finished_partitions(path: str, col: str) -> set[str]:
    """Raw partition-value strings with a ``_DONE`` marker."""
    return {v for v, d in _part_dirs(path, col).items()
            if os.path.exists(os.path.join(d, _DONE))}


def write_partitioned(
    ds: rd.Dataset,
    path: str,
    partition_col: str,
    resume: bool = True,
) -> dict:
    """Write ``ds`` hive-partitioned by ``partition_col``; skip
    partitions already marked done. Returns
    ``{"written": [...], "skipped": [...]}`` (raw value strings).

    Hive dirs stringify values, so the done-set comparison happens on
    ``str(value)`` — stable for ints/strings/dates, the sane partition
    key types."""
    done: set[str] = set()
    if resume:
        done = finished_partitions(path, partition_col)
        # clear partial output from a crashed run: dir without marker
        for v, d in _part_dirs(path, partition_col).items():
            if v not in done:
                shutil.rmtree(d)
    elif os.path.isdir(path):
        shutil.rmtree(path)

    if done:
        done_list = sorted(done)

        def keep(t):
            s = pc.cast(t[partition_col], "string")
            return t.filter(pc.invert(
                pc.is_in(s, value_set=pa.array(done_list))))

        todo = ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)
    else:
        todo = ds

    todo.write_parquet(path, partition_cols=[partition_col])

    written = [v for v in _part_dirs(path, partition_col) if v not in done]
    for v, d in _part_dirs(path, partition_col).items():
        if v in written:
            with open(os.path.join(d, _DONE), "w") as f:
                f.write("ok\n")
    return {"written": sorted(written), "skipped": sorted(done)}
