"""Per-stage resource tags for heterogeneous clusters (r5).

On a single node Ray Data's default — 1 CPU per map_batches task — is
right for every kernel in this repo: they are single-threaded
NumPy/Arrow (Ray workers run with OMP/BLAS threads pinned to 1). On a
multi-node cluster an operator may want to resize specific stages —
give the matmul-heavy ANN scorers 2 CPUs on big-BLAS nodes, or run the
trivially cheap text kernels at fractional CPUs to pack more tasks per
node. ``GRAFT_STAGE_CPUS`` overrides per-stage defaults without code
changes, e.g.::

    GRAFT_STAGE_CPUS="ann=2,text=0.5,minhash=0.5"

Stage names threaded through the heavy map_batches call sites:
``ann`` (brute/IVF cosine scorers), ``minhash`` / ``simhash``
(signature kernels), ``text`` (language-ID), ``multimodal``
(decode/stats actor pools).
"""

from __future__ import annotations

import os

_CACHE: dict[str, dict[str, float]] = {}


def _parse(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for item in spec.split(","):
        if "=" in item:
            k, v = item.split("=", 1)
            try:
                out[k.strip()] = float(v)
            except ValueError:
                continue
    return out


def stage_cpus(stage: str, default: float = 1.0) -> float:
    """CPU tag for a named heavy stage; env-overridable per deployment."""
    spec = os.environ.get("GRAFT_STAGE_CPUS", "")
    if spec not in _CACHE:
        _CACHE[spec] = _parse(spec)
    return _CACHE[spec].get(stage, default)
