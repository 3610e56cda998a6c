"""Memory-bandwidth envelope probe for scaling-efficiency context.

Fixed TOTAL work (STREAM-style triad-ish passes: y = x + y then sum),
split across N taskset-pinned worker processes. Reports aggregate GB/s
at each N and pairwise scaling efficiencies. The superstep engine's
hot kernels (gather + segmented reduce) are streaming passes, so the
engine's N->4N efficiency on a single box is bounded by THIS curve,
not by 1.0 — a real N->4N cluster adds memory systems with the nodes.

Usage: python tools/membw_probe.py [N,N,...]   (default 4,8,16,32)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ARRAY_MB = 128
TOTAL_PASSES = 256  # total work, split across workers


def worker(cpu_list: str, passes: int) -> subprocess.Popen:
    code = (
        "import numpy as np, time, sys\n"
        f"n = {ARRAY_MB} * (1 << 20) // 8\n"
        "x = np.ones(n); y = np.zeros(n)\n"
        "t0 = time.perf_counter()\n"
        f"for _ in range({passes}):\n"
        "    np.add(x, y, out=y)\n"
        "    s = float(y.sum())\n"
        "print(time.perf_counter() - t0)\n"
    )
    return subprocess.Popen(
        ["/usr/bin/taskset", "-c", cpu_list, sys.executable, "-c", code],
        stdout=subprocess.PIPE, text=True)


def measure(n_procs: int) -> float:
    """Aggregate GB/s moved (3 array touches per pass: read x, read y,
    write y, plus the sum read = 4 × ARRAY_MB per pass)."""
    per = TOTAL_PASSES // n_procs
    procs = [worker(str(i), per) for i in range(n_procs)]
    walls = [float(p.communicate()[0].strip().splitlines()[-1])
             for p in procs]
    wall = max(walls)
    bytes_total = 4 * ARRAY_MB * (1 << 20) * per * n_procs
    return bytes_total / wall / 1e9


def main() -> None:
    levels = [int(c) for c in
              (sys.argv[1] if len(sys.argv) > 1 else "4,8,16,32").split(",")]
    out = {"metric": "membw_gbps", "array_mb": ARRAY_MB,
           "total_passes": TOTAL_PASSES, "runs": {}, "pairs": {}}
    for n in levels:
        gbps = measure(n)
        out["runs"][n] = round(gbps, 1)
    for a, b in zip(levels, levels[1:]):
        out["pairs"][f"{a}->{b}"] = round(
            (out["runs"][b] / out["runs"][a]) / (b / a), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
