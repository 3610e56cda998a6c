"""Property scalers — parity with the reference's ScaleProperties
(algo-common/src/main/java/org/neo4j/gds/scaling/ScalarScaler.java and
variants: MinMax, Mean, Max, Log, StdScore, L1Norm, L2Norm).

Two-phase Ray Data shape: one streaming aggregate pass for the global
statistics, then a vectorized map_batches transform. Aggregates use
per-batch partials (no shuffle of the raw rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _stats(ds: rd.Dataset, col: str) -> dict:
    s = {"min": np.inf, "max": -np.inf, "sum": 0.0, "sumsq": 0.0,
         "abssum": 0.0, "count": 0}
    for batch in ds.select_columns([col]).iter_batches(
            batch_size=1 << 18, batch_format="pyarrow"):
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(v) == 0:
            continue
        s["min"] = min(s["min"], float(v.min()))
        s["max"] = max(s["max"], float(v.max()))
        s["sum"] += float(v.sum())
        s["sumsq"] += float((v * v).sum())
        s["abssum"] += float(np.abs(v).sum())
        s["count"] += len(v)
    return s


def scale(ds: rd.Dataset, col: str, method: str,
          out_col: str | None = None) -> rd.Dataset:
    """method ∈ minmax | mean | max | log | stdscore | l1 | l2.

    Semantics follow the reference scalers: minmax → (v-min)/(max-min);
    mean → (v-avg)/(max-min); max → v/|max|; log → ln(v); stdscore →
    (v-avg)/std; l1 → v/Σ|v|; l2 → v/√Σv². Degenerate denominators → 0
    (ScalarScaler.java zero-divide guards)."""
    out_col = out_col or f"{col}_scaled"
    if method != "log":
        st = _stats(ds, col)
        n = max(st["count"], 1)
        avg = st["sum"] / n
        rng = st["max"] - st["min"]
        std = float(np.sqrt(max(st["sumsq"] / n - avg * avg, 0.0)))

    def kernel(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if method == "minmax":
            out = (v - st["min"]) / rng if rng != 0 else np.zeros_like(v)
        elif method == "mean":
            out = (v - avg) / rng if rng != 0 else np.zeros_like(v)
        elif method == "max":
            m = max(abs(st["min"]), abs(st["max"]))
            out = v / m if m != 0 else np.zeros_like(v)
        elif method == "log":
            with np.errstate(divide="ignore", invalid="ignore"):
                out = np.log(v)
        elif method == "stdscore":
            out = (v - avg) / std if std != 0 else np.zeros_like(v)
        elif method == "l1":
            out = v / st["abssum"] if st["abssum"] != 0 else np.zeros_like(v)
        elif method == "l2":
            l2 = float(np.sqrt(st["sumsq"]))
            out = v / l2 if l2 != 0 else np.zeros_like(v)
        else:
            raise ValueError(f"unknown scaler {method}")
        return t.append_column(out_col, pa.array(out, type=pa.float64()))

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def one_hot_encode(values: list, available: list) -> list[list[int]]:
    """gds.alpha.ml.oneHotEncoding parity
    (alpha/alpha-proc/.../functions/OneHotEncodingFunc.java): for each
    selected value, a vector over `available` with a 1 at its index."""
    index = {v: i for i, v in enumerate(available)}
    out = []
    for v in values:
        vec = [0] * len(available)
        if v in index:
            vec[index[v]] = 1
        out.append(vec)
    return out
