"""CollapsePath — parity with gds.alpha.collapsePath
(alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/walking/CollapsePath.java):
contract A-[r1]->B-[r2]->C path templates into direct A-[new]->C
relationships.

Distributed shape: an edge-edge equi-join on the middle vertex —
bucketed by hash(middle) so each bucket joins locally with a pandas
merge (both sides of a bucket share the same middle-vertex hash)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.shuffle import distinct_rows


def collapse_path(
    edges1: rd.Dataset,
    edges2: rd.Dataset,
    num_buckets: int = 16,
    distinct: bool = True,
) -> rd.Dataset:
    """edges1 (src, dst) ⋈ edges2 (src, dst) on edges1.dst = edges2.src
    → (src, dst). Both inputs need int64 'src'/'dst' columns."""

    def tag(side: int):
        def kernel(t: pa.Table) -> pa.Table:
            key = (t["dst"] if side == 1 else t["src"]).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "src": t["src"], "dst": t["dst"],
                "side": pa.array(np.full(len(t), side, dtype=np.int64)),
                "bucket": pa.array((key % num_buckets).astype(np.int64)),
            })
        return kernel

    both = edges1.map_batches(tag(1), batch_format="pyarrow").union(
        edges2.map_batches(tag(2), batch_format="pyarrow"))

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 1]
        right = group[group["side"] == 2]
        if left.empty or right.empty:
            return pd.DataFrame({"src": np.empty(0, np.int64),
                                 "dst": np.empty(0, np.int64)})
        merged = left.merge(right, left_on="dst", right_on="src",
                            suffixes=("_l", "_r"))
        return pd.DataFrame({"src": merged["src_l"].to_numpy(np.int64),
                             "dst": merged["dst_r"].to_numpy(np.int64)})

    out = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")
    return distinct_rows(out, ["src", "dst"]) if distinct else out