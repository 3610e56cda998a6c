"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().

entry(): flagship pipeline on sf0.001 — derive the supplier co-supply
graph from lineitem, run PageRank + WCC on the superstep engine, return
the joined per-supplier result.

queries()/oracle_sql(): one entry per implemented operator/pipeline
(SURVEY.md §2 + training-data ops); the driver compares each Ray result
against its DuckDB oracle at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMALL = "/root/testdata/sf0.001"


def entry() -> Any:
    import numpy as np
    import pyarrow as pa

    from graph_data_science_ray.entry_queries import _co_supply_graph
    from graph_data_science_ray.pipelines.pagerank import pagerank
    from graph_data_science_ray.pipelines.wcc import wcc

    suppkeys, graph = _co_supply_graph(SF_SMALL)
    ranks = pagerank(graph, tolerance=0.0, max_iterations=20).to_pandas()
    comps = wcc(graph).to_pandas()
    merged = ranks.merge(comps, on="vid")
    merged = merged[merged["vid"].isin(suppkeys)]
    return pa.table({
        "s_suppkey": merged["vid"].to_numpy(dtype=np.int64),
        "rank": merged["rank"].to_numpy(),
        "component": merged["label"].to_numpy(dtype=np.int64),
    })


def queries() -> dict[str, Callable[[str], Any]]:
    from graph_data_science_ray.entry_queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graph_data_science_ray.entry_queries import ORACLE_SQL
    return dict(ORACLE_SQL)
