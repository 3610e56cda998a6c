"""graph_data_science_ray — a Ray-Data-native link-graph analytics engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference `frank-zsy/graph-data-science`
(Neo4j OpenGDS ~2.1-dev): graph construction from Parquet tables of
source-code repositories, iterative PageRank / WCC / Label Propagation /
Triangle Count expressed as gather-scatter supersteps over hash-partitioned
CSR edge blocks held by stateful Ray actor pools, plus the relational /
training-data operators (dedup, similarity search, text analysis) a
100 TB pipeline needs.

Layout:
  sources/    graph construction: repo-table synthesis, edge derivation,
              graph build (vertices/edges/degrees/partitioned blocks), fixtures
  state/      CSR block layout, checkpoint/lineage manifests
  stages/     the superstep engine (PartitionWorker actors, VertexProgram)
  pipelines/  algorithms: pagerank, wcc, labelprop, triangles, degree, ...
  functions/  scalar/vector kernels: similarity, scalers, text, dedup, ann
  oracle.py   single-process NumPy oracle implementing the reference
              semantics verbatim (test cross-check only)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (avoids importing ray at package import time)."""
    surface = {
        "PartitionedGraph": ("graph_data_science_ray.stages.superstep",
                             "PartitionedGraph"),
        "SuperstepEngine": ("graph_data_science_ray.stages.superstep",
                            "SuperstepEngine"),
        "GraphCatalog": ("graph_data_science_ray.catalog", "GraphCatalog"),
        "pagerank": ("graph_data_science_ray.pipelines.pagerank", "pagerank"),
        "wcc": ("graph_data_science_ray.pipelines.wcc", "wcc"),
        "label_propagation": ("graph_data_science_ray.pipelines.labelprop",
                              "label_propagation"),
        "triangle_count": ("graph_data_science_ray.pipelines.triangles",
                           "triangle_count"),
        "louvain": ("graph_data_science_ray.pipelines.louvain", "louvain"),
        "build_graph_from_repos": (
            "graph_data_science_ray.pipelines.graph_pipeline",
            "build_graph_from_repos"),
        "triangle_stream": ("graph_data_science_ray.pipelines.triangles",
                            "triangle_stream"),
        "node_similarity": (
            "graph_data_science_ray.pipelines.similarity_graph",
            "node_similarity"),
        "TerminationFlag": ("graph_data_science_ray.stages.superstep",
                            "TerminationFlag"),
        "ProgressTracker": ("graph_data_science_ray.stages.superstep",
                            "ProgressTracker"),
        "estimate": ("graph_data_science_ray.estimation", "estimate"),
        "check_fits": ("graph_data_science_ray.estimation", "check_fits"),
        "broadcast_join": ("graph_data_science_ray.functions.join",
                           "broadcast_join"),
        "bucket_join": ("graph_data_science_ray.functions.join",
                        "bucket_join"),
        "grouped_topk": ("graph_data_science_ray.functions.relational",
                         "grouped_topk"),
        "group_quantiles": ("graph_data_science_ray.functions.relational",
                            "group_quantiles"),
        "hash_sample": ("graph_data_science_ray.functions.relational",
                        "hash_sample"),
        "kmv_distinct": ("graph_data_science_ray.functions.relational",
                         "kmv_distinct"),
        "band_join_count": ("graph_data_science_ray.functions.relational",
                            "band_join_count"),
        "normalize_text": ("graph_data_science_ray.functions.relational",
                           "normalize_text"),
        "asof_join": ("graph_data_science_ray.functions.temporal",
                      "asof_join"),
        "sliding_window_sum": ("graph_data_science_ray.functions.temporal",
                               "sliding_window_sum"),
        "lag_delta": ("graph_data_science_ray.functions.temporal",
                      "lag_delta"),
        "ntile": ("graph_data_science_ray.functions.relational", "ntile"),
        "global_rank_int": ("graph_data_science_ray.functions.relational",
                            "global_rank_int"),
        "inverted_index": ("graph_data_science_ray.functions.text",
                           "inverted_index"),
        "semi_join": ("graph_data_science_ray.functions.join",
                      "semi_join"),
        "anti_join": ("graph_data_science_ray.functions.join",
                      "anti_join"),
        "pivot_table": ("graph_data_science_ray.functions.olap",
                        "pivot_table"),
        "rollup_sums": ("graph_data_science_ray.functions.olap",
                        "rollup_sums"),
        "intersect_distinct": ("graph_data_science_ray.functions.olap",
                               "intersect_distinct"),
        "except_distinct": ("graph_data_science_ray.functions.olap",
                            "except_distinct"),
        "grouped_running_sum": ("graph_data_science_ray.functions.olap",
                                "grouped_running_sum"),
        "grouped_corr": ("graph_data_science_ray.functions.olap",
                         "grouped_corr"),
        "funnel_counts": ("graph_data_science_ray.functions.temporal",
                          "funnel_counts"),
        "int_field": ("graph_data_science_ray.functions.text",
                      "int_field"),
        "fuzzy_pairs": ("graph_data_science_ray.functions.fuzzy",
                        "fuzzy_pairs"),
        "profile_columns": ("graph_data_science_ray.functions.relational",
                            "profile_columns"),
        "degree_assortativity": (
            "graph_data_science_ray.functions.graph_stats",
            "degree_assortativity"),
        "k_core_bipartite": (
            "graph_data_science_ray.functions.graph_stats",
            "k_core_bipartite"),
        "write_partitioned": ("graph_data_science_ray.sources.sinks",
                              "write_partitioned"),
        "weighted_sample": ("graph_data_science_ray.functions.relational",
                            "weighted_sample"),
        "table_diff": ("graph_data_science_ray.functions.olap",
                       "table_diff"),
        "integer_islands": ("graph_data_science_ray.functions.relational",
                            "integer_islands"),
        "cube_sums": ("graph_data_science_ray.functions.olap",
                      "cube_sums"),
        "grouped_moving_sum": ("graph_data_science_ray.functions.olap",
                               "grouped_moving_sum"),
        "transition_counts": ("graph_data_science_ray.functions.temporal",
                              "transition_counts"),
        "training_data_prep": ("graph_data_science_ray.pipelines.prep",
                               "training_data_prep"),
        "pca_components": ("graph_data_science_ray.functions.pca",
                           "pca_components"),
        "pca_transform": ("graph_data_science_ray.functions.pca",
                          "pca_transform"),
        "broadcast_semi_join": ("graph_data_science_ray.functions.join",
                                "broadcast_semi_join"),
    }
    if name in surface:
        import importlib
        mod, attr = surface[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
