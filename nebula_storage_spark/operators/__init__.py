from .go import (bfs_min_hop, common_neighbors, get_neighbors, get_subgraph,
                 go_1_to_n, go_n_hops, go_stats, go_stats_salted)
from .lookup import lookup
from .scan import scan_edge, scan_vertex
from .fetch import fetch_edges, fetch_vertices
from .agg import stats_task
from .dedup import dedup
from .kv import kv_get, kv_put, kv_remove, kv_scan_prefix
from .index_rebuild import rebuild_index
from .sessionize import sessionize
from .analytics import (connected_components_fixed,
                        connected_components_oracle_sql,
                        pagerank_fixed, pagerank_oracle_sql)

__all__ = [
    "bfs_min_hop", "common_neighbors", "get_neighbors", "get_subgraph", "go_1_to_n",
    "go_n_hops", "go_stats", "go_stats_salted", "lookup", "scan_vertex", "scan_edge",
    "fetch_vertices", "fetch_edges", "stats_task", "dedup",
    "kv_get", "kv_put", "kv_remove", "kv_scan_prefix",
    "rebuild_index", "sessionize", "pagerank_fixed", "pagerank_oracle_sql",
    "connected_components_fixed", "connected_components_oracle_sql",
]
