"""Hybrid search layer over the materialized KG tables (SURVEY.md §2.7).

Batch re-expression of graphiti_core/search/: candidate generation is
distributed scoring over the node/edge Datasets (fulltext-lite + cosine
over hash embeddings + BFS), fused with RRF / MMR / node-distance /
mentions rerankers on the small candidate sets, then top-k.
"""

from .search import SearchFilters, bfs_neighborhood, edge_search, node_search

__all__ = ["node_search", "edge_search", "bfs_neighborhood", "SearchFilters"]
