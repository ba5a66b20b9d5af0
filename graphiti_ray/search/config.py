"""Search configuration system (Q11) and the 3-way hybrid orchestrator
(Q1, graphiti_core/search/search.py:61-130).

Mirrors the reference's recipe surface
(search/search_config.py:32-105, search_config_recipes.py:31-202):
per-lane method lists + a reranker enum, with prebuilt recipes. The
orchestrator runs the node / edge / community searches over their
Datasets and fuses per the config; empty queries short-circuit to
empty results (search.py:78-80).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from ..functions.embed import hash_embed_texts
from . import search as S


class SearchMethod(str, Enum):
    bm25 = "bm25"
    cosine_similarity = "cosine_similarity"
    bfs = "breadth_first_search"


class Reranker(str, Enum):
    rrf = "reciprocal_rank_fusion"
    mmr = "maximal_marginal_relevance"
    cross_encoder = "cross_encoder"
    node_distance = "node_distance"
    episode_mentions = "episode_mentions"


@dataclass
class LaneConfig:
    methods: list[SearchMethod] = field(
        default_factory=lambda: [SearchMethod.bm25, SearchMethod.cosine_similarity]
    )
    reranker: Reranker = Reranker.rrf
    limit: int = S.DEFAULT_LIMIT


@dataclass
class SearchConfig:
    node_config: LaneConfig | None = field(default_factory=LaneConfig)
    edge_config: LaneConfig | None = field(default_factory=LaneConfig)
    community_config: LaneConfig | None = None
    limit: int = S.DEFAULT_LIMIT


# Prebuilt recipes (search_config_recipes.py analog)
COMBINED_HYBRID_SEARCH_RRF = SearchConfig()
NODE_HYBRID_SEARCH_RRF = SearchConfig(edge_config=None)
EDGE_HYBRID_SEARCH_RRF = SearchConfig(node_config=None)
NODE_HYBRID_SEARCH_MMR = SearchConfig(
    node_config=LaneConfig(reranker=Reranker.mmr), edge_config=None
)
EDGE_HYBRID_SEARCH_MMR = SearchConfig(
    node_config=None, edge_config=LaneConfig(reranker=Reranker.mmr)
)
COMBINED_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    node_config=LaneConfig(reranker=Reranker.cross_encoder),
    edge_config=LaneConfig(reranker=Reranker.cross_encoder),
)

RECIPES = {
    "COMBINED_HYBRID_SEARCH_RRF": COMBINED_HYBRID_SEARCH_RRF,
    "NODE_HYBRID_SEARCH_RRF": NODE_HYBRID_SEARCH_RRF,
    "EDGE_HYBRID_SEARCH_RRF": EDGE_HYBRID_SEARCH_RRF,
    "NODE_HYBRID_SEARCH_MMR": NODE_HYBRID_SEARCH_MMR,
    "EDGE_HYBRID_SEARCH_MMR": EDGE_HYBRID_SEARCH_MMR,
    "COMBINED_HYBRID_SEARCH_CROSS_ENCODER": COMBINED_HYBRID_SEARCH_CROSS_ENCODER,
}


def _rerank(uuids: list[str], lane_cfg: LaneConfig, query: str, ds, text_col: str,
            limit: int) -> list[str]:
    """Apply the configured reranker to a fused candidate list."""
    if not uuids or lane_cfg.reranker == Reranker.rrf:
        return uuids[:limit]
    import pyarrow as pa
    import pyarrow.compute as pc

    vs = pa.array(uuids)
    sub = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("uuid"), value_set=vs)),
        batch_format="pyarrow",
    )
    df = sub.to_pandas()
    texts = dict(zip(df["uuid"], df[text_col]))
    if lane_cfg.reranker == Reranker.mmr:
        from .rank import maximal_marginal_relevance

        qv = hash_embed_texts([query])[0]
        cands = {u: hash_embed_texts([texts.get(u, "")])[0] for u in uuids}
        return maximal_marginal_relevance(qv, cands)[:limit]
    if lane_cfg.reranker == Reranker.cross_encoder:
        import pyarrow as pa
        import ray.data as rd

        from .rerank_models import cross_encoder_rank

        cand_ds = rd.from_arrow(
            pa.table(
                {
                    "uuid": list(texts.keys()),
                    "passage": [str(v) for v in texts.values()],
                }
            )
        )
        return cross_encoder_rank(cand_ds, query)[:limit]
    return uuids[:limit]


def hybrid_search(
    query: str,
    nodes_ds=None,
    edges_ds=None,
    communities_ds=None,
    config: SearchConfig | None = None,
    filters: S.SearchFilters | None = None,
) -> dict[str, list[str]]:
    """Q1: run the configured lanes over the distributed KG tables.

    Returns {'nodes': [...], 'edges': [...], 'communities': [...]}."""
    cfg = config or COMBINED_HYBRID_SEARCH_RRF
    out: dict[str, list[str]] = {"nodes": [], "edges": [], "communities": []}
    if not query.strip():  # empty-query short-circuit (search.py:78-80)
        return out
    if cfg.node_config and nodes_ds is not None:
        fused = S.node_search(nodes_ds, query, limit=cfg.node_config.limit * 2,
                              filters=filters)
        out["nodes"] = _rerank(fused, cfg.node_config, query, nodes_ds, "name",
                               cfg.node_config.limit)
    if cfg.edge_config and edges_ds is not None:
        fused = S.edge_search(edges_ds, query, limit=cfg.edge_config.limit * 2,
                              filters=filters)
        out["edges"] = _rerank(fused, cfg.edge_config, query, edges_ds, "fact",
                               cfg.edge_config.limit)
    if cfg.community_config and communities_ds is not None:
        ft = S._fulltext_lane(communities_ds, "community_name", "community_uuid",
                              query, cfg.community_config.limit * 2)
        cos = S._cosine_lane(communities_ds, "community_name", "community_uuid",
                             query, cfg.community_config.limit * 2)
        from .rank import rrf

        def _dedup_keep_best(ids: list[str]) -> list[str]:
            # the membership table has one row per MEMBER entity, so a
            # lane surfaces the same community_uuid once per member;
            # keep only its best (first) rank so rrf doesn't sum
            # 1/(rank+1) per duplicate and bias toward large communities
            seen: set[str] = set()
            out_ids: list[str] = []
            for u in ids:
                if u not in seen:
                    seen.add(u)
                    out_ids.append(u)
            return out_ids

        out["communities"] = rrf(
            [
                _dedup_keep_best(S._lane_ids(ft, "community_uuid")),
                _dedup_keep_best(S._lane_ids(cos, "community_uuid")),
            ]
        )[: cfg.community_config.limit]
    return out
