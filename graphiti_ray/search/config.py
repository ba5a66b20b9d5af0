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


# Prebuilt recipes — full parity with the reference's 16
# (search_config_recipes.py:31-202). Lane x reranker matrix: combined /
# node / edge / community, each with its reference reranker set.


def _cfg(node=None, edge=None, community=None) -> SearchConfig:
    return SearchConfig(
        node_config=node, edge_config=edge, community_config=community
    )


COMBINED_HYBRID_SEARCH_RRF = SearchConfig(
    community_config=LaneConfig()
)
COMBINED_HYBRID_SEARCH_MMR = _cfg(
    node=LaneConfig(reranker=Reranker.mmr),
    edge=LaneConfig(reranker=Reranker.mmr),
    community=LaneConfig(reranker=Reranker.mmr),
)
COMBINED_HYBRID_SEARCH_CROSS_ENCODER = _cfg(
    node=LaneConfig(reranker=Reranker.cross_encoder),
    edge=LaneConfig(reranker=Reranker.cross_encoder),
    community=LaneConfig(reranker=Reranker.cross_encoder),
)
NODE_HYBRID_SEARCH_RRF = _cfg(node=LaneConfig())
NODE_HYBRID_SEARCH_MMR = _cfg(node=LaneConfig(reranker=Reranker.mmr))
NODE_HYBRID_SEARCH_NODE_DISTANCE = _cfg(
    node=LaneConfig(reranker=Reranker.node_distance)
)
NODE_HYBRID_SEARCH_EPISODE_MENTIONS = _cfg(
    node=LaneConfig(reranker=Reranker.episode_mentions)
)
NODE_HYBRID_SEARCH_CROSS_ENCODER = _cfg(
    node=LaneConfig(reranker=Reranker.cross_encoder)
)
EDGE_HYBRID_SEARCH_RRF = _cfg(edge=LaneConfig())
EDGE_HYBRID_SEARCH_MMR = _cfg(edge=LaneConfig(reranker=Reranker.mmr))
EDGE_HYBRID_SEARCH_NODE_DISTANCE = _cfg(
    edge=LaneConfig(reranker=Reranker.node_distance)
)
EDGE_HYBRID_SEARCH_EPISODE_MENTIONS = _cfg(
    edge=LaneConfig(reranker=Reranker.episode_mentions)
)
EDGE_HYBRID_SEARCH_CROSS_ENCODER = _cfg(
    edge=LaneConfig(reranker=Reranker.cross_encoder)
)
COMMUNITY_HYBRID_SEARCH_RRF = _cfg(community=LaneConfig())
COMMUNITY_HYBRID_SEARCH_MMR = _cfg(community=LaneConfig(reranker=Reranker.mmr))
COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER = _cfg(
    community=LaneConfig(reranker=Reranker.cross_encoder)
)

RECIPES = {
    "COMBINED_HYBRID_SEARCH_RRF": COMBINED_HYBRID_SEARCH_RRF,
    "COMBINED_HYBRID_SEARCH_MMR": COMBINED_HYBRID_SEARCH_MMR,
    "COMBINED_HYBRID_SEARCH_CROSS_ENCODER": COMBINED_HYBRID_SEARCH_CROSS_ENCODER,
    "NODE_HYBRID_SEARCH_RRF": NODE_HYBRID_SEARCH_RRF,
    "NODE_HYBRID_SEARCH_MMR": NODE_HYBRID_SEARCH_MMR,
    "NODE_HYBRID_SEARCH_NODE_DISTANCE": NODE_HYBRID_SEARCH_NODE_DISTANCE,
    "NODE_HYBRID_SEARCH_EPISODE_MENTIONS": NODE_HYBRID_SEARCH_EPISODE_MENTIONS,
    "NODE_HYBRID_SEARCH_CROSS_ENCODER": NODE_HYBRID_SEARCH_CROSS_ENCODER,
    "EDGE_HYBRID_SEARCH_RRF": EDGE_HYBRID_SEARCH_RRF,
    "EDGE_HYBRID_SEARCH_MMR": EDGE_HYBRID_SEARCH_MMR,
    "EDGE_HYBRID_SEARCH_NODE_DISTANCE": EDGE_HYBRID_SEARCH_NODE_DISTANCE,
    "EDGE_HYBRID_SEARCH_EPISODE_MENTIONS": EDGE_HYBRID_SEARCH_EPISODE_MENTIONS,
    "EDGE_HYBRID_SEARCH_CROSS_ENCODER": EDGE_HYBRID_SEARCH_CROSS_ENCODER,
    "COMMUNITY_HYBRID_SEARCH_RRF": COMMUNITY_HYBRID_SEARCH_RRF,
    "COMMUNITY_HYBRID_SEARCH_MMR": COMMUNITY_HYBRID_SEARCH_MMR,
    "COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER": COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER,
}


def _candidate_rows(ds, uuids: list[str], cols: list[str], id_col: str = "uuid"):
    """Pull the candidate rows (O(k), post-limit) out of a distributed
    table via a broadcast is_in filter."""
    import pyarrow as pa
    import pyarrow.compute as pc

    vs = pa.array(uuids)
    want = [c for c in cols if c is not None]
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(id_col), value_set=vs)).select(want),
        batch_format="pyarrow",
    ).to_pandas()


def _rerank(uuids: list[str], lane_cfg: LaneConfig, query: str, ds, text_col: str,
            limit: int, *, edges_ds=None, mentions_ds=None,
            center_node_uuid: str | None = None,
            source_col: str | None = None,
            id_col: str = "uuid") -> list[str]:
    """Apply the configured reranker to a fused candidate list.

    ``source_col``: for EDGE candidates, the column holding the node
    uuid that graph-based rerankers (node_distance, episode_mentions)
    score by — the reference reranks edges by their source node
    (search.py edge_search reranker branches)."""
    if not uuids or lane_cfg.reranker == Reranker.rrf:
        return uuids[:limit]

    if lane_cfg.reranker in (Reranker.node_distance, Reranker.episode_mentions):
        if source_col is not None:
            df = _candidate_rows(ds, uuids, [id_col, source_col], id_col)
            node_of = dict(zip(df[id_col], df[source_col]))
        else:
            node_of = {u: u for u in uuids}
        if lane_cfg.reranker == Reranker.node_distance:
            if edges_ds is None or center_node_uuid is None:
                return uuids[:limit]
            from .search import bfs_neighborhood

            hops = bfs_neighborhood(edges_ds, [center_node_uuid])
            inf = float("inf")
            # Tie-break equal distances by the candidate's position in
            # the fused RRF list: the reference's node_distance_reranker
            # uses a stable sort over the fused order (search_utils.py:
            # 758-795), so same-hop candidates keep their fused ranking.
            fused_index = {u: i for i, u in enumerate(uuids)}
            ranked = sorted(
                (u for u in uuids if node_of.get(u) != center_node_uuid),
                key=lambda u: (hops.get(node_of.get(u), inf), fused_index[u]),
            )
            return ranked[:limit]
        # episode_mentions: degree of the candidate's node in MENTIONS
        if mentions_ds is None:
            return uuids[:limit]
        import pyarrow as pa
        import pyarrow.compute as pc

        nodes = pa.array(sorted({str(v) for v in node_of.values()}))
        m = mentions_ds.map_batches(
            lambda t: t.filter(
                pc.is_in(t.column("entity_uuid"), value_set=nodes)
            ).select(["entity_uuid"]),
            batch_format="pyarrow",
        ).to_pandas()
        counts = m["entity_uuid"].value_counts().to_dict()
        from .rank import episode_mentions_rank

        scored = episode_mentions_rank(
            uuids, {u: counts.get(node_of.get(u), 0) for u in uuids}
        )
        return scored[:limit]

    df = _candidate_rows(ds, uuids, [id_col, text_col], id_col)
    texts = dict(zip(df[id_col], df[text_col]))
    if lane_cfg.reranker == Reranker.mmr:
        from .rank import maximal_marginal_relevance

        qv = hash_embed_texts([query])[0]
        cands = {u: hash_embed_texts([str(texts.get(u, ""))])[0] for u in uuids}
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
    center_node_uuid: str | None = None,
    mentions_ds=None,
) -> dict[str, list[str]]:
    """Q1: run the configured lanes over the distributed KG tables.

    center_node_uuid: required by the *_NODE_DISTANCE recipes (the BFS
    origin); mentions_ds: required by *_EPISODE_MENTIONS (degree
    source). Returns {'nodes': [...], 'edges': [...],
    'communities': [...]}."""
    cfg = config or COMBINED_HYBRID_SEARCH_RRF
    out: dict[str, list[str]] = {"nodes": [], "edges": [], "communities": []}
    if not query.strip():  # empty-query short-circuit (search.py:78-80)
        return out
    if cfg.node_config and nodes_ds is not None:
        fused = S.node_search(nodes_ds, query, limit=cfg.node_config.limit * 2,
                              filters=filters)
        out["nodes"] = _rerank(
            fused, cfg.node_config, query, nodes_ds, "name",
            cfg.node_config.limit, edges_ds=edges_ds, mentions_ds=mentions_ds,
            center_node_uuid=center_node_uuid,
        )
    if cfg.edge_config and edges_ds is not None:
        fused = S.edge_search(edges_ds, query, limit=cfg.edge_config.limit * 2,
                              filters=filters)
        out["edges"] = _rerank(
            fused, cfg.edge_config, query, edges_ds, "fact",
            cfg.edge_config.limit, edges_ds=edges_ds, mentions_ds=mentions_ds,
            center_node_uuid=center_node_uuid,
            source_col="source_node_uuid",
        )
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

        fused = rrf(
            [
                _dedup_keep_best(S._lane_ids(ft, "community_uuid")),
                _dedup_keep_best(S._lane_ids(cos, "community_uuid")),
            ]
        )
        out["communities"] = _rerank(
            fused, cfg.community_config, query, communities_ds,
            "community_name", cfg.community_config.limit,
            id_col="community_uuid",
        )
    return out
