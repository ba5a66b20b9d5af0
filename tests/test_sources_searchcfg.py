"""S3 message/json episode sources and the Q1/Q11 search orchestrator."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest


def _msgs():
    return pd.DataFrame(
        {
            "conversation_id": ["c1", "c1", "c2"],
            "actor": ["Ana Barton", "Eli Vancefield", "Mira Holton"],
            "role": ["user", "assistant", "user"],
            "content": [
                "Ana Barton works for Zorex Corp.",
                "Noted.",
                "Mira Holton lives in Dorville.",
            ],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-02-01"]
            ),
        }
    )


def test_message_episodes_extract(ray_session):
    import ray.data as rd

    from graphiti_ray.sources.episodes import episodes_from_messages
    from graphiti_ray.stages.extract import extract_all

    eps = episodes_from_messages(rd.from_pandas(_msgs()))
    df = eps.to_pandas()
    assert (df["source"] == "message").all()
    assert df["content"].iloc[0] == "Ana Barton(user): Ana Barton works for Zorex Corp."
    # the standard extractor runs unchanged on message episodes
    ext = extract_all(eps, concurrency=2).to_pandas()
    edges = ext[ext["kind"] == "edge"]
    assert "WORKS_FOR" in set(edges["name"])
    assert "LIVES_IN" in set(edges["name"])


def test_json_episodes_deterministic(ray_session):
    import ray.data as rd

    from graphiti_ray.sources.episodes import episodes_from_json

    df = pd.DataFrame(
        {
            "pid": [1, 2],
            "grp": ["shop", "shop"],
            "payload": ['{"b": 2, "a": 1}', '{"x": [3, 4]}'],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        }
    )
    eps = episodes_from_json(
        rd.from_pandas(df), group_col="grp", id_col="pid",
        payload_col="payload", ts_col="ts",
    ).to_pandas()
    # canonical sorted-keys serialization
    assert eps["content"].iloc[0] == '{"a": 1, "b": 2}'
    assert (eps["source"] == "json").all()
    # rerun -> identical uuids (content-hash identity)
    eps2 = episodes_from_json(
        rd.from_pandas(df), group_col="grp", id_col="pid",
        payload_col="payload", ts_col="ts",
    ).to_pandas()
    assert eps["episode_uuid"].tolist() == eps2["episode_uuid"].tolist()


@pytest.fixture(scope="module")
def kg(ray_session):
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.synth import pages_dataset

    return build_kg(pages_dataset(200), now=datetime(2026, 1, 1), concurrency=2)


def test_hybrid_search_orchestrator(kg):
    from graphiti_ray.search.config import (
        COMBINED_HYBRID_SEARCH_CROSS_ENCODER,
        NODE_HYBRID_SEARCH_MMR,
        RECIPES,
        LaneConfig,
        SearchConfig,
        hybrid_search,
    )
    from graphiti_ray.stages.communities import build_communities

    nodes = kg.nodes.materialize()
    edges = kg.edges.materialize()
    comms = build_communities(kg.nodes, kg.edges).materialize()

    # empty query short-circuits
    out = hybrid_search("", nodes_ds=nodes, edges_ds=edges)
    assert out == {"nodes": [], "edges": [], "communities": []}

    surname = next(
        n for n in nodes.to_pandas()["name"] if " " in n
    ).split()[-1]
    cfg = SearchConfig(community_config=LaneConfig())
    out = hybrid_search(
        surname, nodes_ds=nodes, edges_ds=edges, communities_ds=comms, config=cfg
    )
    assert out["nodes"] and out["edges"]
    assert len(out["nodes"]) <= cfg.node_config.limit

    # MMR and cross-encoder recipes return permutations of candidates
    out_mmr = hybrid_search(surname, nodes_ds=nodes, config=NODE_HYBRID_SEARCH_MMR)
    assert out_mmr["nodes"]
    out_ce = hybrid_search(
        surname, nodes_ds=nodes, edges_ds=edges,
        config=COMBINED_HYBRID_SEARCH_CROSS_ENCODER,
    )
    assert out_ce["nodes"] and out_ce["edges"]
    assert "COMBINED_HYBRID_SEARCH_RRF" in RECIPES
