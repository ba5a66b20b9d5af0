"""GraphitiRay facade: the reference-shaped API surface end-to-end."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest


def test_engine_full_surface(ray_session, tmp_path):
    from graphiti_ray.engine import GraphitiRay
    from graphiti_ray.synth import pages_dataset

    g = GraphitiRay(now=datetime(2026, 1, 1), concurrency=2)
    with pytest.raises(RuntimeError):
        g.search_nodes("anything")

    kg = g.build(pages_dataset(150))
    assert kg.triples.count() > 0

    # search surfaces
    names = kg.nodes.to_pandas()["name"]
    surname = next(n for n in names if " " in n).split()[-1]
    assert g.search_nodes(surname)
    assert g.search_edges("works for")
    out = g.search(surname)
    assert out["nodes"]

    # context windows / communities / summaries
    assert g.episode_windows().count() == kg.episodes.count()
    comms = g.build_communities().to_pandas()
    assert len(comms) == kg.nodes.count()
    assert g.summaries().count() == kg.nodes.count()

    # provenance + cascade
    ep = kg.edges.to_pandas().iloc[0]["episodes"][0]
    assert g.get_by_episode(ep)["edges"].count() >= 1
    after = g.remove_episode(ep)
    assert ep not in set(after["episodes"].to_pandas()["episode_uuid"])

    # persist with lineage
    res = g.build_to_dir(pages_dataset(60), str(tmp_path / "kg"), resume=False)
    assert res["partitions_processed"]


def test_engine_from_message_episodes_with_injected_client(ray_session):
    import ray.data as rd

    from graphiti_ray.engine import GraphitiRay
    from graphiti_ray.functions.clients import DeterministicExtractorClient
    from graphiti_ray.sources.episodes import episodes_from_messages

    msgs = pd.DataFrame(
        {
            "conversation_id": ["c1", "c1"],
            "actor": ["Ana Barton", "Eli Vancefield"],
            "role": ["user", "user"],
            "content": [
                "Ana Barton works for Zorex Corp.",
                "Eli Vancefield lives in Dorville.",
            ],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        }
    )
    g = GraphitiRay(concurrency=2, extractor_factory=DeterministicExtractorClient)
    kg = g.build_from_episodes(episodes_from_messages(rd.from_pandas(msgs)))
    preds = set(kg.triples.to_pandas()["pred"])
    assert {"WORKS_FOR", "LIVES_IN"} <= preds
