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


def test_all_sixteen_recipes_run(kg):
    """Full recipe parity with the reference's 16
    (search_config_recipes.py:31-202): every recipe runs through the
    orchestrator and produces results on its configured lanes; the
    graph-based rerankers are checked against their definitions."""
    from graphiti_ray.search.config import (
        NODE_HYBRID_SEARCH_EPISODE_MENTIONS,
        NODE_HYBRID_SEARCH_NODE_DISTANCE,
        RECIPES,
        hybrid_search,
    )
    from graphiti_ray.search.search import bfs_neighborhood
    from graphiti_ray.stages.communities import build_communities

    nodes = kg.nodes.materialize()
    edges = kg.edges.materialize()
    mentions = kg.mentions.materialize()
    comms = build_communities(kg.nodes, kg.edges).materialize()
    ndf = nodes.to_pandas()
    surname = next(n for n in ndf["name"] if " " in n).split()[-1]
    center = ndf["uuid"].iloc[0]
    comm_word = comms.to_pandas()["community_name"].iloc[0].split()[0]

    assert len(RECIPES) == 16
    for name, cfg in RECIPES.items():
        q = comm_word if name.startswith("COMMUNITY") else surname
        out = hybrid_search(
            q, nodes_ds=nodes, edges_ds=edges, communities_ds=comms,
            config=cfg, center_node_uuid=center, mentions_ds=mentions,
        )
        if name.startswith(("NODE", "COMBINED")):
            assert out["nodes"], f"{name}: empty nodes lane"
        if name.startswith(("EDGE", "COMBINED")):
            assert out["edges"], f"{name}: empty edges lane"
        if name.startswith("COMMUNITY"):
            assert out["communities"], f"{name}: empty communities lane"

    # node_distance: result order follows BFS hop count from center
    got = hybrid_search(
        surname, nodes_ds=nodes, edges_ds=edges,
        config=NODE_HYBRID_SEARCH_NODE_DISTANCE, center_node_uuid=center,
    )["nodes"]
    hops = bfs_neighborhood(edges, [center])
    inf = float("inf")
    dists = [hops.get(u, inf) for u in got]
    assert dists == sorted(dists)
    assert center not in got  # reference filters the center itself

    # episode_mentions: result order follows MENTIONS degree desc
    got = hybrid_search(
        surname, nodes_ds=nodes, config=NODE_HYBRID_SEARCH_EPISODE_MENTIONS,
        mentions_ds=mentions,
    )["nodes"]
    counts = mentions.to_pandas()["entity_uuid"].value_counts().to_dict()
    degs = [counts.get(u, 0) for u in got]
    assert degs == sorted(degs, reverse=True)


def test_read_pages_any_formats_agree(ray_session, tmp_path):
    """The same corpus round-tripped through parquet, JSONL and CSV
    reads back byte-identical after normalization, and the JSONL path
    feeds build_kg to the same triples as the parquet path."""
    import pandas as pd

    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.formats import read_pages_any
    from graphiti_ray.sources.pages import synthetic_pages

    pages = synthetic_pages("/root/testdata/sf0.001")
    df = pages.to_pandas()

    pq_path = str(tmp_path / "pages.parquet")
    df.to_parquet(pq_path, index=False)

    jdf = df.copy()
    jdf["warc_ts"] = jdf["warc_ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    jdf["html"] = [None if h is None else h.decode("utf-8") for h in jdf["html"]]
    jl_path = str(tmp_path / "pages.jsonl")
    jdf.to_json(jl_path, orient="records", lines=True)
    csv_path = str(tmp_path / "pages.csv")
    jdf.to_csv(csv_path, index=False)

    def canon(ds):
        out = ds.to_pandas().sort_values("url").reset_index(drop=True)
        return out[sorted(out.columns)]

    base = canon(read_pages_any(pq_path))
    for p in (jl_path, csv_path):
        got = canon(read_pages_any(p))
        assert list(got.dtypes) == list(base.dtypes), p
        pd.testing.assert_frame_equal(got, base), p

    # e2e: format does not leak into extraction results (default
    # concurrency=4 on the 4-CPU test session also pins the
    # autoscaling-pool deadlock fix in stages/extract.extract_all)
    t_pq = build_kg(read_pages_any(pq_path)).triples.to_pandas()
    t_jl = build_kg(read_pages_any(jl_path)).triples.to_pandas()
    assert len(t_pq) > 0
    key = sorted(t_pq.columns)
    pd.testing.assert_frame_equal(
        t_pq[key].sort_values(key).reset_index(drop=True),
        t_jl[key].sort_values(key).reset_index(drop=True),
    )
