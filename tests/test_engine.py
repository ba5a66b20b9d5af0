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


def test_engine_build_indices_and_constraints(ray_session, tmp_path):
    """The index-DDL analog (graph_data_operations.py:31-92): persisted
    BM25 indices over edge facts and node names, plus the IVF vector
    index when embeddings are present; indexed queries answer from the
    partitioned artifacts."""
    from datetime import datetime

    import numpy as np
    import pyarrow as pa

    from graphiti_ray.engine import GraphitiRay
    from graphiti_ray.search.index import bm25_search_indexed
    from graphiti_ray.search.vindex import knn_search_indexed
    from graphiti_ray.synth import pages_dataset

    g = GraphitiRay(now=datetime(2026, 1, 1), concurrency=2, embed=True)
    kg = g.build(pages_dataset(120))
    out = g.build_indices_and_constraints(str(tmp_path / "idx"))
    assert set(out) == {"edge_facts", "node_names", "node_vectors"}
    assert out["edge_facts"]["n_docs"] == kg.edges.count()

    hits = bm25_search_indexed(
        str(tmp_path / "idx" / "edge_facts"), "works for", limit=5
    ).to_pandas()
    assert len(hits) == 5
    edge_uuids = set(kg.edges.to_pandas()["uuid"])
    assert set(hits["id"]) <= edge_uuids

    # vector search over string node uuids: nearest neighbor of a
    # node's own embedding is a node with an identical/close name
    nodes = kg.nodes.to_pandas()
    qrow = nodes.iloc[0]
    qmat = np.array([np.asarray(qrow["name_embedding"])], dtype=np.float64)
    nn = knn_search_indexed(
        str(tmp_path / "idx" / "node_vectors"), [qrow["uuid"]], qmat, nprobe=16, k=3
    ).to_pandas()
    assert len(nn) == 3
    assert qrow["uuid"] not in set(nn["neighbor_id"])  # self excluded
    assert set(nn["neighbor_id"]) <= set(nodes["uuid"])


def test_engine_add_triplet_resolves_merges_and_sweeps(ray_session):
    """add_triplet (graphiti.py:723-757): endpoints resolve against the
    existing graph, identical facts fold provenance, and a later
    contradicting exclusive fact invalidates the stored edge."""
    from datetime import datetime

    from graphiti_ray.engine import GraphitiRay
    from graphiti_ray.synth import pages_dataset

    g = GraphitiRay(now=datetime(2026, 1, 1), concurrency=2)
    kg0 = g.build(pages_dataset(80))
    nodes0 = kg0.nodes.to_pandas()
    n_nodes0 = len(nodes0)
    person = next(n for n in nodes0["name"] if " " in n)
    prow = nodes0[nodes0["name"] == person].iloc[0]
    grp = prow["group_id"]

    # existing-subject + brand-new object: subject must MERGE into the
    # existing canonical node (same uuid), object is one new node
    kg1 = g.add_triplet(
        person, "WORKS_FOR", "Novel Labs",
        fact=f"{person} works for Novel Labs.",
        group_id=grp, valid_at=datetime(2025, 6, 1),
    )
    nodes1 = kg1.nodes.to_pandas()
    assert len(nodes1) == n_nodes0 + 1
    assert nodes1[nodes1["name"] == person].iloc[0]["uuid"] == prow["uuid"]
    new_edge = kg1.edges.to_pandas().query(
        "name == 'WORKS_FOR' and fact.str.contains('Novel Labs')"
    )
    assert len(new_edge) == 1
    assert new_edge.iloc[0]["source_node_uuid"] == prow["uuid"]

    # identical fact again: provenance folds, no second edge row
    kg2 = g.add_triplets(kg1.triples.limit(0))  # empty batch: no-op
    assert kg2.edges.count() == kg1.edges.count()
    import pandas as pd
    import ray.data as rd

    dup = rd.from_pandas(pd.DataFrame({
        "group_id": [grp], "subj": [person], "pred": ["WORKS_FOR"],
        "obj": ["Novel Labs"], "fact": [f"{person} works for Novel Labs."],
        "valid_at": [datetime(2025, 6, 1)],
    }))
    kg3 = g.add_triplets(dup)
    e3 = kg3.edges.to_pandas().query(
        "name == 'WORKS_FOR' and fact.str.contains('Novel Labs')"
    )
    assert len(e3) == 1  # deduped into one canonical edge

    # later contradicting exclusive fact invalidates the stored one
    kg4 = g.add_triplet(
        person, "WORKS_FOR", "Other Org",
        fact=f"{person} works for Other Org.",
        group_id=grp, valid_at=datetime(2025, 9, 1),
    )
    e4 = kg4.edges.to_pandas()
    old = e4.query("fact.str.contains('Novel Labs')").iloc[0]
    assert old["invalid_at"] == pd.Timestamp(2025, 9, 1)
    assert pd.notna(old["expired_at"])
