"""Search-layer (Q1-Q12) and community (D9) tests.

Rerankers are pinned against the reference formulas
(search_utils.py:744-838); label propagation against hand-computed
clusters; the distributed lanes against the KG built from the synthetic
corpus (known entities)."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest


@pytest.fixture(scope="module")
def kg(ray_session):
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.synth import pages_dataset

    return build_kg(pages_dataset(300), now=datetime(2026, 1, 1), concurrency=2)


# ------------------------------------------------------------- rerankers

def test_rrf_matches_reference_formula():
    from graphiti_ray.search.rank import rrf

    # reference: score += 1/(rank + rank_const), rank_const=1
    out = rrf([["a", "b", "c"], ["b", "a"]])
    # a: 1/1 + 1/2 = 1.5 ; b: 1/2 + 1/1 = 1.5 ; c: 1/3
    # tie a vs b -> uuid order
    assert out == ["a", "b", "c"]


def test_mmr_prefers_diversity_and_keeps_order():
    from graphiti_ray.search.rank import maximal_marginal_relevance

    q = np.array([1.0, 0.0])
    cands = {
        "rel1": np.array([1.0, 0.0]),
        "rel1_dup": np.array([0.999, 0.0447]),
        "diverse": np.array([0.6, 0.8]),
    }
    cands = {k: v / np.linalg.norm(v) for k, v in cands.items()}
    out = maximal_marginal_relevance(q, cands)
    assert out[0] == "rel1"
    # the near-duplicate of the first pick is penalized below the
    # diverse candidate (the reference's list(set()) bug would
    # scramble this order; SURVEY.md Q8)
    assert out[1] == "diverse"
    assert len(out) == 3


def test_node_distance_scores_bfs():
    from graphiti_ray.search.rank import node_distance_scores

    adj = {"a": {"b"}, "b": {"a", "c"}, "c": {"b", "d"}, "d": {"c"}}
    s = node_distance_scores(["a", "b", "c", "d", "zz"], "a", adj)
    assert s["a"] == 1.0 and s["b"] == 1.0 and s["c"] == 0.5
    assert s["d"] == pytest.approx(1 / 3)
    assert s["zz"] == 0.0


def test_episode_mentions_rank():
    from graphiti_ray.search.rank import episode_mentions_rank

    assert episode_mentions_rank(["x", "y", "z"], {"y": 5, "x": 2}) == ["y", "x", "z"]


# ------------------------------------------------------------- filters

def test_search_filters_and_of_ors(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from graphiti_ray.search import SearchFilters

    t = pa.table(
        {
            "uuid": ["e1", "e2", "e3"],
            "valid_at": pa.array(
                [datetime(2023, 1, 1), datetime(2024, 6, 1), None],
                pa.timestamp("us"),
            ),
        }
    )
    ds = rd.from_arrow(t)
    f = SearchFilters(valid_at=[[(">=", datetime(2024, 1, 1))]])
    got = {r["uuid"] for r in f.apply(ds).take_all()}
    assert got == {"e2"}  # null valid_at excluded, older excluded

    f2 = SearchFilters(
        valid_at=[[("<", datetime(2024, 1, 1)), (">=", datetime(2024, 1, 1))]]
    )
    assert {r["uuid"] for r in f2.apply(ds).take_all()} == {"e1", "e2"}


# ------------------------------------------------------- search lanes

def test_node_search_finds_entity(kg):
    from graphiti_ray.search import node_search

    nodes = kg.nodes.materialize()
    names = {r["uuid"]: r["name"] for r in nodes.take_all()}
    # pick a real surname from the corpus
    surname = next(n for n in names.values() if " " in n).split()[-1]
    got = node_search(nodes, surname, limit=10)
    assert got, "search returned nothing"
    assert any(surname.lower() in names[u].lower() for u in got[:3])


def test_edge_search_and_filters(kg):
    from graphiti_ray.search import SearchFilters, edge_search

    edges = kg.edges.materialize()
    got = edge_search(edges, "works for", limit=5)
    assert len(got) == 5
    # date-filtered search returns a subset
    f = SearchFilters(valid_at=[[(">=", datetime(2024, 1, 1))]])
    got_f = edge_search(edges, "works for", limit=5, filters=f)
    facts = {r["uuid"]: r for r in edges.take_all()}
    for u in got_f:
        assert facts[u]["valid_at"] >= datetime(2024, 1, 1)


def test_bfs_neighborhood(kg):
    from graphiti_ray.search import bfs_neighborhood

    edges = kg.edges.materialize()
    first = edges.take(1)[0]
    hops = bfs_neighborhood(edges, [first["source_node_uuid"]], depth=2)
    assert hops[first["source_node_uuid"]] == 0
    assert hops[first["target_node_uuid"]] == 1
    assert all(d <= 2 for d in hops.values())


# ------------------------------------------------------------ communities

def test_label_propagation_reference_semantics():
    from graphiti_ray.stages.communities import label_propagation

    # two triangles joined by nothing -> two communities
    order = ["a", "b", "c", "x", "y", "z"]
    nbrs = {
        "a": {"b": 1, "c": 1}, "b": {"a": 1, "c": 1}, "c": {"a": 1, "b": 1},
        "x": {"y": 1, "z": 1}, "y": {"x": 1, "z": 1}, "z": {"x": 1, "y": 1},
    }
    lbl = label_propagation(nbrs, order)
    assert lbl["a"] == lbl["b"] == lbl["c"]
    assert lbl["x"] == lbl["y"] == lbl["z"]
    assert lbl["a"] != lbl["x"]


def test_communities_partition_entities(kg):
    from graphiti_ray.stages.communities import build_communities

    df = build_communities(kg.nodes, kg.edges).to_pandas()
    n_entities = kg.nodes.count()
    # every entity lands in exactly one community
    assert len(df) == n_entities
    assert df["entity_uuid"].nunique() == n_entities
    # communities never span group_ids (per-group projection)
    assert (df.groupby("community_uuid")["group_id"].nunique() == 1).all()
    # connected spouses/employers collapse: at least one multi-member
    assert (df["n_members"] > 1).any()
    # deterministic across runs
    df2 = build_communities(kg.nodes, kg.edges).to_pandas()
    a = df.sort_values(["community_uuid", "entity_uuid"]).reset_index(drop=True)
    b = df2.sort_values(["community_uuid", "entity_uuid"]).reset_index(drop=True)
    assert a.equals(b)


def test_tree_summarize_properties():
    from graphiti_ray.stages.communities import SUMMARY_MAX_CHARS, tree_summarize

    # dedupes repeated clauses, bounded length, deterministic
    out = tree_summarize(["Ana Barton", "Ana Barton", "Zorex Corp"])
    assert out == "Ana Barton; Zorex Corp"
    big = tree_summarize([f"member {i}" for i in range(500)])
    assert len(big) <= SUMMARY_MAX_CHARS
    assert tree_summarize([]) == ""
    a = tree_summarize([f"m{i}" for i in range(37)])
    b = tree_summarize([f"m{i}" for i in range(37)])
    assert a == b


def test_communities_hot_group_distributed_path_matches(kg):
    """Forcing every group down the distributed-LP fallback
    (hot_group_rows=0) must reproduce the in-worker path exactly —
    the uuid-label domain is order-isomorphic to the reference's
    index labels, so member sets, names and summaries coincide."""
    from graphiti_ray.stages.communities import build_communities

    base = (
        build_communities(kg.nodes, kg.edges)
        .to_pandas()
        .sort_values(["community_uuid", "entity_uuid"])
        .reset_index(drop=True)
    )
    forced = (
        build_communities(kg.nodes, kg.edges, hot_group_rows=0)
        .to_pandas()
        .sort_values(["community_uuid", "entity_uuid"])
        .reset_index(drop=True)
    )
    assert len(forced) == len(base) > 0
    assert forced.equals(base)


def test_update_communities_incremental_fold(ray_session):
    """D10: the batch analog of update_community
    (community_operations.py:240-325). Hand-built graph:
    C1={a,b,c}, C2={d,e}; new entities x (nbrs a,b -> C1), y (nbrs
    c,d,e -> C2 by 2-vs-1 plurality), t (nbrs a,d -> 1-1 tie ->
    smallest community_name), z (no community-bearing neighbor ->
    unassigned), and w already a member -> untouched."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from graphiti_ray.stages.communities import update_communities

    def mem_rows(cu, ents, name, summary):
        return [
            {
                "community_uuid": cu,
                "entity_uuid": u,
                "group_id": "g",
                "community_name": name,
                "summary": summary,
                "n_members": len(ents),
            }
            for u in ents
        ]

    membership = rd.from_pandas(
        pd.DataFrame(
            mem_rows("c1", ["a", "b", "c"], "Ana community", "Ana; Bob; Cy")
            + mem_rows("c2", ["d", "e"], "Dee community", "Dee; Eve")
            + mem_rows("c9", ["w"], "Wim community", "Wim")
        )
    )
    new_nodes = rd.from_pandas(
        pd.DataFrame(
            {
                "uuid": ["x", "y", "t", "z", "w"],
                "group_id": ["g"] * 5,
                "name": ["Xen", "Yul", "Tam", "Zed", "Wim"],
            }
        )
    )
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "source_node_uuid": ["x", "x", "c", "y", "y", "t", "t", "z"],
                "target_node_uuid": ["a", "b", "y", "d", "e", "a", "d", "q"],
            }
        )
    )
    out = (
        update_communities(membership, new_nodes, edges)
        .to_pandas()
        .sort_values(["community_uuid", "entity_uuid"])
        .reset_index(drop=True)
    )
    got = out.set_index("entity_uuid")["community_uuid"].to_dict()
    assert got["x"] == "c1"          # unanimous neighbors
    assert got["y"] == "c2"          # 2-vs-1 plurality
    assert got["t"] == "c1"          # tie -> smallest community_name
    assert "z" not in got            # no community-bearing neighbor
    assert got["w"] == "c9"          # already a member: untouched
    # community identity preserved; counts and summaries folded
    c1 = out[out["community_uuid"] == "c1"]
    assert set(c1["entity_uuid"]) == {"a", "b", "c", "t", "x"}
    assert (c1["n_members"] == 5).all()
    assert (c1["community_name"] == "Ana community").all()
    assert c1["summary"].iloc[0] == "Ana; Bob; Cy; Tam; Xen"
    # untouched community rows stream through byte-identical
    c9 = out[out["community_uuid"] == "c9"]
    assert c9["summary"].iloc[0] == "Wim" and (c9["n_members"] == 1).all()
    # idempotent: folding the same batch again changes nothing
    again = (
        update_communities(rd.from_pandas(out), new_nodes, edges)
        .to_pandas()
        .sort_values(["community_uuid", "entity_uuid"])
        .reset_index(drop=True)
    )
    assert again.equals(out)


def test_build_communities_group_ids_filter(kg):
    """group_ids restricts clustering to the listed partitions
    (graphiti.py:606-613) and matches the full run's rows for them."""
    from graphiti_ray.stages.communities import build_communities

    full = build_communities(kg.nodes, kg.edges).to_pandas()
    grps = sorted(full["group_id"].unique())
    assert len(grps) >= 2
    pick = grps[:2]
    sub = build_communities(kg.nodes, kg.edges, group_ids=pick).to_pandas()
    assert set(sub["group_id"]) == set(pick)
    a = (full[full["group_id"].isin(pick)]
         .sort_values(["community_uuid", "entity_uuid"]).reset_index(drop=True))
    b = sub.sort_values(["community_uuid", "entity_uuid"]).reset_index(drop=True)
    assert b.equals(a)
