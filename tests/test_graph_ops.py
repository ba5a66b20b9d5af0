"""S6 lookups and S8 destructive ops over the KG tables."""

from __future__ import annotations

from datetime import datetime

import pytest


@pytest.fixture(scope="module")
def kg(ray_session):
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.synth import pages_dataset

    return build_kg(pages_dataset(200), now=datetime(2026, 1, 1), concurrency=2)


def test_get_by_uuids(kg):
    from graphiti_ray.state.graph_ops import get_by_uuids

    nodes = kg.nodes.to_pandas()
    want = sorted(nodes["uuid"].head(5))
    got = get_by_uuids(kg.nodes, want).to_pandas()
    assert sorted(got["uuid"]) == want


def test_get_by_group_ids_with_cursor_and_limit(kg):
    from graphiti_ray.state.graph_ops import get_by_group_ids

    nodes = kg.nodes.to_pandas()
    grp = nodes["group_id"].iloc[0]
    all_in_group = sorted(nodes[nodes["group_id"] == grp]["uuid"])
    assert len(all_in_group) >= 3
    page1 = get_by_group_ids(kg.nodes, [grp], limit=2).to_pandas()["uuid"].tolist()
    assert page1 == all_in_group[:2]
    page2 = get_by_group_ids(
        kg.nodes, [grp], limit=2, cursor_uuid=page1[-1]
    ).to_pandas()["uuid"].tolist()
    assert page2 == all_in_group[2:4]


def test_remove_episode_cascade(kg):
    from graphiti_ray.state.graph_ops import remove_episode

    edges = kg.edges.to_pandas()
    # pick an episode that is the sole provenance of some edge
    solo = None
    for r in edges.itertuples(index=False):
        if len(r.episodes) == 1:
            solo = r.episodes[0]
            sole_edge = r.uuid
            break
    assert solo is not None
    out = remove_episode(kg, solo)
    eps = out["episodes"].to_pandas()
    assert solo not in set(eps["episode_uuid"])
    men = out["mentions"].to_pandas()
    assert solo not in set(men["episode_uuid"])
    new_edges = out["edges"].to_pandas()
    # the solely-provenanced edge is gone; no surviving edge lists it
    assert sole_edge not in set(new_edges["uuid"])
    assert all(solo not in list(lst) for lst in new_edges["episodes"])
    # node count shrinks or stays (orphans dropped), never grows
    assert out["nodes"].count() <= kg.nodes.count()


def test_delete_group_partitions(tmp_path, ray_session):
    import os

    from graphiti_ray.pipelines.kg import run_kg_to_dir
    from graphiti_ray.state.graph_ops import delete_group_partitions
    from graphiti_ray.synth import pages_dataset

    out = str(tmp_path / "kg")
    run_kg_to_dir(pages_dataset(120), out, resume=False, concurrency=2)
    parts = [
        int(p.split("=")[1])
        for p in os.listdir(os.path.join(out, "nodes"))
        if p.startswith("partition_id=")
    ]
    victim = parts[0]
    removed = delete_group_partitions(out, [victim])
    assert removed
    assert not os.path.isdir(os.path.join(out, "nodes", f"partition_id={victim}"))
    # other partitions intact
    for p in parts[1:]:
        assert os.path.isdir(os.path.join(out, "nodes", f"partition_id={p}"))


def test_get_by_episode_provenance(kg):
    from graphiti_ray.state.graph_ops import get_by_episode

    edges = kg.edges.to_pandas()
    ep = edges.iloc[0]["episodes"][0]
    out = get_by_episode(kg, ep)
    got_edges = out["edges"].to_pandas()
    assert all(ep in list(lst) for lst in got_edges["episodes"])
    assert len(got_edges) >= 1
    got_nodes = out["nodes"].to_pandas()
    ment = kg.mentions.to_pandas()
    want_nodes = set(ment[ment["episode_uuid"] == ep]["entity_uuid"])
    assert set(got_nodes["uuid"]) == want_nodes


def test_store_partition_pruned_load(tmp_path, ray_session):
    from graphiti_ray.pipelines.kg import run_kg_to_dir
    from graphiti_ray.state.store import (
        available_partitions,
        load_manifest,
        load_table,
    )
    from graphiti_ray.synth import pages_dataset

    out = str(tmp_path / "kg2")
    run_kg_to_dir(pages_dataset(150), out, resume=False, concurrency=2)
    parts = available_partitions(out, "triples")
    assert parts
    # full load == sum of per-partition loads
    full = load_table(out, "triples").to_pandas()
    subset = load_table(out, "triples", partitions=parts[:1]).to_pandas()
    assert set(subset["partition_id"]) == {parts[0]}
    assert len(subset) == (full["partition_id"] == parts[0]).sum()
    assert str(subset["partition_id"].dtype) == "int32"
    # lineage manifest covers every partition with consistent counts
    man = load_manifest(out).to_pandas()
    assert set(man["partition_id"]) == set(parts)
    tri_counts = full.groupby("partition_id").size()
    for r in man.itertuples(index=False):
        assert tri_counts.get(r.partition_id, 0) == r.triples


def test_lookup_column_all_tiers(ray_session, monkeypatch):
    """Broadcast and distributed-parquet-shard lookup tiers must
    produce identical results, whether the shard tier is forced by ROW
    count or by the BYTE cap (a small-rows/large-bytes mapping must
    abort the broadcast collect and spill — VERDICT r2 item 7)."""
    import pandas as pd
    import ray.data as rd

    import graphiti_ray.stages.joins as joins

    target = rd.from_pandas(
        pd.DataFrame({"k": [f"id{i}" for i in range(50)], "x": list(range(50))})
    )
    mapping = rd.from_pandas(
        pd.DataFrame(
            {"old": [f"id{i}" for i in range(0, 50, 2)],
             "new": [f"canon{i}" for i in range(0, 50, 2)]}
        )
    )

    def run():
        df = joins.lookup_column(target, "k", mapping, "old", "new", "out").to_pandas()
        return df.sort_values("k").reset_index(drop=True)

    base = run()
    assert base.loc[base["k"] == "id2", "out"].iloc[0] == "canon2"
    assert base.loc[base["k"] == "id3", "out"].isna().all()

    monkeypatch.setattr(joins, "BROADCAST_MAX_ROWS", 0)
    by_rows = run()
    assert base.equals(by_rows)

    # byte-forced: rows fit, bytes don't -> broadcast collect must
    # abort mid-stream and fall back to the parquet-shard tier
    monkeypatch.setattr(joins, "BROADCAST_MAX_ROWS", 5_000_000)
    monkeypatch.setattr(joins, "BROADCAST_MAX_BYTES", 1)
    joins._KV_REF_CACHE.clear()
    by_bytes = run()
    assert base.equals(by_bytes)


def test_lookup_column_empty_mapping(ray_session):
    """An empty mapping resolves every key to None instead of crashing
    (to_pandas() of an empty Dataset has no columns at all)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import graphiti_ray.stages.joins as joins

    target = rd.from_pandas(pd.DataFrame({"k": ["a", "b"], "x": [1, 2]}))
    empty = rd.from_arrow(
        pa.table({"old": pa.array([], pa.string()), "new": pa.array([], pa.string())})
    ).filter(lambda r: False)
    df = joins.lookup_column(target, "k", empty, "old", "new", "out").to_pandas()
    assert len(df) == 2
    assert df["out"].isna().all()


def test_job_entrypoint_runs_and_resumes(ray_session, tmp_path):
    """python -m graphiti_ray.job over the synthetic KG corpus: writes
    all five tables, and a re-run with resume skips every partition."""
    from graphiti_ray.job import main

    out = tmp_path / "kg"
    argv = [
        "--synthetic", "/root/testdata/sf0.001", "--out", str(out),
        "--concurrency", "2",
    ]
    assert main(argv) == 0
    for t in ("episodes", "nodes", "edges", "mentions", "triples"):
        assert (out / t).exists()
    # second run resumes: no partitions left to process
    assert main(argv) == 0


def test_canonicalize_distributed_components_path(ray_session, monkeypatch):
    """Forcing the distributed-CC path (membership stays a Dataset,
    members tagged via tiered lookup, alias=None -> join rewrites) must
    produce the same canonical nodes and uuid_map as the driver
    union-find + broadcast path."""
    import graphiti_ray.stages.canonicalize as canon
    import graphiti_ray.stages.cc as cc
    from graphiti_ray.sources.pages_kg import kg_pages_from_documents
    from graphiti_ray.stages import extract

    pages = kg_pages_from_documents("/root/testdata/sf0.001")
    extracted = extract.extract_all(
        extract.pages_to_episodes(pages), concurrency=2
    ).materialize()
    nodes_raw, _, _ = extract.split_extracted(extracted)

    def snap(nodes, uuid_map):
        n = nodes.to_pandas()
        n = n[sorted(n.columns)].astype(str).sort_values("uuid").reset_index(drop=True)
        m = uuid_map.to_pandas()
        m = m[sorted(m.columns)].sort_values("old_uuid").reset_index(drop=True)
        return n, m

    nodes_a, map_a, alias_a = canon.canonicalize_nodes(nodes_raw)
    na, ma = snap(nodes_a, map_a)
    assert alias_a is not None and len(ma) > 0

    monkeypatch.setattr(cc, "components_with_pairs", lambda pairs, **k: (None, None))
    nodes_b, map_b, alias_b = canon.canonicalize_nodes(nodes_raw)
    assert alias_b is None
    nb, mb = snap(nodes_b, map_b)
    assert na.equals(nb)
    assert ma.equals(mb)


def test_retrieve_episodes_window_and_scope(kg):
    """Reference retrieve_episodes (graph_data_operations.py:104-160):
    last_n at/before reference_time, chronological, optional group
    scope — pinned against a pandas replay of the same rule."""
    from graphiti_ray.state.graph_ops import retrieve_episodes

    eps = kg.episodes.to_pandas()
    ref = eps["valid_at"].quantile(0.6)

    got = retrieve_episodes(kg.episodes, ref, last_n=5)
    want = (
        eps[eps["valid_at"] <= ref]
        .sort_values(["valid_at", "url"], ascending=[False, True])
        .head(5)
        .sort_values(["valid_at", "url"])["url"]
        .tolist()
    )
    assert got["url"].tolist() == want
    assert (got["valid_at"] <= ref).all()
    assert list(got["valid_at"]) == sorted(got["valid_at"])  # chronological

    grp = eps["group_id"].iloc[0]
    scoped = retrieve_episodes(kg.episodes, ref, last_n=5, group_ids=[grp])
    assert set(scoped["group_id"]) <= {grp}
    want_g = (
        eps[(eps["valid_at"] <= ref) & (eps["group_id"] == grp)]
        .sort_values(["valid_at", "url"], ascending=[False, True])
        .head(5)
        .sort_values(["valid_at", "url"])["url"]
        .tolist()
    )
    assert scoped["url"].tolist() == want_g


def test_search_filters_group_ids_scope(kg):
    """SearchFilters.group_ids confines every lane to the listed
    partitions (graphiti.py:630-640 search group scope)."""
    from graphiti_ray.search.search import SearchFilters, node_search

    nodes = kg.nodes.to_pandas()
    grp = nodes["group_id"].value_counts().index[0]
    person = next(
        n for n in nodes[nodes["group_id"] == grp]["name"] if " " in n
    )
    surname = person.split()[-1]
    hits = node_search(
        kg.nodes, surname, limit=50,
        filters=SearchFilters(group_ids=[grp]),
    )
    assert hits
    by_uuid = nodes.set_index("uuid")["group_id"]
    assert all(by_uuid[u] == grp for u in hits)
