"""M4 node summaries, T4 episode windows, A4/Q10 cross-encoder stage."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def kg(ray_session):
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.synth import pages_dataset

    return build_kg(pages_dataset(200), now=datetime(2026, 1, 1), concurrency=2)


def test_node_summaries(kg):
    from graphiti_ray.stages.summarize import summarize_nodes

    df = summarize_nodes(kg.nodes, kg.edges).to_pandas()
    assert len(df) == kg.nodes.count()
    nodes = kg.nodes.to_pandas().set_index("uuid")
    # summary always carries the mention count; entities with edges get
    # a relation histogram
    for r in df.head(20).itertuples(index=False):
        assert r.summary.startswith(f"{r.name}: mentioned in ")
        assert str(nodes.loc[r.uuid, "n_mentions"]) in r.summary
    edges = kg.edges.to_pandas()
    linked = set(edges["source_node_uuid"]) | set(edges["target_node_uuid"])
    with_rel = df[df["uuid"].isin(linked)]
    assert (with_rel["summary"].str.contains("relations:")).all()


def test_episode_windows_lag_semantics(ray_session):
    from graphiti_ray.sources.pages import pages_from_documents
    from graphiti_ray.stages.extract import pages_to_episodes
    from graphiti_ray.stages.summarize import episode_windows

    eps = pages_to_episodes(pages_from_documents("/root/testdata/sf0.001"))
    got = episode_windows(eps).to_pandas()
    ref = eps.to_pandas()[["group_id", "url", "valid_at"]]
    ref = ref.sort_values(["group_id", "valid_at", "url"])
    for lag in (1, 2, 3):
        ref[f"prev{lag}"] = ref.groupby("group_id")["url"].shift(lag)
    merged = got.set_index("url").sort_index()
    expected = ref.set_index("url").sort_index()
    for lag in (1, 2, 3):
        assert merged[f"prev{lag}"].fillna("-").equals(expected[f"prev{lag}"].fillna("-"))


def test_cross_encoder_rank(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from graphiti_ray.search.rerank_models import cross_encoder_rank

    cands = rd.from_arrow(
        pa.table(
            {
                "uuid": ["a", "b", "c"],
                "passage": [
                    "completely unrelated text here",
                    "alice works for acme corp",
                    "alice works somewhere",
                ],
            }
        )
    )
    out = cross_encoder_rank(cands, "alice works for acme")
    assert out[0] == "b"
    assert out[-1] == "a"


def test_embed_stage_and_clients(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    import pytest as _pytest

    from graphiti_ray.functions.clients import (
        DeterministicExtractorClient,
        LLMExtractorClient,
    )
    from graphiti_ray.stages.embed_stage import add_embeddings

    ds = rd.from_arrow(pa.table({"uuid": ["a", "b"], "name": ["Ana Barton", "Zorex Corp"]}))
    out = add_embeddings(ds, "name", "name_embedding").to_pandas()
    from graphiti_ray import EMBEDDING_DIM

    v = np.array(out["name_embedding"].tolist())
    assert v.shape == (2, EMBEDDING_DIM)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)

    from datetime import datetime

    c = DeterministicExtractorClient()
    r1 = c.extract("Ana Barton works for Zorex Corp.", datetime(2024, 1, 1))
    r2 = c.extract("Ana Barton works for Zorex Corp.", datetime(2024, 1, 1))
    assert r1 is r2  # response-cache hit returns the cached object
    assert c.cache.hits == 1
    with _pytest.raises(NotImplementedError):
        LLMExtractorClient()


def test_build_kg_with_embeddings_and_stored_column_search(ray_session):
    from datetime import datetime

    import numpy as np

    from graphiti_ray import EMBEDDING_DIM
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.search import node_search
    from graphiti_ray.synth import pages_dataset

    kg = build_kg(pages_dataset(120), now=datetime(2026, 1, 1), concurrency=2,
                  embed=True)
    nodes = kg.nodes.materialize()
    df = nodes.to_pandas()
    assert "name_embedding" in df.columns
    v = np.array(df["name_embedding"].iloc[0])
    assert v.shape == (EMBEDDING_DIM,)
    # stored-column lane produces the same ranking as on-the-fly
    plain = build_kg(pages_dataset(120), now=datetime(2026, 1, 1), concurrency=2)
    surname = next(n for n in df["name"] if " " in n).split()[-1]
    assert node_search(nodes, surname) == node_search(plain.nodes.materialize(), surname)
