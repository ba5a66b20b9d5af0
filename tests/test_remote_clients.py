"""Contract tests for the HTTP-shaped remote model clients (A1/A3/A4).

The reference's two retry layers (transport retry with backoff —
graphiti_core/llm_client/client.py:85-114; application-level feedback
re-ask — openai_client.py:134-173) are exercised against the in-process
FakeModelServer, including through the Ray actor-pool seams, with NO
network: the fake transport implements the same deterministic kernels
as the local clients, so remote-path outputs must be byte-identical to
local-path outputs.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pyarrow as pa
import pytest

from graphiti_ray.functions.remote_clients import (
    FakeModelServer,
    InvalidResponseError,
    RateLimitError,
    RefusalError,
    RemoteClientError,
    RemoteCrossEncoderClient,
    RemoteEmbedderClient,
    RemoteExtractorClient,
    RetryPolicy,
    ServerError,
)

REF_T = datetime(2023, 5, 17, 12, 0, 0)
# newline-separated sentences in the rule grammar
# (functions/extraction.RELATION_PATTERNS) so the episode yields
# relations, not just entities — the parity tests below assert
# non-empty relation lists to stay non-vacuous
EPISODE = (
    "Alpha Corp acquired Beta Labs in 2021.\n"
    "Carol Jones works for Alpha Corp.\n"
    "Carol Jones lives in Berlin."
)


def _no_sleep_retry(**kw):
    slept: list[float] = []
    pol = RetryPolicy(sleep=slept.append, **kw)
    return pol, slept


# ------------------------------------------------------ transport retry


def test_transport_retry_recovers_with_backoff():
    server = FakeModelServer()
    server.fail_first(2, RateLimitError)
    pol, slept = _no_sleep_retry(backoff_base_s=0.05)
    client = RemoteExtractorClient(server, retry=pol)
    out = client.extract(EPISODE, REF_T)
    assert "Alpha Corp" in out.entities
    # 2 failures + 1 success; deterministic exponential backoff
    assert server.calls["/v1/extract"] == 3
    assert slept == [0.05, 0.1]


def test_transport_retry_exhausts_and_raises():
    server = FakeModelServer()
    server.fail_first(99, ServerError)
    pol, slept = _no_sleep_retry(max_attempts=4)
    client = RemoteExtractorClient(server, retry=pol)
    with pytest.raises(ServerError):
        client.extract(EPISODE, REF_T)
    assert server.calls["/v1/extract"] == 4  # max_attempts total
    assert len(slept) == 3  # no sleep after the final attempt


def test_non_retryable_status_not_retried():
    calls = {"n": 0}

    def transport(path, payload):
        calls["n"] += 1
        raise RemoteClientError("HTTP 400 bad request")

    pol, slept = _no_sleep_retry()
    client = RemoteExtractorClient(transport, retry=pol)
    with pytest.raises(RemoteClientError):
        client.extract(EPISODE, REF_T)
    assert calls["n"] == 1 and slept == []


# ------------------------------------------------- application feedback


def test_feedback_reask_recovers_from_invalid_response():
    server = FakeModelServer()
    server.garble_first(1)
    client = RemoteExtractorClient(server, retry=_no_sleep_retry()[0])
    out = client.extract(EPISODE, REF_T)
    assert "Alpha Corp" in out.entities
    # garbled first answer + corrected re-ask carrying error_context
    assert server.calls["/v1/extract"] == 2


def test_feedback_reask_exhausts():
    server = FakeModelServer()
    server.garble_first(99)

    # answer garbled even on re-asks: strip the error_context marker
    def stubborn(path, payload):
        return server(path, {k: v for k, v in payload.items() if k != "error_context"})

    client = RemoteExtractorClient(
        stubborn, retry=_no_sleep_retry()[0], max_feedback_retries=2
    )
    with pytest.raises(InvalidResponseError):
        client.extract(EPISODE, REF_T)
    assert server.calls["/v1/extract"] == 3  # initial + 2 feedback re-asks


def test_refusal_never_reasked():
    calls = {"n": 0}

    def transport(path, payload):
        calls["n"] += 1
        return {"refusal": "cannot comply"}

    client = RemoteExtractorClient(transport, retry=_no_sleep_retry()[0])
    with pytest.raises(RefusalError):
        client.extract(EPISODE, REF_T)
    assert calls["n"] == 1


# ---------------------------------------------------- batched extraction


def test_extract_batch_one_request_per_chunk_not_per_episode():
    """The verdict-item contract: 10 episodes through request_batch=4
    cost ceil(10/4)=3 requests on the BATCH endpoint (zero on the
    per-episode one), and results match the per-episode path exactly."""
    server = FakeModelServer()
    client = RemoteExtractorClient(server, request_batch=4,
                                   retry=_no_sleep_retry()[0])
    episodes = [f"{EPISODE}\nExtra Fact {i} happened in 200{i}." for i in range(10)]
    times = [datetime(2023, 1, 1 + i) for i in range(10)]
    got = client.extract_batch(episodes, times)
    assert server.calls["/v1/extract_batch"] == 3
    assert "/v1/extract" not in server.calls
    want = [client.extract(c, t) for c, t in zip(episodes, times)]
    assert [g.entities for g in got] == [w.entities for w in want]
    assert [
        [(r.subj, r.pred, r.obj, r.fact, r.valid_at, r.invalid_at)
         for r in g.relations] for g in got
    ] == [
        [(r.subj, r.pred, r.obj, r.fact, r.valid_at, r.invalid_at)
         for r in w.relations] for w in want
    ]
    assert any(g.relations for g in got)  # non-vacuous


def test_extract_batch_feedback_reask_per_chunk():
    server = FakeModelServer()
    server.garble_first(1)
    client = RemoteExtractorClient(server, request_batch=3,
                                   retry=_no_sleep_retry()[0])
    episodes = [EPISODE] * 5
    times = [REF_T] * 5
    got = client.extract_batch(episodes, times)
    # chunk 1 garbled + feedback re-ask, chunk 2 clean -> 3 requests
    assert server.calls["/v1/extract_batch"] == 3
    assert all("Alpha Corp" in g.entities for g in got)


def test_extract_batch_refusal_never_reasked():
    calls = {"n": 0}

    def transport(path, payload):
        calls["n"] += 1
        return {"refusal": "cannot comply"}

    client = RemoteExtractorClient(transport, retry=_no_sleep_retry()[0])
    with pytest.raises(RefusalError):
        client.extract_batch([EPISODE], [REF_T])
    assert calls["n"] == 1


def test_actor_stage_routes_whole_batch_through_extract_batch():
    """MentionRelationExtractor (called directly, no Ray — the actor
    __call__ is a plain function) detects extract_batch and issues one
    request per chunk; the union table is byte-identical to the
    default local client's."""
    from graphiti_ray.stages.extract import (
        MentionRelationExtractor,
        pages_to_episodes_batch,
    )

    eps = pages_to_episodes_batch(_pages(10))
    server = FakeModelServer()
    ext = MentionRelationExtractor(
        client_factory=lambda: RemoteExtractorClient(
            server, request_batch=4, retry=_no_sleep_retry()[0]
        )
    )
    assert ext.batched
    got = ext(eps)
    assert server.calls["/v1/extract_batch"] == 3  # ceil(10/4)
    assert "/v1/extract" not in server.calls
    want = MentionRelationExtractor()(eps)
    assert got.equals(want)
    assert got.num_rows > 0


# ----------------------------------------- parity with the local kernels


def test_remote_extract_equals_local():
    from graphiti_ray.functions.clients import DeterministicExtractorClient

    remote = RemoteExtractorClient(FakeModelServer(), retry=_no_sleep_retry()[0])
    local = DeterministicExtractorClient()
    r, l = remote.extract(EPISODE, REF_T), local.extract(EPISODE, REF_T)
    assert r.entities == l.entities
    assert len(r.relations) == len(l.relations) >= 3  # non-vacuous
    assert [(x.subj, x.pred, x.obj, x.valid_at, x.invalid_at, x.fact)
            for x in r.relations] == [
        (x.subj, x.pred, x.obj, x.valid_at, x.invalid_at, x.fact)
        for x in l.relations
    ]


def test_embedder_batches_requests_and_matches_hash_embedder():
    from graphiti_ray.functions.embed import hash_embed_texts

    server = FakeModelServer()
    client = RemoteEmbedderClient(server, dim=256, request_batch=3,
                                  retry=_no_sleep_retry()[0])
    texts = [f"document number {i} about topic {i % 3}" for i in range(10)]
    emb = client.embed(texts)
    assert emb.shape == (10, 256)
    assert server.calls["/v1/embed"] == 4  # ceil(10/3)
    np.testing.assert_array_equal(emb, hash_embed_texts(texts, dim=256))


def test_embedder_rejects_shape_mismatch():
    client = RemoteEmbedderClient(
        lambda path, payload: {"embeddings": [[0.0, 1.0]] * len(payload["input"])},
        dim=256, retry=_no_sleep_retry()[0],
    )
    with pytest.raises(InvalidResponseError):
        client.embed(["a", "b"])


def test_cross_encoder_remote_matches_local_scores():
    from graphiti_ray.search.rerank_models import CrossEncoderReranker

    query = "alpha corp acquisition"
    passages = [EPISODE, "unrelated text about weather", "alpha corp ceo"]
    remote = RemoteCrossEncoderClient(FakeModelServer(), request_batch=2,
                                      retry=_no_sleep_retry()[0])
    local = CrossEncoderReranker(query)
    np.testing.assert_allclose(
        remote.score(query, passages), local._score_pairs(passages)
    )


# -------------------------------------------- through the Ray actor pool


def _pages(n=4):
    from graphiti_ray.schemas import PAGES

    rows = [
        {
            "url": f"https://r.example/p{i}",
            "warc_ts": datetime(2023, 1, 1 + i),
            "html": None,
            "text": (
                f"Alpha Corp acquired Beta Labs in 202{i % 2}.\n"
                "Carol Jones works for Alpha Corp.\n"
                f"Delta Group moved to Berlin in 201{i + 1}."
            ),
            "lang": "en",
        }
        for i in range(n)
    ]
    return pa.Table.from_pylist(rows, schema=PAGES)


def test_build_kg_through_remote_client_with_retries(ray_session):
    """The flagship pipeline through the actor-pool seam with the
    remote-shaped client, INCLUDING a transient-failure retry inside
    every actor (each actor's copy of the fake server fails its first
    request) — output must equal the default local-client build."""
    import ray.data as rd

    from graphiti_ray.pipelines.kg import build_kg

    def remote_factory():
        server = FakeModelServer()
        server.fail_first(1, ServerError)
        return RemoteExtractorClient(
            server, retry=RetryPolicy(backoff_base_s=0.0, sleep=lambda s: None)
        )

    def triples(factory):
        kg = build_kg(rd.from_arrow(_pages()), concurrency=1,
                      client_factory=factory)
        return (
            kg.triples.to_pandas()
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )

    got, want = triples(remote_factory), triples(None)
    assert len(got) == len(want) > 0
    for col in ("subj", "pred", "obj", "fact"):
        assert got[col].tolist() == want[col].tolist()


def test_embed_stage_through_remote_embedder(ray_session):
    import ray.data as rd

    from graphiti_ray.stages.embed_stage import add_embeddings

    ds = rd.from_items(
        [{"uuid": str(i), "text": f"entity description {i}"} for i in range(20)]
    )

    def remote_factory():
        return RemoteEmbedderClient(FakeModelServer(), dim=256,
                                    retry=RetryPolicy(sleep=lambda s: None))

    got = add_embeddings(ds, "text", "emb", concurrency=1,
                         embedder_factory=remote_factory).to_pandas()
    want = add_embeddings(ds, "text", "emb", concurrency=1).to_pandas()
    got_m = np.stack(got.sort_values("uuid")["emb"].to_numpy())
    want_m = np.stack(want.sort_values("uuid")["emb"].to_numpy())
    np.testing.assert_allclose(got_m, want_m, atol=1e-6)


def test_recipe_lane_with_remote_cross_encoder(ray_session):
    """A cross-encoder recipe lane driven by the remote-shaped reranker
    (factory overrides _score_pairs only — the documented seam) ranks
    identically to the local token-overlap model."""
    import ray.data as rd

    from graphiti_ray.functions.remote_clients import remote_cross_encoder_reranker
    from graphiti_ray.search.rerank_models import cross_encoder_rank

    cand = rd.from_items(
        [
            {"uuid": "a", "passage": "alpha corp acquired beta labs"},
            {"uuid": "b", "passage": "weather report for berlin"},
            {"uuid": "c", "passage": "alpha corp quarterly earnings"},
            {"uuid": "d", "passage": "beta labs research alpha corp"},
        ]
    )
    query = "alpha corp beta labs"
    local = cross_encoder_rank(cand, query, concurrency=1)

    remote_cls = remote_cross_encoder_reranker(FakeModelServer())
    scored = cand.map_batches(
        remote_cls, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"query": query},
    ).to_pandas()
    remote = scored.sort_values(
        ["ce_score", "uuid"], ascending=[False, True]
    )["uuid"].tolist()
    assert remote == local
