"""Golden-file tests for the versioned prompt-template library
(functions/prompts.py — the content analog of the reference's
prompts/ registry, graphiti_core/prompts/lib.py:83-139).

Rendering is pure string formatting, so each stage's prompt for a
fixed context is pinned byte-for-byte against tests/golden/ — a prompt
edit must come with a deliberate golden update (and a version bump for
behavioral changes, since the response cache keys on the version)."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from graphiti_ray.functions.prompts import (
    DEFAULT_PROMPT_VERSION,
    PROMPT_LIBRARY,
    render,
    response_schema,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

REF_T = "2023-05-17T12:00:00"

# one deterministic context per stage — every substitution slot filled
STAGE_CONTEXTS: dict[str, dict] = {
    "extract_episode": {
        "content": (
            "Alpha Corp acquired Beta Labs in 2021.\n"
            "Carol Jones works for Alpha Corp."
        ),
        "reference_time": REF_T,
        "previous_episodes": ["Beta Labs opened a Berlin office."],
    },
    "reflexion": {
        "content": "Alpha Corp acquired Beta Labs in 2021.",
        "extracted_entities": ["Alpha Corp"],
    },
    "edge_dates": {
        "content": "Alpha Corp acquired Beta Labs in 2021.",
        "fact": "Alpha Corp acquired Beta Labs in 2021.",
        "reference_time": REF_T,
    },
    "dedupe_node": {
        "new_node": {"name": "Alpha Corporation", "summary": "an acquirer"},
        "existing_nodes": [
            {"uuid": "u1", "name": "Alpha Corp", "summary": "acquired Beta Labs"},
            {"uuid": "u2", "name": "Gamma Inc", "summary": "unrelated"},
        ],
    },
    "dedupe_node_list": {
        "nodes": [
            {"uuid": "u1", "name": "Alpha Corp", "summary": "acquirer"},
            {"uuid": "u2", "name": "Alpha Corporation", "summary": "same firm"},
            {"uuid": "u3", "name": "Gamma Inc", "summary": "other"},
        ],
    },
    "dedupe_edge": {
        "new_edge": {
            "uuid": "e9",
            "fact": "Alpha Corp bought Beta Labs.",
        },
        "existing_edges": [
            {"uuid": "e1", "fact": "Alpha Corp acquired Beta Labs in 2021."},
        ],
    },
    "summarize_node": {
        "name": "Alpha Corp",
        "episodes": [
            "Alpha Corp acquired Beta Labs in 2021.",
            "Carol Jones works for Alpha Corp.",
        ],
        "max_words": 500,
    },
    "invalidate_edges": {
        "new_edge": {
            "uuid": "e9",
            "fact": "Carol Jones works for Gamma Inc.",
            "valid_at": REF_T,
        },
        "existing_edges": [
            {
                "uuid": "e1",
                "fact": "Carol Jones works for Alpha Corp.",
                "valid_at": "2021-01-01T00:00:00",
                "invalid_at": None,
            },
        ],
    },
}


def render_text(stage: str) -> str:
    msgs = render(stage, STAGE_CONTEXTS[stage])
    return "\n".join(
        f"=== {m['role']} ===\n{m['content']}\n" for m in msgs
    )


def test_every_stage_has_a_context_and_golden():
    stages = sorted(PROMPT_LIBRARY[DEFAULT_PROMPT_VERSION])
    assert sorted(STAGE_CONTEXTS) == stages
    for s in stages:
        assert os.path.exists(
            os.path.join(GOLDEN_DIR, f"prompt_{s}.txt")
        ), f"missing golden for {s} — run tests/make_prompt_goldens.py"


@pytest.mark.parametrize("stage", sorted(STAGE_CONTEXTS))
def test_rendered_prompt_matches_golden(stage):
    with open(os.path.join(GOLDEN_DIR, f"prompt_{stage}.txt")) as f:
        want = f.read()
    assert render_text(stage) == want


@pytest.mark.parametrize("stage", sorted(STAGE_CONTEXTS))
def test_schema_is_object_with_required(stage):
    sch = response_schema(stage)
    assert sch["type"] == "object" and sch["required"]
    assert set(sch["required"]) <= set(sch["properties"])


def test_unknown_stage_and_version_fail_loudly():
    with pytest.raises(KeyError, match="available"):
        render("no_such_stage", {})
    with pytest.raises(KeyError, match="available"):
        render("extract_episode", {}, version="prompts-v999")


def test_remote_client_sends_rendered_prompt_and_schema():
    """The fake-server contract the verdict asked for: a client
    constructed with prompt_version ships the golden-rendered messages
    and the response schema in every request — single AND batched —
    while the kernel output stays identical to the promptless client."""
    from graphiti_ray.functions.remote_clients import (
        FakeModelServer,
        RemoteExtractorClient,
        RetryPolicy,
    )

    ctx = STAGE_CONTEXTS["extract_episode"]
    seen: list[dict] = []
    server = FakeModelServer()

    def spy(path, payload):
        seen.append({"path": path, **payload})
        return server(path, payload)

    pol = RetryPolicy(sleep=lambda s: None)
    client = RemoteExtractorClient(spy, retry=pol,
                                   prompt_version=DEFAULT_PROMPT_VERSION)
    assert client.model_id.endswith(":prompts-v1")
    ref = datetime.fromisoformat(ctx["reference_time"])
    out1 = client.extract(ctx["content"], ref,
                          previous_episodes=ctx["previous_episodes"])
    out2 = client.extract_batch(
        [ctx["content"]], [ref],
        previous_episodes=[ctx["previous_episodes"]],
    )[0]

    want_msgs = render("extract_episode", ctx)
    single, batched = seen[0], seen[1]
    assert single["path"] == "/v1/extract"
    assert single["messages"] == want_msgs
    assert single["response_schema"] == response_schema("extract_episode")
    assert batched["path"] == "/v1/extract_batch"
    assert batched["prompt_version"] == DEFAULT_PROMPT_VERSION
    assert batched["items"][0]["messages"] == want_msgs
    assert batched["items"][0]["response_schema"] == response_schema(
        "extract_episode"
    )

    plain = RemoteExtractorClient(FakeModelServer(), retry=pol).extract(
        ctx["content"], ref, previous_episodes=ctx["previous_episodes"]
    )
    assert out1.entities == out2.entities == plain.entities
    assert len(out1.relations) == len(plain.relations) >= 1
