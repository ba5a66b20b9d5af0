"""Versioned LLM prompt-template library + structured-output schemas.

The reference keeps every LLM prompt in a named registry
(graphiti_core/prompts/lib.py:83-139) with one module per stage:
entity extraction (prompts/extract_nodes.py:63-196), fact-triple
extraction (prompts/extract_edges.py:50-82), edge-date resolution
(prompts/extract_edge_dates.py:43-87), node dedupe verdicts
(prompts/dedupe_nodes.py:47-128), edge dedupe (prompts/dedupe_edges.py),
node summaries (prompts/summarize_nodes.py) and edge invalidation
(prompts/invalidate_edges.py). The engine's transport/retry/cache
layers (functions/remote_clients.py) already carry requests to a model
endpoint; this module supplies the CONTENT those requests would carry
in production — chat messages rendered from a context dict, plus the
JSON schema the response must satisfy (the reference enforces the same
contracts via Pydantic response models).

Everything here is deterministic data: rendering is pure string
formatting, so templates are testable against golden files with no
model in the loop. The templates are original text expressing the same
task semantics as the reference prompts (same inputs, same guidelines
in intent, same response shape) — not copies of its wording.

Versioning mirrors functions/promptlib.py's rule registry: the library
is keyed ``version -> stage -> template``; remote clients bake the
version into every payload so a response cache can never serve one
version's output for another.
"""

from __future__ import annotations

import json
from typing import Callable

Message = dict  # {"role": "system"|"user", "content": str}

# ------------------------------------------------------------- schemas
#
# JSON-Schema-shaped response contracts, one per stage — the batch
# analog of the reference's Pydantic response models
# (prompts/models.py, openai_client.py:104-133 structured output).

EXTRACT_NODES_SCHEMA = {
    "type": "object",
    "required": ["entities"],
    "properties": {
        "entities": {"type": "array", "items": {"type": "string"}},
    },
}

EXTRACT_EDGES_SCHEMA = {
    "type": "object",
    "required": ["relations"],
    "properties": {
        "relations": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["subject", "predicate", "object", "fact"],
                "properties": {
                    "subject": {"type": "string"},
                    "predicate": {"type": "string"},
                    "object": {"type": "string"},
                    "fact": {"type": "string"},
                    "valid_at": {"type": ["string", "null"]},
                    "invalid_at": {"type": ["string", "null"]},
                },
            },
        },
    },
}

# the fused wire contract RemoteExtractorClient validates (_parse):
# entity extraction + fact extraction + edge dates in one response
EXTRACT_EPISODE_SCHEMA = {
    "type": "object",
    "required": ["entities", "relations"],
    "properties": {
        "entities": EXTRACT_NODES_SCHEMA["properties"]["entities"],
        "relations": EXTRACT_EDGES_SCHEMA["properties"]["relations"],
    },
}

EDGE_DATES_SCHEMA = {
    "type": "object",
    "required": ["valid_at", "invalid_at"],
    "properties": {
        "valid_at": {"type": ["string", "null"]},
        "invalid_at": {"type": ["string", "null"]},
    },
}

DEDUPE_NODE_SCHEMA = {
    "type": "object",
    "required": ["is_duplicate", "uuid", "name"],
    "properties": {
        "is_duplicate": {"type": "boolean"},
        "uuid": {"type": ["string", "null"]},
        "name": {"type": "string"},
    },
}

DEDUPE_NODE_LIST_SCHEMA = {
    "type": "object",
    "required": ["groups"],
    "properties": {
        "groups": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["uuids", "summary"],
                "properties": {
                    "uuids": {"type": "array", "items": {"type": "string"}},
                    "summary": {"type": "string"},
                },
            },
        },
    },
}

DEDUPE_EDGE_SCHEMA = {
    "type": "object",
    "required": ["is_duplicate", "uuid"],
    "properties": {
        "is_duplicate": {"type": "boolean"},
        "uuid": {"type": ["string", "null"]},
    },
}

SUMMARIZE_NODE_SCHEMA = {
    "type": "object",
    "required": ["summary"],
    "properties": {"summary": {"type": "string"}},
}

INVALIDATE_EDGES_SCHEMA = {
    "type": "object",
    "required": ["invalidated_edge_uuids"],
    "properties": {
        "invalidated_edge_uuids": {
            "type": "array",
            "items": {"type": "string"},
        },
    },
}

MISSED_ENTITIES_SCHEMA = {
    "type": "object",
    "required": ["missed_entities"],
    "properties": {
        "missed_entities": {"type": "array", "items": {"type": "string"}},
    },
}


# ----------------------------------------------------------- templates


def _block(tag: str, body: str) -> str:
    return f"<{tag}>\n{body}\n</{tag}>"


def _jblock(tag: str, obj) -> str:
    return _block(tag, json.dumps(obj, indent=2, default=str))


def extract_episode_prompt(ctx: dict) -> list[Message]:
    """Fused M1+M2+M3 episode prompt (the /v1/extract contract).

    Context keys: content, reference_time, previous_episodes (list of
    str, may be empty). Task semantics of
    prompts/extract_nodes.extract_text + extract_edges.edge +
    extract_edge_dates.v1, fused because the engine's extraction stage
    is one pass per episode."""
    prev = ctx.get("previous_episodes") or []
    return [
        {
            "role": "system",
            "content": (
                "You build knowledge graphs from documents. For one "
                "episode of text you must return, as JSON matching the "
                "provided schema: every significant entity mentioned, "
                "and every factual relationship holding between two of "
                "those entities."
            ),
        },
        {
            "role": "user",
            "content": "\n".join(
                [
                    _jblock("CONTEXT_EPISODES", prev),
                    _block("EPISODE", ctx["content"]),
                    _block("REFERENCE_TIME", str(ctx["reference_time"])),
                    "",
                    "Rules for entities:",
                    "- name each entity by its fullest form appearing in "
                    "the EPISODE; no abbreviations.",
                    "- entities are things (people, organizations, places, "
                    "concepts) — never actions, relationships, dates or "
                    "times.",
                    "- the CONTEXT_EPISODES exist only to resolve "
                    "references; never emit an entity that appears only "
                    "there.",
                    "",
                    "Rules for relations:",
                    "- both endpoints must be entities you returned, and "
                    "they must be distinct.",
                    "- predicate: a terse ALL_CAPS_SNAKE label "
                    "(WORKS_FOR, ACQUIRED, LIVES_IN).",
                    "- fact: one sentence from the episode's content "
                    "carrying the full statement.",
                    "- valid_at / invalid_at: ISO-8601 instants for when "
                    "the relationship began / ceased holding, ONLY when "
                    "the episode states them (resolve relative phrases "
                    "against REFERENCE_TIME; bare years mean Jan 1 "
                    "00:00:00; otherwise null). A fact asserted in the "
                    "present tense is valid_at the REFERENCE_TIME.",
                ]
            ),
        },
    ]


def reflexion_prompt(ctx: dict) -> list[Message]:
    """Which entities did the previous pass miss?
    (prompts/extract_nodes.reflexion; consumed by
    functions/clients.ReflexiveExtractor.find_missed).
    Context keys: content, extracted_entities."""
    return [
        {
            "role": "system",
            "content": (
                "You audit entity-extraction output for completeness."
            ),
        },
        {
            "role": "user",
            "content": "\n".join(
                [
                    _block("EPISODE", ctx["content"]),
                    _jblock("ALREADY_EXTRACTED", ctx["extracted_entities"]),
                    "",
                    "List every entity present in the EPISODE that is "
                    "absent from ALREADY_EXTRACTED. Return an empty list "
                    "if nothing was missed.",
                ]
            ),
        },
    ]


def edge_dates_prompt(ctx: dict) -> list[Message]:
    """Standalone M3 date resolution for one fact
    (prompts/extract_edge_dates.v1). Context keys: fact,
    reference_time, content."""
    return [
        {
            "role": "system",
            "content": (
                "You resolve the lifetime of one knowledge-graph fact: "
                "when it became true (valid_at) and, if stated, when it "
                "stopped being true (invalid_at)."
            ),
        },
        {
            "role": "user",
            "content": "\n".join(
                [
                    _block("EPISODE", ctx["content"]),
                    _block("FACT", ctx["fact"]),
                    _block("REFERENCE_TIME", str(ctx["reference_time"])),
                    "",
                    "Return ISO-8601 instants (UTC, trailing Z) or null.",
                    "- use only time information that is part of the FACT "
                    "itself; ignore other dates in the episode.",
                    "- resolve relative mentions ('two years ago') "
                    "against REFERENCE_TIME.",
                    "- a bare date means midnight; a bare year means "
                    "January 1st at midnight.",
                    "- present-tense facts: valid_at = REFERENCE_TIME.",
                    "- when nothing ties a time to the fact, both fields "
                    "are null — never guess.",
                ]
            ),
        },
    ]


def dedupe_node_prompt(ctx: dict) -> list[Message]:
    """Is this freshly extracted node a duplicate of a known node?
    (prompts/dedupe_nodes.node — the verdict the engine's
    canonicalize stage computes deterministically). Context keys:
    new_node {name, summary}, existing_nodes [{uuid, name, summary}]."""
    return [
        {
            "role": "system",
            "content": (
                "You decide whether a newly extracted graph node refers "
                "to the same real-world entity as one already in the "
                "graph."
            ),
        },
        {
            "role": "user",
            "content": "\n".join(
                [
                    _jblock("KNOWN_NODES", ctx["existing_nodes"]),
                    _jblock("CANDIDATE", ctx["new_node"]),
                    "",
                    "Judge by meaning, not spelling: names can differ "
                    "while the entity is the same — weigh the summaries "
                    "too. If CANDIDATE matches a known node, answer "
                    "is_duplicate=true with that node's uuid and the most "
                    "complete name available from either record; "
                    "otherwise is_duplicate=false with uuid=null and the "
                    "candidate's own name.",
                ]
            ),
        },
    ]


def dedupe_node_list_prompt(ctx: dict) -> list[Message]:
    """Partition a node list into duplicate groups
    (prompts/dedupe_nodes.node_list). Context keys: nodes
    [{uuid, name, summary}]."""
    return [
        {
            "role": "system",
            "content": (
                "You partition a list of graph nodes into groups that "
                "refer to the same real-world entity."
            ),
        },
        {
            "role": "user",
            "content": "\n".join(
                [
                    _jblock("NODES", ctx["nodes"]),
                    "",
                    "Every uuid must land in exactly one group; a node "
                    "with no duplicate forms a singleton group. For each "
                    "group also write one short summary synthesizing its "
                    "members' summaries.",
                ]
            ),
        },
    ]


def dedupe_edge_prompt(ctx: dict) -> list[Message]:
    """Does this new fact restate an existing edge?
    (prompts/dedupe_edges.edge). Context keys: new_edge,
    existing_edges."""
    return [
        {
            "role": "system",
            "content": (
                "You decide whether a newly extracted fact edge carries "
                "the same information as an edge already in the graph."
            ),
        },
        {
            "role": "user",
            "content": "\n".join(
                [
                    _jblock("KNOWN_EDGES", ctx["existing_edges"]),
                    _jblock("CANDIDATE", ctx["new_edge"]),
                    "",
                    "Two facts are duplicates when they express the same "
                    "information, even with different wording. Answer "
                    "is_duplicate plus the matching edge's uuid (null "
                    "when none matches).",
                ]
            ),
        },
    ]


def summarize_node_prompt(ctx: dict) -> list[Message]:
    """Entity summary from its episodes (prompts/summarize_nodes.
    summarize_context; the engine's summarize stage computes the
    deterministic analog). Context keys: name, episodes (list of str),
    max_words (int)."""
    return [
        {
            "role": "system",
            "content": (
                "You write grounded entity summaries: only statements "
                "supported by the supplied episodes, only statements "
                "about the target entity."
            ),
        },
        {
            "role": "user",
            "content": "\n".join(
                [
                    _jblock("EPISODES", ctx["episodes"]),
                    _block("ENTITY", ctx["name"]),
                    "",
                    f"Summarize ENTITY in at most {ctx.get('max_words', 500)} "
                    "words using nothing beyond the EPISODES. Omit "
                    "anything you cannot point to in them — an "
                    "unsupported claim is worse than a missing one.",
                ]
            ),
        },
    ]


def invalidate_edges_prompt(ctx: dict) -> list[Message]:
    """Which existing edges does a new edge contradict?
    (prompts/invalidate_edges.v2 — the engine's temporal sweep is the
    deterministic analog, stages/edges.py). Context keys: new_edge,
    existing_edges."""
    return [
        {
            "role": "system",
            "content": (
                "You detect contradictions in a knowledge graph: an "
                "existing edge is invalidated only when a newer edge "
                "makes it explicitly false, never merely because it "
                "went unmentioned."
            ),
        },
        {
            "role": "user",
            "content": "\n".join(
                [
                    _jblock("EXISTING_EDGES", ctx["existing_edges"]),
                    _jblock("NEW_EDGE", ctx["new_edge"]),
                    "",
                    "Return the uuids of EXISTING_EDGES that NEW_EDGE "
                    "explicitly contradicts or supersedes (use the "
                    "edges' validity windows); an empty list when "
                    "nothing is invalidated.",
                ]
            ),
        },
    ]


# ------------------------------------------------------------- registry

PromptTemplate = Callable[[dict], list[Message]]

PROMPT_LIBRARY: dict[str, dict[str, tuple[PromptTemplate, dict]]] = {
    "prompts-v1": {
        "extract_episode": (extract_episode_prompt, EXTRACT_EPISODE_SCHEMA),
        "reflexion": (reflexion_prompt, MISSED_ENTITIES_SCHEMA),
        "edge_dates": (edge_dates_prompt, EDGE_DATES_SCHEMA),
        "dedupe_node": (dedupe_node_prompt, DEDUPE_NODE_SCHEMA),
        "dedupe_node_list": (dedupe_node_list_prompt, DEDUPE_NODE_LIST_SCHEMA),
        "dedupe_edge": (dedupe_edge_prompt, DEDUPE_EDGE_SCHEMA),
        "summarize_node": (summarize_node_prompt, SUMMARIZE_NODE_SCHEMA),
        "invalidate_edges": (invalidate_edges_prompt, INVALIDATE_EDGES_SCHEMA),
    },
}

DEFAULT_PROMPT_VERSION = "prompts-v1"


def render(stage: str, ctx: dict,
           version: str = DEFAULT_PROMPT_VERSION) -> list[Message]:
    """Render one stage's chat messages. Unknown stage/version fail
    loudly with the catalog (prompts/lib.py behaves the same way)."""
    try:
        stages = PROMPT_LIBRARY[version]
    except KeyError:
        raise KeyError(
            f"unknown prompt version {version!r}; available: "
            f"{sorted(PROMPT_LIBRARY)}"
        ) from None
    try:
        template, _schema = stages[stage]
    except KeyError:
        raise KeyError(
            f"unknown prompt stage {stage!r} in {version}; available: "
            f"{sorted(stages)}"
        ) from None
    return template(ctx)


def response_schema(stage: str,
                    version: str = DEFAULT_PROMPT_VERSION) -> dict:
    """The JSON schema a response to this stage's prompt must satisfy."""
    return PROMPT_LIBRARY[version][stage][1]
